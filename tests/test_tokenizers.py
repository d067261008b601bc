"""GPT-2 byte-level BPE and T5 SentencePiece-unigram tokenizer oracles.

The reference tokenizes through AutoTokenizer.from_pretrained inside the
model forward (narr_pooling_layers.py:270,351); these tests pin our offline
host-side implementations against huggingface implementations constructed
from the SAME local files (no network).
"""

import struct

import numpy as np
import pytest

from transfusion_tpu.data.tokenizer import (
    GPT2BPETokenizer,
    SentencePieceTokenizer,
    bytes_to_unicode,
    gpt2_words,
    hash_gpt2_tokenizer,
    hash_t5_tokenizer,
    parse_sentencepiece_model,
)

TRICKY = [
    "wash the pan",
    "I'll   wash 2 pans, then  dry them!",
    "Hello there,I'm #C mixing flour...",
    "  leading and trailing  ",
    "tabs\tand\nnewlines \n mixed",
    "don't you've we'd they'll it's CAN'T",
    "digits123mix 45.6 7,8",
    "unicode café naïve über",
    "",
    " ",
    "   ",
    "a",
    " a",
    "a ",
    "!?.",
]


def test_gpt2_words_matches_regex_pattern():
    regex = pytest.importorskip("regex")
    pat = regex.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
    )
    for text in TRICKY:
        assert gpt2_words(text) == pat.findall(text), repr(text)


def _toy_gpt2_files(tmp_path):
    """A coherent small vocab.json/merges.txt over the byte alphabet."""
    import json

    byte_tokens = list(bytes_to_unicode().values())
    merges = [
        ("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("a", "n"),
        ("w", "as"), ("a", "s"), ("Ġ", "p"), ("Ġp", "an"),
        ("i", "n"), ("o", "u"), ("'", "s"),
    ]
    vocab = {t: i for i, t in enumerate(byte_tokens)}
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vj = tmp_path / "vocab.json"
    mg = tmp_path / "merges.txt"
    vj.write_text(json.dumps(vocab), encoding="utf-8")
    mg.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
        encoding="utf-8",
    )
    return str(vj), str(mg)


def test_gpt2_bpe_matches_hf_from_same_files(tmp_path):
    transformers = pytest.importorskip("transformers")
    vj, mg = _toy_gpt2_files(tmp_path)
    ours = GPT2BPETokenizer.from_files(vj, mg, max_length=32)
    theirs = transformers.GPT2Tokenizer(vj, mg)
    for text in TRICKY:
        assert ours.tokenize(text) == theirs.tokenize(text), repr(text)
        assert ours.encode(text) == theirs.convert_tokens_to_ids(theirs.tokenize(text))


def test_gpt2_encode_batch_contract(tmp_path):
    vj, mg = _toy_gpt2_files(tmp_path)
    tok = GPT2BPETokenizer.from_files(vj, mg, max_length=8)
    ids, mask = tok.encode_batch(["wash the pan", ""])
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    assert ids.dtype == np.int32
    # pad == eos (reference sets pad_token = eos_token)
    assert ids[1, 0] == tok.eos_id and mask[1].sum() == 0
    assert mask[0, 0] == 1


def _encode_spm_proto(pieces):
    """Hand-rolled ModelProto bytes: repeated field 1 = SentencePiece
    {1: piece, 2: score(float), 3: type(varint)}."""

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    blob = b""
    for piece, score, ptype in pieces:
        pb = piece.encode("utf-8")
        inner = b"\x0a" + varint(len(pb)) + pb  # field 1, wire 2
        inner += b"\x15" + struct.pack("<f", score)  # field 2, wire 5
        inner += b"\x18" + varint(ptype)  # field 3, wire 0
        blob += b"\x0a" + varint(len(inner)) + inner
    # trailing unrelated field (e.g. trainer_spec, field 2 wire 2) is skipped
    blob += b"\x12" + varint(3) + b"abc"
    return blob


SPM_PIECES = [
    ("<pad>", 0.0, 3),
    ("</s>", 0.0, 3),
    ("<unk>", 0.0, 2),
    ("▁", -4.0, 1),
    ("▁wash", -1.5, 1),
    ("▁the", -1.0, 1),
    ("▁pan", -2.0, 1),
    ("▁pa", -2.5, 1),
    ("n", -3.0, 1),
    ("pan", -2.2, 1),
    ("wash", -3.5, 1),
    ("▁w", -3.0, 1),
    ("ash", -2.8, 1),
    ("a", -4.5, 1),
    ("s", -4.5, 1),
    ("h", -4.6, 1),
    ("t", -4.4, 1),
    ("e", -4.3, 1),
    ("▁t", -3.3, 1),
    ("he", -3.1, 1),
    ("p", -4.8, 1),
]


def test_spm_proto_roundtrip(tmp_path):
    path = tmp_path / "spiece.model"
    path.write_bytes(_encode_spm_proto(SPM_PIECES))
    parsed = parse_sentencepiece_model(str(path))
    assert [(p, t) for p, _, t in parsed] == [(p, t) for p, _, t in SPM_PIECES]
    np.testing.assert_allclose(
        [s for _, s, _ in parsed], [s for _, s, _ in SPM_PIECES], rtol=1e-6
    )


def test_unigram_viterbi_matches_hf_tokenizers(tmp_path):
    tokenizers = pytest.importorskip("tokenizers")
    path = tmp_path / "spiece.model"
    path.write_bytes(_encode_spm_proto(SPM_PIECES))
    ours = SentencePieceTokenizer.from_model_file(str(path), max_length=16)

    vocab = [(p, s) for p, s, t in SPM_PIECES if t != 3]
    unk_idx = next(i for i, (p, _) in enumerate(vocab) if p == "<unk>")
    hf = tokenizers.Tokenizer(tokenizers.models.Unigram(vocab, unk_id=unk_idx))
    for text in ["wash the pan", "the pan", "wash pans", "pat the wash"]:
        norm = ours._normalize(text)
        theirs = hf.encode(norm).tokens
        assert ours.tokenize(text) == theirs, text


def test_t5_encode_batch_contract(tmp_path):
    path = tmp_path / "spiece.model"
    path.write_bytes(_encode_spm_proto(SPM_PIECES))
    tok = SentencePieceTokenizer.from_model_file(str(path), max_length=8)
    ids, mask = tok.encode_batch(["wash the pan", ""])
    assert ids.shape == (2, 8)
    n = int(mask[0].sum())
    assert ids[0, n - 1] == tok.eos_id  # </s> appended
    assert ids[0, n:].max(initial=0) == tok.pad_id  # pad id 0
    assert int(mask[1].sum()) == 1 and ids[1, 0] == tok.eos_id  # empty -> just </s>


def test_hash_fallbacks_runnable():
    g = hash_gpt2_tokenizer(max_length=8)
    ids, mask = g.encode_batch(["take the knife"])
    assert ids.shape == (1, 8) and 0 <= ids.min() and ids.max() < 50257
    t = hash_t5_tokenizer(max_length=8)
    ids, mask = t.encode_batch(["take the knife"])
    assert ids.shape == (1, 8) and int(mask.sum()) > 0
