"""Tokenizer, BERT encoder, and fusion-layer parity tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from transfusion_tpu.data.tokenizer import WordPieceTokenizer, hash_vocab_tokenizer
from transfusion_tpu.models.fusion import CrossFusionLevel, EncoderLayer, FusionLevelConfig, PoolPredictor
from transfusion_tpu.models.text_encoder import BertConfig, BertEncoder, NarrationEncoder, mean_pool

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] take knife cut onion put down pick up the a and "
    "bowl plate wash hand ##s ##ing open close drawer , . ; pan"
).split()


@pytest.fixture
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


def test_wordpiece_matches_hf_bert_tokenizer(vocab_file):
    from transformers import BertTokenizer

    ours = WordPieceTokenizer.from_vocab_file(vocab_file, max_length=16)
    ref = BertTokenizer(vocab_file, do_lower_case=True)

    texts = [
        "take knife; cut onions.",
        "Put down the bowl, wash hands",
        "opening the drawer UNKNOWNWORD",
        "",
    ]
    ids, mask = ours.encode_batch(texts, max_length=16)
    for i, t in enumerate(texts):
        ref_out = ref(t, padding="max_length", truncation=True, max_length=16)
        np.testing.assert_array_equal(ids[i], ref_out["input_ids"], err_msg=t)
        np.testing.assert_array_equal(mask[i], ref_out["attention_mask"], err_msg=t)


def test_hash_tokenizer_runs():
    tok = hash_vocab_tokenizer(max_length=12)
    ids, mask = tok.encode_batch(["cut the onion", ""])
    assert ids.shape == (2, 12)
    assert mask[0].sum() >= 4
    ids2, _ = tok.encode_batch(["cut the onion"])
    np.testing.assert_array_equal(ids[0], ids2[0])  # deterministic


def _copy_bert_weights(params, hf):
    """Copy HF BertModel weights into our flax param tree."""
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    b = params["bert"]
    b["word_embeddings"]["embedding"] = jnp.asarray(sd["embeddings.word_embeddings.weight"])
    b["position_embeddings"] = jnp.asarray(sd["embeddings.position_embeddings.weight"])
    b["token_type_embeddings"] = jnp.asarray(sd["embeddings.token_type_embeddings.weight"])
    b["embeddings_norm"]["scale"] = jnp.asarray(sd["embeddings.LayerNorm.weight"])
    b["embeddings_norm"]["bias"] = jnp.asarray(sd["embeddings.LayerNorm.bias"])
    i = 0
    while f"layer_{i}" in b:
        l = b[f"layer_{i}"]
        pre = f"encoder.layer.{i}."
        for ours, theirs in [
            ("query", "attention.self.query"),
            ("key", "attention.self.key"),
            ("value", "attention.self.value"),
            ("output", "attention.output.dense"),
        ]:
            l["attention"][ours]["kernel"] = jnp.asarray(sd[pre + theirs + ".weight"].T)
            l["attention"][ours]["bias"] = jnp.asarray(sd[pre + theirs + ".bias"])
        l["attention_norm"]["scale"] = jnp.asarray(sd[pre + "attention.output.LayerNorm.weight"])
        l["attention_norm"]["bias"] = jnp.asarray(sd[pre + "attention.output.LayerNorm.bias"])
        l["intermediate"]["kernel"] = jnp.asarray(sd[pre + "intermediate.dense.weight"].T)
        l["intermediate"]["bias"] = jnp.asarray(sd[pre + "intermediate.dense.bias"])
        l["output"]["kernel"] = jnp.asarray(sd[pre + "output.dense.weight"].T)
        l["output"]["bias"] = jnp.asarray(sd[pre + "output.dense.bias"])
        l["output_norm"]["scale"] = jnp.asarray(sd[pre + "output.LayerNorm.weight"])
        l["output_norm"]["bias"] = jnp.asarray(sd[pre + "output.LayerNorm.bias"])
        i += 1
    return params


def test_bert_encoder_matches_hf(rng):
    import transformers

    hf_cfg = transformers.BertConfig(
        vocab_size=200, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=40, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    hf = transformers.BertModel(hf_cfg).eval()

    cfg = BertConfig(
        vocab_size=200, hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        max_position_embeddings=40, dropout=0.0,
    )
    enc = BertEncoder(cfg)
    ids = rng.integers(0, 200, (3, 11)).astype(np.int32)
    mask = np.ones((3, 11), np.int32)
    mask[1, 6:] = 0
    mask[2, 3:] = 0
    params = enc.init(jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask))["params"]
    params = _copy_bert_weights({"bert": params}, hf)["bert"]

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    got = np.asarray(enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
    # Only valid positions must match (HF computes padded positions too but
    # downstream masks them; values at pads differ by mask conventions).
    for b in range(3):
        n = mask[b].sum()
        np.testing.assert_allclose(got[b, :n], ref[b, :n], rtol=1e-4, atol=1e-4)

    # Mean pool matches sentence-transformers pooling.
    pooled = np.asarray(mean_pool(jnp.asarray(ref), jnp.asarray(mask)))
    man = (ref * mask[..., None]).sum(1) / np.maximum(mask.sum(1, keepdims=True), 1)
    np.testing.assert_allclose(pooled, man, rtol=1e-5, atol=1e-5)


def test_encoder_layer_matches_torch(rng):
    d, h, l, b = 32, 4, 9, 2
    tlayer = torch.nn.TransformerEncoderLayer(
        d_model=d, nhead=h, dim_feedforward=64, dropout=0.0, activation="gelu", batch_first=True
    ).eval()

    ours = EncoderLayer(dim=d, num_heads=h, ff_multiplier=2.0, dropout=0.0, activation="gelu")
    x = rng.normal(0, 1, (b, l, d)).astype(np.float32)
    pad = np.zeros((b, l), bool)
    pad[1, 6:] = True

    params = ours.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(pad))["params"]
    sd = {k: v.detach().numpy() for k, v in tlayer.state_dict().items()}
    w = sd["self_attn.in_proj_weight"]
    bqkv = sd["self_attn.in_proj_bias"]
    params["q_proj"]["kernel"] = jnp.asarray(w[:d].T)
    params["q_proj"]["bias"] = jnp.asarray(bqkv[:d])
    params["k_proj"]["kernel"] = jnp.asarray(w[d : 2 * d].T)
    params["k_proj"]["bias"] = jnp.asarray(bqkv[d : 2 * d])
    params["v_proj"]["kernel"] = jnp.asarray(w[2 * d :].T)
    params["v_proj"]["bias"] = jnp.asarray(bqkv[2 * d :])
    params["out_proj"]["kernel"] = jnp.asarray(sd["self_attn.out_proj.weight"].T)
    params["out_proj"]["bias"] = jnp.asarray(sd["self_attn.out_proj.bias"])
    for ln, tn in [("linear1", "linear1"), ("linear2", "linear2"), ("norm1", "norm1"), ("norm2", "norm2")]:
        if "linear" in ln:
            params[ln]["kernel"] = jnp.asarray(sd[tn + ".weight"].T)
            params[ln]["bias"] = jnp.asarray(sd[tn + ".bias"])
        else:
            params[ln]["scale"] = jnp.asarray(sd[tn + ".weight"])
            params[ln]["bias"] = jnp.asarray(sd[tn + ".bias"])

    with torch.no_grad():
        ref = tlayer(torch.from_numpy(x), src_key_padding_mask=torch.from_numpy(pad)).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(pad)))
    for i in range(b):
        n = (~pad[i]).sum()
        np.testing.assert_allclose(got[i, :n], ref[i, :n], rtol=1e-4, atol=1e-4)


def test_cross_fusion_level_shapes(rng):
    cfg = FusionLevelConfig(token_dim=64, num_layers=2, num_heads=4, patch_h=4, patch_w=4)
    mod = CrossFusionLevel(cfg, out_channels=16)
    feat = jnp.asarray(rng.normal(0, 1, (2, 32, 48, 16)).astype(np.float32))
    lang = jnp.asarray(rng.normal(0, 1, (2, 7, 64)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1]], np.int32))
    params = mod.init(jax.random.key(0), feat, lang, mask)["params"]
    fused, lang_out = mod.apply({"params": params}, feat, lang, mask)
    assert fused.shape == feat.shape
    assert lang_out.shape == lang.shape
    assert bool(jnp.isfinite(fused).all())


def test_narration_encoder_out_mlp(rng):
    cfg = BertConfig(vocab_size=100, hidden_size=24, num_layers=1, num_heads=4,
                     intermediate_size=48, max_position_embeddings=16, dropout=0.0)
    enc = NarrationEncoder(cfg, out_mlp=40, out_dropout=0.0)
    ids = jnp.asarray(rng.integers(0, 100, (2, 9)).astype(np.int32))
    mask = jnp.ones((2, 9), jnp.int32)
    params = enc.init(jax.random.key(0), ids, mask)["params"]
    out, m = enc.apply({"params": params}, ids, mask)
    assert out.shape == (2, 9, 40)


def test_pool_predictor(rng):
    mod = PoolPredictor(num_nouns=10, num_verbs=6, pooling="mean")
    x = jnp.asarray(rng.normal(0, 1, (3, 5, 16)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0]] * 3, np.int32)).astype(bool)
    params = mod.init(jax.random.key(0), x, mask)["params"]
    out = mod.apply({"params": params}, x, mask)
    assert out["noun_logits"].shape == (3, 10)
    assert out["verb_logits"].shape == (3, 6)
