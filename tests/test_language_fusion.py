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


def test_visual_token_mask_matches_reference_loop():
    """Dense oracle: the reference's clamped double loop
    (cross_fusion/utils.py:9-32), 0=attend 1=blocked."""
    from transfusion_tpu.models.fusion import visual_token_mask

    for gh, gw, k in [(4, 5, 1), (3, 3, 2), (2, 6, 3), (5, 4, 0)]:
        ref = np.ones((gh * gw, gh * gw))
        for i in range(gh * gw):
            true_c, true_r = i % gw, i // gw
            for j1 in range(-k, k + 1):
                for j2 in range(-k, k + 1):
                    c = max(0, min(true_c + j1, gw - 1))
                    r = max(0, min(true_r + j2, gh - 1))
                    ref[i, r * gw + c] = 0
        ours = visual_token_mask(gh, gw, f"local_{k}")
        np.testing.assert_array_equal(ours, ref.astype(bool), f"{gh}x{gw} k={k}")
    assert visual_token_mask(4, 4, "global") is None


def test_sin2d_table_matches_reference_math():
    """Port of get_sin2d_embed (cross_fusion/utils.py:276-303, w_hmap_emb
    False) as a torch oracle."""
    import math as _math

    from transfusion_tpu.models.fusion import sin2d_table

    h, w, m_dim = 3, 6, 32
    pe = torch.zeros(m_dim, h, w)
    dim = m_dim // 2
    div_term = torch.exp(torch.arange(0.0, dim, 2) * -(_math.log(10000.0) / dim))
    pos_w = torch.arange(0.0, w).unsqueeze(1)
    pos_h = torch.arange(0.0, h).unsqueeze(1)
    pe[0:dim:2] = torch.sin(pos_w * div_term).transpose(0, 1).unsqueeze(1).repeat(1, h, 1)
    pe[1:dim:2] = torch.cos(pos_w * div_term).transpose(0, 1).unsqueeze(1).repeat(1, h, 1)
    pe[dim::2] = torch.sin(pos_h * div_term).transpose(0, 1).unsqueeze(2).repeat(1, 1, w)
    pe[dim + 1 :: 2] = torch.cos(pos_h * div_term).transpose(0, 1).unsqueeze(2).repeat(1, 1, w)
    ref = pe.reshape(m_dim, -1).transpose(0, 1).numpy()
    np.testing.assert_allclose(sin2d_table(h, w, m_dim), ref, atol=1e-6)


def test_local_mask_blocks_attention(rng):
    """With local_0, a far-away visual token cannot influence another visual
    token through one encoder layer (language stays globally attended)."""
    cfg = FusionLevelConfig(token_dim=16, num_layers=1, num_heads=2, patch_h=1, patch_w=1,
                            vis_mask_type="local_0", token_dropout=0.0, patch_dropout=0.0,
                            backproj_dropout=0.0)
    level = CrossFusionLevel(cfg, out_channels=8)
    b, h, w, c = 1, 1, 6, 8
    feat = rng.normal(0, 1, (b, h, w, c)).astype(np.float32)
    lang = rng.normal(0, 1, (b, 3, 16)).astype(np.float32)
    mask = np.ones((b, 3), np.int32)
    params = level.init(jax.random.key(0), jnp.asarray(feat), jnp.asarray(lang), jnp.asarray(mask))

    out0, _ = level.apply(params, jnp.asarray(feat), jnp.asarray(lang), jnp.asarray(mask))
    feat2 = feat.copy()
    feat2[0, 0, 5] += 3.0  # far from column 0 (Chebyshev distance 5 > 0)
    out1, _ = level.apply(params, jnp.asarray(feat2), jnp.asarray(lang), jnp.asarray(mask))
    # token (0,0) sees only itself among visual tokens -> unchanged
    np.testing.assert_allclose(np.asarray(out0)[0, 0, 0], np.asarray(out1)[0, 0, 0], atol=1e-5)
    # sanity: the perturbed location itself changed
    assert not np.allclose(np.asarray(out0)[0, 0, 5], np.asarray(out1)[0, 0, 5], atol=1e-5)


def test_local_mask_differs_from_global(rng):
    kw = dict(token_dim=16, num_layers=1, num_heads=2, patch_h=1, patch_w=1,
              token_dropout=0.0, patch_dropout=0.0, backproj_dropout=0.0)
    feat = jnp.asarray(rng.normal(0, 1, (1, 4, 4, 8)).astype(np.float32))
    lang = jnp.asarray(rng.normal(0, 1, (1, 3, 16)).astype(np.float32))
    mask = jnp.ones((1, 3), jnp.int32)
    g = CrossFusionLevel(FusionLevelConfig(vis_mask_type="global", **kw), out_channels=8)
    l = CrossFusionLevel(FusionLevelConfig(vis_mask_type="local_1", **kw), out_channels=8)
    params = g.init(jax.random.key(0), feat, lang, mask)
    outg, _ = g.apply(params, feat, lang, mask)
    outl, _ = l.apply(params, feat, lang, mask)  # same params, masked attention
    assert not np.allclose(np.asarray(outg), np.asarray(outl), atol=1e-5)


def test_type_embeddings_mark_and_modify(vocab_file):
    """Inline `word<type>` markers: marker-stripped ids equal plain encoding,
    marked word's tokens flagged, and the encoder adds the type vector there
    (narr_pooling_layers.py:100-110,119-186)."""
    tok = WordPieceTokenizer.from_vocab_file(vocab_file, max_length=16)
    ids, mask, tmask = tok.encode_batch_with_types(
        ["wash<obj> the pan,<obj> now", "cut onion"], ("obj", "hand"), 16)
    plain_ids, plain_mask = tok.encode_batch(["wash the pan, now", "cut onion"], 16)
    np.testing.assert_array_equal(ids, plain_ids)
    np.testing.assert_array_equal(mask, plain_mask)
    # 'wash' (token 1) and 'pan' marked with type 0; ',' not marked
    assert tmask[0, 1, 0] and not tmask[0, 1, 1]
    pan_pos = list(ids[0]).index(tok.vocab["pan"])
    comma_pos = list(ids[0]).index(tok.vocab[","])
    assert tmask[0, pan_pos, 0] and not tmask[0, comma_pos, 0]
    assert not tmask[1].any()

    cfg = BertConfig(vocab_size=len(VOCAB), hidden_size=16, num_layers=1, num_heads=2,
                     intermediate_size=32, max_position_embeddings=16)
    enc = NarrationEncoder(cfg, out_mlp=None, out_dropout=0.0,
                           type_embeddings=("obj", "hand"), type_embedding_init_div=2.0)
    params = enc.init(jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask),
                      type_mask=jnp.asarray(tmask))
    out_t, _ = enc.apply(params, jnp.asarray(ids), jnp.asarray(mask),
                         type_mask=jnp.asarray(tmask))
    out_p, _ = enc.apply(params, jnp.asarray(ids), jnp.asarray(mask),
                         type_mask=jnp.zeros_like(jnp.asarray(tmask)))
    delta = np.abs(np.asarray(out_t) - np.asarray(out_p)).sum(-1)
    assert delta[0, 1] > 0 and delta[0, pan_pos] > 0  # marked tokens moved
    assert delta[0, comma_pos] == 0 and delta[1].max() == 0  # others untouched
    # the added vector is exactly the 'obj' type param
    p = params["params"]["type_obj"]
    np.testing.assert_allclose(np.asarray(out_t - out_p)[0, 1], np.asarray(p), atol=1e-5)


def test_multi_pool_predictor_dispatch(rng):
    """lm_args.multi True/"sep" average per-scale logits (lm_layers.py:84-125)."""
    from transfusion_tpu.models.transfusion import _mean_lm_outs

    scales = []
    for s in range(3):
        scales.append({
            "noun_logits": jnp.asarray(rng.normal(0, 1, (2, 5)).astype(np.float32)),
            "verb_logits": jnp.asarray(rng.normal(0, 1, (2, 4)).astype(np.float32)),
        })
    out = _mean_lm_outs(scales)
    np.testing.assert_allclose(
        np.asarray(out["noun_logits"]),
        np.mean([np.asarray(s["noun_logits"]) for s in scales], axis=0), rtol=1e-6)
    # verb-less variant
    out2 = _mean_lm_outs([{"noun_logits": s["noun_logits"], "verb_logits": None} for s in scales])
    assert out2["verb_logits"] is None


def test_transfusion_lm_multi_sep_params(rng):
    """lm_multi="sep" creates one PoolPredictor per fused level and the lm
    output averages them; plain multi shares one."""
    from transfusion_tpu.models.detector import DetectorConfig
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig
    from transfusion_tpu.models.transfusion import FusionConfig, TransFusion, TransFusionConfig

    def build(multi):
        return TransFusion(TransFusionConfig(
            detector=DetectorConfig(
                roi=RoIConfig(num_nouns=6, num_verbs=4, representation_size=32,
                              batch_size_per_image=8, detections_per_img=4),
                rpn=RPNConfig(pre_nms_top_n_train=64, post_nms_top_n_train=32),
            ),
            fusion=FusionConfig(fpn_features=(2, 3), patch_h=(1, 1), patch_w=(1, 1),
                                num_layers=(1, 1), token_dim=16, num_heads=2),
            bert=BertConfig(vocab_size=50, hidden_size=16, num_layers=1, num_heads=2,
                            intermediate_size=32, max_position_embeddings=16),
            out_mlp=16, lm_on=True, lm_multi=multi,
        ))

    batch = {
        "image": jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 50, (1, 8)).astype(np.int32)),
        "attention_mask": jnp.ones((1, 8), jnp.int32),
        "image_hw": (64, 64),
    }
    m_sep = build("sep")
    p_sep = m_sep.init({"params": jax.random.key(0)}, batch, False)
    names = set()
    for path, _ in jax.tree_util.tree_flatten_with_path(p_sep)[0]:
        names.add(str(getattr(path[1], "key", path[1])))
    assert {"lm_layer_0", "lm_layer_1"} <= names

    m_multi = build(True)
    p_multi = m_multi.init({"params": jax.random.key(0)}, batch, False)
    out = m_multi.apply(p_multi, batch, False)
    assert out["lm"]["noun_logits"].shape == (1, 5)
    names_m = set()
    for path, _ in jax.tree_util.tree_flatten_with_path(p_multi)[0]:
        names_m.add(str(getattr(path[1], "key", path[1])))
    assert "lm_layer" in names_m and "lm_layer_0" not in names_m
