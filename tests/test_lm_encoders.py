"""GPT-2 / T5 encoder parity against config-constructed HF torch models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from transfusion_tpu.models.lm_encoders import (
    GPT2Config,
    GPT2Encoder,
    PooledLMEncoder,
    T5Config,
    T5Encoder,
)


def test_gpt2_matches_hf(rng):
    import transformers

    hf = transformers.GPT2Model(
        transformers.GPT2Config(
            vocab_size=150, n_positions=32, n_embd=24, n_layer=2, n_head=4,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        )
    ).eval()
    cfg = GPT2Config(vocab_size=150, hidden_size=24, num_layers=2, num_heads=4,
                     max_positions=32, dropout=0.0)
    enc = GPT2Encoder(cfg)
    ids = rng.integers(0, 150, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    mask[1, 7:] = 0
    params = enc.init(jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask))["params"]

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params["wte"]["embedding"] = jnp.asarray(sd["wte.weight"])
    params["wpe"] = jnp.asarray(sd["wpe.weight"])
    for i in range(2):
        blk = params[f"h_{i}"]
        pre = f"h.{i}."
        # HF GPT2 uses Conv1D: weight [in, out] — matches flax kernel directly.
        blk["c_attn"]["kernel"] = jnp.asarray(sd[pre + "attn.c_attn.weight"])
        blk["c_attn"]["bias"] = jnp.asarray(sd[pre + "attn.c_attn.bias"])
        blk["c_proj"]["kernel"] = jnp.asarray(sd[pre + "attn.c_proj.weight"])
        blk["c_proj"]["bias"] = jnp.asarray(sd[pre + "attn.c_proj.bias"])
        blk["mlp_fc"]["kernel"] = jnp.asarray(sd[pre + "mlp.c_fc.weight"])
        blk["mlp_fc"]["bias"] = jnp.asarray(sd[pre + "mlp.c_fc.bias"])
        blk["mlp_proj"]["kernel"] = jnp.asarray(sd[pre + "mlp.c_proj.weight"])
        blk["mlp_proj"]["bias"] = jnp.asarray(sd[pre + "mlp.c_proj.bias"])
        for ln in ("ln_1", "ln_2"):
            blk[ln]["scale"] = jnp.asarray(sd[pre + ln + ".weight"])
            blk[ln]["bias"] = jnp.asarray(sd[pre + ln + ".bias"])
    params["ln_f"]["scale"] = jnp.asarray(sd["ln_f.weight"])
    params["ln_f"]["bias"] = jnp.asarray(sd["ln_f.bias"])

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    got = np.asarray(enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
    for b in range(2):
        n = mask[b].sum()
        np.testing.assert_allclose(got[b, :n], ref[b, :n], rtol=1e-4, atol=1e-4)


def test_t5_matches_hf(rng):
    import transformers

    hf = transformers.T5EncoderModel(
        transformers.T5Config(
            vocab_size=120, d_model=24, d_kv=6, d_ff=48, num_layers=2, num_heads=4,
            dropout_rate=0.0, feed_forward_proj="relu",
        )
    ).eval()
    cfg = T5Config(vocab_size=120, hidden_size=24, num_layers=2, num_heads=4,
                   head_dim=6, ff_dim=48, gated_ff=False, dropout=0.0)
    enc = T5Encoder(cfg)
    ids = rng.integers(0, 120, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[0, 6:] = 0
    params = enc.init(jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask))["params"]

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params["shared"]["embedding"] = jnp.asarray(sd["shared.weight"])
    for i in range(2):
        blk = params[f"block_{i}"]
        pre = f"encoder.block.{i}."
        for ours, theirs in (("q", "q"), ("k", "k"), ("v", "v"), ("o", "o")):
            blk[ours]["kernel"] = jnp.asarray(sd[pre + f"layer.0.SelfAttention.{theirs}.weight"].T)
        blk["ln_attn"]["scale"] = jnp.asarray(sd[pre + "layer.0.layer_norm.weight"])
        blk["wi"]["kernel"] = jnp.asarray(sd[pre + "layer.1.DenseReluDense.wi.weight"].T)
        blk["wo"]["kernel"] = jnp.asarray(sd[pre + "layer.1.DenseReluDense.wo.weight"].T)
        blk["ln_ff"]["scale"] = jnp.asarray(sd[pre + "layer.1.layer_norm.weight"])
    params["block_0"]["relative_attention_bias"] = jnp.asarray(
        sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
    )
    params["final_norm"]["scale"] = jnp.asarray(sd["encoder.final_layer_norm.weight"])

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    got = np.asarray(enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
    for b in range(2):
        n = mask[b].sum()
        np.testing.assert_allclose(got[b, :n], ref[b, :n], rtol=1e-3, atol=1e-4)


def test_pooled_lm_encoder_embedding_mode(rng):
    cfg = GPT2Config(vocab_size=60, hidden_size=16, num_layers=1, num_heads=2,
                     max_positions=16, dropout=0.0)
    mod = PooledLMEncoder(GPT2Encoder(cfg), out_mode="embedding", out_mlp=20, out_dropout=0.0)
    ids = jnp.asarray(rng.integers(0, 60, (3, 8)).astype(np.int32))
    mask = jnp.ones((3, 8), jnp.int32)
    params = mod.init(jax.random.key(0), ids, mask)["params"]
    out, m = mod.apply({"params": params}, ids, mask)
    assert out.shape == (3, 20)


def test_model_v_dispatch_selects_towers():
    """build_transfusion_config maps model_v onto the tower family
    (LM_TO_TEXT_POOLING, run_experiment.py:53-61)."""
    from transfusion_tpu.models.transfusion import build_transfusion_config

    base = {
        "run": {
            "criterion": {"bbox": 1, "noun": 1, "verb": 1, "ttc": 0, "lm": 0},
            "narration_embeds": {"use": True, "args": {"model_v": "distilgpt2", "out_mlp": 896}},
            "narr_fusion": {"args": {}},
        },
        "model": {"representation_size": 1280, "rcnn_kwargs": {}},
    }
    cfg = build_transfusion_config(base, 8, 6)
    assert cfg.text_encoder == "gpt2" and cfg.gpt2.hidden_size == 768
    assert cfg.gpt2.num_layers == 6

    base["run"]["narration_embeds"]["args"]["model_v"] = "flan-t5-small"
    cfg = build_transfusion_config(base, 8, 6)
    assert cfg.text_encoder == "t5" and cfg.t5.gated_ff and cfg.t5.num_layers == 8

    base["run"]["narration_embeds"]["args"]["model_v"] = "t5-small"
    cfg = build_transfusion_config(base, 8, 6)
    assert cfg.text_encoder == "t5" and not cfg.t5.gated_ff and cfg.t5.ff_dim == 2048

    base["run"]["narration_embeds"]["args"]["model_v"] = "all-MiniLM-L12-v2"
    cfg = build_transfusion_config(base, 8, 6)
    assert cfg.text_encoder == "sbert"


@pytest.mark.parametrize("tower", ["gpt2", "t5"])
def test_train_step_with_lm_tower_from_narration_strings(tower, rng):
    """End-to-end: narration strings -> tower tokenizer -> one train step
    (the reference's distilgpt2 / t5-wikihow runs, run_experiment.py:43-61)."""
    import jax
    import numpy as np

    from transfusion_tpu.models.detector import DetectorConfig
    from transfusion_tpu.models.lm_encoders import GPT2Config, T5Config
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig
    from transfusion_tpu.models.transfusion import FusionConfig, TransFusion, TransFusionConfig
    from transfusion_tpu.runner.trainer import build_tokenizer
    from transfusion_tpu.train.optim import make_optimizer
    from transfusion_tpu.train.step import LossConfig, criterion_weights, init_state, make_train_step

    if tower == "gpt2":
        kw = dict(text_encoder="gpt2",
                  gpt2=GPT2Config(vocab_size=50257, hidden_size=32, num_layers=1,
                                  num_heads=2, max_positions=32))
        tok = build_tokenizer("distilgpt2", max_length=12)
    else:
        kw = dict(text_encoder="t5",
                  t5=T5Config(vocab_size=32128, hidden_size=32, num_layers=1,
                              num_heads=2, head_dim=16, ff_dim=64))
        tok = build_tokenizer("t5-small", max_length=12)

    cfg = TransFusionConfig(
        detector=DetectorConfig(
            roi=RoIConfig(num_nouns=6, num_verbs=4, representation_size=32,
                          batch_size_per_image=8, detections_per_img=4),
            rpn=RPNConfig(pre_nms_top_n_train=64, post_nms_top_n_train=32),
        ),
        fusion=FusionConfig(fpn_features=(3,), patch_h=(1,), patch_w=(1,),
                            num_layers=(1,), token_dim=16, num_heads=2),
        out_mlp=16,
        **kw,
    )
    model = TransFusion(cfg)
    bsz = 2
    ids, mask = tok.encode_batch(["wash the pan", "take the knife from the drawer"])
    batch = {
        "image": jnp.asarray(rng.normal(0, 1, (bsz, 64, 64, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "targets": {
            "boxes": jnp.asarray(np.tile([[10, 10, 40, 40]], (bsz, 1, 1)).astype(np.float32)),
            "nouns": jnp.full((bsz, 1), 2),
            "verbs": jnp.full((bsz, 1), 1),
            "ttcs": jnp.full((bsz, 1), 0.8, jnp.float32),
            "valid": jnp.ones((bsz, 1), bool),
        },
    }
    tx, _ = make_optimizer({"name": "radam", "lr": 1e-3}, None, 10)
    state = init_state(model, tx, dict(batch, image_hw=(64, 64)), jax.random.key(0))
    step = make_train_step(model, tx, LossConfig(rpn_batch_size_per_image=16, last_noun_idx=5),
                           jnp.ones(6), jnp.ones(4), donate=False)
    lw = jnp.asarray(criterion_weights({"bbox": 1, "obj_prop": 1, "noun": 1, "verb": 1}))
    state, metrics = step(state, batch, jax.random.key(1), lw, (64, 64))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_identity_tower_precomputed_language(rng):
    """Precomputed narration vectors (pooling: sbert / non-learnable
    text_pooling -> IdentityLayer, narr_pooling_layers.py:23-49): the model
    consumes batch['language_f'] as a single fully-attended language token."""
    import numpy as np

    from transfusion_tpu.models.detector import DetectorConfig
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig
    from transfusion_tpu.models.transfusion import TransFusion, TransFusionConfig, FusionConfig, build_transfusion_config

    cfg = TransFusionConfig(
        detector=DetectorConfig(
            roi=RoIConfig(num_nouns=6, num_verbs=4, representation_size=32,
                          batch_size_per_image=8, detections_per_img=4),
            rpn=RPNConfig(pre_nms_top_n_train=64, post_nms_top_n_train=32),
        ),
        fusion=FusionConfig(fpn_features=(3,), patch_h=(1,), patch_w=(1,),
                            num_layers=(1,), token_dim=16, num_heads=2),
        text_encoder="identity",
        narr_out_mode="embedding",
        lm_on=True,
    )
    model = TransFusion(cfg)
    batch = {
        "image": jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)),
        "language_f": jnp.asarray(rng.normal(0, 1, (2, 16)).astype(np.float32)),
        "image_hw": (64, 64),
    }
    params = model.init({"params": jax.random.key(0)}, batch, False)
    out = model.apply(params, batch, False)
    assert out["lm"]["noun_logits"].shape == (2, 5)
    # no narration-encoder params exist
    flat = ["/".join(str(getattr(k, "key", k)) for k in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    assert not any("narr_encoder" in j for j in flat)

    # dispatch: pooling sbert -> identity; slowfast text_pooling -> identity
    base = {
        "run": {
            "criterion": {"bbox": 1, "noun": 1, "verb": 1, "ttc": 0, "lm": 0},
            "narration_embeds": {"use": True, "args": {"model_v": "all-MiniLM-L12-v2",
                                                       "pooling": "sbert", "out_mlp": 896}},
            "narr_fusion": {"args": {}, "narr_out_mode": "embedding"},
        },
        "model": {"representation_size": 1280, "rcnn_kwargs": {}},
    }
    c2 = build_transfusion_config(base, 8, 6)
    assert c2.text_encoder == "identity" and c2.narr_out_mode == "embedding"
    base["run"]["narration_embeds"]["args"] = {"model_v": "all-MiniLM-L12-v2",
                                               "text_pooling": "slowfast"}
    assert build_transfusion_config(base, 8, 6).text_encoder == "identity"
