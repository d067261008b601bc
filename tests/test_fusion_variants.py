"""Shared-encoder, asymmetric, and visual-feature fusion variants."""

import re

import numpy as np
import jax
import jax.numpy as jnp

from transfusion_tpu.models.fusion_variants import (
    AsymmetricConfig,
    AsymmetricCrossFusionLevel,
    QKVEncoderLayer,
    VisualFeatureFusion,
)


def test_qkv_encoder_cross_attention(rng):
    mod = QKVEncoderLayer(dim=32, num_heads=4, dropout=0.0)
    q = jnp.asarray(rng.normal(0, 1, (2, 5, 32)).astype(np.float32))
    mem = jnp.asarray(rng.normal(0, 1, (2, 9, 32)).astype(np.float32))
    pad = jnp.zeros((2, 9), bool).at[1, 6:].set(True)
    params = mod.init(jax.random.key(0), q, mem, pad)["params"]
    out = mod.apply({"params": params}, q, mem, pad)
    assert out.shape == q.shape
    # Padded memory positions must not influence the output.
    mem2 = mem.at[1, 6:].set(999.0)
    out2 = mod.apply({"params": params}, q, mem2, pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_asymmetric_level(rng):
    cfg = AsymmetricConfig(token_dim=32, vis_layers=3, lang_layers=2, num_heads=4,
                           patch_h=2, patch_w=2)
    mod = AsymmetricCrossFusionLevel(cfg, out_channels=8)
    feat = jnp.asarray(rng.normal(0, 1, (2, 8, 12, 8)).astype(np.float32))
    lang = jnp.asarray(rng.normal(0, 1, (2, 6, 32)).astype(np.float32))
    mask = jnp.ones((2, 6), jnp.int32)
    params = mod.init(jax.random.key(0), feat, lang, mask)["params"]
    fused, lang_out = mod.apply({"params": params}, feat, lang, mask)
    assert fused.shape == feat.shape
    assert lang_out.shape == lang.shape
    assert sum(1 for k in params if re.fullmatch(r"vis_\d+", k)) == 3
    assert sum(1 for k in params if re.fullmatch(r"lang_\d+", k)) == 2


def test_visual_feature_fusion(rng):
    mod = VisualFeatureFusion(token_dim=32, num_layers=1, num_heads=4)
    patches = jnp.asarray(rng.normal(0, 1, (2, 24, 32)).astype(np.float32))
    clip = jnp.asarray(rng.normal(0, 1, (2, 6, 2304)).astype(np.float32))
    params = mod.init(jax.random.key(0), patches, clip)["params"]
    fused, aux = mod.apply({"params": params}, patches, clip)
    assert fused.shape == patches.shape
    assert aux.shape == (2, 6, 32)


def test_shared_encoder_transfusion(rng):
    from transfusion_tpu.models.detector import DetectorConfig
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig
    from transfusion_tpu.models.text_encoder import BertConfig
    from transfusion_tpu.models.transfusion import FusionConfig, TransFusion, TransFusionConfig

    cfg = TransFusionConfig(
        detector=DetectorConfig(
            roi=RoIConfig(num_nouns=5, num_verbs=4, representation_size=32,
                          batch_size_per_image=8, detections_per_img=4),
            rpn=RPNConfig(pre_nms_top_n_test=32, post_nms_top_n_test=16),
        ),
        fusion=FusionConfig(fpn_features=(2, 3), patch_h=(2, 1), patch_w=(2, 1),
                            num_layers=(1, 1), token_dim=16, num_heads=2,
                            share_encoders=True),
        bert=BertConfig(vocab_size=80, hidden_size=16, num_layers=1, num_heads=2,
                        intermediate_size=32, max_position_embeddings=16),
        out_mlp=16,
    )
    model = TransFusion(cfg)
    batch = {
        "image": jnp.zeros((1, 64, 64, 3)),
        "image_hw": (64, 64),
        "input_ids": jnp.ones((1, 8), jnp.int32),
        "attention_mask": jnp.ones((1, 8), jnp.int32),
    }
    variables = model.init({"params": jax.random.key(0)}, batch, False)
    params = variables["params"]
    # The encoder stack lives ONCE at the top level, not per fusion level.
    assert "shared_layer_0" in params
    assert "layer_0" not in params.get("fusion_2", {})
    assert "layer_0" not in params.get("fusion_3", {})
    out = model.apply(variables, batch, False)
    assert out["roi_outputs"]["class_logits"].shape[-1] == 5


def test_visual_features_end_to_end(rng):
    """use_visual_features wires batch clip features through the early
    vis-vis fusion before the language stage (VisLangFusionBoxWrapper path)."""
    from transfusion_tpu.models.detector import DetectorConfig
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig
    from transfusion_tpu.models.text_encoder import BertConfig
    from transfusion_tpu.models.transfusion import FusionConfig, TransFusion, TransFusionConfig

    cfg = TransFusionConfig(
        detector=DetectorConfig(
            roi=RoIConfig(num_nouns=5, num_verbs=4, representation_size=32,
                          batch_size_per_image=8, detections_per_img=4),
            rpn=RPNConfig(pre_nms_top_n_test=32, post_nms_top_n_test=16),
            stage_sizes=(1, 1, 1, 1),
        ),
        fusion=FusionConfig(fpn_features=(3,), patch_h=(1,), patch_w=(1,),
                            num_layers=(1,), token_dim=16, num_heads=2),
        bert=BertConfig(vocab_size=80, hidden_size=16, num_layers=1, num_heads=2,
                        intermediate_size=32, max_position_embeddings=16),
        out_mlp=16,
        use_visual_features=True,
        visual_feature_layers=1,
    )
    model = TransFusion(cfg)
    batch = {
        "image": jnp.zeros((1, 64, 64, 3)),
        "image_hw": (64, 64),
        "input_ids": jnp.ones((1, 8), jnp.int32),
        "attention_mask": jnp.ones((1, 8), jnp.int32),
        "visual_features": jnp.asarray(rng.normal(0, 1, (1, 4, 2304)).astype(np.float32)),
    }
    variables = model.init({"params": jax.random.key(0)}, batch, False)
    assert "vis_fusion_3" in variables["params"]
    out = model.apply(variables, batch, False)
    # The clip features influence the output.
    batch2 = dict(batch, visual_features=batch["visual_features"] * -2.0)
    out2 = model.apply(variables, batch2, False)
    assert not np.allclose(
        np.asarray(out["roi_outputs"]["class_logits"]),
        np.asarray(out2["roi_outputs"]["class_logits"]),
    )


def test_space_time_layer_axis_plumbing(rng):
    """The factorized layer equals looping my EncoderLayer over each time row
    (spatial) then each spatial column (temporal) with the same params —
    validates the reshape/transpose plumbing on a T != S grid (the reference
    scrambles axes there, cross_f_box_layers.py:207-209; we implement the
    intended factorization)."""
    from transfusion_tpu.models.fusion import EncoderLayer
    from transfusion_tpu.models.fusion_variants import SpaceTimeFusionLayer

    b, t, s, d = 2, 3, 5, 16
    x = jnp.asarray(rng.normal(0, 1, (b, t, s, d)).astype(np.float32))
    layer = SpaceTimeFusionLayer(d, num_heads=2, dropout=0.0)
    params = layer.init(jax.random.key(0), x)
    out = layer.apply(params, x)
    assert out.shape == (b, t, s, d)

    enc = EncoderLayer(d, 2, 2.0, 0.0, "relu")
    sp = {"params": params["params"]["spatial"]}
    te = {"params": params["params"]["temporal"]}
    ref = np.asarray(x).copy()
    # spatial over each time row + extra residual
    ref = ref + np.stack([np.asarray(enc.apply(sp, jnp.asarray(ref[:, i]))) for i in range(t)], 1)
    # temporal over each spatial column + extra residual
    ref = ref + np.stack([np.asarray(enc.apply(te, jnp.asarray(ref[:, :, j]))) for j in range(s)], 2)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_space_time_module_stack(rng):
    from transfusion_tpu.models.fusion_variants import SpaceTimeFusionModule

    x = jnp.asarray(rng.normal(0, 1, (1, 4, 4, 16)).astype(np.float32))
    mod = SpaceTimeFusionModule(16, num_layers=2, num_heads=2,
                                token_dropout=0.0, patch_dropout=0.0)
    params = mod.init(jax.random.key(0), x)
    out = mod.apply(params, x)
    assert out.shape == x.shape
    names = set(params["params"])
    assert {"layer_0", "layer_1", "image_kind", "final_norm"} <= names


def _tiny_cfg(**fusion_kwargs):
    from transfusion_tpu.models.detector import DetectorConfig
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig
    from transfusion_tpu.models.text_encoder import BertConfig
    from transfusion_tpu.models.transfusion import FusionConfig, TransFusionConfig

    return TransFusionConfig(
        detector=DetectorConfig(
            roi=RoIConfig(num_nouns=5, num_verbs=4, representation_size=32,
                          batch_size_per_image=8, detections_per_img=4),
            rpn=RPNConfig(pre_nms_top_n_train=32, post_nms_top_n_train=16,
                          pre_nms_top_n_test=32, post_nms_top_n_test=16),
            stage_sizes=(1, 1, 1, 1),
        ),
        fusion=FusionConfig(**{
            "fpn_features": (3,), "patch_h": (1,), "patch_w": (1,),
            "num_layers": (1,), "token_dim": 16, "num_heads": 2,
            **fusion_kwargs,
        }),
        bert=BertConfig(vocab_size=80, hidden_size=16, num_layers=1, num_heads=2,
                        intermediate_size=32, max_position_embeddings=16),
        out_mlp=16,
    )


def test_fusion_type_yaml_dispatch():
    """The fusion YAML's type: key + narr_out_mode select the box-path
    encoder family (get_cross_box_encoder, cross_f_box_wrapper.py:24-37,
    dispatched at :88-91) — the shipped config's commented alternatives
    (cross_fusion_config_sym_ego_res50.yml:2) must be one-line YAML edits."""
    import pytest

    from transfusion_tpu.models.transfusion import build_transfusion_config

    def base(**narr_fusion):
        return {
            "run": {
                "criterion": {"bbox": 1, "noun": 1, "verb": 1},
                "narration_embeds": {"use": True, "args": {"out_mlp": 896}},
                "narr_fusion": {"args": {}, **narr_fusion},
            },
            "model": {"representation_size": 1280, "rcnn_kwargs": {}},
        }

    cfg = build_transfusion_config(base(), 8, 6)
    assert cfg.fusion.fusion_type == "cross_transformer"
    assert not cfg.fusion.class_token_only

    cfg = build_transfusion_config(base(type="asymmetric", narr_out_mode="embedding"), 8, 6)
    assert cfg.fusion.fusion_type == "asymmetric"
    assert cfg.fusion.class_token_only  # narr_out_mode == "embedding"

    b = base(type="asymmetric")
    b["run"]["narr_fusion"]["args"] = {"lang_layers": 3, "vis_dropout": 0.2, "lang_dropout": 0.3}
    cfg = build_transfusion_config(b, 8, 6)
    assert cfg.fusion.asymm_lang_layers == 3
    assert cfg.fusion.asymm_vis_dropout == 0.2
    assert cfg.fusion.asymm_lang_dropout == 0.3

    cfg = build_transfusion_config(base(type="space_time"), 8, 6)
    assert cfg.fusion.fusion_type == "space_time"

    with pytest.raises(ValueError, match="not implemented"):
        build_transfusion_config(base(type="bogus"), 8, 6)
    with pytest.raises(ValueError, match="share_encoders"):
        build_transfusion_config(base(type="asymmetric", share_encoders=True), 8, 6)


def _one_train_step(cfg, rng):
    import jax.numpy as jnp

    from transfusion_tpu.models.transfusion import TransFusion
    from transfusion_tpu.train.optim import make_optimizer
    from transfusion_tpu.train.step import LossConfig, init_state, make_train_step

    model = TransFusion(cfg)
    batch = {
        "image": jnp.asarray(rng.normal(0, 0.5, (1, 64, 64, 3)).astype(np.float32)),
        "input_ids": jnp.ones((1, 8), jnp.int32),
        "attention_mask": jnp.ones((1, 8), jnp.int32),
        "targets": {
            "boxes": jnp.asarray([[[8.0, 8.0, 40.0, 44.0]]]),
            "nouns": jnp.full((1, 1), 2),
            "verbs": jnp.full((1, 1), 1),
            "ttcs": jnp.full((1, 1), 0.9, jnp.float32),
            "valid": jnp.ones((1, 1), bool),
        },
    }
    tx, _ = make_optimizer({"name": "radam", "lr": 1e-4}, None, 10)
    state = init_state(model, tx, dict(batch, image_hw=(64, 64)), jax.random.key(0))
    loss_cfg = LossConfig(rpn_batch_size_per_image=8, last_noun_idx=4)
    step = make_train_step(model, tx, loss_cfg, jnp.ones(5), jnp.ones(4), donate=False)
    new_state, metrics = step(
        state, batch, jax.random.key(1), jnp.asarray([1.0, 1, 1, 1, 0, 0]), (64, 64)
    )
    return state, new_state, metrics


def test_asymmetric_type_trains_a_step(rng):
    cfg = _tiny_cfg(fusion_type="asymmetric", asymm_lang_layers=1, num_layers=(2,))
    state, new_state, metrics = _one_train_step(cfg, rng)
    assert np.isfinite(float(metrics["loss"]))
    level = state.params["fusion_3"]
    assert "vis_0" in level and "vis_1" in level and "lang_0" in level
    # The fusion level actually updates.
    before = np.asarray(state.params["fusion_3"]["vis_0"]["q_proj"]["kernel"])
    after = np.asarray(new_state.params["fusion_3"]["vis_0"]["q_proj"]["kernel"])
    assert not np.allclose(before, after)


def test_space_time_type_trains_a_step(rng):
    cfg = _tiny_cfg(fusion_type="space_time")
    state, new_state, metrics = _one_train_step(cfg, rng)
    assert np.isfinite(float(metrics["loss"]))
    level = state.params["fusion_3"]
    assert "encoder" in level  # SpaceTimeFusionModule under the level
    assert "spatial" in level["encoder"]["layer_0"]
    assert "temporal" in level["encoder"]["layer_0"]
    before = np.asarray(level["encoder"]["layer_0"]["spatial"]["q_proj"]["kernel"])
    after = np.asarray(
        new_state.params["fusion_3"]["encoder"]["layer_0"]["spatial"]["q_proj"]["kernel"]
    )
    assert not np.allclose(before, after)
