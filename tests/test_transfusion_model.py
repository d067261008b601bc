"""Full TransFusion model assembly tests (small config)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transfusion_tpu.models.detector import DetectorConfig, detections_from_outputs
from transfusion_tpu.models.roi_heads import RoIConfig
from transfusion_tpu.models.text_encoder import BertConfig
from transfusion_tpu.models.transfusion import FusionConfig, TransFusion, TransFusionConfig


@pytest.fixture(scope="module")
def small_model():
    cfg = TransFusionConfig(
        detector=DetectorConfig(
            roi=RoIConfig(
                num_nouns=7, num_verbs=5, representation_size=64,
                batch_size_per_image=16, detections_per_img=8, score_thresh=0.01,
                ttc_on=True, additional_postprocessing=True,
            ),
        ),
        fusion=FusionConfig(
            fpn_features=(0, 1, 2, 3), patch_h=(4, 4, 2, 1), patch_w=(4, 4, 2, 1),
            num_layers=(1, 1, 1, 1), token_dim=32, num_heads=4,
        ),
        bert=BertConfig(vocab_size=120, hidden_size=24, num_layers=1, num_heads=4,
                        intermediate_size=48, max_position_embeddings=32),
        out_mlp=32,
        lm_on=True,
    )
    model = TransFusion(cfg)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(0, 1, (2, 128, 160, 3)).astype(np.float32)),
        "image_hw": (128, 160),
        "input_ids": jnp.asarray(rng.integers(0, 120, (2, 12)).astype(np.int32)),
        "attention_mask": jnp.asarray(np.array([[1] * 8 + [0] * 4, [1] * 12], np.int32)),
        "targets": {
            "boxes": jnp.asarray(np.array([[[10, 10, 60, 60], [70, 20, 120, 90]]] * 2, np.float32)),
            "nouns": jnp.asarray([[3, 5]] * 2),
            "verbs": jnp.asarray([[2, 1]] * 2),
            "ttcs": jnp.asarray([[0.7, 1.2]] * 2),
            "valid": jnp.asarray([[True, True]] * 2),
        },
    }
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1), "dropout": jax.random.key(2)},
        batch, True,
    )
    return cfg, model, variables, batch


def test_train_forward_contract(small_model):
    cfg, model, variables, batch = small_model
    out = model.apply(
        variables, batch, True,
        rngs={"sampling": jax.random.key(3), "dropout": jax.random.key(4)},
    )
    roi = out["roi_outputs"]
    assert roi["class_logits"].shape == (2, 16, 7)
    assert roi["verb_logits"].shape == (2, 16, 5)
    assert roi["ttcs"].shape == (2, 16)
    nouns, verbs, ttcs = roi["labels"]
    assert nouns.shape == verbs.shape == ttcs.shape == (2, 16)
    assert out["lm"]["noun_logits"].shape == (2, 6)
    assert out["lm"]["verb_logits"].shape == (2, 4)
    assert out["proposals"]["labels"].shape[0] == 2  # anchor labels for rpn loss
    assert bool(jnp.isfinite(roi["class_logits"]).all())


def test_eval_forward_and_detections(small_model):
    cfg, model, variables, batch = small_model
    eval_batch = {k: v for k, v in batch.items() if k != "targets"}
    out = model.apply(variables, eval_batch, False)
    freqs = jnp.zeros((7, 5)).at[3, 2].set(4.0)
    dets = detections_from_outputs(out, cfg.detector, noun_verb_frequencies=freqs)
    assert dets["boxes"].shape == (2, 8, 4)
    assert dets["nouns"].shape == (2, 8)
    # All valid detections lie inside the image.
    v = np.asarray(dets["valid"])
    b = np.asarray(dets["boxes"])
    assert (b[v][:, 2] <= 160).all() and (b[v][:, 3] <= 128).all()
    # TTC clamp applied.
    assert (np.asarray(dets["ttcs"])[v] >= 0.251).all() or v.sum() == 0


def test_language_off_path():
    cfg = TransFusionConfig(
        detector=DetectorConfig(
            roi=RoIConfig(num_nouns=5, num_verbs=4, representation_size=32,
                          batch_size_per_image=8, detections_per_img=4),
        ),
        use_language=False,
    )
    model = TransFusion(cfg)
    batch = {
        "image": jnp.zeros((1, 64, 64, 3)),
        "image_hw": (64, 64),
    }
    variables = model.init({"params": jax.random.key(0)}, batch, False)
    out = model.apply(variables, batch, False)
    assert "lm" not in out
    assert out["roi_outputs"]["class_logits"].shape[-1] == 5


def test_reference_v1_config_builds_model():
    """The v1 reference config constructs the full model (shape-level)."""
    import os

    from tests.conftest import require_reference
    from transfusion_tpu.config import derive_config, load_config
    from transfusion_tpu.models.transfusion import build_transfusion_config

    ref = require_reference()
    os.environ["CODE"] = ref
    cfg_dict = derive_config(load_config(os.path.join(ref, "runner/nao/configs/ego_nao_res50_ego4d.yml")))
    cfg = build_transfusion_config(cfg_dict, num_nouns=88, num_verbs=75)
    assert cfg.fusion.token_dim == 712  # v1 out_mlp
    assert cfg.detector.roi.representation_size == 1024
    assert cfg.detector.roi.ttc_on is False  # criterion ttc: 0
    assert cfg.lm_on is False
    assert cfg.detector.stage_sizes == (3, 4, 6, 3)

    model = TransFusion(cfg)
    batch = {
        "image": jnp.zeros((1, 128, 160, 3)),
        "image_hw": (128, 160),
        "input_ids": jnp.ones((1, 16), jnp.int32),
        "attention_mask": jnp.ones((1, 16), jnp.int32),
    }
    shapes = jax.eval_shape(lambda k: model.init({"params": k}, batch, False), jax.random.key(0))
    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(shapes))
    assert n_params > 1e8  # full-size model
    # All four fusion levels present with 4 layers each.
    p = shapes["params"]
    for lvl in (0, 1, 2, 3):
        assert f"fusion_{lvl}" in p
        assert "layer_3" in p[f"fusion_{lvl}"]
