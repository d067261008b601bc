"""Golden-detections regression pin (VERDICT r3 next #7, SURVEY §7 hard part
#2: prediction-JSON parity discipline): a seeded tiny model on a fixed input
must keep producing the SAME detections (boxes/scores/nouns/verbs/ttcs/valid)
so NMS/postprocess refactors can't silently shift the exported predictions.

The golden file is committed; regenerate DELIBERATELY after an intentional
behavior change with:  GOLDEN_REGEN=1 pytest tests/test_golden_detections.py
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_detections.npz")


def _tiny_model():
    from transfusion_tpu.models.detector import DetectorConfig
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig
    from transfusion_tpu.models.text_encoder import BertConfig
    from transfusion_tpu.models.transfusion import FusionConfig, TransFusion, TransFusionConfig

    cfg = TransFusionConfig(
        detector=DetectorConfig(
            roi=RoIConfig(num_nouns=7, num_verbs=5, representation_size=64,
                          batch_size_per_image=16, detections_per_img=10,
                          score_thresh=0.01, ttc_on=True,
                          additional_postprocessing=True),
            rpn=RPNConfig(pre_nms_top_n_test=64, post_nms_top_n_test=32,
                          score_thresh=0.01),
            stage_sizes=(1, 1, 1, 1),
        ),
        fusion=FusionConfig(fpn_features=(2, 3), patch_h=(2, 1), patch_w=(2, 1),
                            num_layers=(1, 1), token_dim=32, num_heads=2),
        bert=BertConfig(vocab_size=64, hidden_size=16, num_layers=1, num_heads=2,
                        intermediate_size=32, max_position_embeddings=16),
        out_mlp=32,
    )
    return TransFusion(cfg), cfg


def _fixed_batch():
    """Deterministic structured input (no RNG library dependence): smooth
    gradients plus two solid rectangles."""
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        xx / w, yy / h, 0.5 + 0.5 * np.sin(xx / 11.0) * np.cos(yy / 7.0)
    ], axis=-1)
    img[20:50, 30:70] = [0.9, 0.1, 0.1]
    img[55:85, 80:115] = [0.1, 0.8, 0.2]
    ids = (np.arange(8)[None, :] * 7 + 3) % 64
    return {
        "image": jnp.asarray(img[None]),
        "input_ids": jnp.asarray(ids.astype(np.int32)),
        "attention_mask": jnp.ones((1, 8), jnp.int32),
    }, (h, w)


def _compute_detections():
    from transfusion_tpu.models.detector import detections_from_outputs

    model, cfg = _tiny_model()
    batch, hw = _fixed_batch()
    params = model.init({"params": jax.random.key(1234)}, dict(batch, image_hw=hw), False)
    freqs = np.zeros((7, 5), np.float32)
    freqs[1, 2] = 3.0
    freqs[2, 0] = 1.0

    @jax.jit
    def run(params, batch):
        out = model.apply(params, dict(batch, image_hw=hw), False)
        return detections_from_outputs(out, cfg.detector,
                                       noun_verb_frequencies=jnp.asarray(freqs))

    dets = jax.device_get(run(params, batch))
    return {k: np.asarray(v) for k, v in dets.items()}


def test_golden_detections_pinned():
    dets = _compute_detections()
    assert dets["valid"].any(), "tiny model produced no detections to pin"

    if os.environ.get("GOLDEN_REGEN") == "1" or not os.path.isfile(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **dets)
        if os.environ.get("GOLDEN_REGEN") != "1":
            raise AssertionError(
                f"golden file was missing — generated {GOLDEN}; commit it and rerun"
            )
        return

    golden = np.load(GOLDEN)
    assert set(golden.files) == set(dets.keys()), (golden.files, list(dets))
    for key in golden.files:
        got, want = dets[key], golden[key]
        assert got.shape == want.shape, (key, got.shape, want.shape)
        if got.dtype.kind in "fc":
            # Float tolerance: jax/XLA CPU codegen may reorder reductions
            # across versions; coordinates at ~100 px scale get 1e-3 abs.
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3, err_msg=key)
        else:
            np.testing.assert_array_equal(got, want, err_msg=key)
