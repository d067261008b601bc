"""Dual-stream (RGB + flow) backbone and the packed-flow JPEG decoder.

The reference two-stream model is dead code (model_factory.py:55 hardcodes
dual_stream=False; no fused backbone ships), so the oracle here is the block
adapters' own arithmetic (resnet_wrapper.py:81-109): with a zero motion
feature the 'sum' fusion is the identity, so DualBottleneck must reproduce a
plain Bottleneck bit-for-bit from shared conv parameters.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfusion_tpu.data.readers import decode_flow_jpg
from transfusion_tpu.models.detector import DetectorConfig, FasterRCNN
from transfusion_tpu.models.dual_stream import DualBottleneck, DualStreamResNet
from transfusion_tpu.models.resnet import Bottleneck
from transfusion_tpu.models.roi_heads import RoIConfig
from transfusion_tpu.models.rpn import RPNConfig


@pytest.mark.parametrize("project", [False, True])
def test_dual_bottleneck_reduces_to_bottleneck_with_zero_flow(project):
    """extra == 0 under 'sum' fusion makes fusion_fn the identity, and both
    shortcut variants (identity binds pre-fusion; downsample consumes the
    fused input, resnet_wrapper.py:87-107) collapse onto the plain block."""
    rng = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 16))
    extra = jnp.zeros((1, 8, 8, 8))
    dual = DualBottleneck(mid=4, stride=1, project=project)
    dv = dual.init(rng, x, extra)
    plain = Bottleneck(mid=4, stride=1, project=project)
    # Same submodule names (conv1/2/3, downsample) -> shared param tree minus
    # the fusion projection.
    pv = {"params": {k: v for k, v in dv["params"].items() if k != "fuse"}}
    np.testing.assert_allclose(
        np.asarray(dual.apply(dv, x, extra)),
        np.asarray(plain.apply(pv, x)),
        rtol=0, atol=0,
    )


def test_dual_bottleneck_flow_changes_output():
    rng = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 16))
    extra = jax.random.normal(jax.random.key(2), (1, 8, 8, 8))
    dual = DualBottleneck(mid=4, stride=1, project=True)
    dv = dual.init(rng, x, extra)
    out0 = dual.apply(dv, x, jnp.zeros_like(extra))
    out1 = dual.apply(dv, x, extra)
    assert float(jnp.abs(out0 - out1).max()) > 0


def test_dual_stream_resnet_feature_pyramid():
    model = DualStreamResNet(stage_sizes=(1, 1, 1, 1))
    img = jnp.zeros((1, 64, 64, 3))
    flow = jnp.zeros((1, 64, 64, 2))
    variables = model.init(jax.random.key(0), img, flow)
    feats = model.apply(variables, img, flow)
    assert sorted(feats.keys()) == ["0", "1", "2", "3"]
    assert feats["0"].shape == (1, 16, 16, 256)
    assert feats["3"].shape == (1, 2, 2, 2048)


def test_dual_stream_detector_forward():
    """The DualStreamRCNNWrapper contract: the detector consumes
    {"image", "flow_data"} and produces the standard output dict
    (dual_stream_rcnn_wrapper.py:38-42,81-94)."""
    cfg = DetectorConfig(
        stage_sizes=(1, 1, 1, 1),
        dual_stream=True,
        roi=RoIConfig(num_nouns=5, num_verbs=4, representation_size=32,
                      detections_per_img=4),
        rpn=RPNConfig(pre_nms_top_n_test=16, post_nms_top_n_test=8),
    )
    model = FasterRCNN(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    flow = jnp.zeros((1, 64, 64, 2))
    variables = model.init(jax.random.key(0), img, (64, 64), flow=flow)
    out = model.apply(variables, img, (64, 64), flow=flow)
    assert {"roi_outputs", "proposals", "image_sizes"} <= set(out)
    assert "flow_stem" in variables["params"]["backbone"]


def test_decode_flow_jpg_roundtrip():
    """Packed layout: one grayscale JPEG stacking (u, v) vertically ->
    [H, W, 2], resized to the target shape (readers.py:314-322)."""
    h, w = 32, 48
    u = np.full((h, w), 64, np.uint8)
    v = np.full((h, w), 192, np.uint8)
    packed = np.concatenate([u, v], axis=0)  # [2h, w]
    ok, buf = cv2.imencode(".jpg", packed, [cv2.IMWRITE_JPEG_QUALITY, 100])
    assert ok
    out = decode_flow_jpg(buf.tobytes(), load_shape=(2, h, w), img_shape=(h, w, 2))
    assert out.shape == (h, w, 2)
    assert abs(int(out[..., 0].mean()) - 64) <= 2
    assert abs(int(out[..., 1].mean()) - 192) <= 2
    # Stored-at-half-resolution path resizes up.
    up = decode_flow_jpg(buf.tobytes(), load_shape=(2, h, w), img_shape=(2 * h, 2 * w, 2))
    assert up.shape == (2 * h, 2 * w, 2)
