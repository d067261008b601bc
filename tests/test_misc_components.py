"""Readers, plotting callback, profiling utils."""

import os

import numpy as np
import pytest

from transfusion_tpu.data.readers import (
    Ego4dJpgReader,
    get_clip_frame_idxs,
    get_clip_frame_idxs_block,
    slowfast_feature_window,
)
from transfusion_tpu.runner.callbacks import BboxPlotter, plot_boxes_grid
from transfusion_tpu.utils.profiling import StepTimer


def test_jpg_reader(tmp_path, rng):
    from PIL import Image

    img = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    Image.fromarray(img).save(tmp_path / "vid-a_0000123.jpg", quality=95)
    reader = Ego4dJpgReader(str(tmp_path), "vid-a")
    out = reader.get_frame(123)
    assert out.shape == (40, 60, 3)


def test_clip_frame_idxs():
    assert get_clip_frame_idxs(100, 4, 10) == [70, 80, 90, 100]
    assert get_clip_frame_idxs(15, 4, 10) == [0, 0, 5, 15]  # clamped at 0
    assert get_clip_frame_idxs_block(20, 2, 10, 2) == [10, 11, 20, 21]


def test_slowfast_window_leak_avoidance():
    idxs = slowfast_feature_window(100, contact_frame=85, window=4, stride=10)
    assert all(i < 85 for i in idxs)
    # All excluded -> falls back to the frame before contact.
    idxs2 = slowfast_feature_window(100, contact_frame=50, window=2, stride=10)
    assert idxs2 == [49]
    # No contact info: plain window.
    assert slowfast_feature_window(100, None, 3, 5) == [90, 95, 100]


def test_plot_boxes_grid(tmp_path, rng):
    images = rng.normal(0, 0.5, (3, 48, 64, 3)).astype(np.float32)
    gt = [np.array([[5, 5, 30, 30]])] * 3
    pred = [np.array([[8, 8, 28, 28], [40, 10, 60, 40]])] * 3
    labels = [["cup/take 0.50s 0.90", "pan/put 1.00s 0.40"]] * 3
    out = plot_boxes_grid(images, gt, pred, labels, ["cup/take"] * 3,
                          str(tmp_path / "grid.jpg"))
    assert os.path.isfile(out) and os.path.getsize(out) > 1000


def test_bbox_plotter(tmp_path, rng):
    plotter = BboxPlotter(str(tmp_path), {1: "cup"}, {0: "take"})
    batch = {
        "image": rng.normal(0, 0.5, (2, 32, 48, 3)).astype(np.float32),
        "targets": {
            "boxes": np.array([[[4, 4, 20, 20]]] * 2, np.float32),
            "nouns": np.array([[1]] * 2),
            "verbs": np.array([[0]] * 2),
            "valid": np.ones((2, 1), bool),
        },
    }
    dets = {
        "boxes": np.array([[[5, 5, 19, 19], [0, 0, 10, 10]]] * 2, np.float32),
        "scores": np.array([[0.9, 0.3]] * 2, np.float32),
        "nouns": np.array([[1, 1]] * 2),
        "verbs": np.array([[0, 0]] * 2),
        "ttcs": np.array([[0.5, 1.0]] * 2, np.float32),
        "valid": np.ones((2, 2), bool),
    }
    path = plotter("val", 3, batch, dets)
    assert path.endswith(os.path.join("val", "epoch_003.jpg"))
    assert os.path.isfile(path)


def test_step_timer():
    t = StepTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    rep = t.report()
    assert "a" in rep and rep["a"] >= 0


def test_hmap_metrics_match_reference_torch(rng):
    """Oracle: the reference's torchmetrics classes re-expressed in torch
    (hmap_metrics.py:8-123), streamed over two batches."""
    import torch

    from transfusion_tpu.metrics.hmap_metrics import CoordMetric, HeatmapAccuracy, MAEWithNorm

    batches = []
    for _ in range(2):
        t = rng.uniform(0.1, 1.0, (3, 8, 10)).astype(np.float32)
        p = (t + rng.normal(0, 0.2, t.shape)).astype(np.float32)
        batches.append((p, t))

    mae = MAEWithNorm(True)
    acc = HeatmapAccuracy(True)
    coord = CoordMetric((8, 10))
    # torch reference accumulators
    abs_sum = cnt = 0.0
    diffs = area = 0.0
    cdiffs = ctot = 0.0
    for p, t in batches:
        mae.update(p, t)
        acc.update(p, t)
        coord.update(p, t)

        tp, tt = torch.from_numpy(p), torch.from_numpy(t)
        tmax = torch.amax(tt, dim=(-1, -2), keepdim=True)
        tn, pn = tt / tmax, tp / tmax
        abs_sum += float(torch.abs(pn - tn).sum())
        cnt += pn.numel()
        area += float(torch.sum(tn > tn.std(dim=[-1, -2], unbiased=True, keepdim=True)))
        diffs += float(torch.abs(pn - tn).sum())
        n = tp.shape[0]
        ta = tt.reshape(n, -1).max(-1)[1]
        pa = tp.reshape(n, -1).max(-1)[1]
        tc = np.stack(np.unravel_index(ta.numpy(), t.shape[1:]), -1)
        pc = np.stack(np.unravel_index(pa.numpy(), t.shape[1:]), -1)
        cdiffs += float((np.abs(tc - pc) / np.array([8.0, 10.0])).max(-1).sum())
        ctot += n

    np.testing.assert_allclose(mae.compute(), abs_sum / cnt, rtol=1e-6)
    np.testing.assert_allclose(acc.compute(), diffs / area, rtol=1e-6)
    np.testing.assert_allclose(coord.compute(), cdiffs / ctot, rtol=1e-6)


def test_misc_layers_upsample_and_condition(rng):
    """Legacy upsample + heatmap conditioning primitives
    (modeling/layers/upsample_layers.py, heatmap_condition.py)."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from transfusion_tpu.models.misc_layers import (
        Conv2dHeatmapCondition,
        SqueezeHeatmapCondition,
        get_heatmap_cond_module,
        get_upsample_l,
    )

    x = rng.normal(0, 1, (1, 6, 8, 3)).astype(np.float32)
    up = get_upsample_l("bilinear")(3)
    out = np.asarray(up.apply({}, jnp.asarray(x), (12, 16)))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), (12, 16),
                        mode="bilinear", align_corners=True).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)

    nn2d = get_upsample_l("nn2d")(3)
    params = nn2d.init(jax.random.key(0), jnp.asarray(x), (12, 16))
    assert nn2d.apply(params, jnp.asarray(x), (12, 16)).shape == (1, 12, 16, 3)

    feats = jnp.asarray(rng.normal(0, 1, (2, 6, 8, 4)).astype(np.float32))
    hmap = jnp.asarray(rng.normal(0, 1, (2, 6, 8, 1)).astype(np.float32))
    cond = get_heatmap_cond_module({"type": "1x1"}, 4)
    assert isinstance(cond, Conv2dHeatmapCondition)
    p = cond.init(jax.random.key(0), feats, hmap)
    assert cond.apply(p, feats, hmap).shape == feats.shape

    se = get_heatmap_cond_module({"type": "se_block"}, 4)
    assert isinstance(se, SqueezeHeatmapCondition)
    p = se.init(jax.random.key(0), feats, hmap)
    assert se.apply(p, feats, hmap).shape == feats.shape


def test_hmap_plotter(tmp_path, rng):
    """Legacy heatmap plot grids (HmapPlotterCallback equivalent)."""
    pytest.importorskip("matplotlib")
    from transfusion_tpu.runner.callbacks import HmapPlotter

    imgs = rng.normal(0, 1, (2, 32, 40, 3)).astype(np.float32)
    gt = rng.uniform(0, 1, (2, 32, 40)).astype(np.float32)
    pred = rng.uniform(0, 1, (2, 32, 40)).astype(np.float32)
    p = HmapPlotter(str(tmp_path))
    out = p("val", 3, imgs, gt, pred, titles=["a", "b"])
    import os

    assert os.path.isfile(out) and os.path.getsize(out) > 0
