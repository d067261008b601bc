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
