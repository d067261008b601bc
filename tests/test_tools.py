"""Offline tools: postprocess corrector, ttc adapter, frame extraction,
norm stats, split generation."""

import json
import os

import numpy as np
import pytest

from tests.fixtures import make_synthetic_ego4d
from transfusion_tpu.tools.adapt_ttc_values import adapt_ttc
from transfusion_tpu.tools.postprocess_result_json import (
    noun_verb_freqs_from_annotations,
    postprocess_results,
)


def test_postprocess_results_corrections():
    freqs = {3: {1: 10, 2: 2}, 5: {0: 4}}
    results = {
        "f1": [
            {"box": [0, 0, 50, 50], "noun_category_id": 3, "verb_category_id": 9,
             "time_to_contact": 0.1, "score": 0.9},   # unseen pair -> verb 1; ttc clamped
            {"box": [10, 10, 60, 60], "noun_category_id": 3, "verb_category_id": 1,
             "time_to_contact": 0.5, "score": 0.8},   # seen; intersects after replacement
            {"box": [200, 200, 240, 260], "noun_category_id": 5, "verb_category_id": 0,
             "time_to_contact": 0.9, "score": 0.7},
            {"box": [5, 5, 4, 9], "noun_category_id": 5, "verb_category_id": 0,
             "time_to_contact": 0.9, "score": 0.6},   # degenerate box dropped
        ]
    }
    out = postprocess_results({k: [dict(e) for e in v] for k, v in results.items()}, freqs)
    entries = out["f1"]
    # Unseen (3, 9): frame-wise preference picks verb 1 (already predicted, seen).
    assert entries[0]["verb_category_id"] == 1
    assert entries[0]["time_to_contact"] == 0.251
    # Second (3, 1) intersects the first (now same pair) -> suppressed.
    nouns = [e["noun_category_id"] for e in entries]
    assert nouns.count(3) == 1
    # Degenerate box dropped; far noun-5 box kept.
    assert len(entries) == 2


def test_noun_verb_freqs_from_annotations():
    train = {"annotations": [
        {"objects": [{"noun_category_id": 1, "verb_category_id": 2},
                     {"noun_category_id": 1, "verb_category_id": 2}]},
        {"objects": [{"noun_category_id": 4, "verb_category_id": 0}]},
    ]}
    freqs = noun_verb_freqs_from_annotations(train)
    assert freqs == {1: {2: 2}, 4: {0: 1}}


def test_adapt_ttc_matching():
    dets = {"u1": [{"score": 0.9, "time_to_contact": 1.0},
                   {"score": 0.5, "time_to_contact": 1.0}]}
    ref = {"results": {"u1": [{"score": 0.5, "time_to_contact": 0.7},
                              {"score": 0.9, "time_to_contact": []}]}}
    out = adapt_ttc({k: [dict(e) for e in v] for k, v in dets.items()}, ref)
    assert out["u1"][0]["time_to_contact"] == 0.5  # empty external -> default
    assert out["u1"][1]["time_to_contact"] == 0.7


def test_compute_norm_stats(tmp_path):
    from PIL import Image

    from transfusion_tpu.tools.compute_norm_stats import compute_stats

    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)).save(
            tmp_path / f"x{i}.jpg", quality=95
        )
    mean, std = compute_stats(str(tmp_path))
    assert mean.shape == (3,) and 0.2 < mean.mean() < 0.8
    assert np.all(std > 0)


def test_generate_splits(tmp_path):
    from transfusion_tpu.data.annotations import load_sta_annotations
    from transfusion_tpu.tools.generate_splits import generate_split

    fx = make_synthetic_ego4d(tmp_path / "root", n_train=20, n_val=6, n_test=2, n_videos=4)
    annots = load_sta_annotations(fx["root"])
    split = generate_split(annots, "group_stratified", "noun", n_subsets=2, seed=1)
    assert set(split.columns) >= {"nao_narration", "subset_1", "subset_2"}
    for c in ("subset_1", "subset_2"):
        counts = split[c].value_counts()
        assert counts.get("train", 0) > 0 and counts.get("val", 0) > 0
    # Group integrity: a clip never straddles train and eval within a subset.
    merged = split.join(annots.set_index("nao_clip_id")[["clip_id"]])
    for c in ("subset_1", "subset_2"):
        per_clip = merged.groupby("clip_id")[c].nunique()
        assert (per_clip == 1).all()


def test_extract_frames_monotonic_pass(tmp_path):
    """extract_video writes the exact jpg contract from a real mp4 if cv2 can
    encode one; otherwise skipped (container codecs vary)."""
    import cv2

    vid_path = str(tmp_path / "vid-0000.mp4")
    w = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    if not w.isOpened():
        pytest.skip("cv2 mp4 encoder unavailable")
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8) for _ in range(30)]
    for f in frames:
        w.write(f)
    w.release()

    from transfusion_tpu.tools.extract_frames import extract_video

    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    n = extract_video(vid_path, [3, 7, 20], out_dir)
    assert n == 3
    names = sorted(os.listdir(out_dir))
    assert names == ["vid-0000_0000003.jpg", "vid-0000_0000007.jpg", "vid-0000_0000020.jpg"]
