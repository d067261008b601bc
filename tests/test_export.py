"""Prediction-JSON export + shard fusion."""

import json

import numpy as np

from transfusion_tpu.runner.export import detections_to_results, fuse_result_jsons, write_result_json


def _dets():
    return {
        "boxes": np.array([[[10, 20, 50, 80], [0, 0, 5, 5], [1, 1, 2, 2]]], np.float32),
        "scores": np.array([[0.9, 0.5, 0.1]], np.float32),
        "nouns": np.array([[87, 4, 3]]),
        "verbs": np.array([[2, 5, 1]]),
        "ttcs": np.array([[0.7, 1.0, 2.0]], np.float32),
        "valid": np.array([[True, True, False]]),
    }


def test_detections_to_results_rescale_and_unswap():
    res = detections_to_results(
        _dets(), ["uid_1"], np.array([[1080, 1440]]), (540, 720), last_noun_idx=87
    )
    entries = res["uid_1"]
    assert len(entries) == 2
    # 2x rescale both axes; noun 87 (the moved class) unswaps to 0.
    assert entries[0]["box"] == [20.0, 40.0, 100.0, 160.0]
    assert entries[0]["noun_category_id"] == 0
    assert entries[1]["noun_category_id"] == 4
    assert abs(entries[0]["score"] - 0.9) < 1e-6 and entries[0]["verb_category_id"] == 2


def test_write_and_fuse(tmp_path):
    r1 = {"a": [{"score": 1.0}], "b": [{"score": 0.5}]}
    r2 = {"c": [{"score": 0.2}]}
    p1 = write_result_json(r1, str(tmp_path / "shard0.json"), epoch=3)
    p2 = write_result_json(r2, str(tmp_path / "shard1.json"), epoch=3)
    fused = fuse_result_jsons([p1, p2], str(tmp_path / "fused.json"))
    data = json.load(open(fused))
    assert set(data["results"]) == {"a", "b", "c"}
    assert data["challenge"].startswith("ego4d_short_term")
    assert json.load(open(p1))["epoch"] == 3
