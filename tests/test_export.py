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


def test_inloop_metric_matches_offline_eval_tool(rng):
    """The logged metric and the exported JSON's official scoring see the
    SAME numbers (VERDICT r1 weak #8): feed identical fixed-shape detections
    through (a) the trainer's metric.add loop and (b) detections_to_results ->
    evaluate_results, with GT ids mapped by the same bg/0 swap."""
    from transfusion_tpu.metrics import STAMeanAveragePrecision
    from transfusion_tpu.runner.export import detections_to_results
    from transfusion_tpu.tools.evaluate_result_json import evaluate_results

    bsz, k, last_noun = 3, 5, 7
    bucket = (64, 80)
    orig_hw = np.array([[128, 160], [96, 120], [256, 320]], np.int64)
    boxes = rng.uniform(0, 48, (bsz, k, 4))
    boxes = np.concatenate([boxes[..., :2], boxes[..., :2] + 4 + boxes[..., 2:] * 0.2], -1)
    dets = {
        "boxes": boxes.astype(np.float32),
        "scores": rng.uniform(0.1, 1, (bsz, k)).astype(np.float32),
        "nouns": rng.integers(1, last_noun + 1, (bsz, k)),
        "verbs": rng.integers(0, 5, (bsz, k)),
        "ttcs": rng.uniform(0.3, 2.0, (bsz, k)).astype(np.float32),
        "valid": rng.uniform(0, 1, (bsz, k)) > 0.3,
    }
    gt = {
        "boxes": boxes[:, :2] * 1.1 + 1,
        "nouns": rng.integers(1, last_noun + 1, (bsz, 2)),
        "verbs": rng.integers(0, 5, (bsz, 2)),
        "ttcs": rng.uniform(0.3, 2.0, (bsz, 2)),
        "valid": np.ones((bsz, 2), bool),
    }
    uids = [f"u{i}" for i in range(bsz)]

    # (a) trainer loop: internal ids, float boxes rescaled to original res.
    metric = STAMeanAveragePrecision(top_k=5)
    for i in range(bsz):
        v = dets["valid"][i]
        ry, rx = orig_hw[i][0] / bucket[0], orig_hw[i][1] / bucket[1]
        metric.add(
            {
                "boxes": dets["boxes"][i][v] * np.array([rx, ry, rx, ry]),
                "scores": dets["scores"][i][v],
                "nouns": dets["nouns"][i][v],
                "verbs": dets["verbs"][i][v],
                "ttcs": dets["ttcs"][i][v],
            },
            {
                "boxes": gt["boxes"][i] * np.array([rx, ry, rx, ry]),
                "nouns": gt["nouns"][i],
                "verbs": gt["verbs"][i],
                "ttcs": gt["ttcs"][i],
            },
        )
    inloop = dict(zip(metric.get_short_names(), metric.evaluate()))

    # (b) export -> offline tool with GT in official ids (same bg/0 swap the
    # export applies to predictions).
    results = detections_to_results(dets, uids, orig_hw, bucket, last_noun_idx=last_noun)
    swap = lambda n: np.where(n == last_noun, 0, n)
    gt_official = {
        uids[i]: {
            "boxes": gt["boxes"][i] * np.array(
                [orig_hw[i][1] / bucket[1], orig_hw[i][0] / bucket[0]] * 2
            ),
            "nouns": swap(gt["nouns"][i]),
            "verbs": gt["verbs"][i],
            "ttcs": gt["ttcs"][i],
        }
        for i in range(bsz)
    }
    offline = evaluate_results(results, gt_official, top_k=5)
    for name, val in inloop.items():
        np.testing.assert_allclose(val, offline[name], atol=1e-9, err_msg=name)
