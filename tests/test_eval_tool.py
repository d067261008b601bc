"""Offline evaluation tool + heatmap math."""

import json

import numpy as np

from tests.fixtures import make_synthetic_ego4d
from transfusion_tpu.data.heatmaps import const_heatmap, gaussian_heatmap, get_img_heatmap
from transfusion_tpu.tools.evaluate_result_json import evaluate_results, load_gt


def test_evaluate_results_perfect(tmp_path):
    fx = make_synthetic_ego4d(tmp_path / "r", n_train=4, n_val=4, n_test=0)
    gt = load_gt(f"{fx['root']}/annotations/fho_sta_val.json")
    results = {
        uid: [
            {
                "box": labels["boxes"][i].tolist(),
                "noun_category_id": int(labels["nouns"][i]),
                "verb_category_id": int(labels["verbs"][i]),
                "time_to_contact": float(labels["ttcs"][i]),
                "score": 0.9,
            }
            for i in range(len(labels["boxes"]))
        ]
        for uid, labels in gt.items()
    }
    values = evaluate_results(results, gt)
    for name in ("map_noun", "map_box_noun", "map_box_noun_verb_ttc"):
        assert abs(values[name] - 100.0) < 1e-9
    # Dropping predictions for one uid is counted.
    partial = dict(results)
    missing_uid = next(iter(partial))
    del partial[missing_uid]
    v2 = evaluate_results(partial, gt)
    assert v2["_uids_without_predictions"] == 1
    assert v2["map_box_noun"] < 100.0


def test_heatmaps():
    hm = const_heatmap(np.array([[2, 2, 6, 5]]), 10, 12)
    assert hm.shape == (10, 12)
    assert hm[3, 4] == 1.0 and hm[0, 0] == 0.0

    g = gaussian_heatmap(np.array([[10, 10, 30, 30]]), 40, 48)
    assert g.shape == (40, 48)
    # Peak near the box center.
    cy, cx = np.unravel_index(np.argmax(g), g.shape)
    assert abs(cy - 20) <= 3 and abs(cx - 20) <= 3

    dist = get_img_heatmap("gaussian_dist")(np.array([[10, 10, 30, 30]]), 40, 48)
    assert abs(dist.sum() - 1.0) < 1e-5
