"""NAO label extraction: matching cases, row NMS, per-video labeling, CSV IO.

Oracle style: the reference package (data_preprocessing/label_extraction/) is
not importable in the snapshot (dead ``Code.`` prefix imports), so these are
behavioral tests constructed from the reference source semantics, with a
torch-free reimplementation of the detectron2 box helpers checked by hand.
"""

import numpy as np
import pandas as pd
import pytest

from transfusion_tpu.tools.label_extraction import (
    _get_all_matches,
    _get_closest_to_hands,
    _get_first_match,
    _get_put_obj_matches,
    detections_to_rows,
    label_video,
    match_frame_in_annotation,
    nao_csv_path,
    nms_row,
    pairwise_intersection,
    pairwise_point_box_distance,
    read_detections_csv,
    write_detections_csv,
)


def det_row(classes, boxes, scores=None):
    classes = np.asarray(classes)
    if scores is None:
        scores = np.linspace(0.9, 0.5, len(classes))
    return pd.Series({
        "Classes": classes,
        "Scores": np.asarray(scores, np.float32),
        "Bboxes": np.asarray(boxes, np.float32).reshape(-1, 4),
    })


SOFT = {
    "no_matches": ["hob"],
    "actions": {
        "obj_only": ["cut"],
        "take_closest_to_hand": ["wash"],
        "take_all_instances": ["gather"],
        "pour": ["obj", "jug"],
        "gather": ["obj"],
        "wash": ["obj"],
        "cut": ["obj"],
        "put": ["obj"],
    },
    "cucumber": {"default": ["cucumber", "zucchini"]},
    "pepper": {"default": ["pepper"], "put": ["cutting board"]},
    "knife": {"default": ["knife"]},
    "plate": {"default": ["plate"]},
    "water": {"default": []},
}


# ---------------------------------------------------------------- box math


def test_pairwise_intersection_and_point_distance():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    inter = pairwise_intersection(a, b)
    assert inter.shape == (1, 2)
    assert inter[0, 0] == pytest.approx(25.0)
    assert inter[0, 1] == 0.0

    # Signed edge distances (left, top, right, bottom), positive inside.
    d = pairwise_point_box_distance(np.array([[7.0, 8.0]]), b)
    assert d.shape == (1, 2, 4)
    np.testing.assert_allclose(d[0, 0], [2.0, 3.0, 8.0, 7.0])
    assert d[0, 1].min() < 0  # outside the far box: some edge delta negative


def test_nms_row_keeps_input_order_not_score_order():
    # Reference quirk (label_extraction/utils.py:86-95): suppression is
    # greedy over INPUT order; a higher-scoring later box is dropped by an
    # earlier lower-scoring overlap.
    classes = np.array(["plate", "plate", "cup"])
    boxes = [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]]
    scores = [0.3, 0.9, 0.5]
    c, s, b = nms_row(classes, scores, boxes, iou_lim=0.4)
    assert c.tolist() == ["plate", "cup"]
    assert s.tolist() == pytest.approx([0.3, 0.5])
    assert b.shape == (2, 4)


# ------------------------------------------------------------- processors


def test_first_match_priority_order():
    row = det_row(["zucchini", "cucumber"], [[0, 0, 1, 1], [2, 2, 3, 3]])
    # "cucumber" outranks "zucchini" in the priority list even though the
    # zucchini detection comes first.
    assert _get_first_match(["cucumber", "zucchini"], row["Classes"]) == [1]
    assert _get_first_match(["missing"], row["Classes"]) == []
    assert _get_first_match([], row["Classes"]) == []


def test_all_matches_head_then_tail():
    classes = np.array(["a", "b", "c", "d", "a"])
    # Head (first three labels) hits -> tail ignored.
    assert _get_all_matches(["a", "x", "y", "d"], classes) == [0, 4]
    # Head misses entirely -> tail labels are consulted.
    assert _get_all_matches(["q", "r", "s", "d"], classes) == [3]


def test_closest_to_hands_prefers_overlap_then_distance():
    row = det_row(
        ["person", "plate", "plate"],
        [[0, 0, 10, 10], [5, 5, 15, 15], [100, 100, 110, 110]],
    )
    assert _get_closest_to_hands(["plate"], row) == [1]  # overlaps the hand

    row2 = det_row(
        ["person", "plate", "plate"],
        [[0, 0, 10, 10], [20, 0, 30, 10], [200, 200, 210, 210]],
    )
    assert _get_closest_to_hands(["plate"], row2) == [1]  # nearer, no overlap

    no_hands = det_row(["plate"], [[0, 0, 10, 10]])
    assert _get_closest_to_hands(["plate"], no_hands) == []


def test_put_requires_hand_overlap():
    row = det_row(
        ["person", "cutting board"],
        [[0, 0, 10, 10], [8, 8, 30, 30]],
    )
    assert _get_put_obj_matches(["cutting board"], row) == [1]
    far = det_row(
        ["person", "cutting board"],
        [[0, 0, 10, 10], [50, 50, 80, 80]],
    )
    assert _get_put_obj_matches(["cutting board"], far) == []


# -------------------------------------------------------- frame matching


def test_noun_path_default_and_side_matches():
    ann = {"verb": "move", "all_nouns": ["pepper"]}
    row = det_row(["pepper", "cutting board"], [[0, 0, 5, 5], [10, 10, 30, 30]])
    assert match_frame_in_annotation(row, ann, SOFT) == [0]
    # Side matches activate when the annotation verb has a per-noun entry
    # (nao_labeling_cases.py:53-56).
    ann_put_like = {"verb": "shift", "all_nouns": ["pepper"]}
    SOFT_side = {**SOFT, "pepper": {"default": ["pepper"], "shift": ["cutting board"]}}
    assert match_frame_in_annotation(row, ann_put_like, SOFT_side) == [0, 1]


def test_no_matches_noun_short_circuits():
    ann = {"verb": "move", "all_nouns": ["hob"]}
    row = det_row(["hob"], [[0, 0, 5, 5]])
    assert match_frame_in_annotation(row, ann, SOFT) == []


def test_cut_adds_knife_and_obj_tail_labels():
    # "cut" is obj_only: per-noun defaults + the knife special case
    # (nao_labeling_cases.py:89-93).
    ann = {"verb": "cut", "all_nouns": ["cucumber"]}
    row = det_row(
        ["knife", "cucumber", "zucchini"],
        [[0, 0, 5, 5], [10, 10, 15, 15], [20, 20, 25, 25]],
    )
    assert match_frame_in_annotation(row, ann, SOFT) == [0, 1]

    # "pour" carries ["obj", "jug"]: the tail after the "obj" sentinel is an
    # extra target label list (nao_labeling_cases.py:77-78).
    ann2 = {"verb": "pour", "all_nouns": ["water"]}
    row2 = det_row(["jug", "glass"], [[0, 0, 5, 5], [10, 10, 15, 15]])
    assert match_frame_in_annotation(row2, ann2, SOFT) == [0]


def test_take_all_instances_via_gather():
    SOFT_g = {**SOFT, "actions": {**SOFT["actions"], "take_all_instances": ["gather"]}}
    ann = {"verb": "gather", "all_nouns": ["cucumber"]}
    row = det_row(
        ["cucumber", "plate", "cucumber"],
        [[0, 0, 5, 5], [10, 10, 15, 15], [20, 20, 25, 25]],
    )
    assert match_frame_in_annotation(row, ann, SOFT_g) == [0, 2]


def test_wash_takes_closest_to_hand():
    ann = {"verb": "wash", "all_nouns": ["plate"]}
    row = det_row(
        ["person", "plate", "plate"],
        [[0, 0, 10, 10], [5, 5, 15, 15], [100, 100, 110, 110]],
    )
    assert match_frame_in_annotation(row, ann, SOFT) == [1]


# ----------------------------------------------------------- video level


def _annots():
    return pd.DataFrame([
        {"start_frame": 0, "narration_id": "v_0", "narration": "open fridge",
         "starting_ms": 0, "fps": 30.0, "verb": "open", "all_nouns": ["fridge"]},
        {"start_frame": 100, "narration_id": "v_1", "narration": "cut cucumber",
         "starting_ms": 3333, "fps": 30.0, "verb": "cut", "all_nouns": ["cucumber"]},
        {"start_frame": 200, "narration_id": "v_2", "narration": "move pepper",
         "starting_ms": 6667, "fps": 30.0, "verb": "move", "all_nouns": ["pepper"]},
    ])


def _detections():
    rows = []
    # Segment (0, 100): frames feeding the "cut cucumber" annotation.
    rows.append({"Frame_no": 50,
                 "Classes": np.array(["cucumber", "spoon"]),
                 "Scores": np.array([0.9, 0.8], np.float32),
                 "Bboxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)})
    rows.append({"Frame_no": 60,
                 "Classes": np.array(["spoon"]),
                 "Scores": np.array([0.7], np.float32),
                 "Bboxes": np.array([[0, 0, 10, 10]], np.float32)})
    # Segment (100, 200): feeds "move pepper".
    rows.append({"Frame_no": 150,
                 "Classes": np.array(["pepper", "pepper"]),
                 "Scores": np.array([0.4, 0.95], np.float32),
                 # second pepper overlaps the first -> input-order NMS drops it
                 "Bboxes": np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)})
    return pd.DataFrame(rows).set_index("Frame_no")


def test_label_video_segments_and_metadata():
    labels = label_video(_detections(), _annots(), SOFT, version=1)
    # Frame 50 matches "cut cucumber" (cucumber; no knife present), frame 150
    # matches "move pepper"; frame 60 (spoon only) matches nothing.
    assert sorted(labels.index.tolist()) == [50, 150]
    f50 = labels.loc[50]
    assert f50["Classes"] == ["cucumber"]
    assert f50["nao_clip_id"] == "v_1"
    assert f50["nao_narration"] == "cut cucumber"
    assert f50["nao_start_sec"] == pytest.approx(3.333)
    assert f50["det_sec"] == pytest.approx(50 / 30.0)
    f150 = labels.loc[150]
    # Input-order NMS (iou .4) kept only the FIRST pepper despite its lower
    # score; matching then finds exactly one candidate.
    assert f150["Classes"] == ["pepper"]
    assert np.asarray(f150["Bboxes"]).reshape(-1, 4)[0].tolist() == [0, 0, 10, 10]


def test_label_video_single_annotation_yields_nothing():
    labels = label_video(_detections(), _annots().iloc[:1], SOFT)
    assert len(labels) == 0


# ------------------------------------------------------------------- IO


def test_detections_rows_and_csv_roundtrip(tmp_path):
    label_file_names = ["Plate_", "_Person", "Watch_x"]
    # detections_to_rows takes display names from the label file, drops
    # jewelry classes, rounds, and skips empty frames.
    per_frame = [
        (np.array([0, 1, 2]), np.array([0.91234, 0.5, 0.4]),
         np.array([[0, 0, 10.12345, 10], [1, 1, 11, 11], [2, 2, 3, 3]])),
        (np.array([2]), np.array([0.9]), np.array([[0, 0, 1, 1]])),  # only watch
    ]
    rows = detections_to_rows([7, 8], per_frame, ["Plate", "Person", "Watch"])
    assert len(rows) == 1 and rows[0]["Frame_no"] == 7
    assert rows[0]["Classes"] == ["Plate", "Person"]
    assert rows[0]["Bboxes"][0][2] == pytest.approx(10.123)

    df = pd.DataFrame(rows, columns=["Frame_no", "Classes", "Scores", "Bboxes"])
    path = tmp_path / "vid_detections.csv"
    write_detections_csv(df, path)
    back = read_detections_csv(path)
    assert back.index.tolist() == [7]
    # read_detections_csv lowercases class names (path_utils.py:141).
    assert back.iloc[0]["Classes"].tolist() == ["plate", "person"]
    assert isinstance(back.iloc[0]["Scores"], np.ndarray)


def test_nao_csv_path_layout(tmp_path):
    assert nao_csv_path(tmp_path, "vid", 2).name == "vid_nao_2.csv"
    assert nao_csv_path(tmp_path, "vid", 2, epic_video=True).name == "vid_nao_2_video.csv"
    assert nao_csv_path(tmp_path, "vid", "").name == "vid_nao.csv"


def test_cli_label_subcommand(tmp_path):
    from transfusion_tpu.tools.label_extraction import main
    import json

    det_csv = tmp_path / "vid_detections.csv"
    rows = _detections().reset_index()
    rows["Classes"] = rows["Classes"].apply(lambda a: a.tolist())
    rows["Scores"] = rows["Scores"].apply(lambda a: a.tolist())
    rows["Bboxes"] = rows["Bboxes"].apply(lambda a: a.tolist())
    rows.to_csv(det_csv, index=False)
    ann_pkl = tmp_path / "annots.pkl"
    _annots().to_pickle(ann_pkl)
    sm = tmp_path / "soft.json"
    sm.write_text(json.dumps({"epic": SOFT}))

    main(["label", "--detections-csv", str(det_csv), "--annotations-pkl",
          str(ann_pkl), "--video", "vid", "--soft-matches", str(sm),
          "--out-dir", str(tmp_path), "--dataset", "epic", "--version", "1"])
    out = pd.read_pickle(tmp_path / "vid_nao_1.pkl")
    assert sorted(out.index.tolist()) == [50, 150]
