"""EPIC/EGTEA snao ingestion round trip: the label-extraction pipeline's
output (extract -> label) feeds the legacy heatmap family end to end
(VERDICT r3 missing #2 / next #8).

Reference match: path_utils.py:128-160/193-206 (nao_*.{csv,pkl} loaders),
dataset_utils.py:17-46 (det_diff filter), utils.py:37-49
(get_datasets_from_name), path_constants.py:5-12 (epic/egtea data_roots).
"""

import os

import numpy as np
import pandas as pd
import pytest


def _mk_annotations():
    """Narration-annotations frame in the schema label_video consumes."""
    fps = 30.0
    return pd.DataFrame([
        {"start_frame": 0, "narration_id": "P01_01_0", "narration": "open fridge",
         "starting_ms": 0.0, "fps": fps, "verb": "open", "all_nouns": ["fridge"]},
        {"start_frame": 100, "narration_id": "P01_01_1", "narration": "take cup",
         "starting_ms": 100 / fps * 1000, "fps": fps, "verb": "take", "all_nouns": ["cup"]},
        {"start_frame": 200, "narration_id": "P01_01_2", "narration": "wash pan",
         "starting_ms": 200 / fps * 1000, "fps": fps, "verb": "wash", "all_nouns": ["pan"]},
    ])


def test_filter_nao_annotations_closest_and_take_double():
    df = pd.DataFrame({
        "Frame_no": [10, 40, 70, 85, 15],
        "nao_clip_id": ["c1", "c1", "c1", "c1", "c2"],
        "nao_start_sec": [3.0, 3.0, 3.0, 3.0, 1.0],
        "det_sec": [10 / 30, 40 / 30, 70 / 30, 85 / 30, 0.5],
    }).set_index("Frame_no")

    from transfusion_tpu.data.epic_nao import filter_nao_annotations

    # offset 0.25 drops frame 85 (det_diff ~0.167); closest-per-clip keeps
    # frame 70 for c1 (det_diff ~0.667) and frame 15 for c2.
    out = filter_nao_annotations(df, 0.25, take_double=False)
    assert sorted(out.index.tolist()) == [15, 70]
    # take_double adds the closest frame at least .35 s earlier: frame 40
    # (det_diff 1.667 > 0.667 + 0.35); frame 10 (2.667) loses to 40.
    out2 = filter_nao_annotations(df, 0.25, take_double=True)
    assert sorted(out2.index.tolist()) == [15, 40, 70]


def test_get_datasets_from_name():
    from transfusion_tpu.data.epic_nao import get_datasets_from_name

    assert get_datasets_from_name("epic_egtea") == ["epic", "egtea"]
    assert get_datasets_from_name("epic") == ["epic"]


def test_extract_label_ingest_train_round_trip(tmp_path):
    """The full loop: detector sweep CSV -> NAO labeling -> nao_*.pkl under
    the epic actor layout -> load_nao_dataset_frame -> SNaoDataset heatmap
    batch -> one snao train step on ResnetNao."""
    from PIL import Image

    from transfusion_tpu.tools.label_extraction import (
        extract_detections_for_video,
        label_video,
        nao_csv_path,
        read_detections_csv,
        write_detections_csv,
        detections_csv_path,
    )

    # --- synthetic epic-like tree: $DATA/EK/data/P01 with flat jpg frames.
    root = tmp_path / "EK"
    adir = root / "data" / "P01"
    adir.mkdir(parents=True)
    video = "P01_01"
    rng = np.random.default_rng(0)
    frame_ids = list(range(10, 200, 20))
    for f in frame_ids:
        img = np.full((120, 160, 3), 90, np.uint8)
        img[40:80, 60:120] = [200, 40, 40]  # the "cup"
        Image.fromarray(img).save(adir / f"{video}_{f:07d}.jpg")

    # --- extract: fake single-class detector (the real-detector sweep is
    # covered by tests/test_label_extraction.py).
    class_names = ["cup", "pan"]

    def detect_fn(images):
        return [
            (np.array([0]), np.array([0.9]), np.array([[60.0, 40.0, 120.0, 80.0]]))
            for _ in images
        ]

    def read_frame(f):
        return np.asarray(Image.open(adir / f"{video}_{f:07d}.jpg"))

    det_df = extract_detections_for_video(detect_fn, read_frame, frame_ids, class_names)
    det_path = detections_csv_path(adir, video)
    write_detections_csv(det_df, det_path)

    # --- label: match against the narration annotations.
    annots = _mk_annotations()
    # The soft-match dict schema: per-noun "default" label lists drive the
    # fallback matcher (nao_labeling.py:212-213 schema).
    soft = {
        "actions": {}, "no_matches": [],
        "cup": {"default": ["cup"]},
        "pan": {"default": ["pan"]},
        "fridge": {"default": ["fridge"]},
    }
    labels = label_video(read_detections_csv(det_path), annots, soft, version=1)
    assert len(labels) > 0
    out = nao_csv_path(adir, video, 1)
    labels.to_csv(out)
    labels.to_pickle(str(out)[: -len("csv")] + "pkl")

    # --- ingest: per-actor nao pkl -> filtered + merged sample frame.
    from transfusion_tpu.data.epic_nao import EpicNaoDataset, load_nao_dataset_frame

    frame = load_nao_dataset_frame(
        "epic", annotations=annots, data_root=root, actors=["P01"],
        offset_s=0.1, version=1,
    )
    assert len(frame) > 0
    assert set(frame["nao_clip_id"]) <= {"P01_01_1", "P01_01_2"}
    assert (frame["det_diff"] > 0.1).all()
    assert {"noun", "verb", "video", "actor", "Bboxes"} <= set(frame.columns)

    # --- dataset view: SNaoDataset wraps the epic base unchanged.
    from transfusion_tpu.data.labels import generated_label_mapping
    from transfusion_tpu.data.snao import SNaoDataset, snao_collate
    from transfusion_tpu.data.transforms import AugConfig

    nmap = generated_label_mapping(frame["noun"])
    vmap = generated_label_mapping(frame["verb"], "verb")
    base = EpicNaoDataset(
        annots=frame, dataset_name="epic", data_root=root,
        aug=AugConfig(resize_spec=((64,), (64,)), crop_spec=(1, 1), flip=False),
        noun_mapping=nmap, verb_mapping=vmap,
    )
    ds = SNaoDataset(base, heatmap_type="gaussian")
    gen = np.random.default_rng(1)
    batch = snao_collate([ds.get_example(i, gen, (64, 64), False) for i in range(len(ds))])
    assert batch["image"].shape[1:] == (64, 64, 3)
    assert batch["heatmap"].shape[1:] == (64, 64)
    assert batch["heatmap"].max() > 0  # the matched cup box painted mass
    assert batch["ttc"].min() > 0.1  # det_diff rides the ttc slot

    # --- one snao train step.
    import jax
    import jax.numpy as jnp
    import optax

    from transfusion_tpu.models.resnet_nao import ResnetNao, ResnetNaoConfig
    from transfusion_tpu.train.losses import hmap_criterion

    model = ResnetNao(ResnetNaoConfig(stage_sizes=(1, 1, 1, 1), heatmap_blocks=3,
                                      hmap_dropout=0.0))
    x = jnp.asarray(batch["image"])
    target = jnp.asarray(batch["heatmap"])
    crit = hmap_criterion({"mse": 1, "agg": "mean"}, 1)
    variables = model.init(jax.random.key(0), x)
    tx = optax.adam(1e-3)
    opt = tx.init(variables["params"])

    def loss_fn(p):
        out = model.apply({"params": p}, x)
        return crit(out["heatmap"], target, jnp.asarray(batch["fg_perc"]),
                    jnp.asarray(batch["bg_perc"]))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = optax.global_norm(grads)
    assert float(gnorm) > 0
    upd, opt = tx.update(grads, opt, variables["params"])
    stepped = optax.apply_updates(variables["params"], upd)
    moved = jax.tree.map(lambda a, b: not np.allclose(a, b), variables["params"], stepped)
    assert any(jax.tree.leaves(moved))
    # A small step along -grad reduces the loss (first-order check; a full
    # adam step at 1e-3 can overshoot on a random-init unnormalized trunk).
    tiny = jax.tree.map(lambda p, g: p - 1e-6 * g, variables["params"], grads)
    assert float(loss_fn(tiny)) < float(loss)
