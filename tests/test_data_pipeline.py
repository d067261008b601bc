"""Annotation pipeline, labels, splits, dataset, loader — end to end on the
synthetic fixture, finishing with a real train step on a tiny model."""

import numpy as np
import pytest

from tests.fixtures import make_synthetic_ego4d
from transfusion_tpu.data.annotations import load_sta_annotations
from transfusion_tpu.data.dataset import MAX_GT, EgoNaoDataset, build_narration_lookup, collate
from transfusion_tpu.data.labels import (
    balanced_class_weights,
    frequencies_to_array,
    generated_label_mapping,
    noun_verb_frequencies,
)
from transfusion_tpu.data.loader import DataLoader
from transfusion_tpu.data.splits import apply_split, load_split
from transfusion_tpu.data.tokenizer import hash_vocab_tokenizer
from transfusion_tpu.data.transforms import AugConfig


@pytest.fixture(scope="module")
def ego_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("ego4d")
    return make_synthetic_ego4d(root)


@pytest.fixture(scope="module")
def annots(ego_fixture):
    return load_sta_annotations(
        ego_fixture["root"],
        narr_structure="{external_0}; {external_1}",
        narr_external_paths=ego_fixture["externals"],
    )


def test_annotations_structure(annots):
    assert annots.index.is_unique
    assert set(annots["orig_split"]) == {"train", "val", "test"}
    row = annots[annots["orig_split"] == "train"].iloc[0]
    # Narration templated from both external files, "; "-joined.
    assert "; person acting" in row["narration"]
    # nao_narration is "verb noun [and ...]".
    assert row["nao_narration"].split(" ")[0].startswith("verb")
    # Underscore-suffixed category names truncated.
    assert all("_" not in n for n in row["all_nouns"])
    # det_sec = frame / fps.
    assert row["det_sec"] == pytest.approx(row["Frame_no"] / 30.0)
    # episode_action_id formatted clip_counter.
    assert "_" in row["episode_action_id"]


def test_label_mappings_and_weights(annots):
    train = annots[annots["orig_split"] == "train"]
    nmap = generated_label_mapping(train["all_nouns"].explode())
    vmap = generated_label_mapping(train["all_verbs"].explode())
    assert min(nmap.values()) == 1  # 0 reserved for bg

    w = balanced_class_weights(train["all_nouns"].explode(), nmap, dampen=0.2)
    assert w.shape == (max(nmap.values()) + 1,)
    assert np.all(w > 0)

    freqs = noun_verb_frequencies(train, nmap, vmap)
    arr = frequencies_to_array(freqs, len(nmap) + 1, len(vmap) + 1)
    assert arr.sum() > 0
    # Every (noun, verb) pair in the data is counted.
    row = train.iloc[0]
    assert arr[nmap[row["all_nouns"][0]], vmap[row["all_verbs"][0]]] >= 1


def test_split_and_dataset_batch(annots, ego_fixture):
    split = load_split(annots, {"subset": 0})
    train_df, val_df, test_df = apply_split(annots, split)
    assert len(train_df) >= 8 and len(val_df) >= 3 and len(test_df) >= 1

    nmap = generated_label_mapping(annots["all_nouns"].explode())
    vmap = generated_label_mapping(annots["all_verbs"].explode())
    aug = AugConfig(resize_spec=((96, 128), (128, 160)))
    lookup = build_narration_lookup(annots, "current")
    ds = EgoNaoDataset(
        annots=train_df, frames_dir=ego_fixture["frames_dir"],
        noun_mapping=nmap, verb_mapping=vmap, aug=aug,
        narration_lookup=lookup, uid_col="video_id",
    )
    assert ds.num_nouns == len(nmap) + 1
    assert ds.num_verbs == len(vmap) + 1

    rng = np.random.default_rng(0)
    ex = ds.get_example(0, rng, (96, 128), training=True)
    assert ex["image"].shape == (96, 128, 3)
    assert ex["boxes"].shape[1] == 4
    assert (ex["boxes"][:, [0, 2]] <= 128 + 1e-3).all()
    assert (ex["boxes"][:, [1, 3]] <= 96 + 1e-3).all()
    assert len(ex["narration"]) > 0

    tok = hash_vocab_tokenizer(max_length=24)
    batch = collate([ds.get_example(i, rng, (96, 128), True) for i in range(4)], tok, 24)
    assert batch["image"].shape == (4, 96, 128, 3)
    assert batch["targets"]["boxes"].shape == (4, MAX_GT, 4)
    assert batch["targets"]["valid"].any(axis=1).all()
    assert batch["input_ids"].shape == (4, 24)
    assert batch["orig_hw"].shape == (4, 2)


def test_prev_narration_lookup(annots):
    lookup = build_narration_lookup(annots, "prev_2", empty_prompt="nothing before")
    train = annots[annots["orig_split"] == "train"]
    # Earliest sample of a clip has no history -> empty prompt.
    ordered = train.sort_values(["clip_id", "start_frame"])
    first_uid = ordered.index[0]
    assert lookup[first_uid] == "nothing before"
    # A later sample in the same clip gets previous narrations, not its own.
    same_clip = ordered[ordered["clip_id"] == ordered.iloc[0]["clip_id"]]
    if len(same_clip) > 2:
        later_uid = same_clip.index[-1]
        assert lookup[later_uid] != ""
        assert annots.loc[later_uid, "narration"] not in lookup[later_uid].split(", ")[-1:]


def test_loader_and_train_step(annots, ego_fixture):
    """Full stack: loader batches -> tiny TransFusion train step."""
    import jax
    import jax.numpy as jnp

    from transfusion_tpu.models.detector import DetectorConfig
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig
    from transfusion_tpu.models.text_encoder import BertConfig
    from transfusion_tpu.models.transfusion import FusionConfig, TransFusion, TransFusionConfig
    from transfusion_tpu.train.optim import make_optimizer
    from transfusion_tpu.train.step import LossConfig, init_state, make_train_step

    split = load_split(annots, {"subset": 0})
    train_df, _, _ = apply_split(annots, split)
    nmap = generated_label_mapping(annots["all_nouns"].explode())
    vmap = generated_label_mapping(annots["all_verbs"].explode())
    aug = AugConfig(resize_spec=((64,), (64,)))
    ds = EgoNaoDataset(
        annots=train_df, frames_dir=ego_fixture["frames_dir"],
        noun_mapping=nmap, verb_mapping=vmap, aug=aug,
        narration_lookup=build_narration_lookup(annots, "current"), uid_col="video_id",
    )
    tok = hash_vocab_tokenizer(vocab_size=2000, max_length=16)
    loader = DataLoader(ds, batch_size=4, tokenizer=tok, training=True, num_workers=2,
                        lang_max_length=16)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b["image_hw"] == (64, 64)

    cfg = TransFusionConfig(
        detector=DetectorConfig(
            roi=RoIConfig(num_nouns=ds.num_nouns, num_verbs=ds.num_verbs,
                          representation_size=32, batch_size_per_image=8,
                          detections_per_img=4, ttc_on=True),
            rpn=RPNConfig(pre_nms_top_n_train=64, post_nms_top_n_train=32),
        ),
        fusion=FusionConfig(fpn_features=(3,), patch_h=(1,), patch_w=(1,),
                            num_layers=(1,), token_dim=16, num_heads=2),
        bert=BertConfig(vocab_size=2000, hidden_size=16, num_layers=1, num_heads=2,
                        intermediate_size=32, max_position_embeddings=16),
        out_mlp=16,
    )
    model = TransFusion(cfg)
    tx, _ = make_optimizer({"name": "radam", "lr": 1e-3}, None, 1)

    def to_model_batch(b):
        return {
            "image": jnp.asarray(b["image"]),
            "input_ids": jnp.asarray(b["input_ids"]),
            "attention_mask": jnp.asarray(b["attention_mask"]),
            "targets": {
                "boxes": jnp.asarray(b["targets"]["boxes"]),
                "nouns": jnp.asarray(b["targets"]["nouns"]),
                "verbs": jnp.asarray(b["targets"]["verbs"]),
                "ttcs": jnp.asarray(b["targets"]["ttcs"]),
                "valid": jnp.asarray(b["targets"]["valid"]),
            },
        }

    mb = to_model_batch(b)
    state = init_state(model, tx, dict(mb, image_hw=(64, 64)), jax.random.key(0))
    loss_cfg = LossConfig(ttc_on=True, rpn_batch_size_per_image=16,
                          last_noun_idx=ds.num_nouns - 1)
    step = make_train_step(model, tx, loss_cfg, jnp.ones(ds.num_nouns), jnp.ones(ds.num_verbs),
                           donate=False)
    state, metrics = step(state, mb, jax.random.key(1), jnp.asarray([1.0, 1, 1, 1, 1, 0]), (64, 64))
    assert np.isfinite(float(metrics["loss"]))


def test_pooled_video_narration_lookup():
    """strategy 'all': one pooled embedding per video, shared by its uids
    (all_embeddings_dsets.py:9-33)."""
    import pandas as pd

    from transfusion_tpu.data.dataset import pooled_video_narration_lookup

    annots = pd.DataFrame(
        {
            "video_uid": ["v1", "v1", "v2"],
            "narration": ["wash pan", "cut onion", "open drawer"],
        },
        index=["u1", "u2", "u3"],
    )
    embeds = {
        "wash pan": np.array([1.0, 0.0]),
        "cut onion": np.array([0.0, 1.0]),
        # "open drawer" missing -> v2 zero-fills
    }
    lk = pooled_video_narration_lookup(annots, embeds, pooling="mean")
    np.testing.assert_allclose(lk["u1"], [0.5, 0.5])
    np.testing.assert_allclose(lk["u2"], lk["u1"])
    np.testing.assert_allclose(lk["u3"], [0.0, 0.0])
    lk_max = pooled_video_narration_lookup(annots, embeds, pooling="max")
    np.testing.assert_allclose(lk_max["u1"], [1.0, 1.0])


def test_glove_narration_embedder(tmp_path):
    """Word-table narration variant (narration_embeddings.py:17-73): parse,
    L2-normalize, alias remap, max/mean pooling, unknown-word skip."""
    import numpy as np

    from transfusion_tpu.data.glove import GloveNarrationEmbedder, load_glove_table

    path = tmp_path / "glove.6B.4d.txt"
    path.write_text(
        "take 1 0 0 0\n"
        "zucchini 0 2 0 0\n"
        "pan 0 0 3 0\n"
    )
    table = load_glove_table(str(path), normalize=True)
    np.testing.assert_allclose(table["zucchini"], [0, 1, 0, 0])
    # alias remap (narration_embeddings.py:35)
    np.testing.assert_allclose(table["courgette"], table["zucchini"])

    emb = GloveNarrationEmbedder(str(path), size=4, pooling="max")
    # unknown word 'the' skipped; max pooling over the rest
    np.testing.assert_allclose(emb("take the courgette, pan"), [1, 1, 1, 0])
    mean = GloveNarrationEmbedder(str(path), size=4, pooling="mean")
    np.testing.assert_allclose(mean("take pan"), [0.5, 0, 0.5, 0])
    # all-unknown narration -> zeros of the table size
    np.testing.assert_allclose(emb("wibble wobble"), np.zeros(4))
    # cache returns identical object
    assert emb("take pan") is emb("take pan")


def test_merged_nao_dataset(annots, ego_fixture):
    """Multi-source concat with unified label mappings
    (snao_datasets.py:22-43): source tagging, union mappings, index routing."""
    from transfusion_tpu.data.dataset import MergedNaoDataset

    split = load_split(annots, {"subset": 0})
    train_df, val_df, _ = apply_split(annots, split)
    nmap = generated_label_mapping(annots["all_nouns"].explode())
    vmap = generated_label_mapping(annots["all_verbs"].explode())
    aug = AugConfig(resize_spec=((96, 128),))
    lookup = build_narration_lookup(annots, "current")
    mk = lambda df: EgoNaoDataset(
        annots=df, frames_dir=ego_fixture["frames_dir"],
        noun_mapping=nmap, verb_mapping=vmap, aug=aug,
        narration_lookup=lookup, uid_col="video_id",
    )
    a, b = mk(train_df), mk(val_df)
    merged = MergedNaoDataset({"srcA": a, "srcB": b})
    assert len(merged) == len(a) + len(b)
    # Source tags land in the concat annotations (snao_datasets.py:27-28).
    assert set(merged.annots["source"].unique()) == {"srcA", "srcB"}
    # Union mappings cover every label of both sources.
    assert set(merged.noun_mapping) >= set(
        annots.loc[train_df.index.union(val_df.index), "all_nouns"].explode()
    )
    # Routing: the first sample of source B is merged[len(a)].
    rng = np.random.default_rng(0)
    ex_b0 = merged.get_example(len(a), rng, (96, 128), training=False)
    direct = merged.datasets["srcB"].get_example(0, np.random.default_rng(0), (96, 128), False)
    assert ex_b0["id"] == direct["id"]
    np.testing.assert_array_equal(ex_b0["nouns"], direct["nouns"])
    assert merged.num_nouns == len(merged.noun_mapping) + 1


def test_process_pool_loader_matches_threads(annots, ego_fixture):
    """worker_type='process' (GIL-free decode for val_bs-224-class hosts)
    must produce batches identical to the thread pool: same seeds, same
    bucket draws, same collated tensors."""
    split = load_split(annots, {"subset": 0})
    train_df, _, _ = apply_split(annots, split)
    nmap = generated_label_mapping(annots["all_nouns"].explode())
    vmap = generated_label_mapping(annots["all_verbs"].explode())
    aug = AugConfig(resize_spec=((64,), (64,)))
    ds = EgoNaoDataset(
        annots=train_df, frames_dir=ego_fixture["frames_dir"],
        noun_mapping=nmap, verb_mapping=vmap, aug=aug,
        narration_lookup=build_narration_lookup(annots, "current"), uid_col="video_id",
    )
    tok = hash_vocab_tokenizer(vocab_size=2000, max_length=16)

    def batches(worker_type):
        loader = DataLoader(ds, batch_size=4, tokenizer=tok, training=True,
                            num_workers=2, lang_max_length=16, seed=11,
                            worker_type=worker_type)
        out = list(loader)
        loader.close()
        return out

    bt, bp = batches("thread"), batches("process")
    assert len(bt) == len(bp) > 0
    for a, b in zip(bt, bp):
        assert a["image_hw"] == b["image_hw"]
        for k in ("image", "input_ids", "attention_mask"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)
        np.testing.assert_array_equal(
            np.asarray(a["targets"]["boxes"]), np.asarray(b["targets"]["boxes"]))
