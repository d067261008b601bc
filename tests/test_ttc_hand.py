"""Transformer TTC head + hand-pose lookup."""

import pickle

import numpy as np
import jax
import jax.numpy as jnp

from transfusion_tpu.data.hand_pose import HandPoseLookup
from transfusion_tpu.models.ttc_head import TTCHeadConfig, TTCPredictionHead


def test_ttc_head_forward(rng):
    cfg = TTCHeadConfig(feat_dim=32, ff_dim=64, num_heads=4, num_layers=2,
                        num_steps=3, object_feat_dim=48)
    head = TTCPredictionHead(cfg)
    b = 5
    inputs = {
        "box_features": jnp.asarray(rng.normal(0, 1, (b, 48)).astype(np.float32)),
        "object_boxes": jnp.asarray(rng.uniform(0, 1, (b, 1, 4)).astype(np.float32)),
        "hand_boxes": jnp.asarray(rng.uniform(0, 1, (b, 6, 4)).astype(np.float32)),
        "hand_poses": jnp.asarray(rng.normal(0, 0.3, (b, 6, 63)).astype(np.float32)),
    }
    params = head.init(jax.random.key(0), inputs)["params"]
    out = head.apply({"params": params}, inputs)
    assert out.shape == (b,)
    assert bool((out >= 0).all())  # softplus
    # Token count: 1 cls + 1 obj feat + 4 obj coords + 24 hand coords + 6 poses.
    assert "layer_0" in params


def test_ttc_head_no_transformer(rng):
    cfg = TTCHeadConfig(feat_dim=16, num_layers=0, num_steps=2, object_feat_dim=8,
                        emb_steps_hand=50, emb_steps_object=50)
    head = TTCPredictionHead(cfg)
    inputs = {
        "box_features": jnp.asarray(rng.normal(0, 1, (2, 8)).astype(np.float32)),
        "object_boxes": jnp.asarray(rng.uniform(0, 1, (2, 1, 4)).astype(np.float32)),
        "hand_boxes": jnp.asarray(rng.uniform(0, 1, (2, 4, 4)).astype(np.float32)),
        "hand_poses": jnp.asarray(rng.normal(0, 0.3, (2, 4, 63)).astype(np.float32)),
    }
    params = head.init(jax.random.key(0), inputs)["params"]
    out = head.apply({"params": params}, inputs)
    assert out.shape == (2,)


def test_hand_pose_lookup(tmp_path, rng):
    record = {
        "image_width": 640,
        "image_height": 480,
        "hand_bbox_list": [{
            "left_hand": np.array([100.0, 50.0, 64.0, 32.0]),
            "right_hand": np.array([300.0, 200.0, 40.0, 40.0]),
        }],
        "pred_output_list": [{
            "left_hand": {"pred_joints_img": rng.normal(0, 50, (21, 3))},
            "right_hand": {},  # missing detection
        }],
    }
    cache = {"vid-1": {100: record, 95: record}}
    path = tmp_path / "hands.pkl"
    with open(path, "wb") as fp:
        pickle.dump(cache, fp)

    lk = HandPoseLookup(str(path), num_steps=3, step=5)
    boxes, poses = lk.get("vid-1", 100)
    assert boxes.shape == (6, 4) and poses.shape == (6, 63)
    # Left hand found at steps 0 (frame 100) and 1 (frame 95); step 2 (frame 90) missing.
    np.testing.assert_allclose(boxes[0], [100 / 640, 50 / 480, 164 / 640, 82 / 480], rtol=1e-6)
    assert np.allclose(boxes[2], 0)
    # Right hand empty dict -> all zeros.
    assert np.allclose(boxes[3:], 0) and np.allclose(poses[3:], 0)
    # Unknown video -> zeros.
    b2, p2 = lk.get("nope", 5)
    assert np.allclose(b2, 0) and np.allclose(p2, 0)


def _hand_model(num_nouns=6, num_verbs=4):
    from transfusion_tpu.models.detector import DetectorConfig
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig
    from transfusion_tpu.models.text_encoder import BertConfig
    from transfusion_tpu.models.transfusion import FusionConfig, TransFusion, TransFusionConfig

    head = TTCHeadConfig(feat_dim=32, ff_dim=32, num_heads=2, num_layers=1,
                         num_steps=2, object_feat_dim=32, max_len=256)
    cfg = TransFusionConfig(
        detector=DetectorConfig(
            roi=RoIConfig(num_nouns=num_nouns, num_verbs=num_verbs, representation_size=32,
                          batch_size_per_image=8, detections_per_img=4, ttc_on=True,
                          ttc_hand=True, additional_postprocessing=True),
            rpn=RPNConfig(pre_nms_top_n_train=64, post_nms_top_n_train=32),
        ),
        fusion=FusionConfig(fpn_features=(3,), patch_h=(1,), patch_w=(1,),
                            num_layers=(1,), token_dim=16, num_heads=2),
        bert=BertConfig(vocab_size=50, hidden_size=16, num_layers=1, num_heads=2,
                        intermediate_size=32, max_position_embeddings=16),
        out_mlp=16,
        ttc_hand=head,
        max_ttc_boxes=3,
    )
    return TransFusion(cfg), cfg


def _hand_batch(rng, bsz=2, with_targets=True, steps=2):
    batch = {
        "image": jnp.asarray(rng.normal(0, 1, (bsz, 64, 64, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 50, (bsz, 8)).astype(np.int32)),
        "attention_mask": jnp.ones((bsz, 8), jnp.int32),
        "hand_boxes": jnp.asarray(rng.uniform(0, 1, (bsz, 2 * steps, 4)).astype(np.float32)),
        "hand_poses": jnp.asarray(rng.normal(0, 0.3, (bsz, 2 * steps, 63)).astype(np.float32)),
    }
    if with_targets:
        batch["targets"] = {
            "boxes": jnp.asarray(np.tile([[10, 10, 40, 40]], (bsz, 1, 1)).astype(np.float32)),
            "nouns": jnp.full((bsz, 1), 2),
            "verbs": jnp.full((bsz, 1), 1),
            "ttcs": jnp.full((bsz, 1), 0.8, jnp.float32),
            "valid": jnp.ones((bsz, 1), bool),
        }
    return batch


def test_ttc_hand_eval_second_pass_changes_ttcs(rng):
    """Eval path: with ttc_hand_head the detection TTCs come from the
    transformer second pass — hand inputs change them, and MIN_TTC clamps
    (faster_rcnn_wrapper.py:219-263)."""
    from transfusion_tpu.train.step import make_eval_step

    model, cfg = _hand_model()
    batch = _hand_batch(rng, with_targets=True)
    params = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1), "dropout": jax.random.key(2)},
        dict(batch, image_hw=(64, 64)), True,
    )["params"]
    # No linear ttc layer exists under the transformer head.
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    joined = ["/".join(str(getattr(p, "key", p)) for p in path) for path, _ in flat]
    assert not any("ttc_pred_layer" in j for j in joined)
    assert any("ttc_hand_head" in j for j in joined)

    step = make_eval_step(model, cfg.detector)
    dets1 = step(params, {k: v for k, v in batch.items() if k != "targets"}, (64, 64))
    batch2 = dict(batch, hand_boxes=batch["hand_boxes"] * 0.3 + 0.1,
                  hand_poses=batch["hand_poses"] + 1.0)
    dets2 = step(params, {k: v for k, v in batch2.items() if k != "targets"}, (64, 64))

    v = np.asarray(dets1["valid"][:, :3]) & np.asarray(dets2["valid"][:, :3])
    assert v.any()
    t1 = np.asarray(dets1["ttcs"][:, :3])[v]
    t2 = np.asarray(dets2["ttcs"][:, :3])[v]
    assert not np.allclose(t1, t2, atol=1e-6)  # hand inputs reach the TTCs
    assert (t1 >= 0.251 - 1e-6).all()  # MIN_TTC clamp (additional postproc)


def test_ttc_hand_train_step_gradient_reaches_head(rng):
    """Train path: the second pass feeds the ttc criterion and grads reach
    the hand head's params (ego_nao_trainer.py:326-359)."""
    from transfusion_tpu.train.optim import make_optimizer
    from transfusion_tpu.train.step import LossConfig, criterion_weights, init_state, make_train_step

    model, cfg = _hand_model()
    batch = _hand_batch(rng, with_targets=True)
    tx, _ = make_optimizer({"name": "radam", "lr": 1e-2}, None, 10)
    state = init_state(model, tx, dict(batch, image_hw=(64, 64)), jax.random.key(0))
    loss_cfg = LossConfig(ttc_on=True, rpn_batch_size_per_image=16, last_noun_idx=5)
    step = make_train_step(model, tx, loss_cfg, jnp.ones(6), jnp.ones(4), donate=False)
    lw = jnp.asarray(criterion_weights({"bbox": 1, "obj_prop": 1, "noun": 1, "verb": 1, "ttc": 1}))

    head_before = {
        "/".join(str(getattr(p, "key", p)) for p in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]
        if "ttc_hand_head" in "/".join(str(getattr(p, "key", p)) for p in path)
    }
    assert head_before
    state, metrics = step(state, batch, jax.random.key(3), lw, (64, 64))
    assert np.isfinite(float(metrics["loss"])) and np.isfinite(float(metrics["ttc_loss"]))
    changed = False
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        j = "/".join(str(getattr(p, "key", p)) for p in path)
        if "ttc_hand_head" in j and not np.allclose(np.asarray(leaf), head_before[j]):
            changed = True
            break
    assert changed, "no gradient reached the transformer TTC head"
