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
