"""Parity of core detection ops against independent numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests import oracles
from transfusion_tpu.ops import (
    BoxCoder,
    balanced_sample,
    batched_nms,
    box_iou,
    clip_boxes,
    match_proposals,
    nms,
    small_box_mask,
)


def random_boxes(rng, n, size=800.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 4, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_box_iou_parity(rng):
    a = random_boxes(rng, 37)
    b = random_boxes(rng, 53)
    ours = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, oracles.iou_matrix(a, b), rtol=1e-5, atol=1e-6)


def test_clip_and_small_boxes(rng):
    b = random_boxes(rng, 20, size=1200.0)
    ours = np.asarray(clip_boxes(jnp.asarray(b), 700, 900))
    ref = b.copy()
    ref[:, 0::2] = np.clip(ref[:, 0::2], 0, 900)
    ref[:, 1::2] = np.clip(ref[:, 1::2], 0, 700)
    np.testing.assert_allclose(ours, ref)

    mask = np.asarray(small_box_mask(jnp.asarray(ours), 40.0))
    expect = ((ours[:, 2] - ours[:, 0]) >= 40) & ((ours[:, 3] - ours[:, 1]) >= 40)
    np.testing.assert_array_equal(mask, expect)


@pytest.mark.parametrize("weights", [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)])
def test_box_coder_parity(rng, weights):
    props = random_boxes(rng, 64)
    gts = random_boxes(rng, 64)
    coder = BoxCoder(weights)

    enc = np.asarray(coder.encode(jnp.asarray(gts), jnp.asarray(props)))
    np.testing.assert_allclose(enc, oracles.encode_oracle(gts, props, weights), rtol=1e-3, atol=1e-4)

    deltas = rng.normal(0, 0.4, (64, 4)).astype(np.float32)
    dec = np.asarray(coder.decode(jnp.asarray(deltas), jnp.asarray(props)))
    np.testing.assert_allclose(dec, oracles.decode_oracle(deltas, props, weights), rtol=1e-4, atol=1e-3)

    # Round trip: decode(encode(gt, prop), prop) == gt.
    rt = np.asarray(coder.decode(jnp.asarray(enc), jnp.asarray(props)))
    np.testing.assert_allclose(rt, gts, rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("n,thresh", [(50, 0.5), (300, 0.7), (1000, 0.5), (130, 0.3)])
def test_nms_parity(rng, n, thresh):
    boxes = random_boxes(rng, n, size=400.0)  # small canvas -> many overlaps
    scores = rng.uniform(0, 1, n).astype(np.float32)
    keep_ref = oracles.greedy_nms(boxes, scores, thresh)

    max_keep = min(n, 100)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), thresh, max_keep)
    idx, valid = np.asarray(idx), np.asarray(valid)
    np.testing.assert_array_equal(idx[valid], keep_ref[: valid.sum()])
    assert valid.sum() == min(len(keep_ref), max_keep)


def test_nms_with_padding(rng):
    n, n_valid = 200, 77
    boxes = random_boxes(rng, n, size=300.0)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[:n_valid] = True
    keep_ref = oracles.greedy_nms(boxes[:n_valid], scores[:n_valid], 0.5)
    idx, v = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, 100)
    idx, v = np.asarray(idx), np.asarray(v)
    np.testing.assert_array_equal(idx[v], keep_ref[: v.sum()])


def test_batched_nms_parity(rng):
    n = 600
    boxes = random_boxes(rng, n, size=350.0)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    classes = rng.integers(0, 7, n)
    keep_ref = oracles.batched_greedy_nms(boxes, scores, classes, 0.5)
    idx, v = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes), jnp.ones(n, bool), 0.5, 200
    )
    idx, v = np.asarray(idx), np.asarray(v)
    np.testing.assert_array_equal(idx[v], keep_ref[: v.sum()])


def test_nms_early_exit_prefix(rng):
    """max_keep truncation must equal the prefix of the full keep list."""
    n = 800
    boxes = random_boxes(rng, n, size=250.0)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    keep_ref = oracles.greedy_nms(boxes, scores, 0.6)
    for max_keep in (5, 17, 64):
        idx, v = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.6, max_keep)
        np.testing.assert_array_equal(np.asarray(idx)[np.asarray(v)], keep_ref[: np.asarray(v).sum()])


def test_nms_batched_images(rng):
    """The natively-batched core handles a whole image batch at once."""
    from transfusion_tpu.ops.nms import nms_multi

    b = np.stack([random_boxes(rng, 120, size=300.0) for _ in range(4)])
    s = rng.uniform(0, 1, (4, 120)).astype(np.float32)
    v = np.ones((4, 120), bool)
    idx, valid = nms_multi(jnp.asarray(b), jnp.asarray(s), jnp.asarray(v), 0.5, 30)
    for i in range(4):
        ref = oracles.greedy_nms(b[i], s[i], 0.5)
        got_valid = np.asarray(valid[i])
        np.testing.assert_array_equal(np.asarray(idx[i])[got_valid], ref[: got_valid.sum()])


@pytest.mark.parametrize("allow_lq,high,low", [(False, 0.5, 0.5), (True, 0.7, 0.3)])
def test_matcher_parity(rng, allow_lq, high, low):
    gts = random_boxes(rng, 6, size=500.0)
    props = random_boxes(rng, 400, size=500.0)
    iou = oracles.iou_matrix(gts, props)
    ref = oracles.match_oracle(iou, high, low, allow_lq)
    ours = np.asarray(match_proposals(jnp.asarray(iou), jnp.ones(6, bool), high, low, allow_lq))
    np.testing.assert_array_equal(ours, ref)


def test_matcher_gt_padding(rng):
    """Padded (invalid) GT rows must never be matched."""
    gts = random_boxes(rng, 4, size=500.0)
    props = np.concatenate([gts + 1.0, random_boxes(rng, 50, size=500.0)])
    iou = oracles.iou_matrix(np.concatenate([gts, gts]), props)  # rows 4..7 padding
    gt_valid = np.array([True] * 4 + [False] * 4)
    out = np.asarray(match_proposals(jnp.asarray(iou), jnp.asarray(gt_valid), 0.5, 0.5, True))
    assert out.max() < 4


def test_balanced_sample_counts():
    labels = jnp.asarray(np.array([1] * 10 + [0] * 500 + [-1] * 20))
    valid = jnp.ones(530, bool)
    pos, neg = balanced_sample(jax.random.key(0), labels, valid, 128, 0.25)
    pos, neg = np.asarray(pos), np.asarray(neg)
    assert pos.sum() == 10  # fewer positives than the 32 budget
    assert neg.sum() == 118
    assert not np.any(pos & neg)
    assert not np.any(np.asarray(labels)[neg] != 0)

    # Saturated positives: budget caps at batch*frac.
    labels2 = jnp.asarray(np.array([1] * 100 + [0] * 100))
    pos2, neg2 = balanced_sample(jax.random.key(1), labels2, jnp.ones(200, bool), 128, 0.25)
    assert np.asarray(pos2).sum() == 32
    assert np.asarray(neg2).sum() == 96
