"""RoIAlign (aligned=True) + multiscale FPN assignment, pure XLA.

The reference monkeypatches torchvision so every roi_align call runs with
``aligned=True`` and ``sampling_ratio=0`` (detectron2 semantics,
``modeling/obj_detection/rcnn_factory.py:167-172``). On TPU we implement the
same bilinear math as a batched gather:

  * half-pixel alignment: roi coords are scaled then shifted by -0.5;
  * bilinear interpolation with torchvision's border handling (points more
    than one pixel outside contribute 0; points in (-1, 0) clamp to 0);
  * sampling ratio: the reference's adaptive ``ceil(bin/out)`` is 1 or 2 for
    FPN-assigned RoIs (canonical mapping puts bin sizes in [0.5, 2] feature
    cells), so we fix ratio=2 — a static superset grid; for bins where the
    adaptive rule would pick 1 sample this takes 4 closely-spaced samples
    instead, a sub-1e-2 numerical deviation flagged for the Pallas kernel.

``multiscale_roi_align`` evaluates each FPN level for all RoIs and selects by
the canonical level formula (torchvision LevelMapper: k0=4, scale 224).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample feat [H, W, C] at float coords ys/xs [..., S] -> [..., S, C]."""
    h, w, _ = feat.shape
    outside = (ys < -1.0) | (ys > h) | (xs < -1.0) | (xs > w)
    y = jnp.clip(ys, 0.0, h - 1)
    x = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = y - y0
    lx = x - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    flat = feat.reshape(h * w, -1)

    def take(yy, xx):
        return flat[yy * w + xx]

    val = (
        take(y0, x0) * (hy * hx)[..., None]
        + take(y0, x1) * (hy * lx)[..., None]
        + take(y1, x0) * (ly * hx)[..., None]
        + take(y1, x1) * (ly * lx)[..., None]
    )
    return jnp.where(outside[..., None], 0.0, val)


def roi_align(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Aligned RoIAlign on one image. feat [H, W, C], rois [R, 4] -> [R, P, P, C]."""
    p, r = output_size, sampling_ratio
    x1 = rois[:, 0] * spatial_scale - 0.5
    y1 = rois[:, 1] * spatial_scale - 0.5
    x2 = rois[:, 2] * spatial_scale - 0.5
    y2 = rois[:, 3] * spatial_scale - 0.5
    bin_w = (x2 - x1) / p
    bin_h = (y2 - y1) / p

    # Sample grid offsets within the roi, shape [P*r] per axis.
    cell = (jnp.arange(p)[:, None] + (jnp.arange(r)[None, :] + 0.5) / r).reshape(-1)
    ys = y1[:, None] + bin_h[:, None] * cell[None, :]  # [R, P*r]
    xs = x1[:, None] + bin_w[:, None] * cell[None, :]

    # Full grid [R, P*r, P*r] -> flat [R, S].
    yy = jnp.broadcast_to(ys[:, :, None], (rois.shape[0], p * r, p * r))
    xx = jnp.broadcast_to(xs[:, None, :], (rois.shape[0], p * r, p * r))
    vals = _bilinear_gather(feat, yy.reshape(rois.shape[0], -1), xx.reshape(rois.shape[0], -1))
    c = vals.shape[-1]
    vals = vals.reshape(rois.shape[0], p, r, p, r, c)
    return vals.mean(axis=(2, 4))


def fpn_levels(rois: jnp.ndarray, num_levels: int = 4) -> jnp.ndarray:
    """Canonical FPN level index in [0, num_levels) per RoI (LevelMapper)."""
    area = jnp.clip(rois[:, 2] - rois[:, 0], 0) * jnp.clip(rois[:, 3] - rois[:, 1], 0)
    lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(area) / 224.0 + 1e-6))
    return (jnp.clip(lvl, 2, 2 + num_levels - 1) - 2).astype(jnp.int32)


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "chunk"))
def multiscale_roi_align(
    feats: dict[str, jnp.ndarray],
    rois: jnp.ndarray,
    image_hw: tuple,
    output_size: int = 7,
    sampling_ratio: int = 2,
    chunk: int | None = None,
) -> jnp.ndarray:
    """Batched multiscale RoIAlign.

    feats: {"0".."3": [B, H_l, W_l, C]} (the 'pool' level is not pooled over,
    matching torchvision box_roi_pool featmap_names).
    rois: [B, R, 4] in image coordinates. Returns [B, R, P, P, C].

    Each level is evaluated for every RoI and the canonical level selected by
    mask — 4x gather cost for zero dynamic shapes; the Pallas kernel will
    specialize this later.
    """
    keys = sorted([k for k in feats if k.isdigit()], key=int)

    def per_image(feats_i, rois_i):
        lvl = fpn_levels(rois_i, len(keys))

        def run(rois_chunk, lvl_chunk):
            acc = None
            for i, k in enumerate(keys):
                scale = feats_i[k].shape[0] / image_hw[0]
                out = roi_align(feats_i[k], rois_chunk, scale, output_size, sampling_ratio)
                sel = (lvl_chunk == i)[:, None, None, None]
                acc = jnp.where(sel, out, 0.0 if acc is None else acc)
            return acc

        if chunk is None or rois_i.shape[0] <= chunk:
            return run(rois_i, lvl)
        n = rois_i.shape[0]
        pad = (-n) % chunk
        rp = jnp.pad(rois_i, ((0, pad), (0, 0)))
        lp = jnp.pad(lvl, (0, pad))
        rp = rp.reshape(-1, chunk, 4)
        lp = lp.reshape(-1, chunk)
        out = jax.lax.map(lambda args: run(*args), (rp, lp))
        return out.reshape(-1, *out.shape[2:])[:n]

    return jax.vmap(per_image)(feats, rois)
