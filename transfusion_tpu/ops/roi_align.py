"""RoIAlign (aligned=True, adaptive sampling) + multiscale FPN assignment.

The reference monkeypatches torchvision so every roi_align call runs with
``aligned=True`` and ``sampling_ratio=0`` (detectron2 semantics,
``modeling/obj_detection/rcnn_factory.py:167-172``). Semantics implemented
here, exactly:

  * half-pixel alignment: roi coords are scaled then shifted by -0.5;
  * bilinear interpolation with torchvision's border handling (points more
    than one pixel outside contribute 0; points in (-1, 0) clamp to 0);
  * adaptive sampling: ``sampling_ratio=0`` takes ``ceil(bin_size)`` samples
    per bin axis **per RoI per axis**; a RoI with zero bins produces zeros
    (torchvision divides by ``max(grid_h * grid_w, 1)``). Fixed ratios > 0
    are also supported.

Two implementations share the per-RoI parameter math in
:func:`roi_sample_params`:

  * the XLA path below — masked per-sample gather, exact at any ratio. Used
    on CPU (tests, debug runs); its sample count scales with the worst-case
    adaptive ratio so it is not the TPU path.
  * the fused Pallas kernel (``ops/roi_align_pallas.py``) — the TPU path.
    Each RoI's feature window is DMA'd HBM->VMEM once and pooled with a
    single MXU matmul against a separable bilinear weight matrix, so the
    adaptive sampling ratio changes only the (cheap) weight construction,
    not bytes moved or FLOPs.

``multiscale_roi_align`` evaluates each RoI at the canonical FPN level
(torchvision LevelMapper: k0=4, scale 224) over a packed level pyramid.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def fpn_levels(rois: jnp.ndarray, num_levels: int = 4) -> jnp.ndarray:
    """Canonical FPN level index in [0, num_levels) per RoI (LevelMapper)."""
    area = jnp.clip(rois[:, 2] - rois[:, 0], 0) * jnp.clip(rois[:, 3] - rois[:, 1], 0)
    lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(area) / 224.0 + 1e-6))
    return (jnp.clip(lvl, 2, 2 + num_levels - 1) - 2).astype(jnp.int32)


def pack_pyramid(feats: dict[str, jnp.ndarray]):
    """Stack FPN levels vertically at a common width.

    feats: {"0".."3": [B, H_l, W_l, C]}. Returns (packed [B, sum(H_l), maxW, C],
    heights, widths, row_offsets) — the padding columns of narrower levels are
    never addressed because sample x-coords receive zero weight past each
    level's width.
    """
    keys = sorted([k for k in feats if k.isdigit()], key=int)
    shapes = [feats[k].shape[1:3] for k in keys]
    max_w = max(w for _, w in shapes)
    offsets = [0]
    for h, _ in shapes:
        offsets.append(offsets[-1] + h)
    packed = jnp.concatenate(
        [
            jnp.pad(feats[k], ((0, 0), (0, 0), (0, max_w - feats[k].shape[2]), (0, 0)))
            for k in keys
        ],
        axis=1,
    )
    return packed, shapes, offsets[:-1]


def roi_sample_params(
    rois: jnp.ndarray,
    shapes: list[tuple[int, int]],
    offsets: list[int],
    image_hw: tuple,
    output_size: int,
    sampling_ratio: int,
):
    """Per-RoI level assignment + adaptive sampling parameters.

    rois: [B, R, 4] image-space boxes. Returns a dict of [B, R] arrays:
    level-relative roi corner (y1, x1), bin sizes (bh, bw), per-axis sample
    counts (ry, rx int32, 0 allowed), 1/count, level dims (hl, wl f32) and
    the packed-pyramid row offset (off int32).
    """
    bsz, n = rois.shape[:2]
    heights = jnp.asarray([h for h, _ in shapes], jnp.float32)
    widths = jnp.asarray([w for _, w in shapes], jnp.float32)
    offs = jnp.asarray(offsets, jnp.int32)
    lvl = fpn_levels(rois.reshape(-1, 4), len(shapes)).reshape(bsz, n)
    scale = heights[lvl] / image_hw[0]
    x1 = rois[..., 0] * scale - 0.5
    y1 = rois[..., 1] * scale - 0.5
    x2 = rois[..., 2] * scale - 0.5
    y2 = rois[..., 3] * scale - 0.5
    bh = (y2 - y1) / output_size
    bw = (x2 - x1) / output_size
    if sampling_ratio > 0:
        ry = jnp.full((bsz, n), sampling_ratio, jnp.int32)
        rx = ry
    else:
        ry = jnp.ceil(bh).astype(jnp.int32)
        rx = jnp.ceil(bw).astype(jnp.int32)
    count_inv = 1.0 / jnp.maximum(ry * rx, 1).astype(jnp.float32)
    return {
        "lvl": lvl,
        "y1": y1,
        "x1": x1,
        "bh": bh,
        "bw": bw,
        "ry": ry,
        "rx": rx,
        "count_inv": count_inv,
        "hl": heights[lvl],
        "wl": widths[lvl],
        "off": offs[lvl],
    }


def max_adaptive_samples(shapes, output_size: int, sampling_ratio: int) -> int:
    """Static bound on the per-axis sample count for the masked XLA path."""
    if sampling_ratio > 0:
        return sampling_ratio
    biggest = max(max(h, w) for h, w in shapes)
    return max(1, math.ceil(biggest / output_size))


def _pooled_xla(packed, params, output_size: int, max_r: int):
    """Masked per-sample 2x2-slice gather over the packed pyramid.

    Exact adaptive semantics: samples beyond each RoI's (ry, rx) grid get
    zero weight and the bin sum divides by max(ry*rx, 1).
    """
    p = output_size
    bsz, n = params["bh"].shape
    c = packed.shape[-1]
    y1, x1, bh, bw = params["y1"], params["x1"], params["bh"], params["bw"]
    ryf = jnp.maximum(params["ry"].astype(jnp.float32), 1.0)
    rxf = jnp.maximum(params["rx"].astype(jnp.float32), 1.0)

    # Sample coordinates [B, R, P, MAXR]; samples with index >= r are masked.
    ar = jnp.arange(max_r, dtype=jnp.float32)
    pr = jnp.arange(p, dtype=jnp.float32)
    cy = pr[:, None] + (ar[None, :] + 0.5) / ryf[..., None, None]  # [B,R,P,MR]
    cx = pr[:, None] + (ar[None, :] + 0.5) / rxf[..., None, None]
    ys = y1[..., None, None] + bh[..., None, None] * cy
    xs = x1[..., None, None] + bw[..., None, None] * cx
    my = ar[None, None, None, :] < params["ry"][..., None, None].astype(jnp.float32)
    mx = ar[None, None, None, :] < params["rx"][..., None, None].astype(jnp.float32)

    # Bin-major grid [B, R, p, p, MR, MR]: the weighted reduction over the
    # sub-sample axes then contracts trailing dims in place (row-major
    # ordering forced XLA to materialize a layout copy here).
    grid_shape = (bsz, n, p, p, max_r, max_r)
    yy = jnp.broadcast_to(ys[:, :, :, None, :, None], grid_shape)
    xx = jnp.broadcast_to(xs[:, :, None, :, None, :], grid_shape)
    valid = jnp.broadcast_to(my[:, :, :, None, :, None], grid_shape) & jnp.broadcast_to(
        mx[:, :, None, :, None, :], grid_shape
    )

    h_l = params["hl"][..., None, None, None, None]
    w_l = params["wl"][..., None, None, None, None]
    valid &= (yy >= -1.0) & (yy <= h_l) & (xx >= -1.0) & (xx <= w_l)
    y = jnp.clip(yy, 0.0, h_l - 1)
    x = jnp.clip(xx, 0.0, w_l - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1i = jnp.minimum(y0 + 1, h_l - 1)
    x1i = jnp.minimum(x0 + 1, w_l - 1)
    ly = (y - y0).astype(packed.dtype)
    lx = (x - x0).astype(packed.dtype)
    hy = 1.0 - ly
    hx = 1.0 - lx

    # One gather of a contiguous [2, 2, C] slice per sample point, anchored
    # at (min(y0, h-2), min(x0, w-2)) so clamped edge points stay in range;
    # the four bilinear weights are re-binned onto the 2x2 slice.
    off = params["off"][..., None, None, None, None]
    sy = jnp.minimum(y0, h_l - 2).astype(jnp.int32)
    sx = jnp.minimum(x0, w_l - 2).astype(jnp.int32)
    sy = jnp.maximum(sy, 0) + off
    sx = jnp.maximum(sx, 0)

    dy0 = (y0.astype(jnp.int32) + off - sy).astype(packed.dtype)
    dy1 = (y1i.astype(jnp.int32) + off - sy).astype(packed.dtype)
    dx0 = (x0.astype(jnp.int32) - sx).astype(packed.dtype)
    dx1 = (x1i.astype(jnp.int32) - sx).astype(packed.dtype)

    def bin_weights(da, db, w):
        return (w * (1 - da) * (1 - db), w * (1 - da) * db, w * da * (1 - db), w * da * db)

    w00 = bin_weights(dy0, dx0, hy * hx)
    w01 = bin_weights(dy0, dx1, hy * lx)
    w10 = bin_weights(dy1, dx0, ly * hx)
    w11 = bin_weights(dy1, dx1, ly * lx)
    w2 = jnp.stack([sum(t[i] for t in (w00, w01, w10, w11)) for i in range(4)], axis=-1)
    w2 = jnp.where(valid[..., None], w2, 0.0)

    starts = jnp.stack([sy, sx], axis=-1).reshape(bsz, -1, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def gather_image(op, idx):
        return jax.lax.gather(
            op, idx, dnums, slice_sizes=(2, 2, c), mode=jax.lax.GatherScatterMode.CLIP
        )

    slices = jax.vmap(gather_image)(packed, starts)  # [B, N, 2, 2, C]
    slices = slices.reshape(*grid_shape, 4, c)
    val = (w2.astype(packed.dtype)[..., None] * slices).sum(axis=-2)
    val = val.sum(axis=(4, 5))  # [B, R, p, p, C]
    return val * params["count_inv"][..., None, None, None].astype(packed.dtype)


def roi_align(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 0,
) -> jnp.ndarray:
    """Aligned RoIAlign on one single-level image. feat [H, W, C], rois [R, 4]."""
    h, w = feat.shape[:2]
    # A one-level pyramid whose image height makes the level scale equal to
    # spatial_scale; fpn_levels clamps every RoI onto that single level.
    params = roi_sample_params(
        rois[None], [(h, w)], [0], (h / spatial_scale, w / spatial_scale),
        output_size, sampling_ratio,
    )
    max_r = max_adaptive_samples([(h, w)], output_size, sampling_ratio)
    return _pooled_xla(feat[None], params, output_size, max_r)[0]


@partial(
    jax.jit,
    static_argnames=(
        "output_size", "sampling_ratio", "impl", "bwd_acc", "tile", "dedup"
    ),
)
def multiscale_roi_align(
    feats: dict[str, jnp.ndarray],
    rois: jnp.ndarray,
    image_hw: tuple,
    output_size: int = 7,
    sampling_ratio: int = 0,
    impl: str | None = None,
    bwd_acc: str | None = None,
    tile: tuple[int, int] | None = None,
    dedup: bool | None = None,
) -> jnp.ndarray:
    """Batched multiscale RoIAlign over a packed FPN pyramid.

    feats: {"0".."3": [B, H_l, W_l, C]} (the 'pool' level is not pooled over,
    matching torchvision box_roi_pool featmap_names).
    rois: [B, R, 4] in image coordinates. Returns [B, R, P, P, C].

    impl: "pallas" (fused TPU kernel), "xla", or None = pallas on anything
    that is not the CPU backend. bwd_acc ("f32"/"out"/None=env) selects the
    Pallas backward's pyramid-grad accumulator dtype — static so differing
    values cannot collide in the jit cache.
    """
    if impl is None:
        import os

        impl = os.environ.get(
            "TRANSFUSION_ROIALIGN_IMPL",
            "xla" if jax.default_backend() == "cpu" else "pallas",
        )
    packed, shapes, offsets = pack_pyramid(feats)
    params = roi_sample_params(rois, shapes, offsets, image_hw, output_size, sampling_ratio)
    if impl == "pallas":
        from transfusion_tpu.ops.roi_align_pallas import fused_roi_align

        return fused_roi_align(packed, params, output_size, bwd_acc, tile, dedup)
    max_r = max_adaptive_samples(shapes, output_size, sampling_ratio)
    return _pooled_xla(packed, params, output_size, max_r)
