"""Fused multiscale RoIAlign as a Pallas TPU kernel.

Replaces the per-sample gather formulation (the profiled wall of the eval
step: a TPU random-access gather running at ~10% of HBM peak) with a
DMA + matmul pipeline built on one observation: aligned bilinear RoIAlign
with per-bin sample averaging is *separable* —

    pooled[p, q, c] = (1/count) * sum_{h,w} Wy[p, h] * Wx[q, w] * feat[h, w, c]

where ``Wy[p, h] = sum_iy tent(clip(y_sample(p, iy)) - h)`` is a small dense
weight matrix depending only on the RoI's coordinates. detectron2's adaptive
``ceil(bin_size)`` sampling (``rcnn_factory.py:167-172``: sampling_ratio=0)
therefore changes only the weight construction — a few hundred VPU ops —
while bytes moved and MXU FLOPs stay fixed per RoI.

Per grid step the kernel DMAs a TY x TX x C window per RoI from the
packed FPN pyramid (HBM) into VMEM (tile-0 windows for the whole RoI block
are prefetched up front so DMA overlaps compute), builds the combined weight
matrix W2[p*8+q, h*TX+w] with two small MXU expansions (no cross-lane
relayouts), and pools with a single [64, TY*TX] x [TY*TX, C] matmul.
RoIs larger than one window (realistic RPN proposals regularly span 2x1/2x2
windows at their assigned level; level assignment is by area, span by
extent) accumulate over a dynamic grid of window tiles, double-buffered
through two spare VMEM slots so each extra tile costs max(DMA, compute)
rather than a serialized start->wait chain — exact for any RoI shape.

The backward pass (custom VJP; linear in features, so no residual feature
read) scatters ``W2^T @ g`` windows back into the pyramid with sequential
read-modify-write DMA — grid steps execute in order on a TPU core, making
the accumulation race-free.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Window tile edges (rows x cols). The kernel is DMA-bound at eval RoI counts
# (a TY x TX x C bf16 window per RoI tile). The canonical FPN level mapping
# sizes RoIs to ~14-28 px at their assigned level, so TILE=16 halves average
# bytes moved — but measured end-to-end symmetric 16 LOSES even with the
# double-buffered extra-tile pipeline (85.4 vs 87.1 f/s calibrated eval):
# most RoIs become 2x2-tile and the 4x per-tile weight builds + matmuls
# outweigh the byte savings. 32x32 covers typical RoIs in the one prefetched
# window. TRANSFUSION_ROIALIGN_TILE accepts "N" (symmetric) or "TYxTX"
# (asymmetric, e.g. "32x16": at most 2x tiles for wide RoIs while halving
# bytes for narrow ones). TX must be a multiple of 8 (the packed pyramid's
# W axis is the sublane-tiled dim); power-of-two edges only — 24 fails the
# CPU-interpret parity test (non-power-of-two tiles interact with the
# 8-aligned window origins).
_CHUNK = 8  # samples evaluated per weight-build loop iteration


def _tile_env() -> tuple[int, int]:
    import os

    raw = os.environ.get("TRANSFUSION_ROIALIGN_TILE", "32").lower()
    ty, _, tx = raw.partition("x")
    return int(ty), int(tx or ty)


class _Spec(NamedTuple):
    p: int        # pooled output size (7)
    p_pad: int    # p rounded up to 8 sublanes
    c: int        # padded channel count
    blk: int      # RoIs per grid step
    h_tot: int    # packed pyramid rows (padded >= ty)
    w_tot: int    # packed pyramid cols (padded >= tx)
    bsz: int
    dtype: str    # packed pyramid dtype name
    interpret: bool
    bwd_acc: str = "float32"  # backward pyramid-grad accumulator dtype
    ty: int = 32  # window tile rows
    tx: int = 32  # window tile cols (multiple of 8)
    batched_w: bool = True  # batch the tile-0 weight build across the block


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _axis_weights(spec: _Spec, origin_rel, a1, bin_sz, r_cnt, lim, dup, tile):
    """Summed tent weights of all bin samples onto `tile` consecutive cells.

    origin_rel: level-relative coordinate of the window's first cell (f32).
    a1/bin_sz: RoI start / bin size along this axis; r_cnt: samples per bin
    (int32, 0 => no samples); lim: level extent (f32); dup: number of leading
    window cells already covered by the previous tile (int32 — nonzero only
    when the window origin was clamped at the packed-pyramid edge; their
    weights are zeroed so tile coverage stays disjoint). Returns
    [p_pad, tile] f32, **unnormalized** (caller divides by the sample count).
    """
    p_pad = spec.p_pad
    # Mosaic's tpu.iota is integer-only: emit int32 iotas and convert.
    rows = origin_rel + jax.lax.broadcasted_iota(jnp.int32, (1, 1, tile), 2).astype(jnp.float32)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (p_pad, _CHUNK, 1), 0).astype(jnp.float32)
    i_iota = jax.lax.broadcasted_iota(jnp.int32, (p_pad, _CHUNK, 1), 1).astype(jnp.float32)
    r_f = jnp.maximum(r_cnt.astype(jnp.float32), 1.0)
    n_chunks = pl.cdiv(r_cnt, _CHUNK)

    def body(ci, acc):
        idx = ci.astype(jnp.float32) * _CHUNK + i_iota
        y = a1 + bin_sz * (p_iota + (idx + 0.5) / r_f)
        ok = (
            (idx < r_cnt.astype(jnp.float32))
            & (p_iota < spec.p)
            & (y >= -1.0)
            & (y <= lim)
        )
        yc = jnp.clip(y, 0.0, lim - 1.0)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(yc - rows))  # [p_pad, CHUNK, tile]
        return acc + jnp.where(ok, w, 0.0).sum(axis=1)

    init = jnp.zeros((p_pad, tile), jnp.float32)
    acc = jax.lax.fori_loop(0, n_chunks, body, init)
    cell = jax.lax.broadcasted_iota(jnp.int32, (p_pad, tile), 1)
    return jnp.where(cell >= dup, acc, 0.0)


def _axis_weights_all(spec: _Spec, origin_rel, a1, bin_sz, r_cnt, lim, dup, tile, max_chunks):
    """Batched :func:`_axis_weights` over the whole RoI block (tile 0 only).

    All RoI arguments are [blk, 1, 1, 1] f32 (int-valued ones exact in f32);
    max_chunks is the block-max chunk count (scalar, from SMEM). One
    vectorized VPU pass replaces blk unrolled per-RoI tent builds — the
    weight build measured 1.7 ms of the 16.6 ms standalone kernel call at
    bench shapes (scripts/probe_roialign.py). Returns [blk, p_pad, tile].
    """
    blk, p_pad = spec.blk, spec.p_pad
    rows = origin_rel + jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 1, tile), 3
    ).astype(jnp.float32)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (1, p_pad, _CHUNK, 1), 1).astype(jnp.float32)
    i_iota = jax.lax.broadcasted_iota(jnp.int32, (1, p_pad, _CHUNK, 1), 2).astype(jnp.float32)
    r_f = jnp.maximum(r_cnt, 1.0)

    def body(ci, acc):
        idx = ci.astype(jnp.float32) * _CHUNK + i_iota
        y = a1 + bin_sz * (p_iota + (idx + 0.5) / r_f)  # [blk, p_pad, CHUNK, 1]
        ok = (idx < r_cnt) & (p_iota < spec.p) & (y >= -1.0) & (y <= lim)
        yc = jnp.clip(y, 0.0, lim - 1.0)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(yc - rows))  # [blk, p_pad, CHUNK, tile]
        return acc + jnp.where(ok, w, 0.0).sum(axis=2)

    init = jnp.zeros((blk, p_pad, tile), jnp.float32)
    acc = jax.lax.fori_loop(0, max_chunks, body, init)
    cell = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tile), 2).astype(jnp.float32)
    return jnp.where(cell >= dup[:, :, 0], acc, 0.0)


def _expanders(p_pad: int, ty: int, tx: int):
    """Expansion matrices lifting Wy/Wx [p_pad, ty|tx] onto the combined
    layout W2[m = p*p_pad + q, n = h*tx + w] via MXU matmuls (avoids
    cross-lane relayouts from repeat/reshape). Generated with iota compares
    in-kernel (Pallas kernels cannot close over array constants)."""

    def sel(rows, cols, pred):
        i = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        return pred(i, j).astype(jnp.float32)

    p2, t2 = p_pad * p_pad, ty * tx
    e_p = sel(p2, p_pad, lambda i, j: i // p_pad == j)  # [m, p]
    t_q = sel(p2, p_pad, lambda i, j: i % p_pad == j)   # [m, q]
    r_h = sel(ty, t2, lambda i, j: j // tx == i)        # [h, n]
    t_w = sel(tx, t2, lambda i, j: j % tx == i)         # [w, n]
    return e_p, t_q, r_h, t_w


def _expanders_t(p_pad: int, ty: int, tx: int):
    """Transposed-orientation selectors for the backward kernel."""

    def sel(rows, cols, pred):
        i = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        return pred(i, j).astype(jnp.float32)

    p2, t2 = p_pad * p_pad, ty * tx
    e_p = sel(p_pad, p2, lambda i, j: j // p_pad == i)  # [p, m]
    t_q = sel(p_pad, p2, lambda i, j: j % p_pad == i)   # [q, m]
    r_h = sel(t2, ty, lambda i, j: i // tx == j)        # [n, h]
    t_w = sel(t2, tx, lambda i, j: i % tx == j)         # [n, w]
    return e_p, t_q, r_h, t_w


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _combined_weights(spec: _Spec, scal, origin, transposed: bool):
    """W2 [p_pad^2, ty*tx] (or its transpose) for one (RoI, window tile)."""
    gy, gx, dy, dx = origin
    (_, _, _, _, ry, rx, off, y1, x1, bh, bw, hl, wl, _) = scal
    wy = _axis_weights(spec, (gy - off).astype(jnp.float32), y1, bh, ry, hl, dy, spec.ty)
    wx = _axis_weights(spec, gx.astype(jnp.float32), x1, bw, rx, wl, dx, spec.tx)
    return _combine(spec, wy, wx, transposed)


def _combine(spec: _Spec, wy, wx, transposed: bool):
    """Lift per-axis weights [p_pad, ty|tx] into the combined W2 matrix."""
    if transposed:
        e_p, t_q, r_h, t_w = _expanders_t(spec.p_pad, spec.ty, spec.tx)
        w2y = _mm(r_h, _mm(wy.T, e_p))  # [ty*tx, p_pad^2]
        w2x = _mm(t_w, _mm(wx.T, t_q))
    else:
        e_p, t_q, r_h, t_w = _expanders(spec.p_pad, spec.ty, spec.tx)
        w2y = _mm(e_p, _mm(wy, r_h))    # [p_pad^2, ty*tx]
        w2x = _mm(t_q, _mm(wx, t_w))
    return w2y * w2x


def _read_scalars(ints_ref, floats_ref, j):
    return (
        ints_ref[0, j, 0],  # sy (absolute packed row of the RoI's first tile)
        ints_ref[0, j, 1],  # sx
        ints_ref[0, j, 2],  # nty
        ints_ref[0, j, 3],  # ntx
        ints_ref[0, j, 4],  # ry
        ints_ref[0, j, 5],  # rx
        ints_ref[0, j, 6],  # off (packed row offset of the RoI's level)
        floats_ref[0, j, 0],  # y1 (level-relative)
        floats_ref[0, j, 1],  # x1
        floats_ref[0, j, 2],  # bh
        floats_ref[0, j, 3],  # bw
        floats_ref[0, j, 4],  # hl
        floats_ref[0, j, 5],  # wl
        floats_ref[0, j, 6],  # 1 / max(ry * rx, 1)
    )


def _read_src_slot(ints_ref, j):
    """Within-block index of the first RoI sharing this RoI's tile-0 window
    origin (== j when the RoI owns its own DMA; column 7 is 'j mod blk' when
    dedup is off)."""
    return ints_ref[0, j, 7]


def _tile_origin(spec: _Spec, scal, t):
    """Clamped window origin (gy, gx) plus per-axis duplicate-cell counts.

    Clamping at the packed-pyramid edge shifts a tile's window backwards over
    cells the previous tile already covered; (dy, dx) count those leading
    cells so the weight build can zero them (disjoint coverage — without the
    mask a clamped multi-tile RoI double-counts the overlap)."""
    sy, sx, ntx = scal[0], scal[1], scal[3]
    tyi = t // ntx
    txi = t - tyi * ntx
    uy = sy + tyi * spec.ty
    ux = sx + txi * spec.tx
    gy = jnp.minimum(uy, spec.h_tot - spec.ty)
    gx = jnp.minimum(ux, spec.w_tot - spec.tx)
    # The packed pyramid's W axis is the sublane-tiled dim (8); sx is
    # host-aligned to 8, tx and w_tot are multiples of 8, so gx provably is
    # too — Mosaic needs the annotation to accept the dynamic memref slice.
    return gy, pl.multiple_of(gx, 8), uy - gy, ux - gx


def _fwd_kernel(ints_ref, floats_ref, vec_ref, packed_ref, out_ref, win_ref, sem_ref, *, spec: _Spec):
    b = pl.program_id(0)
    blk, c, p = spec.blk, spec.c, spec.p
    dt = packed_ref.dtype

    def window_dma(slot, origin):
        return pltpu.make_async_copy(
            packed_ref.at[b, pl.ds(origin[0], spec.ty), pl.ds(origin[1], spec.tx)],
            win_ref.at[slot],
            sem_ref.at[slot],
        )

    scals = [_read_scalars(ints_ref, floats_ref, j) for j in range(blk)]
    origins = [_tile_origin(spec, s, jnp.int32(0)) for s in scals]
    srcs = [_read_src_slot(ints_ref, j) for j in range(blk)]
    # Prefetch every owned first window up-front: the DMA engine streams them
    # while earlier RoIs compute. RoIs whose tile-0 origin matches an earlier
    # RoI in the block (host-sorted by origin when dedup is on) skip the DMA
    # and pool from the owner's slot instead — clustered proposals share
    # 8-aligned window origins, so this collapses duplicate window traffic.
    for j in range(blk):
        @pl.when(srcs[j] == j)
        def _start_owned():
            window_dma(j, origins[j]).start()

    def contribution(slot, w2):
        win2 = win_ref[slot].reshape(spec.ty * spec.tx, c)
        return _mm(w2.astype(dt), win2)  # [p_pad^2, C] f32

    if spec.batched_w:
        # One vectorized tent build for every RoI's tile-0 weights (the
        # unrolled per-RoI builds cost 1.7 ms of the 16.6 ms standalone call
        # at bench shapes — scripts/probe_roialign.py). Extra tiles of
        # multi-tile RoIs (rare) keep the per-RoI path below.
        v = vec_ref[0]  # [blk, 12] f32: sy sx ry rx off y1 x1 bh bw hl wl -
        col = lambda k: v[:, k : k + 1].reshape(blk, 1, 1, 1)  # noqa: E731
        sy_v, sx_v = col(0), col(1)
        gy_v = jnp.minimum(sy_v, float(spec.h_tot - spec.ty))
        gx_v = jnp.minimum(sx_v, float(spec.w_tot - spec.tx))
        mc_y = jnp.int32(0)
        mc_x = jnp.int32(0)
        for j in range(blk):
            mc_y = jnp.maximum(mc_y, pl.cdiv(ints_ref[0, j, 4], _CHUNK))
            mc_x = jnp.maximum(mc_x, pl.cdiv(ints_ref[0, j, 5], _CHUNK))
        wy_all = _axis_weights_all(
            spec, gy_v - col(4), col(5), col(7), col(2), col(9), sy_v - gy_v,
            spec.ty, mc_y,
        )
        wx_all = _axis_weights_all(
            spec, gx_v, col(6), col(8), col(3), col(10), sx_v - gx_v,
            spec.tx, mc_x,
        )
        w2_tile0 = [_combine(spec, wy_all[j], wx_all[j], False) for j in range(blk)]
    else:
        w2_tile0 = None

    # Two spare buffers double-buffer the multi-tile path: realistic RPN
    # proposals regularly span 2x1/2x2 windows at their assigned level (with
    # random-init proposals they almost never do — which is why this path
    # only shows up when profiling CALIBRATED weights: 18.2 vs 7.6 ms/step
    # at eval B8). Tile t+1's DMA is issued before tile t's weight build and
    # matmul, so the extra-tile chain costs max(DMA, compute) per tile
    # instead of their sum. Slot reuse is race-free: compute is in-order
    # within the kernel, so when iteration t+1 starts the DMA for tile t+2
    # into slot(t), iteration t's matmul over slot(t) has already executed.
    slot = lambda t: blk + (t % 2)  # noqa: E731
    for j in range(blk):
        scal = scals[j]
        nty, ntx, cinv = scal[2], scal[3], scal[13]
        n_tiles = nty * ntx

        @pl.when(n_tiles > 1)
        def _start_first_extra():
            window_dma(slot(1), _tile_origin(spec, scal, jnp.int32(1))).start()

        @pl.when(srcs[j] == j)
        def _wait_owned():
            window_dma(j, origins[j]).wait()

        # Shared slots are safe without a wait: compute is in-order, so the
        # owner's wait at its own iteration already completed.
        w2_0 = (
            w2_tile0[j]
            if w2_tile0 is not None
            else _combined_weights(spec, scal, origins[j], False)
        )
        acc = contribution(srcs[j], w2_0)

        def extra_tile(t, acc):
            @pl.when(t + 1 < n_tiles)
            def _start_next():
                window_dma(slot(t + 1), _tile_origin(spec, scal, t + 1)).start()

            org = _tile_origin(spec, scal, t)
            w2 = _combined_weights(spec, scal, org, False)
            window_dma(slot(t), org).wait()
            return acc + contribution(slot(t), w2)

        acc = jax.lax.fori_loop(1, n_tiles, extra_tile, acc)
        pooled = (acc * cinv).reshape(spec.p_pad, spec.p_pad, c)
        out_ref[0, j] = pooled[:p, :p].astype(out_ref.dtype)


def _bwd_kernel(ints_ref, floats_ref, g_ref, zeros_ref, grad_ref, win_ref, sem_ref, *, spec: _Spec):
    """Accumulates W2^T @ g windows into grad_ref with sequential RMW DMA.

    zeros_ref is the aliased zero-initialized output buffer (unused as an
    input value; the alias provides the initialization).
    """
    del zeros_ref
    b = pl.program_id(0)
    blk, c, p, p_pad = spec.blk, spec.c, spec.p, spec.p_pad

    for j in range(blk):
        scal = _read_scalars(ints_ref, floats_ref, j)
        nty, ntx, cinv = scal[2], scal[3], scal[13]
        g = g_ref[0, j].astype(jnp.float32) * cinv  # [p, p, C]
        g2 = jnp.pad(g, ((0, p_pad - p), (0, p_pad - p), (0, 0))).reshape(
            p_pad * p_pad, c
        )

        def rmw_tile(t, _):
            org = _tile_origin(spec, scal, t)
            gy, gx = org[:2]
            w2t = _combined_weights(spec, scal, org, True)  # [ty*tx, p_pad^2]
            gwin = _mm(w2t, g2).reshape(spec.ty, spec.tx, c)  # f32
            region = grad_ref.at[b, pl.ds(gy, spec.ty), pl.ds(gx, spec.tx)]
            read = pltpu.make_async_copy(region, win_ref, sem_ref)
            read.start()
            read.wait()
            # Accumulate in f32 on the VPU; the store rounds to the
            # accumulator dtype (bf16 under bwd_acc="out" — one rounding per
            # overlapping RoI tile, bounded by the downstream bf16 cast the
            # f32 path applies anyway).
            win_ref[...] = (win_ref[...].astype(jnp.float32) + gwin).astype(
                win_ref.dtype
            )
            write = pltpu.make_async_copy(win_ref, region, sem_ref)
            write.start()
            write.wait()
            return 0

        jax.lax.fori_loop(0, nty * ntx, rmw_tile, 0)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(spec: _Spec, packed, ints, floats, vec):
    return _fused_fwd(spec, packed, ints, floats, vec)[0]


def _fused_fwd(spec: _Spec, packed, ints, floats, vec):
    bsz, r = ints.shape[:2]
    grid = (bsz, r // spec.blk)
    smem_block = lambda width: pl.BlockSpec(  # noqa: E731
        (1, spec.blk, width), lambda b, rb: (b, rb, 0), memory_space=pltpu.SMEM
    )
    out = pl.pallas_call(
        partial(_fwd_kernel, spec=spec),
        grid=grid,
        in_specs=[
            smem_block(ints.shape[-1]),
            smem_block(floats.shape[-1]),
            pl.BlockSpec(
                (1, spec.blk, vec.shape[-1]),
                lambda b, rb: (b, rb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, spec.blk, spec.p, spec.p, spec.c),
            lambda b, rb: (b, rb, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, r, spec.p, spec.p, spec.c), packed.dtype),
        scratch_shapes=[
            pltpu.VMEM((spec.blk + 2, spec.ty, spec.tx, spec.c), packed.dtype),
            pltpu.SemaphoreType.DMA((spec.blk + 2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=spec.interpret,
    )(ints, floats, vec, packed)
    return out, (ints, floats, vec)


def _fused_bwd(spec: _Spec, res, g):
    ints, floats, vec = res
    bsz, r = ints.shape[:2]
    packed_shape = (spec.bsz, spec.h_tot, spec.w_tot, spec.c)
    grid = (bsz, r // spec.blk)
    smem_block = lambda width: pl.BlockSpec(  # noqa: E731
        (1, spec.blk, width), lambda b, rb: (b, rb, 0), memory_space=pltpu.SMEM
    )
    acc_dt = jnp.dtype(spec.bwd_acc)
    zeros = jnp.zeros(packed_shape, acc_dt)
    grad = pl.pallas_call(
        partial(_bwd_kernel, spec=spec),
        grid=grid,
        in_specs=[
            smem_block(ints.shape[-1]),
            smem_block(floats.shape[-1]),
            pl.BlockSpec(
                (1, spec.blk, spec.p, spec.p, spec.c),
                lambda b, rb: (b, rb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(packed_shape, acc_dt),
        scratch_shapes=[
            pltpu.VMEM((spec.ty, spec.tx, spec.c), acc_dt),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            has_side_effects=True,
        ),
        interpret=spec.interpret,
    )(ints, floats, g, zeros)
    return (
        grad.astype(spec.dtype),
        np.zeros(ints.shape, jax.dtypes.float0),
        jnp.zeros_like(floats),
        jnp.zeros_like(vec),
    )


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_roi_align(
    packed,
    params,
    output_size: int = 7,
    bwd_acc: str | None = None,
    tile: tuple[int, int] | None = None,
    dedup: bool | None = None,
):
    """Pallas multiscale RoIAlign over a packed pyramid.

    packed: [B, H_total, W_max, C]; params: per-RoI dict from
    :func:`transfusion_tpu.ops.roi_align.roi_sample_params`. Returns
    [B, R, P, P, C] in packed's dtype. tile: (rows, cols) window tile edges
    (None reads TRANSFUSION_ROIALIGN_TILE, "N" or "TYxTX"); cols must be a
    multiple of 8. dedup: share tile-0 window DMAs between RoIs with equal
    window origins (sorted adjacency; None reads TRANSFUSION_ROIALIGN_DEDUP).

    bwd_acc selects the backward pyramid-gradient accumulator dtype:
    "f32" (exact RMW accumulation, then one cast to packed's dtype) or
    "out" (accumulate directly in packed's dtype — halves the full-pyramid
    HLO temp and its RMW DMA traffic; each overlapping RoI tile costs one
    extra bf16 rounding). None reads TRANSFUSION_ROI_BWD_ACC, default "out":
    measured on one v5e chip it wins at both bench batches (train B8
    34.23 -> 34.78 f/s/chip, B16 30.91 -> 31.81) and grad parity vs the f32
    accumulator is pinned by
    test_fused_pallas_roi_align_bf16_accumulator_grads.
    """
    bsz, ht, wt, c = packed.shape
    r = params["bh"].shape[1]
    p = output_size
    p_pad = _round_up(p, 8)

    ty, tx = tile if tile is not None else _tile_env()
    if tx % 8:
        raise ValueError(f"RoIAlign tile cols must be a multiple of 8, got {tx}")
    c_pad = _round_up(c, 128)
    # W is the sublane-tiled dim: pad it to a multiple of 8 so clamped window
    # origins (w_tot - tx) stay 8-aligned.
    packed_p = jnp.pad(
        packed,
        (
            (0, 0),
            (0, max(ty - ht, 0)),
            (0, _round_up(max(wt, tx), 8) - wt),
            (0, c_pad - c),
        ),
    )
    h_tot, w_tot = packed_p.shape[1:3]

    import os

    blk = min(int(os.environ.get("TRANSFUSION_ROIALIGN_BLK", "8")), r)
    r_pad = _round_up(r, blk)

    hl_i = params["hl"].astype(jnp.int32)
    wl_i = params["wl"].astype(jnp.int32)
    ay = jnp.clip(jnp.floor(params["y1"]).astype(jnp.int32), 0, jnp.maximum(hl_i - 1, 0))
    ax = jnp.clip(jnp.floor(params["x1"]).astype(jnp.int32), 0, jnp.maximum(wl_i - 1, 0))
    # Align window x-origins down to the 8-sublane boundary (Mosaic dynamic
    # slice constraint); the multi-tile loop covers the widened span exactly.
    ax = (ax // 8) * 8
    y2 = params["y1"] + params["bh"] * p
    x2 = params["x1"] + params["bw"] * p
    ly = jnp.clip(jnp.floor(y2).astype(jnp.int32) + 1, 0, hl_i - 1)
    lx = jnp.clip(jnp.floor(x2).astype(jnp.int32) + 1, 0, wl_i - 1)
    nty = jnp.maximum(-(-(ly - ay + 1) // ty), 1)
    ntx = jnp.maximum(-(-(lx - ax + 1) // tx), 1)

    ints = jnp.stack(
        [params["off"] + ay, ax, nty, ntx, params["ry"], params["rx"], params["off"],
         jnp.zeros_like(ay)],  # col 7 = src slot, filled below
        axis=-1,
    ).astype(jnp.int32)
    floats = jnp.stack(
        [params["y1"], params["x1"], params["bh"], params["bw"],
         params["hl"], params["wl"], params["count_inv"],
         jnp.zeros_like(params["y1"])],
        axis=-1,
    ).astype(jnp.float32)

    if r_pad != r:
        pad_i = jnp.zeros((bsz, r_pad - r, ints.shape[-1]), jnp.int32)
        pad_i = pad_i.at[..., 2:4].set(1)  # nty = ntx = 1
        ints = jnp.concatenate([ints, pad_i], axis=1)
        pad_f = jnp.zeros((bsz, r_pad - r, floats.shape[-1]), jnp.float32)
        pad_f = pad_f.at[..., 4:6].set(1.0)  # hl = wl = 1
        floats = jnp.concatenate([floats, pad_f], axis=1)

    # Tile-0 window dedup: sort RoIs by packed-pyramid window origin so RoIs
    # sharing an (8-aligned) origin sit adjacently, mark each run's first RoI
    # as the DMA owner (col 7 = within-block src slot), and inverse-gather
    # the pooled outputs back to input order after the kernel. Clustered
    # proposals regularly share origins, so the owner's single DMA feeds the
    # whole run. Runs are cut at block boundaries (slots are per-block).
    if dedup is None:
        dedup = os.environ.get("TRANSFUSION_ROIALIGN_DEDUP", "0") == "1"
    ridx = jnp.arange(r_pad, dtype=jnp.int32)
    inv = None
    if dedup:
        key = ints[..., 0] * jnp.int32(w_tot) + ints[..., 1]
        order = jnp.argsort(key, axis=1).astype(jnp.int32)
        ints = jnp.take_along_axis(ints, order[..., None], 1)
        floats = jnp.take_along_axis(floats, order[..., None], 1)
        sy, sx = ints[..., 0], ints[..., 1]
        prev_same = jnp.concatenate(
            [
                jnp.zeros((bsz, 1), bool),
                (sy[:, 1:] == sy[:, :-1]) & (sx[:, 1:] == sx[:, :-1]),
            ],
            axis=1,
        )
        new_run = (~prev_same) | (ridx % blk == 0)[None]
        run_start = jax.lax.cummax(jnp.where(new_run, ridx[None], 0), axis=1)
        ints = ints.at[..., 7].set(run_start % blk)
        inv = jnp.argsort(order, axis=1)
    else:
        ints = ints.at[..., 7].set(jnp.broadcast_to(ridx % blk, ints.shape[:2]))

    if bwd_acc is None:
        bwd_acc = os.environ.get("TRANSFUSION_ROI_BWD_ACC", "out")
    acc_name = (
        jnp.dtype(packed.dtype).name
        if bwd_acc == "out"
        else jnp.dtype(jnp.float32).name
    )
    # Per-RoI parameters as a VMEM vector block for the batched tile-0
    # weight build (f32 exact for the int-valued columns; values < 2^24):
    # cols = sy sx ry rx off y1 x1 bh bw hl wl pad.
    vec = jnp.concatenate(
        [
            ints[..., jnp.array([0, 1, 4, 5, 6])].astype(jnp.float32),
            floats[..., 0:6],
            jnp.zeros_like(floats[..., :1]),
        ],
        axis=-1,
    )

    spec = _Spec(
        p=p, p_pad=p_pad, c=c_pad, blk=blk, h_tot=h_tot, w_tot=w_tot,
        bsz=bsz, dtype=jnp.dtype(packed.dtype).name,
        interpret=jax.default_backend() == "cpu",
        bwd_acc=acc_name, ty=ty, tx=tx,
        batched_w=os.environ.get("TRANSFUSION_ROIALIGN_BATCHED_W", "1") == "1",
    )
    out = _fused(spec, packed_p, ints, floats, vec)
    if inv is not None:
        out = jnp.take_along_axis(out, inv[..., None, None, None], 1)
    return out[:, :r, :, :, :c]
