"""Fused (residual-add +) LayerNorm as a Pallas TPU kernel (MXU statistics).

Motivation (round-5 eval profile): the fusion stack's LayerNorms reduce over
the feature (lane) dimension, and XLA lowers those reductions to cross-lane
shuffle kernels running at ~10% of HBM peak — 4.3 ms/step of "LN stat
reductions" at eval B8 for the level-0 stream alone. Row sums are a matmul
against a ones matrix, which the MXU performs at full bandwidth: this kernel
reads each row block once, computes sum(x) and sum(x^2) with two thin MXU
matmuls, and normalizes in the same pass — one HBM read + one write total.
The post-norm pattern ``LN(x + h)`` fuses the residual add into the same
pass (the sum tensor never hits HBM).

Semantics match ``flax.linen.LayerNorm`` (fast variance E[x^2] - E[x]^2
clamped at 0, statistics in f32, scale/bias f32 params, output cast to the
input dtype; the reference's torch encoders normalize identically — the
post-norms of ``nn.TransformerEncoderLayer``-style blocks in
``modeling/cross_fusion/ego_fusion/cross_f_box_layers.py``). The backward is
the closed-form LayerNorm gradient evaluated with recomputed statistics in
plain XLA, so training numerics are unchanged and the op stores no residuals
beyond its inputs.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 256  # rows per grid step


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _ln_math(xf, w_ref, b_ref, o_ref, d: int, d_pad: int, eps: float):
    ones = jnp.ones((d_pad, 128), jnp.float32)
    mm = lambda a: jax.lax.dot_general(  # noqa: E731
        a, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )[:, :1]
    mean = mm(xf) * (1.0 / d)
    var = jnp.maximum(mm(xf * xf) * (1.0 / d) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * rstd * w_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32
    )
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, d, d_pad, eps):
    _ln_math(x_ref[...].astype(jnp.float32), w_ref, b_ref, o_ref, d, d_pad, eps)


def _res_ln_kernel(x_ref, r_ref, w_ref, b_ref, o_ref, *, d, d_pad, eps):
    # Sum in the input dtype (matches the module-level `x + h` the fusion
    # encoders performed before), then f32 statistics.
    _ln_math(
        (x_ref[...] + r_ref[...]).astype(jnp.float32), w_ref, b_ref, o_ref, d, d_pad, eps
    )


def _ln_call(kernel, xs, w, b, eps, dtype):
    n, d = xs[0].shape
    d_pad = _round_up(d, 128)
    n_pad = _round_up(n, _ROWS)
    xps = [jnp.pad(x, ((0, n_pad - n), (0, d_pad - d))) for x in xs]
    wp = jnp.pad(w, (0, d_pad - d)).reshape(1, d_pad)
    bp = jnp.pad(b, (0, d_pad - d)).reshape(1, d_pad)
    row_block = pl.BlockSpec((_ROWS, d_pad), lambda i: (i, 0))
    vec_block = pl.BlockSpec((1, d_pad), lambda i: (0, 0))
    out = pl.pallas_call(
        partial(kernel, d=d, d_pad=d_pad, eps=eps),
        grid=(n_pad // _ROWS,),
        in_specs=[row_block] * len(xps) + [vec_block, vec_block],
        out_specs=row_block,
        out_shape=jax.ShapeDtypeStruct((n_pad, d_pad), dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=jax.default_backend() == "cpu",
    )(*xps, wp, bp)
    return out[:n, :d]


def _ln_grads(s, w, g, eps):
    """Closed-form LayerNorm gradient with recomputed f32 statistics."""
    sf = s.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean = sf.mean(-1, keepdims=True)
    var = jnp.maximum((sf * sf).mean(-1, keepdims=True) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (sf - mean) * rstd
    gw = gf * w.astype(jnp.float32)
    gx = rstd * (
        gw - gw.mean(-1, keepdims=True) - xhat * (gw * xhat).mean(-1, keepdims=True)
    )
    return gx, (gf * xhat).sum(0).astype(w.dtype), gf.sum(0).astype(w.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_ln(x2, w, b, eps):
    return _fused_ln_fwd(x2, w, b, eps)[0]


def _fused_ln_fwd(x2, w, b, eps):
    return _ln_call(_ln_kernel, [x2], w, b, eps, x2.dtype), (x2, w)


def _fused_ln_bwd(eps, res, g):
    x2, w = res
    gx, gw, gb = _ln_grads(x2, w, g, eps)
    return gx.astype(x2.dtype), gw, gb


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_res_ln(x2, r2, w, b, eps):
    return _fused_res_ln_fwd(x2, r2, w, b, eps)[0]


def _fused_res_ln_fwd(x2, r2, w, b, eps):
    out = _ln_call(_res_ln_kernel, [x2, r2], w, b, eps, x2.dtype)
    return out, (x2, r2, w)


def _fused_res_ln_bwd(eps, res, g):
    x2, r2, w = res
    gx, gw, gb = _ln_grads(x2 + r2, w, g, eps)
    gx = gx.astype(x2.dtype)
    return gx, gx, gw, gb


_fused_res_ln.defvjp(_fused_res_ln_fwd, _fused_res_ln_bwd)


def fused_layer_norm(x, scale, bias, eps: float = 1e-6, residual=None):
    """LayerNorm over the last axis (optionally of ``x + residual``)."""
    d = x.shape[-1]
    if residual is None:
        y = _fused_ln(x.reshape(-1, d), scale, bias, eps)
    else:
        y = _fused_res_ln(
            x.reshape(-1, d), residual.reshape(-1, d), scale, bias, eps
        )
    return y.reshape(x.shape)


class FusedLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm`` (same param names/shapes) running the
    Pallas MXU-statistics kernel; ``__call__(x, residual=h)`` fuses the
    post-norm residual add. ``TRANSFUSION_FUSED_LN=0`` falls back to flax
    (read at trace time). On CPU the kernel runs in interpret mode, keeping
    one code path under test."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, deterministic=True):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        import os

        from transfusion_tpu.parallel.mesh import active_mesh

        x = x.astype(self.dtype)
        if residual is not None:
            residual = residual.astype(self.dtype)
        # The kernel runs on eval passes only (deterministic=True): eval
        # measured 90.80 -> 91.53 f/s, but on the train step the custom
        # VJP's recomputed-stats backward fuses worse than flax autodiff
        # (36.34 -> 35.89 f/s), so training keeps XLA's LayerNorm. It is
        # also a single-device program: under an active mesh a Pallas call
        # has no GSPMD sharding rule and would force replication (the
        # failure mode the tp dryrun asserts against), so sharded paths
        # keep XLA too.
        use_kernel = (
            deterministic
            and os.environ.get("TRANSFUSION_FUSED_LN", "1") == "1"
            and active_mesh() is None
        )
        if not use_kernel:
            s = x if residual is None else x + residual
            return nn.LayerNorm(
                epsilon=self.epsilon, dtype=self.dtype, name="flax_ln"
            ).apply({"params": {"scale": scale, "bias": bias}}, s)
        return fused_layer_norm(x, scale, bias, self.epsilon, residual)
