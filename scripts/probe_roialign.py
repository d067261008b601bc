"""On-chip decomposition of the fused RoIAlign kernel's per-tile cost.

Times the standalone kernel at bench shapes (B8, 768x1024 pyramid, R=1000
realistic RoIs) in three variants:
  full        — the shipped kernel
  noweights   — _axis_weights patched to constant ones (skips the VPU tent
                build; expanders + pooling matmul + DMA remain)
  noexpand    — _combined_weights patched to constant ones (skips the whole
                weight construction; pooling matmul + DMA remain)
Differences localize the 15.3 ms/step eval cost between window DMA, the
pooling matmul, and the per-tile weight build (parity is intentionally
broken in the patched variants — timing only).

Run on the TPU: python scripts/probe_roialign.py
"""

import sys
import time

import numpy as np


def make_inputs(rng, bsz=8, r=1000, c=256):
    import jax.numpy as jnp

    shapes = [(192, 256), (96, 128), (48, 64), (24, 32)]
    h_tot = sum(h for h, _ in shapes)
    w_max = max(w for _, w in shapes)
    packed = jnp.asarray(
        rng.normal(0, 1, (bsz, h_tot, w_max, c)).astype(np.float32)
    ).astype(jnp.bfloat16)

    # Realistic post-NMS proposal mix at 768x1024: log-uniform scale in
    # [32, 512] px, uniform centers, mild aspect jitter — most RoIs land on
    # levels 0-1 with 14-28 px spans at their level, a tail is multi-tile.
    cx = rng.uniform(0, 1024, (bsz, r))
    cy = rng.uniform(0, 768, (bsz, r))
    s = np.exp(rng.uniform(np.log(32), np.log(512), (bsz, r)))
    ar = np.exp(rng.normal(0, 0.4, (bsz, r)))
    w = s * ar
    h = s / ar
    rois = np.stack(
        [
            np.clip(cx - w / 2, 0, 1023),
            np.clip(cy - h / 2, 0, 767),
            np.clip(cx + w / 2, 1, 1024),
            np.clip(cy + h / 2, 1, 768),
        ],
        axis=-1,
    ).astype(np.float32)
    return packed, jnp.asarray(rois), shapes


def main():
    import jax
    import jax.numpy as jnp

    import transfusion_tpu.ops.roi_align_pallas as rap
    from transfusion_tpu.ops.roi_align import roi_sample_params

    rng = np.random.default_rng(0)
    packed, rois, shapes = make_inputs(rng)
    offsets = [0]
    for hh, _ in shapes[:-1]:
        offsets.append(offsets[-1] + hh)
    params = roi_sample_params(rois, shapes, offsets, (768, 1024), 7, 0)
    nt = np.asarray(
        jnp.maximum(jnp.ceil((params["bh"] * 7 + 1) / 32), 1)
        * jnp.maximum(jnp.ceil((params["bw"] * 7 + 1) / 32), 1)
    )
    print(f"probe: mean window tiles/RoI = {nt.mean():.2f}", file=sys.stderr)

    def run_variant(name):
        import jax

        @jax.jit
        def f(packed, rois, i):
            p = roi_sample_params(
                rois + i * 1e-3, shapes, offsets, (768, 1024), 7, 0
            )
            return rap.fused_roi_align(packed, p, 7).sum()

        float(f(packed, rois, jnp.float32(0.0)))  # compile
        k = 8
        best = float("inf")
        for trial in range(3):
            t0 = time.perf_counter()
            outs = [f(packed, rois, jnp.float32(1 + trial * k + j)) for j in range(k)]
            float(outs[-1])
            best = min(best, (time.perf_counter() - t0) / k)
        print(f"probe: {name:10s} {best * 1e3:8.2f} ms/call", file=sys.stderr)
        return best

    t_full = run_variant("full")

    orig_axis = rap._axis_weights

    def ones_axis(spec, origin_rel, a1, bin_sz, r_cnt, lim, dup, tile):
        return jnp.ones((spec.p_pad, tile), jnp.float32)

    rap._axis_weights = ones_axis
    t_now = run_variant("noweights")
    rap._axis_weights = orig_axis

    orig_cw = rap._combined_weights

    def ones_cw(spec, scal, origin, transposed):
        if transposed:
            return jnp.ones((spec.ty * spec.tx, spec.p_pad * spec.p_pad), jnp.float32)
        return jnp.ones((spec.p_pad * spec.p_pad, spec.ty * spec.tx), jnp.float32)

    rap._combined_weights = ones_cw
    t_noe = run_variant("noexpand")
    rap._combined_weights = orig_cw

    # (A fourth variant replacing _mm with constant zeros to split DMA from
    # the pooling matmul was tried and crashes Mosaic's lowering — constant-
    # folded matmul results break the kernel's vector layout assignment. The
    # floor below is therefore DMA + matmul combined.)
    print(
        f"probe: weight-build share {(t_full - t_now) * 1e3:.2f} ms, "
        f"expander share {(t_now - t_noe) * 1e3:.2f} ms, "
        f"DMA+matmul floor {t_noe * 1e3:.2f} ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
