"""Methodology probe: is the eval bench's residual per-step overhead relay
dispatch cost or genuine on-device gaps?

Times the SAME eval program three ways on identical (random-init) params:
  serial     — one dispatch per step, fetch each scalar (bench r1-r3 method)
  pipelined  — K async dispatches, fetch only the last (bench r4 diag)
  scanned    — ONE dispatch of lax.scan over K steps (pure on-device loop)
If scanned >> pipelined, the relay serializes dispatch RPCs and the scan
number is the true device throughput; if scanned ~= pipelined, the gap vs
the profiler's op-time sum is real device idle (scheduling/DMA bubbles).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench

bench._enable_compile_cache()
from __graft_entry__ import _flagship_config
from transfusion_tpu.models.detector import detections_from_outputs
from transfusion_tpu.models.transfusion import TransFusion

K = bench.K
B, H, W, L = bench.BATCH, bench.H, bench.W, bench.LANG_LEN
cfg = _flagship_config()
model = TransFusion(cfg)
rng = np.random.default_rng(0)
batch = {
    "image": jnp.asarray(rng.normal(0, 0.7, (B, H, W, 3)).astype(np.float32)),
    "input_ids": jnp.asarray(rng.integers(0, 30000, (B, L)).astype(np.int32)),
    "attention_mask": jnp.ones((B, L), jnp.int32),
}
params = jax.jit(
    lambda k: model.init({"params": k}, dict(batch, image_hw=(H, W)), False)
)(jax.random.key(0))


def one_step(params, batch, i):
    b = dict(batch, image=batch["image"] + i * 1e-6)
    out = model.apply(params, dict(b, image_hw=(H, W)), False)
    dets = detections_from_outputs(out, cfg.detector)
    return dets["scores"].sum() + dets["boxes"].sum()


infer = jax.jit(one_step)


@jax.jit
def infer_scan(params, batch, i0):
    def body(carry, k):
        return carry + one_step(params, batch, i0 + k.astype(jnp.float32)), ()

    s, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
    return s


@jax.jit
def null_program(x):
    return x + 1.0


float(infer(params, batch, jnp.float32(0.0)))
float(null_program(jnp.float32(0.0)))
print("scalar program warm; compiling scan...", file=sys.stderr)
t0 = time.perf_counter()
float(infer_scan(params, batch, jnp.float32(0.0)))
print(f"scan compiled+ran in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

rtts = []
for _ in range(5):
    t0 = time.perf_counter()
    float(null_program(jnp.float32(t0 % 1.0)))
    rtts.append(time.perf_counter() - t0)
rtt = min(rtts)

serial = []
for k in range(K):
    t0 = time.perf_counter()
    float(infer(params, batch, jnp.float32(k + 1.0)))
    serial.append(time.perf_counter() - t0)

pipe = []
for trial in range(3):
    t0 = time.perf_counter()
    outs = [infer(params, batch, jnp.float32(50 + trial * K + k)) for k in range(K)]
    float(outs[-1])
    pipe.append(time.perf_counter() - t0)

scans = []
for trial in range(3):
    t0 = time.perf_counter()
    float(infer_scan(params, batch, jnp.float32(200 + trial)))
    scans.append(time.perf_counter() - t0)

print(f"rtt = {rtt * 1e3:.1f} ms")
print(f"serial:    {B / (min(serial) - rtt):.2f} f/s  (step {min(serial) - rtt:.4f}s)")
print(f"pipelined: {B * K / (min(pipe) - rtt):.2f} f/s  (K-run {min(pipe) - rtt:.4f}s)")
print(f"scanned:   {B * K / (min(scans) - rtt):.2f} f/s  (K-run {min(scans) - rtt:.4f}s)")
