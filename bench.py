"""Round benchmark: flagship TransFusion inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

What is measured: the full eval path of the v2 flagship config — ResNet-50
(detectron2 strides) + 4x4-layer 896-dim cross fusion + MiniLM-L12 + FPN/RPN/
RoI heads + static postprocess (per-class NMS, additional postprocessing) —
at the v2 eval resolution 768x1024, batched, on the attached TPU.

Methodology: this harness reaches the TPU through a slow relay tunnel whose
host<->device bulk transfers (seconds per MB) would swamp any naive timing,
and remote compilation is minutes per program, so the benchmark compiles ONE
program (forward + postprocess, returning a single scalar), perturbs the
input by a scalar each call (so nothing is cached), fetches only the scalar,
and subtracts the measured null-program round-trip. That isolates on-device
compute — the number that transfers to a co-located TPU host where input
staging rides PCIe/DMA instead of the relay.

vs_baseline: BASELINE.json publishes no reference numbers ("published": {}),
so the denominator is a documented estimate of the reference torch pipeline's
eval throughput on its own hardware (A100-80GB): ~50 frames/s/GPU, derived
from the model's ~0.4 TFLOP/frame forward at 768x1024 and typical fp32/TF32
A100 utilization for this mixed conv+attention workload. Replace with a
measured number when a reference reproduction exists.
"""

import json
import sys
import time

import os

REFERENCE_FPS_ESTIMATE = 50.0
REFERENCE_TRAIN_FPS_ESTIMATE = 18.0  # ~0.4 TFLOP fwd * 3 for bwd on A100 TF32
BATCH = int(os.environ.get("TRANSFUSION_BENCH_BATCH", "8"))
H, W = 768, 1024
LANG_LEN = 64
K = 8  # model iterations inside the on-device loop


def _enable_compile_cache():
    import os

    import jax

    cache_dir = os.environ.get("TRANSFUSION_COMPILE_CACHE", "/root/repo/.jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    _enable_compile_cache()
    from __graft_entry__ import _flagship_config
    from transfusion_tpu.models.detector import detections_from_outputs
    from transfusion_tpu.models.transfusion import TransFusion

    cfg = _flagship_config()
    model = TransFusion(cfg)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(0, 0.7, (BATCH, H, W, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 30000, (BATCH, LANG_LEN)).astype(np.int32)),
        "attention_mask": jnp.ones((BATCH, LANG_LEN), jnp.int32),
    }
    freqs = jnp.asarray(
        (rng.uniform(0, 1, (cfg.detector.roi.num_nouns, cfg.detector.roi.num_verbs)) > 0.7)
        * rng.integers(1, 50, (cfg.detector.roi.num_nouns, cfg.detector.roi.num_verbs))
    ).astype(jnp.float32)

    params = jax.jit(
        lambda k: model.init({"params": k}, dict(batch, image_hw=(H, W)), False)
    )(jax.random.key(0))

    @jax.jit
    def infer_scalar(params, batch, i):
        b = dict(batch, image=batch["image"] + i * 1e-6)
        out = model.apply(params, dict(b, image_hw=(H, W)), False)
        dets = detections_from_outputs(out, cfg.detector, noun_verb_frequencies=freqs)
        return dets["scores"].sum() + dets["boxes"].sum()

    @jax.jit
    def null_program(x):
        return x + 1.0

    # Warmup / compile both programs.
    float(infer_scalar(params, batch, jnp.float32(0.0)))
    float(null_program(jnp.float32(0.0)))

    # RTT of a null dispatch+fetch through the harness.
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(null_program(jnp.float32(t0 % 1.0)))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    times = []
    for k in range(K):
        t0 = time.perf_counter()
        float(infer_scalar(params, batch, jnp.float32(k + 1.0)))
        times.append(time.perf_counter() - t0)
    dt = min(times) - rtt

    fps = BATCH / max(dt, 1e-9)
    print(
        json.dumps(
            {
                "metric": "ego4dv2_eval_768x1024_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 3),
            }
        )
    )


def main_train():
    """--train: full train-step throughput (forward + 5-loss criterion +
    backward + RAdam update) on one chip, same isolation methodology.
    Prints ONE JSON line with the train metric instead of the eval one."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()
    from __graft_entry__ import _flagship_config
    from transfusion_tpu.models.transfusion import TransFusion
    from transfusion_tpu.train.optim import make_optimizer
    from transfusion_tpu.train.step import LossConfig, criterion_weights, init_state, make_train_step

    cfg = _flagship_config()
    model = TransFusion(cfg)
    rng = np.random.default_rng(0)
    nn_, nv = cfg.detector.roi.num_nouns, cfg.detector.roi.num_verbs
    batch = {
        "image": jnp.asarray(rng.normal(0, 0.7, (BATCH, H, W, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 30000, (BATCH, LANG_LEN)).astype(np.int32)),
        "attention_mask": jnp.ones((BATCH, LANG_LEN), jnp.int32),
        "targets": {
            "boxes": jnp.tile(jnp.asarray([[100.0, 100.0, 400.0, 400.0]]), (BATCH, 1, 1)),
            "nouns": jnp.full((BATCH, 1), 2),
            "verbs": jnp.full((BATCH, 1), 1),
            "ttcs": jnp.full((BATCH, 1), 0.9, jnp.float32),
            "valid": jnp.ones((BATCH, 1), bool),
        },
    }
    tx, _ = make_optimizer({"name": "radam", "lr": 1e-4, "weight_decay": 1e-5}, None, 100)
    state = init_state(model, tx, dict(batch, image_hw=(H, W)), jax.random.key(0))
    # The v2 flagship criterion: bbox/obj_prop/noun/verb on, ttc/lm off
    # (ego_nao_res50_ego4dv2.yml:145-154).
    loss_cfg = LossConfig(rpn_batch_size_per_image=256, last_noun_idx=nn_ - 1)
    step = make_train_step(model, tx, loss_cfg, jnp.ones(nn_), jnp.ones(nv), donate=False)
    lw = jnp.asarray(criterion_weights({"bbox": 1, "obj_prop": 1, "noun": 1, "verb": 1}))

    from functools import partial

    # Donate the state on the OUTER jit (inner donation flags don't survive
    # nesting): keeping two copies of params+moments (~6 GB) forces XLA into
    # rematerialization (~24% of the step in the profiled run).
    @partial(jax.jit, donate_argnums=(0,))
    def train_scalar(state, batch, i):
        b = dict(batch, image=batch["image"] + i * 1e-6)
        new_state, metrics = step(state, b, jax.random.key(0), lw, (H, W))
        return new_state, metrics["loss"]

    @jax.jit
    def null_program(x):
        return x + 1.0

    state, loss = train_scalar(state, batch, jnp.float32(0.0))
    float(loss)
    float(null_program(jnp.float32(0.0)))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(null_program(jnp.float32(t0 % 1.0)))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    times = []
    for k in range(K):
        t0 = time.perf_counter()
        state, loss = train_scalar(state, batch, jnp.float32(k + 1.0))
        float(loss)
        times.append(time.perf_counter() - t0)
    dt = min(times) - rtt
    fps = BATCH / max(dt, 1e-9)
    print(
        json.dumps(
            {
                "metric": "ego4dv2_train_768x1024_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / REFERENCE_TRAIN_FPS_ESTIMATE, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--train" in sys.argv:
        main_train()
    else:
        main()
