"""Device-trace the flagship train (or eval) step and print an op breakdown.

Dev tooling for the perf loop: runs N steps under jax.profiler.trace, then
walks the XPlane dump (tensorflow's xplane proto) and aggregates device-side
op durations by HLO category and by op name, printing the top buckets. This
is the measurement the round-2/3 optimization work is driven by (STATUS.md
"Performance" section).

Usage:
    python scripts/profile_train_step.py [--eval] [--batch 8] [--steps 3]
                                         [--out /tmp/tf_trace]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_and_run(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    os.environ.setdefault("TRANSFUSION_BENCH_BATCH", str(args.batch))
    import bench

    bench._enable_compile_cache()
    from __graft_entry__ import _flagship_config
    from transfusion_tpu.models.transfusion import TransFusion

    cfg = _flagship_config()
    model = TransFusion(cfg)
    rng = np.random.default_rng(0)
    B, H, W, L = args.batch, bench.H, bench.W, bench.LANG_LEN
    batch = {
        "image": jnp.asarray(rng.normal(0, 0.7, (B, H, W, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 30000, (B, L)).astype(np.int32)),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "targets": {
            "boxes": jnp.tile(jnp.asarray([[100.0, 100.0, 400.0, 400.0]]), (B, 1, 1)),
            "nouns": jnp.full((B, 1), 2),
            "verbs": jnp.full((B, 1), 1),
            "ttcs": jnp.full((B, 1), 0.9, jnp.float32),
            "valid": jnp.ones((B, 1), bool),
        },
    }

    if args.eval:
        from transfusion_tpu.models.detector import detections_from_outputs

        if args.calib:
            # Realistic score distributions change the NMS/postprocess cost
            # (random init underfills the keep caps) — same calibration the
            # bench uses.
            params = bench._calibrated_params(model, cfg, batch, args.calib)
        else:
            params = jax.jit(
                lambda k: model.init({"params": k}, dict(batch, image_hw=(H, W)), False)
            )(jax.random.key(0))

        @jax.jit
        def step(params, batch, i):
            b = dict(batch, image=batch["image"] + i * 1e-6)
            out = model.apply(params, dict(b, image_hw=(H, W)), False)
            dets = detections_from_outputs(out, cfg.detector)
            return dets["scores"].sum()

        step(params, batch, jnp.float32(0.0)).block_until_ready()
        run = lambda k: float(step(params, batch, jnp.float32(k)))
    else:
        from functools import partial

        from transfusion_tpu.train.optim import make_optimizer
        from transfusion_tpu.train.step import LossConfig, criterion_weights, init_state, make_train_step

        nn_, nv = cfg.detector.roi.num_nouns, cfg.detector.roi.num_verbs
        tx, _ = make_optimizer({"name": "radam", "lr": 1e-4, "weight_decay": 1e-5}, None, 100)
        state = init_state(model, tx, dict(batch, image_hw=(H, W)), jax.random.key(0))
        loss_cfg = LossConfig(rpn_batch_size_per_image=256, last_noun_idx=nn_ - 1)
        # Match the bench's train program exactly (bench.main_train), else the
        # profile explains a program nobody ships: bf16 weight grads default ON.
        step0 = make_train_step(
            model, tx, loss_cfg, jnp.ones(nn_), jnp.ones(nv), donate=False,
            bf16_grads=os.environ.get("TRANSFUSION_BF16_GRADS", "1") == "1",
        )
        lw = jnp.asarray(criterion_weights({"bbox": 1, "obj_prop": 1, "noun": 1, "verb": 1}))

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, batch, i):
            b = dict(batch, image=batch["image"] + i * 1e-6)
            new_state, metrics = step0(state, b, jax.random.key(0), lw, (H, W))
            return new_state, metrics["loss"]

        state, loss = step(state, batch, jnp.float32(0.0))
        float(loss)
        holder = {"state": state}

        def run(k):
            holder["state"], loss = step(holder["state"], batch, jnp.float32(k))
            return float(loss)

    with jax.profiler.trace(args.out):
        for k in range(args.steps):
            run(k + 1.0)


def parse_trace(out_dir: str, top: int = 40):
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print("no xplane dump found under", out_dir)
        return
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as fp:
        xspace.ParseFromString(fp.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        st_meta = plane.stat_metadata
        by_name = defaultdict(float)
        by_cat = defaultdict(float)
        count = defaultdict(int)
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name and line.name != "XLA Modules":
                # the op-level line is usually named "XLA Ops"; fall back to
                # accumulating every line and letting names disambiguate.
                pass
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                dur = ev.duration_ps / 1e9  # ms
                name = md.name
                cat = ""
                for stat in md.stats:
                    sname = st_meta[stat.metadata_id].name
                    if sname in ("hlo_category", "category"):
                        cat = stat.str_value or st_meta.get(stat.ref_value, xplane_pb2.XStatMetadata()).name
                by_name[name] += dur
                by_cat[cat or _guess_cat(name)] += dur
                count[name] += 1
        if not by_name:
            continue
        total = sum(by_name.values())
        print(f"\n=== plane {plane.name}: total XLA op time {total:.1f} ms "
              f"(across profiled steps) ===")
        print("\n-- by category --")
        for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
            print(f"  {cat:40s} {ms:9.2f} ms  {100 * ms / total:5.1f}%")
        print(f"\n-- top {top} ops --")
        for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {name[:90]:90s} {ms:8.2f} ms  x{count[name]}")


def _guess_cat(name: str) -> str:
    for key in ("convolution", "fusion", "copy", "all-reduce", "reduce", "dot",
                "scatter", "gather", "transpose", "custom-call", "sort", "iota",
                "dynamic-slice", "dynamic-update-slice", "select-and-scatter"):
        if name.startswith(key) or f"%{key}" in name:
            return key
    return "other"


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--calib", type=int, default=0,
                    help="on-device calibration train steps before an --eval profile")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/tf_trace")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        build_and_run(args)
    parse_trace(args.out)
