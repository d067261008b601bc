"""Host input-pipeline throughput benchmark (SURVEY §7 hard part #7).

Measures the REAL loader path — JPEG decode + detectron2-equivalent aug +
collate through transfusion_tpu.data.loader.DataLoader — on synthetic frames
at Ego4D-v2 full resolution, at the flagship eval batch size (val_bs 224),
and reports sustained frames/s plus the per-core rate (this dev box has one
core; a v5e host has dozens — the per-core number is what transfers).

Usage: python scripts/bench_loader.py [--frames 256] [--batch 224]
       [--src-hw 1080 1440] [--bucket 768 1024] [--workers 4] [--train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_frames(root: str, n: int, h: int, w: int) -> None:
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (h, w, 3), np.uint8)
    for i in range(n):
        # Shift so JPEGs differ (no decoder caching), cheap to generate.
        img = np.roll(base, i * 7, axis=1)
        Image.fromarray(img).save(os.path.join(root, f"vid-0000_{i:07d}.jpg"), quality=95)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batch", type=int, default=224)
    ap.add_argument("--src-hw", type=int, nargs=2, default=(1080, 1440))
    ap.add_argument("--bucket", type=int, nargs=2, default=(768, 1024))
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--worker-type", default="thread", choices=["thread", "process"])
    ap.add_argument("--train", action="store_true", help="training augs + shuffling")
    ap.add_argument("--root", default="/tmp/loader_bench")
    args = ap.parse_args()

    import pandas as pd

    from transfusion_tpu.data.dataset import EgoNaoDataset, build_narration_lookup
    from transfusion_tpu.data.loader import DataLoader
    from transfusion_tpu.data.tokenizer import hash_vocab_tokenizer
    from transfusion_tpu.data.transforms import AugConfig

    frames_dir = os.path.join(args.root, "object_frames")
    if not os.path.isdir(frames_dir) or len(os.listdir(frames_dir)) < args.frames:
        print(f"generating {args.frames} synthetic {args.src_hw} JPEGs...", file=sys.stderr)
        make_frames(frames_dir, args.frames, *args.src_hw)

    h, w = args.src_hw
    rows = []
    for i in range(args.frames):
        rows.append({
            "uid": f"u{i}", "video_id": "vid-0000", "Frame_no": i,
            "Bboxes": [[10.0, 10.0, 200.0, 200.0]], "all_nouns": ["pan"],
            "all_verbs": ["take"], "det_diff": 0.8, "narration": "take the pan",
        })
    annots = pd.DataFrame(rows).set_index("uid")
    aug = AugConfig(
        resize_spec=((args.bucket[0],), (args.bucket[1],)), crop_spec=(0.9, 0.9), flip=True,
        channel_order="BGR", brightness=0.15, contrast=0.1, hue=0.05,
        normalization="ego4d_baseline",
    )
    ds = EgoNaoDataset(
        annots=annots, frames_dir=frames_dir, noun_mapping={"pan": 1},
        verb_mapping={"take": 0}, aug=aug,
        narration_lookup=build_narration_lookup(annots, "current"),
        uid_col="video_id",
    )
    loader = DataLoader(
        ds, args.batch, tokenizer=hash_vocab_tokenizer(max_length=64),
        training=args.train, num_workers=args.workers, drop_last=False,
        worker_type=args.worker_type,
    )

    # Warm one batch (thread spawn, page cache), then measure a full pass.
    it = iter(loader)
    next(it)
    t0 = time.perf_counter()
    frames = 0
    n_batches = 0
    for batch in it:
        frames += batch["image"].shape[0]
        n_batches += 1
    dt = time.perf_counter() - t0
    loader.close()

    ncores = os.cpu_count() or 1
    fps = frames / dt
    out = {
        "metric": "loader_decode_frames_per_sec",
        "value": round(fps, 2),
        "unit": "frames/s",
        "batch": args.batch,
        "bucket": list(args.bucket),
        "src_hw": list(args.src_hw),
        "mode": "train" if args.train else "eval",
        "workers": args.workers,
        "worker_type": args.worker_type,
        "host_cores": ncores,
        "frames_per_sec_per_core": round(fps / min(args.workers, ncores), 2),
        "s_per_batch": round(dt / max(n_batches, 1), 3),
        "decode_s_per_batch_mean": round(float(np.mean(loader.decode_times)), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
