"""Device mesh + sharding helpers.

The reference's only distribution strategy is data parallelism via PL DDP
(``runner/run_experiment.py:452-453``); the TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis whose gradient all-reduce is the
``psum`` XLA inserts for replicated params under jit (SURVEY.md §2.6). The
mesh keeps a second ``model`` axis so tensor sharding of the fusion stack is
a config change: with ``model > 1`` the fusion/box-head matmul weights shard
over it and XLA rides ICI collectives for the activations.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch dim over the data axis, everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh, batch-dim over 'data'."""
    sh = batch_sharding(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sh)
        return x

    return jax.tree.map(put, batch)


def _is_model_shardable(path_str: str, shape) -> P | None:
    """Sharding rule for the model axis: large matmul weights in the fusion
    stack, box head, and text encoder shard their output (last) dim."""
    if len(shape) < 2:
        return None
    targets = ("fusion_", "box_head", "narr_encoder", "predictors")
    if any(t in path_str for t in targets) and shape[-1] >= 256:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return None


def param_shardings(mesh: Mesh, params):
    """NamedSharding tree for params: replicated on 'data'; the rule above
    over 'model' when the axis is >1."""
    model_n = mesh.shape["model"]

    def assign(path, leaf):
        if model_n > 1:
            path_str = "/".join(str(getattr(p, "key", p)) for p in path)
            spec = _is_model_shardable(path_str, leaf.shape)
            if spec is not None and leaf.shape[-1] % model_n == 0:
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)
