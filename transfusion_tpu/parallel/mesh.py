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


def allgather_pyobj(obj, process_count: int | None = None):
    """All-gather an arbitrary picklable object across hosts; returns the
    list of every process's object (ordered by process index).

    The cross-host fix for the reference's sharded-eval caveat
    (``/root/reference/README.md:59``: per-rank partial metrics require
    offline JSON fusion) — prediction/label sets gather to every host so the
    logged metric is exact. Single-process: returns ``[obj]`` without touching
    any collective."""
    import pickle

    n = process_count if process_count is not None else jax.process_count()
    if n == 1:
        return [obj]
    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(np.array([data.size], np.int64))
    sizes = np.asarray(sizes).reshape(-1)
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[: data.size] = data
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes()) for i in range(gathered.shape[0])
    ]


def _is_model_shardable(path_str: str, shape) -> P | None:
    """Sharding rule for the model axis: large matmul weights in the fusion
    stack, box head, and text encoder shard their output (last) dim."""
    if len(shape) < 2:
        return None
    targets = ("fusion_", "box_head", "narr_encoder", "predictors")
    if any(t in path_str for t in targets) and shape[-1] >= 256:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return None


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def opt_state_shardings(mesh: Mesh, tx_init, params, p_shardings):
    """NamedSharding tree for an optax state: optimizer moments structurally
    mirror the param tree (their leaf paths end with the full param path), so
    each moment inherits its param's sharding; counts and other scalars stay
    replicated. ``tx_init`` is the optimizer's init fn (evaluated abstractly;
    nothing is materialized here)."""
    import jax

    abstract = jax.eval_shape(tx_init, jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), params))
    flat_params = jax.tree_util.tree_flatten_with_path(p_shardings)[0]
    by_path = sorted(
        ((_path_str(path), s) for path, s in flat_params),
        key=lambda kv: -len(kv[0]),
    )
    rep = NamedSharding(mesh, P())

    def assign(path, leaf):
        ps = _path_str(path)
        for k, s in by_path:
            if ps == k or ps.endswith("/" + k):
                return s
        return rep

    return jax.tree_util.tree_map_with_path(assign, abstract)


def param_shardings(mesh: Mesh, params, fsdp: bool = False, fsdp_min_size: int = 2 ** 16):
    """NamedSharding tree for params: replicated on 'data'; the rule above
    over 'model' when the axis is >1.

    ``fsdp=True`` additionally shards every large parameter over the 'data'
    axis (ZeRO-3 style): the stored params + optimizer moments shrink by the
    data-axis size, and under jit XLA inserts the all-gather before each use
    and a reduce-scatter for the weight gradient — the TPU-native form of
    fully-sharded data parallelism (no wrapper module, just shardings). The
    shard dim is the largest dim divisible by the axis size that is NOT
    already taken by the 'model' rule."""
    model_n = mesh.shape["model"]
    data_n = mesh.shape["data"]
    # Small params (< fsdp_min_size elements) stay replicated: an all-gather
    # of a [C]-bias costs more in collective latency than the bytes saved.

    def assign(path, leaf):
        spec = None
        if model_n > 1:
            path_str = _path_str(path)
            mspec = _is_model_shardable(path_str, leaf.shape)
            if mspec is not None and leaf.shape[-1] % model_n == 0:
                spec = list(mspec)
        if fsdp and data_n > 1 and int(np.prod(leaf.shape)) >= fsdp_min_size:
            axes = spec if spec is not None else [None] * len(leaf.shape)
            cands = [d for d in range(len(leaf.shape))
                     if axes[d] is None and leaf.shape[d] % data_n == 0]
            if cands:
                d = max(cands, key=lambda i: leaf.shape[i])
                axes[d] = "data"
                spec = axes
        if spec is not None:
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)
