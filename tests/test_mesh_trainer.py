"""--mesh-model through the *trainer* path: ensure_state places params (and
optimizer moments) onto the mesh, and a 4x2 data x model mesh trains to the
same loss as 8x1 (SURVEY §2.6 — the model axis is a config change)."""

import os

import numpy as np
import pytest

from tests.fixtures import make_synthetic_ego4d
from tests.test_runner_cli import FUSION_CFG, MODEL_CFG, RUN_CFG


@pytest.fixture(scope="module")
def trainer_env(tmp_path_factory):
    code = tmp_path_factory.mktemp("code")
    data = tmp_path_factory.mktemp("data")
    fixture_root = os.path.join(str(data), "Ego4d", "v1")
    make_synthetic_ego4d(fixture_root, n_train=8, n_val=4, n_test=2, fh=216, fw=288)
    (code / "mini_model.yml").write_text(MODEL_CFG)
    (code / "mini_fusion.yml").write_text(FUSION_CFG)
    # One full batch of 8 so the per-mesh batch rounding is identical.
    cfg_path = code / "run_cfg.yml"
    cfg_path.write_text(RUN_CFG.replace("train_bs: 4", "train_bs: 8"))
    os.environ["CODE"] = str(code)
    os.environ["DATA"] = str(data)
    return str(cfg_path)


def _one_epoch(cfg_path, tmp_path, data_axis, model_axis):
    from transfusion_tpu.config import derive_config, load_config
    from transfusion_tpu.parallel.mesh import make_mesh
    from transfusion_tpu.runner.trainer import EgoNaoTrainer

    config = derive_config(load_config(cfg_path), {"debug": False, "resume_from": ""})
    mesh = make_mesh(data=data_axis, model=model_axis)
    # tp_min_dim=16: the tiny model's fusion matmuls are 64-wide, below the
    # 256 production gate — lowering it makes --mesh-model exercise the tp
    # path for real (the trainer ignoring the gate was a latent round-4 gap:
    # the model axis silently no-opped on small models).
    trainer = EgoNaoTrainer(
        config, os.path.join(str(tmp_path), f"run_{data_axis}x{model_axis}"), mesh=mesh,
        tp_min_dim=16,
    )
    trainer.ensure_state()
    return trainer


@pytest.mark.slow
def test_mesh_model_axis_through_trainer(trainer_env, tmp_path):
    t81 = _one_epoch(trainer_env, tmp_path, 8, 1)
    m81 = t81.train_epoch(0)

    t42 = _one_epoch(trainer_env, tmp_path, 4, 2)
    # Params actually sharded over the model axis in the trainer state.
    shardings = [
        leaf.sharding
        for leaf in __import__("jax").tree.leaves(t42.state.params)
        if hasattr(leaf, "sharding")
    ]
    specs = {str(getattr(s, "spec", "")) for s in shardings}
    assert any("model" in sp for sp in specs), specs
    # Optimizer moments follow the same placement (no host-side surprise).
    opt_specs = {
        str(getattr(leaf.sharding, "spec", ""))
        for leaf in __import__("jax").tree.leaves(t42.state.opt_state)
        if hasattr(leaf, "sharding")
    }
    assert any("model" in sp for sp in opt_specs), opt_specs

    m42 = t42.train_epoch(0)
    assert m81["train_steps"] == m42["train_steps"] >= 1
    np.testing.assert_allclose(m81["train_loss"], m42["train_loss"], rtol=2e-3)


@pytest.mark.slow
def test_mesh_fsdp_through_trainer(trainer_env, tmp_path):
    """ZeRO-3-style FSDP: large params + moments shard over the data axis,
    per-device shards shrink accordingly, and an epoch's loss matches the
    replicated run (XLA's all-gather-on-use + reduce-scatter is semantically
    the same step)."""
    import jax

    from transfusion_tpu.config import derive_config, load_config
    from transfusion_tpu.parallel.mesh import make_mesh
    from transfusion_tpu.runner.trainer import EgoNaoTrainer

    t81 = _one_epoch(trainer_env, tmp_path, 8, 1)
    m81 = t81.train_epoch(0)

    config = derive_config(load_config(trainer_env), {"debug": False, "resume_from": ""})
    tf = EgoNaoTrainer(config, os.path.join(str(tmp_path), "run_fsdp"),
                       mesh=make_mesh(data=8, model=1), fsdp=True)
    tf.ensure_state()

    sharded = 0
    for leaf in jax.tree.leaves(tf.state.params):
        if not hasattr(leaf, "sharding"):
            continue
        if "data" in str(getattr(leaf.sharding, "spec", "")):
            sharded += 1
            shard = leaf.addressable_shards[0].data
            assert shard.size * 8 == leaf.size, (leaf.shape, shard.shape)
    assert sharded >= 5, f"expected several fsdp-sharded params, got {sharded}"
    opt_specs = {
        str(getattr(leaf.sharding, "spec", ""))
        for leaf in jax.tree.leaves(tf.state.opt_state)
        if hasattr(leaf, "sharding")
    }
    assert any("data" in sp for sp in opt_specs), opt_specs

    mf = tf.train_epoch(0)
    assert mf["train_steps"] == m81["train_steps"] >= 1
    np.testing.assert_allclose(m81["train_loss"], mf["train_loss"], rtol=2e-3)


def test_megatron_weight_pairing_rule():
    """The model-axis rule pairs matmuls Megatron-style: first GEMM of each
    pair col-shards (output dim), second row-shards (input dim) so one psum
    per pair returns block IO to replicated — the layout that removes the
    round-3 'Involuntary full rematerialization' XLA fallback."""
    from jax.sharding import PartitionSpec as P

    from transfusion_tpu.parallel.mesh import _is_model_shardable

    col = P(None, "model")
    row = P("model", None)
    assert _is_model_shardable("fusion_2/layer_0/q_proj/kernel", (896, 896)) == col
    assert _is_model_shardable("fusion_2/layer_0/linear1/kernel", (896, 1792)) == col
    assert _is_model_shardable("fusion_2/layer_0/out_proj/kernel", (896, 896)) == row
    assert _is_model_shardable("fusion_2/layer_0/linear2/kernel", (1792, 896)) == row
    # back_proj row-shards: replicated input slices locally, one psum yields
    # the replicated fused map — the fold/transpose never sees a sharded dim.
    assert _is_model_shardable("fusion_3/back_proj/kernel", (896, 2048)) == row
    # BERT tower follows the same pairing.
    assert _is_model_shardable(
        "narr_encoder/bert/layer_0/attention/query/kernel", (384, 384)) == col
    assert _is_model_shardable(
        "narr_encoder/bert/layer_0/attention/output/kernel", (384, 384)) == row
    assert _is_model_shardable(
        "narr_encoder/bert/layer_0/intermediate/kernel", (384, 1536)) == col
    assert _is_model_shardable(
        "narr_encoder/bert/layer_0/output/kernel", (1536, 384)) == row
    # Box head pair.
    assert _is_model_shardable("rcnn/box_head/fc6/kernel", (12544, 1280)) == col
    assert _is_model_shardable("rcnn/box_head/fc7/kernel", (1280, 1280)) == row
    # Conv kernels / small dims / out-of-scope paths stay replicated.
    assert _is_model_shardable("fusion_2/patch_to_token/kernel", (2, 2, 1024, 896)) is None
    assert _is_model_shardable("fusion_2/layer_0/q_proj/kernel", (64, 64)) is None
    assert _is_model_shardable("rcnn/backbone/layer1_0/conv1/kernel", (256, 256)) is None
    # Lowered threshold for tiny-model dryruns/tests.
    assert _is_model_shardable("fusion_2/layer_0/q_proj/kernel", (64, 64), min_dim=16) == col


def test_constrain_activation_is_identity_without_mesh():
    import jax.numpy as jnp

    from transfusion_tpu.parallel.mesh import constrain_activation

    x = jnp.ones((4, 8))
    assert constrain_activation(x, "data", None) is x
    # Non-divisible dims leave the array unconstrained under a mesh.
    from transfusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, model=2)
    with mesh:
        y = jnp.ones((3, 8))
        assert constrain_activation(y, "data", None) is y
        z = constrain_activation(jnp.ones((4, 8)), "data", "model")
        assert "data" in str(z.sharding.spec)


@pytest.mark.slow
def test_dryrun_tp_compiles_without_involuntary_remat(tmp_path):
    """The driver's multi-chip dryrun (dp+tp+fsdp in one program) must
    compile WITHOUT XLA's 'Involuntary full rematerialization' warning — the
    round-3 tail showed the partitioner replicating the fusion activations at
    every level boundary (VERDICT r3 weak #3 / next #3)."""
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("_TRANSFUSION_DRYRUN_CHILD", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=1800,
    )
    combined = proc.stdout + proc.stderr
    assert proc.returncode == 0, combined[-3000:]
    assert "dryrun_multichip OK" in combined
    assert "Involuntary full rematerialization" not in combined, combined[-3000:]
