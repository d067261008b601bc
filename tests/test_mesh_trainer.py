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
    trainer = EgoNaoTrainer(
        config, os.path.join(str(tmp_path), f"run_{data_axis}x{model_axis}"), mesh=mesh
    )
    trainer.ensure_state()
    return trainer


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
