"""Resume hardening: shape-drift-tolerant restore and wandb-id resolution
(reference: ego_nao_trainer.py:57-82 load_state_dict surgery,
run_experiment.py:188-253 artifact download)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from transfusion_tpu.runner.wandb_resume import is_wandb_ref, resolve_resume
from transfusion_tpu.train.checkpoint import CheckpointManager, tolerant_merge


def test_tolerant_merge_semantics():
    template = {
        "pos": {"pos_embedding": np.zeros((10, 4), np.float32)},
        "head": {"kernel": np.full((3, 5), 7.0, np.float32)},
        "trunk": {"w": np.zeros((2, 2), np.float32)},
        "new_layer": {"w": np.full((2,), 3.0, np.float32)},
    }
    restored = {
        # fewer patches in the checkpoint -> template table wins
        "pos": {"pos_embedding": np.ones((6, 4), np.float32)},
        # head shape drifted -> fresh init wins
        "head": {"kernel": np.ones((3, 9), np.float32)},
        # matching shape -> checkpoint wins
        "trunk": {"w": np.ones((2, 2), np.float32)},
        # extra key in the checkpoint -> ignored
        "stale": {"w": np.ones((1,), np.float32)},
    }
    merged = tolerant_merge(template, restored)
    np.testing.assert_array_equal(merged["pos"]["pos_embedding"], template["pos"]["pos_embedding"])
    np.testing.assert_array_equal(merged["head"]["kernel"], template["head"]["kernel"])
    np.testing.assert_array_equal(merged["trunk"]["w"], restored["trunk"]["w"])
    np.testing.assert_array_equal(merged["new_layer"]["w"], template["new_layer"]["w"])


def test_checkpoint_restore_tolerates_shape_drift(tmp_path):
    """Save under one architecture, restore into a drifted template."""
    from transfusion_tpu.train.step import TrainState

    ckpt = CheckpointManager(str(tmp_path))
    state = TrainState(
        step=jnp.asarray(3),
        params={"a": jnp.ones((4, 4)), "pos": {"pos_embedding": jnp.ones((8, 2))}},
        opt_state={"mu": {"a": jnp.zeros((4, 4)), "pos": {"pos_embedding": jnp.zeros((8, 2))}}},
    )
    path = ckpt.save(0, state)
    ckpt.wait()

    drifted = TrainState(
        step=jnp.asarray(0),
        params={"a": jnp.zeros((4, 4)), "pos": {"pos_embedding": jnp.full((12, 2), 5.0)}},
        opt_state={"mu": {"a": jnp.ones((4, 4)), "pos": {"pos_embedding": jnp.zeros((12, 2))}}},
    )
    restored = ckpt.restore(drifted, path=path)
    np.testing.assert_array_equal(np.asarray(restored.params["a"]), 1.0)  # from ckpt
    # pos table kept from the (larger) template
    np.testing.assert_array_equal(np.asarray(restored.params["pos"]["pos_embedding"]), 5.0)
    # exact-match restore still exact
    same = ckpt.restore(state, path=path)
    assert int(same.step) == 3


class _FakeArtifact:
    def __init__(self, log):
        self.log = log

    def download(self, root):
        os.makedirs(root, exist_ok=True)
        open(os.path.join(root, "_METADATA"), "w").write("{}")
        self.log.append(root)


class _FakeApi:
    def __init__(self, log):
        self.log = log

    def artifact(self, name):
        self.log.append(name)
        return _FakeArtifact(self.log)


class _FakeWandb:
    def __init__(self):
        self.log = []

    def Api(self):
        return _FakeApi(self.log)


def test_is_wandb_ref(tmp_path):
    local = tmp_path / "ckpt"
    local.mkdir()
    assert not is_wandb_ref(str(local))
    assert not is_wandb_ref("runs/egonao/checkpoints/epoch_0001.ckpt")
    assert is_wandb_ref("abc123xy")
    assert is_wandb_ref("abc123xy:v3")
    assert is_wandb_ref("https://wandb.ai/ent/proj/runs/abc123xy")


def test_resolve_resume_downloads_artifact(tmp_path):
    fake = _FakeWandb()
    out = resolve_resume("abc123xy:v2", str(tmp_path), entity="ent", project="proj",
                         wandb_module=fake)
    assert fake.log[0] == "ent/proj/model-abc123xy:v2"
    assert out == os.path.join(str(tmp_path), "checkpoints", "wandb_abc123xy_v2")
    assert os.path.isfile(os.path.join(out, "_METADATA"))
    # second call reuses the download (no new API hit)
    n = len(fake.log)
    out2 = resolve_resume("abc123xy:v2", str(tmp_path), entity="ent", project="proj",
                          wandb_module=fake)
    assert out2 == out and len(fake.log) == n


def test_resolve_resume_url_and_name_guard(tmp_path):
    fake = _FakeWandb()
    out = resolve_resume("https://wandb.ai/ent/proj/runs/zz9top", str(tmp_path),
                         entity="ent", project="proj", wandb_module=fake)
    assert fake.log[0] == "ent/proj/model-zz9top:latest"
    assert out.endswith("wandb_zz9top_latest")
    with pytest.raises(ValueError):
        resolve_resume("my-run-name", str(tmp_path), wandb_module=fake)
    assert resolve_resume(None, str(tmp_path)) is None
