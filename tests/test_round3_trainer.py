"""Round-3 trainer features: the wandb upload round-trip (artifacts a fresh
run can resume from), real validation losses, cross-host eval fusion, the
monitor-named best-checkpoint pointer, and the hash-tokenizer guard."""

import json
import os
import shutil

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
    cfg_path = code / "run_cfg.yml"
    cfg_path.write_text(RUN_CFG)
    os.environ["CODE"] = str(code)
    os.environ["DATA"] = str(data)
    return str(cfg_path)


def _make_trainer(cfg_path, run_dir):
    from transfusion_tpu.config import derive_config, load_config
    from transfusion_tpu.runner.trainer import EgoNaoTrainer

    config = derive_config(load_config(cfg_path), {"debug": False, "resume_from": ""})
    return EgoNaoTrainer(config, run_dir)


@pytest.fixture(scope="module")
def trainer(trainer_env, tmp_path_factory):
    return _make_trainer(trainer_env, str(tmp_path_factory.mktemp("run")))


# --------------------------------------------------------------- wandb stubs


class _FakeArtifact:
    def __init__(self, name, type):
        self.name = name
        self.type = type
        self.files = []
        self.dirs = []

    def add_dir(self, path):
        self.dirs.append(path)

    def add_file(self, path):
        self.files.append(path)


class _FakeWandbModule:
    Artifact = _FakeArtifact


class _FakeWandbRun:
    def __init__(self, id="run3abc", store=None):
        self.id = id
        self.logged = []
        self.artifacts = []
        self.store = store if store is not None else {}

    def log(self, record, step=None):
        self.logged.append((step, dict(record)))

    def log_artifact(self, art):
        self.artifacts.append(art)
        # Persist dir contents like the wandb backend would, so a fake Api
        # can serve the artifact back to resolve_resume.
        versions = [n for n in self.store if n.startswith(art.name + ":")]
        key = f"{art.name}:v{len(versions)}"
        self.store[key] = {"dirs": list(art.dirs), "files": list(art.files)}
        self.store[f"{art.name}:latest"] = self.store[key]


class _FakeApiArtifact:
    def __init__(self, entry):
        self.entry = entry

    def download(self, root):
        os.makedirs(root, exist_ok=True)
        for d in self.entry["dirs"]:
            # wandb add_dir stores the dir CONTENTS at artifact root.
            for name in os.listdir(d):
                src = os.path.join(d, name)
                dst = os.path.join(root, name)
                if os.path.isdir(src):
                    shutil.copytree(src, dst, dirs_exist_ok=True)
                else:
                    shutil.copy2(src, dst)
        for f in self.entry["files"]:
            shutil.copy2(f, root)
        return root


class _FakeWandbDownload:
    """Stub passed to resolve_resume: serves artifacts logged by _FakeWandbRun."""

    def __init__(self, store):
        self.store = store

    def Api(self):
        outer = self

        class _Api:
            def artifact(self, name):
                # strip entity/project prefix
                short = name.split("/")[-1]
                return _FakeApiArtifact(outer.store[short])

        return _Api()


# -------------------------------------------------------------------- tests


def test_fit_logs_live_uploads_artifacts_and_best_pointer(trainer):
    store = {}
    wb = _FakeWandbRun(store=store)
    history = trainer.fit(epochs=1, wandb_run=wb, wandb_module=_FakeWandbModule,
                          log_checkpoints=True)
    assert len(history) == 1
    # Live per-epoch scalar logging (not a post-hoc replay).
    assert wb.logged and wb.logged[0][0] == 0
    rec = wb.logged[0][1]
    assert "train_loss" in rec

    # Real validation losses with the normalized weight vector (the
    # reference's val losses are constant zeros, ego_nao_trainer.py:407-427).
    assert "val_loss" in rec and np.isfinite(rec["val_loss"])
    assert "val_noun_loss" in rec and rec["val_noun_loss"] > 0
    assert "val_bbox_loss" in rec

    # Checkpoint artifact model-<id> (the address resolve_resume expects) and
    # the per-epoch result JSON artifact.
    names = {(a.name, a.type) for a in wb.artifacts}
    assert (f"model-{wb.id}", "model") in names
    assert (f"results-{wb.id}", "result") in names
    assert f"model-{wb.id}:v0" in store

    # Monitor-named best pointer (reference names checkpoints by the
    # monitored metric, factories.py:36-59).
    best_path = os.path.join(trainer.ckpt.dir, "best.json")
    assert os.path.isfile(best_path)
    best = json.load(open(best_path))
    assert best["metric"] == trainer.monitor and best["epoch"] == 0
    assert best["value"] == pytest.approx(rec[trainer.monitor])

    # Round trip: a fresh run resumes from the uploaded artifact by id:vN.
    from transfusion_tpu.runner.wandb_resume import resolve_resume

    target_dir = trainer.run_dir + "_resume"
    local = resolve_resume(f"{wb.id}:v0", target_dir, entity="e", project="p",
                           wandb_module=_FakeWandbDownload(store))
    assert local and os.path.isdir(local)
    trainer.state = None
    trainer.ensure_state(resume_from=local)
    assert int(trainer.state.step) >= 1  # restored trained state, not fresh


def test_do_not_log_checkpoints_skips_model_artifacts(trainer):
    wb = _FakeWandbRun(id="nockpt")
    trainer.state = None
    trainer.fit(epochs=1, wandb_run=wb, wandb_module=_FakeWandbModule,
                log_checkpoints=False)
    assert all(a.type != "model" for a in wb.artifacts)
    assert wb.logged  # scalars still logged


def test_sharded_eval_fuses_to_single_process_metric(trainer, monkeypatch):
    """process_count=2 evaluation fuses shard (preds, labels) + results so the
    logged metric equals the single-process run — the fix for the caveat the
    reference only documents (README.md:59)."""
    import transfusion_tpu.runner.trainer as trainer_mod

    trainer.state = None
    trainer.ensure_state()
    full = trainer.evaluate(0, export=True)
    full_json = json.load(open(full.result_json_path))
    map_keys = [k for k in full.metrics if k.startswith(("map_", "ap_"))]
    assert map_keys

    # Phase 1: capture each shard's (pairs, results) payload.
    captured = {}

    def run_shard(idx, gather):
        monkeypatch.setattr(trainer, "_process_count", lambda: 2)
        monkeypatch.setattr(trainer, "_process_index", lambda: idx)
        monkeypatch.setattr(trainer_mod, "allgather_pyobj", gather)
        try:
            return trainer.evaluate(0, export=(idx == 0))
        finally:
            monkeypatch.setattr(trainer, "_process_count", lambda: 1)
            monkeypatch.setattr(trainer, "_process_index", lambda: 0)

    for idx in (0, 1):
        def capture(obj, n=None, idx=idx):
            captured[idx] = obj
            return [obj]

        run_shard(idx, capture)
    # Shards are genuinely partial.
    assert 0 < len(captured[0][0]) < len(full_json["results"]) + 1
    assert set(captured[0][1]) | set(captured[1][1]) == set(full_json["results"])
    assert set(captured[0][1]) & set(captured[1][1]) == set()

    # Phase 2: real fusion semantics — every shard sees both payloads.
    fused = run_shard(0, lambda obj, n=None: [captured[0], captured[1]])
    for k in map_keys:
        assert fused.metrics[k] == pytest.approx(full.metrics[k]), k
    fused_json = json.load(open(fused.result_json_path))
    assert set(fused_json["results"]) == set(full_json["results"])


def test_hash_tokenizer_guard_raises_on_pretrained_checkpoint(trainer, tmp_path):
    """Restoring a translate_checkpoint-produced (pretrained-tower) checkpoint
    while the tokenizer is a hash fallback must fail loudly."""
    assert getattr(trainer.tokenizer, "is_hash_fallback", False), (
        "test env should have no vocab files -> hash fallback active"
    )
    ckpt = tmp_path / "translated_ckpt"
    ckpt.mkdir()
    with open(str(ckpt) + ".provenance.json", "w") as fp:
        json.dump({"source": "torch_translation", "pretrained_language_tower": True}, fp)
    trainer.state = None
    with pytest.raises(RuntimeError, match="hash fallback"):
        trainer.ensure_state(resume_from=str(ckpt))
    trainer.state = None


def test_allgather_pyobj_single_process_identity():
    from transfusion_tpu.parallel.mesh import allgather_pyobj

    obj = {"a": np.arange(3), "b": [(1, "x")]}
    out = allgather_pyobj(obj, process_count=1)
    assert len(out) == 1 and out[0]["b"] == [(1, "x")]


def test_stop_grad_rebuild_preserves_live_state(trainer_env, tmp_path):
    """The per-epoch frozen-prefix tape cut rebuilds the compiled steps; the
    live TrainState (possibly restored mid-training) must survive the rebuild
    — the cut is weightless (regression: _build_steps resets self.state for
    the cold-init path, which nuked restored params on the first epoch of
    any train_ep: -1 config)."""
    import jax

    tr = _make_trainer(trainer_env, str(tmp_path / "run_sg"))
    tr.ensure_state()
    leaf_before = np.asarray(jax.tree_util.tree_leaves(tr.state.params)[0])

    from transfusion_tpu.runner.trainer import backbone_stop_grad_stages

    stages = backbone_stop_grad_stages(0, tr.config["model"], -1)
    assert stages == 5, "mini config has train_ep -1 -> fully frozen body"
    tr._set_stop_grad_stages(stages)
    assert tr.state is not None, "rebuild dropped the live train state"
    np.testing.assert_array_equal(
        leaf_before, np.asarray(jax.tree_util.tree_leaves(tr.state.params)[0]))
    assert tr.model_cfg.detector.stop_grad_stages == 5


def test_pretrained_init_applies_weights_and_load_fpn_rpn_ejects(trainer_env, tmp_path):
    """model.pretrained cold-start init (reference rcnn_factory.py:85-108):
    an orbax params dir is merged into the fresh init, and load_fpn_rpn:
    False reverts fpn/rpn/roi subtrees to fresh (rcnn_factory.py:93-99)."""
    import jax
    import orbax.checkpoint as ocp

    src = _make_trainer(trainer_env, str(tmp_path / "src"))
    src.ensure_state()
    params = jax.tree.map(lambda x: np.array(x), src.state.params)
    # Perturb one backbone leaf (should transfer) and one rpn-head leaf
    # (should be ejected by load_fpn_rpn: False).
    bb = params["rcnn"]["backbone"]
    bb_key = next(iter(bb))
    bb_leaf_path = bb[bb_key]
    while isinstance(bb_leaf_path, dict):
        bb_key_inner = next(iter(bb_leaf_path))
        bb_leaf_parent, bb_leaf_path = bb_leaf_path, bb_leaf_path[bb_key_inner]
    bb_leaf_parent[bb_key_inner] = bb_leaf_path + 1.5
    rpn_conv = params["rcnn"]["rpn_head"]["conv"]
    rpn_fresh = np.array(rpn_conv["kernel"])
    rpn_conv["kernel"] = rpn_conv["kernel"] + 2.5
    ckpt_dir = str(tmp_path / "pretrained_params")
    ocp.StandardCheckpointer().save(os.path.abspath(ckpt_dir), params, force=True)

    from transfusion_tpu.config import derive_config, load_config
    from transfusion_tpu.runner.trainer import EgoNaoTrainer

    config = derive_config(load_config(trainer_env), {"debug": False, "resume_from": ""})
    config["model"]["pretrained"] = ckpt_dir
    config["model"]["load_fpn_rpn"] = False
    tr = EgoNaoTrainer(config, str(tmp_path / "dst"))
    tr.ensure_state()
    got = jax.tree.map(np.asarray, tr.state.params)
    inner = got["rcnn"]["backbone"][bb_key]
    while isinstance(inner, dict):
        inner = inner[next(iter(inner))]
    np.testing.assert_allclose(inner, bb_leaf_parent[bb_key_inner], atol=1e-6)
    # Same seed + config -> fresh init equals src's pre-perturbation values.
    np.testing.assert_allclose(
        got["rcnn"]["rpn_head"]["conv"]["kernel"], rpn_fresh, atol=1e-6)
