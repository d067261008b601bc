"""Orbax checkpointing + the reference's resume/transfer behaviors.

Covers the reference's checkpoint surface (SURVEY.md §5): per-epoch saves
named by the monitored STA metric (``runner/utils/factories.py:36-59``),
resume from a path, and the ``replace_heads`` transfer path that keeps a
pretrained trunk but re-initializes classifier/box-regressor heads
(``runner/run_experiment.py:417-435``).
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def monitor_metric_name(criterion: dict) -> str:
    """ModelCheckpoint monitor selection (factories.py:36-59)."""
    if criterion.get("bbox") and criterion.get("noun") and criterion.get("verb") and criterion.get("ttc"):
        return "map_box_noun_verb_ttc_val"
    if criterion.get("bbox") and criterion.get("noun") and criterion.get("verb"):
        return "map_box_noun_verb_val"
    if criterion.get("bbox") and criterion.get("noun"):
        return "map_box_noun_val"
    raise NotImplementedError("unsupported criterion combination for checkpoint monitor")


class CheckpointManager:
    """Thin orbax wrapper: save every epoch (save_top_k=-1 semantics), keep a
    'latest' pointer, restore by path or epoch."""

    def __init__(self, run_dir: str):
        self.dir = os.path.abspath(os.path.join(run_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def epoch_path(self, epoch: int) -> str:
        return os.path.join(self.dir, f"epoch_{epoch:04d}")

    def save(self, epoch: int, state, metrics: dict | None = None) -> str:
        path = self.epoch_path(epoch)
        self._ckpt.save(path, jax.device_get(state), force=True)
        if metrics:
            with open(path + ".metrics", "w") as fp:
                fp.write(repr({k: float(v) for k, v in metrics.items()}))
        return path

    def latest_epoch(self) -> int | None:
        eps = []
        for name in os.listdir(self.dir):
            m = re.fullmatch(r"epoch_(\d+)", name)
            if m:
                eps.append(int(m.group(1)))
        return max(eps) if eps else None

    def restore(self, state_template, path: str | None = None, epoch: int | None = None,
                tolerant: bool = True):
        if path is None:
            if epoch is None:
                epoch = self.latest_epoch()
            if epoch is None:
                raise FileNotFoundError(f"no checkpoints under {self.dir}")
            path = self.epoch_path(epoch)
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(state_template))
        try:
            raw = self._ckpt.restore(os.path.abspath(path), abstract)
        except Exception:
            if not tolerant:
                raise
            # Tree-structure drift (missing/renamed keys): restore raw and
            # merge leaf-wise (the reference's load_state_dict surgery,
            # ego_nao_trainer.py:57-82).
            raw = self._ckpt.restore(os.path.abspath(path))
            return tolerant_merge(state_template, raw)
        # Orbax restores the SAVED shapes even under a drifted abstract
        # template — check and fall back to the merge on any mismatch.
        t_flat = _flat_by_path(jax.device_get(state_template))
        r_flat = _flat_by_path(raw)
        drift = any(
            tuple(np.shape(r_flat.get(k, v))) != tuple(np.shape(v)) for k, v in t_flat.items()
        )
        if drift:
            if not tolerant:
                raise ValueError("checkpoint/model shape drift (pass tolerant=True to merge)")
            return tolerant_merge(state_template, raw)
        return raw

    def wait(self):
        self._ckpt.wait_until_finished()


def _flat_by_path(tree) -> dict:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        "/".join(str(getattr(p, "key", p)) for p in path): leaf for path, leaf in flat
    }


def tolerant_merge(template: Any, restored: Any) -> Any:
    """Shape-drift-tolerant checkpoint merge (reference load_state_dict,
    ego_nao_trainer.py:57-82): leaves whose path+shape match are taken from
    the checkpoint; pos-embedding rows smaller than the template keep the
    template's table (the reference's resize_spec-drift rule — identical for
    sinusoidal embeddings anyway); any other mismatch or missing/extra key
    keeps the template and is logged."""
    import logging

    log = logging.getLogger("transfusion_tpu")
    restored_flat = _flat_by_path(restored)

    def merge(path, tmpl):
        joined = "/".join(str(getattr(p, "key", p)) for p in path)
        got = restored_flat.get(joined)
        if got is None:
            log.warning("checkpoint missing %s; keeping fresh init", joined)
            return tmpl
        t_shape = tuple(np.shape(tmpl))
        g_shape = tuple(np.shape(got))
        if t_shape == g_shape:
            return got
        if "pos_embedding" in joined and len(g_shape) == len(t_shape):
            log.warning("pos embedding %s %s -> %s: keeping template table", joined, g_shape, t_shape)
            return tmpl
        log.warning("shape drift at %s: ckpt %s vs model %s; keeping fresh init", joined, g_shape, t_shape)
        return tmpl

    return jax.tree_util.tree_map_with_path(merge, template)


HEAD_KEYS = ("noun_classifier", "verb_classifier", "box_regressor")


def replace_heads(restored_params: Any, fresh_params: Any) -> Any:
    """Transfer-learning surgery: keep the restored trunk, take the freshly
    initialized classification/regression heads (run_experiment.py:417-435)."""

    def merge(path, restored, fresh):
        joined = "/".join(str(getattr(p, "key", p)) for p in path)
        if any(h in joined for h in HEAD_KEYS):
            return fresh
        return restored

    return jax.tree_util.tree_map_with_path(merge, restored_params, fresh_params)
