"""Optimizer + LR schedule factory.

Covers the reference's optimizer table (``runner/metrics_losses/losses.py:12-22``
— sgd/adam/rmsprop/adamw/radam, radam being the vendored rectified Adam the
shipped configs use), the epoch-based schedules
(``runner/abc_nao_trainer.py:203-235``: exponential, multistep, and gradual
warmup into either), and the per-module LR groups
(``runner/nao/ego_nao_trainer.py:440-497``: backbone body and narration
encoder at lr/div_rate, TTC head at lr/ttc_rate).

LR groups are expressed as gradient scaling on labeled subtrees — numerically
identical to per-group learning rates for any lr-linear update rule.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def make_epoch_schedule(scheduler_cfg: dict | None, base_lr: float, steps_per_epoch: int) -> Callable:
    """Epoch-granular LR schedule as a function of the global step."""
    if not scheduler_cfg or not scheduler_cfg.get("use", False):
        return lambda step: base_lr

    name = scheduler_cfg["name"]
    gamma = scheduler_cfg.get("gamma", 0.1)
    milestones = list(scheduler_cfg.get("milestones", []))

    def exponential(epoch):
        return base_lr * gamma**epoch

    def multistep(epoch):
        k = sum(jnp.asarray(epoch >= m, jnp.float32) for m in milestones) if milestones else 0.0
        return base_lr * gamma**k

    if name == "exponential":
        epoch_fn = exponential
    elif name == "multistep":
        epoch_fn = multistep
    elif name == "warmup":
        multiplier = scheduler_cfg.get("multiplier", 1.0)
        total_epoch = scheduler_cfg.get("total_epoch", 1)
        after = scheduler_cfg.get("after_warmup")

        def after_fn(epoch):
            if after == "exponential":
                return base_lr * multiplier * gamma**epoch
            if after == "multistep":
                k = sum(jnp.asarray(epoch >= m, jnp.float32) for m in milestones) if milestones else 0.0
                return base_lr * multiplier * gamma**k
            return base_lr * multiplier

        def epoch_fn(epoch):
            # GradualWarmupScheduler: lr = base * ((mult - 1) * e / total + 1)
            warm = base_lr * ((multiplier - 1.0) * jnp.minimum(epoch, total_epoch) / total_epoch + 1.0)
            return jnp.where(epoch < total_epoch, warm, after_fn(jnp.maximum(epoch - total_epoch, 0)))

    else:
        raise ValueError(f"unknown scheduler {name}")

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) // max(steps_per_epoch, 1)
        return epoch_fn(epoch)

    return schedule


def scale_by_label(scales: dict[str, float], label_fn: Callable[[tuple], str]) -> optax.GradientTransformation:
    """Multiply updates of labeled subtrees by a factor (per-group LR)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        flat = jax.tree_util.tree_flatten_with_path(updates)[0]
        treedef = jax.tree_util.tree_structure(updates)
        scaled = [u * scales.get(label_fn(path), 1.0) for path, u in flat]
        return jax.tree_util.tree_unflatten(treedef, scaled), state

    return optax.GradientTransformation(init, update)


def param_group_label(path) -> str:
    """Label params the way filter_model_params groups them:
    backbone body -> 'encoder', narration encoder -> 'encoder',
    TTC head -> 'ttc', everything else -> 'main'."""
    keys = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(str(k) for k in keys)
    if "backbone" in joined or "narr_encoder" in joined:
        return "encoder"
    if "ttc_pred_layer" in joined:
        return "ttc"
    return "main"


def make_optimizer(
    optimizer_cfg: dict,
    scheduler_cfg: dict | None,
    steps_per_epoch: int,
    grad_clip: float | None = None,
    accumulate: int = 1,
    freeze_mask: Any | None = None,
) -> tuple[optax.GradientTransformation, Callable]:
    """Build the full optax chain for a reference run config."""
    name = optimizer_cfg.get("name", "radam")
    lr = optimizer_cfg.get("lr", 1e-4)
    wd = optimizer_cfg.get("weight_decay", 0.0)
    momentum = optimizer_cfg.get("momentum", 0.9)
    schedule = make_epoch_schedule(scheduler_cfg, lr, steps_per_epoch)

    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))

    sep = optimizer_cfg.get("sep_encoders") or {}
    scales = {}
    if sep.get("div_rate"):
        scales["encoder"] = 1.0 / sep["div_rate"]
    if sep.get("ttc_rate"):
        scales["ttc"] = 1.0 / sep["ttc_rate"]

    if name == "radam":
        core = optax.chain(
            optax.scale_by_radam(),
            optax.add_decayed_weights(wd) if wd else optax.identity(),
        )
    elif name == "adam":
        core = optax.chain(optax.scale_by_adam(), optax.add_decayed_weights(wd) if wd else optax.identity())
    elif name == "adamw":
        core = optax.chain(optax.scale_by_adam(), optax.add_decayed_weights(wd))
    elif name == "sgd":
        core = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.trace(decay=momentum),
        )
    elif name == "rmsprop":
        core = optax.chain(
            optax.scale_by_rms(),
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.trace(decay=momentum),
        )
    else:
        raise ValueError(f"unknown optimizer {name}")

    chain.append(core)
    if scales:
        chain.append(scale_by_label(scales, param_group_label))
    chain.append(optax.scale_by_learning_rate(schedule))

    tx = optax.chain(*chain)
    if freeze_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            freeze_mask,
        )
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx, schedule
