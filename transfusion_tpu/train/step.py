"""The pjit'd train/eval steps.

One compiled program per resize bucket: forward (backbone -> fusion -> FPN ->
RPN -> RoI), the 5-component loss of the reference trainer
(``runner/nao/ego_nao_trainer.py:259-398``: bbox+rpn, noun, verb, ttc, lm,
combined with the raw criterion weights when agg == "mean"), gradient,
optimizer update. Under a Mesh with the batch sharded over ``data`` and
replicated params, XLA inserts the gradient all-reduce that replaces the
reference's NCCL DDP.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from transfusion_tpu.train import losses as L


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


@dataclass(frozen=True)
class LossConfig:
    """Static criterion switches (run.criterion + run flags)."""

    bbox_on: bool = True
    obj_prop_on: bool = True
    noun_on: bool = True
    verb_on: bool = True
    ttc_on: bool = False
    lm_on: bool = False
    agg_mean: bool = True
    ttc_beta: float = 1.0
    verb_bg: bool = True
    ttc_bg: bool = False
    ttc_bg_val: float = 0.0
    rpn_batch_size_per_image: int = 256
    last_noun_idx: int = 0


def compute_losses(outputs, batch, rng, loss_cfg: LossConfig, noun_w, verb_w):
    """Returns (stacked-losses [5], metrics dict)."""
    roi = outputs["roi_outputs"]
    nouns, verbs, ttcs_t = roi["labels"]

    zero = jnp.float32(0.0)
    bbox = zero
    obj_l = zero
    rpn_box_l = zero
    if loss_cfg.bbox_on:
        bbox = L.box_loss(roi["box_regression"], nouns, roi["reg_targets"])
    if loss_cfg.obj_prop_on:
        prop = outputs["proposals"]
        obj_l, rpn_box_l = L.rpn_loss(
            rng,
            prop["objectness"],
            prop["pred_bbox_deltas"],
            prop["labels"],
            prop["reg_targets"],
            loss_cfg.rpn_batch_size_per_image,
        )
    full_bbox = bbox + obj_l + rpn_box_l

    noun_l = L.noun_loss(roi["class_logits"], nouns, noun_w) if loss_cfg.noun_on else zero
    verb_l = (
        L.verb_loss(roi["verb_logits"], verbs, verb_w, loss_cfg.verb_bg) if loss_cfg.verb_on else zero
    )
    ttc_l = (
        L.ttc_loss(roi["ttcs"], ttcs_t, verbs, loss_cfg.ttc_beta, loss_cfg.ttc_bg, loss_cfg.ttc_bg_val)
        if loss_cfg.ttc_on
        else zero
    )
    lm_l = (
        L.lm_loss(outputs["lm"], batch["targets"], loss_cfg.last_noun_idx) if loss_cfg.lm_on else zero
    )

    stacked = jnp.stack([full_bbox, noun_l, verb_l, ttc_l, lm_l])
    metrics = {
        "bbox_loss": bbox,
        "objectness_loss": obj_l,
        "loss_rpn_box_reg": rpn_box_l,
        "noun_loss": noun_l,
        "verb_loss": verb_l,
        "ttc_loss": ttc_l,
        "lm_loss": lm_l,
    }
    return stacked, metrics


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_cfg: LossConfig,
    noun_w,
    verb_w,
    donate: bool = True,
) -> Callable:
    """Build the jit'd train step. loss_w is the dynamic criterion weight
    vector [bbox, noun, verb, ttc, lm] (lm entry decays per epoch,
    abc_nao_trainer.py:160-163)."""

    def step_fn(state: TrainState, batch, rng, loss_w, image_hw, update_mult=None):
        # image_hw is static: it selects the compile bucket (one program per
        # resize pair, the recompile-free multiscale scheme). update_mult is
        # an optional 0/1 tree implementing the epoch unfreeze triggers as a
        # dynamic input (no recompile when freezing changes).
        batch = dict(batch, image_hw=image_hw)
        rng = jax.random.fold_in(rng, state.step)
        r_sampling, r_dropout, r_rpn = jax.random.split(rng, 3)

        def loss_fn(params):
            outputs = model.apply(
                {"params": params},
                batch,
                True,
                rngs={"sampling": r_sampling, "dropout": r_dropout},
            )
            stacked, metrics = compute_losses(outputs, batch, r_rpn, loss_cfg, noun_w, verb_w)
            if loss_cfg.agg_mean:
                total = jnp.sum(stacked * loss_w)
            else:
                total = jnp.sum(stacked)
            return total, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if update_mult is not None:
            updates = jax.tree.map(lambda u, m: u * m, updates, update_mult)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **metrics}
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), metrics

    return jax.jit(step_fn, static_argnums=(4,), donate_argnums=(0,) if donate else ())


def make_eval_step(model, detector_cfg, noun_verb_frequencies=None) -> Callable:
    """Eval: forward_w_dets equivalent — forward + postprocess, returning
    fixed-shape detections for host-side metric/export."""
    from transfusion_tpu.models.detector import detections_from_outputs

    def step_fn(params, batch, image_hw):
        batch = dict(batch, image_hw=image_hw)
        outputs = model.apply({"params": params}, batch, False)
        dets = detections_from_outputs(
            outputs, detector_cfg, noun_verb_frequencies=noun_verb_frequencies, training=False
        )
        return dets

    return jax.jit(step_fn, static_argnums=(2,))


def init_state(model, tx, batch, rng) -> TrainState:
    variables = model.init(
        {"params": rng, "sampling": jax.random.key(1), "dropout": jax.random.key(2)},
        batch,
        True,
    )
    params = variables["params"]
    return TrainState(step=jnp.asarray(0), params=params, opt_state=tx.init(params))
