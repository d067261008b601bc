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
    # Live BatchNorm running stats when model.batch_norm.use is set
    # (replace_frozen_bn); None (empty pytree) otherwise.
    batch_stats: Any = None


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
            prop["matches"],
            prop["anchors"],
            batch["targets"]["boxes"],
            loss_cfg.rpn_batch_size_per_image,
        )
    noun_l = L.noun_loss(roi["class_logits"], nouns, noun_w) if loss_cfg.noun_on else zero
    verb_l = (
        L.verb_loss(roi["verb_logits"], verbs, verb_w, loss_cfg.verb_bg) if loss_cfg.verb_on else zero
    )
    if loss_cfg.ttc_on and "ttc_hand" in outputs:
        # Transformer head second pass (ego_nao_trainer.py:326-359).
        th = outputs["ttc_hand"]
        ttc_l = L.ttc_hand_loss(th["ttcs"], th["valid"], batch["targets"]["ttcs"], loss_cfg.ttc_beta)
    elif loss_cfg.ttc_on:
        ttc_l = L.ttc_loss(
            roi["ttcs"], ttcs_t, verbs, loss_cfg.ttc_beta, loss_cfg.ttc_bg, loss_cfg.ttc_bg_val
        )
    else:
        ttc_l = zero
    lm_l = (
        L.lm_loss(outputs["lm"], batch["targets"], loss_cfg.last_noun_idx) if loss_cfg.lm_on else zero
    )

    # 6-slot criterion vector [bbox, obj_prop, noun, verb, ttc, lm]. The
    # reference folds the RPN terms into full_bbox_loss under the bbox weight
    # (ego_nao_trainer.py:296-304,377-379) and although it decays a
    # curr_obj_prop_w by obj_prop_rate each epoch (abc_nao_trainer.py:165) it
    # never applies it to any loss. We honor the schema: the trainer computes
    # slot 1's weight as bbox_w * obj_prop * obj_prop_rate**epoch, which is
    # exactly the reference total for its shipped semantics (obj_prop gates
    # on/off at weight 1) and gives obj_prop/obj_prop_rate their documented
    # meaning when non-default.
    stacked = jnp.stack([bbox, obj_l + rpn_box_l, noun_l, verb_l, ttc_l, lm_l])
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


def criterion_weights(criterion: dict, epoch: int = 0):
    """The 6-slot [bbox, obj_prop, noun, verb, ttc, lm] weight vector for an
    epoch. Reference semantics: raw (unnormalized) weights combine the train
    losses (ego_nao_trainer.py:377-379); RPN terms ride inside full_bbox under
    the bbox weight gated by obj_prop > 0 (ego_nao_trainer.py:296-304); the lm
    weight decays by lm_decay per epoch (abc_nao_trainer.py:160-163); and
    obj_prop_rate decays a curr_obj_prop_w per epoch (abc_nao_trainer.py:165)
    that the reference computes but never applies — here it decays slot 1,
    the only reading under which the config key means anything."""
    import numpy as np

    bbox_w = criterion.get("bbox", 0)
    lm_w = criterion.get("lm", 0)
    lm_decay = criterion.get("lm_decay", 0)
    if lm_decay:
        lm_w = lm_w * lm_decay**epoch
    obj_w = bbox_w * criterion.get("obj_prop", 0)
    obj_w = obj_w * criterion.get("obj_prop_rate", 1) ** epoch
    return np.array(
        [bbox_w, obj_w, criterion.get("noun", 0), criterion.get("verb", 0),
         criterion.get("ttc", 0), lm_w],
        np.float32,
    )


def normalized_criterion_weights(criterion: dict):
    """The VALIDATION loss-weight vector [bbox, noun, verb, ttc, lm]: the
    reference normalizes the raw criterion weights to sum 1 for its val loss
    (``abc_nao_trainer.py:57-67`` loss_w = loss_w_init / sum, excluding the
    non-loss keys no_samples/obj_prop/lm_decay/ttc_beta/obj_prop_rate) and
    dots them with the per-term losses (``ego_nao_trainer.py:420-427`` — where
    the reference's per-term values are constant zeros; here they are real)."""
    import numpy as np

    w = np.array(
        [criterion.get(k, 0) for k in ("bbox", "noun", "verb", "ttc", "lm")], np.float32
    )
    s = w.sum()
    return w / s if s > 0 else w


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_cfg: LossConfig,
    noun_w,
    verb_w,
    donate: bool = True,
    bf16_grads: bool = False,
) -> Callable:
    """Build the jit'd train step. loss_w is the dynamic criterion weight
    vector [bbox, obj_prop, noun, verb, ttc, lm]; the lm entry decays per
    epoch (abc_nao_trainer.py:160-163) and the obj_prop entry is
    bbox_w * obj_prop * obj_prop_rate**epoch (abc_nao_trainer.py:68-69,165 —
    see compute_losses for why).

    ``bf16_grads``: differentiate w.r.t. a bf16 view of the >=2D f32 params
    (kernels/embeddings). The flax modules cast those to bf16 inside the
    forward anyway, so forward numerics are IDENTICAL; the payoff is in the
    backward — weight-grad convolutions/dots emit bf16 and the large
    weight-grad reductions move half the HBM bytes. Biases/norm scales stay
    f32 (their per-layer f32 compute paths keep exact numerics); master
    params and RAdam moments stay f32 in the optimizer (mixed-precision
    standard practice)."""

    def to_bf16_grads_view(params):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if (x.dtype == jnp.float32 and x.ndim >= 2) else x,
            params,
        )

    def step_fn(state: TrainState, batch, rng, loss_w, image_hw, update_mult=None):
        # image_hw is static: it selects the compile bucket (one program per
        # resize pair, the recompile-free multiscale scheme). update_mult is
        # an optional 0/1 tree implementing the epoch unfreeze triggers as a
        # dynamic input (no recompile when freezing changes).
        batch = dict(batch, image_hw=image_hw)
        rng = jax.random.fold_in(rng, state.step)
        r_sampling, r_dropout, r_rpn = jax.random.split(rng, 3)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                outputs, mutated = model.apply(
                    variables, batch, True,
                    rngs={"sampling": r_sampling, "dropout": r_dropout},
                    mutable=["batch_stats"],
                )
                new_bs = mutated["batch_stats"]
            else:
                outputs = model.apply(
                    variables, batch, True,
                    rngs={"sampling": r_sampling, "dropout": r_dropout},
                )
                new_bs = None
            stacked, metrics = compute_losses(outputs, batch, r_rpn, loss_cfg, noun_w, verb_w)
            if loss_cfg.agg_mean:
                total = jnp.sum(stacked * loss_w)
            else:
                total = jnp.sum(stacked)
            return total, (metrics, new_bs)

        grad_params = to_bf16_grads_view(state.params) if bf16_grads else state.params
        (loss, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(grad_params)
        if update_mult is not None:
            # Freeze by masking the *gradients* (reference: requires_grad=False,
            # ego_nao_trainer.py:265-272) so optimizer moments stay exactly zero
            # through the frozen phase; also mask the updates so additive terms
            # (weight decay) cannot move frozen params.
            grads = jax.tree.map(lambda g, m: g * m, grads, update_mult)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if update_mult is not None:
            updates = jax.tree.map(lambda u, m: u * m, updates, update_mult)
        params = optax.apply_updates(state.params, updates)
        # Non-finite guard (the reference's documented failure mode is manual
        # restart-on-NaN, README.md:62): a step whose loss or grads went
        # non-finite is skipped wholesale — params and optimizer state keep
        # their previous values — so one bad batch cannot poison training.
        good = jnp.isfinite(loss)
        for g in jax.tree.leaves(grads):
            good &= jnp.all(jnp.isfinite(g))
        keep = lambda new, old: jax.tree.map(  # noqa: E731
            lambda n, o: jnp.where(good, n, o.astype(n.dtype)), new, old
        )
        params = keep(params, state.params)
        opt_state = keep(opt_state, state.opt_state)
        if new_bs is not None:
            new_bs = keep(new_bs, state.batch_stats)
        metrics = {"loss": loss, **metrics, "nonfinite_skipped": 1.0 - good.astype(jnp.float32)}
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state, batch_stats=new_bs),
            metrics,
        )

    return jax.jit(step_fn, static_argnums=(4,), donate_argnums=(0,) if donate else ())


def make_eval_step(model, detector_cfg, noun_verb_frequencies=None) -> Callable:
    """Eval: forward_w_dets equivalent — forward + postprocess, returning
    fixed-shape detections for host-side metric/export."""
    from transfusion_tpu.models.detector import detections_from_outputs

    def step_fn(params, batch, image_hw, batch_stats=None):
        batch = dict(batch, image_hw=image_hw)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        outputs = model.apply(variables, batch, False)
        dets = detections_from_outputs(
            outputs, detector_cfg, noun_verb_frequencies=noun_verb_frequencies, training=False
        )
        if getattr(model.cfg, "ttc_hand", None) is not None and "hand_boxes" in batch:
            # Transformer TTC second pass over the postprocessed detections
            # (faster_rcnn_wrapper.py:219-263).
            dets = model.apply(
                {"params": params}, dets, outputs["roi_outputs"], batch, image_hw,
                method="predict_ttc",
            )
        return dets

    return jax.jit(step_fn, static_argnums=(2,))


def make_eval_loss_step(
    model, detector_cfg, loss_cfg: LossConfig, noun_w, verb_w, noun_verb_frequencies=None
) -> Callable:
    """Eval forward producing detections AND real validation losses in one
    compiled program (one shared trunk — see TransFusion.eval_with_losses).

    loss_w is the NORMALIZED 5-slot [bbox, noun, verb, ttc, lm] vector
    (``normalized_criterion_weights``); the returned metrics dict carries the
    combined val loss plus every per-term loss. The reference logs this
    weighting applied to constant zeros (ego_nao_trainer.py:407-427)."""
    from transfusion_tpu.models.detector import detections_from_outputs

    def step_fn(params, batch, loss_w, image_hw, batch_stats=None):
        batch = dict(batch, image_hw=image_hw)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        outputs = model.apply(
            variables, batch, method="eval_with_losses",
            rngs={"sampling": jax.random.key(0)},
        )
        dets = detections_from_outputs(
            outputs["eval"], detector_cfg, noun_verb_frequencies=noun_verb_frequencies,
            training=False,
        )
        if getattr(model.cfg, "ttc_hand", None) is not None and "hand_boxes" in batch:
            dets = model.apply(
                {"params": params}, dets, outputs["eval"]["roi_outputs"], batch, image_hw,
                method="predict_ttc",
            )
            # With the transformer head the linear per-RoI ttc slot is a
            # placeholder (roi_heads.py:108-112); the val ttc loss scores the
            # second-pass detections like the training path does.
            k = min(model.cfg.max_ttc_boxes, dets["ttcs"].shape[1])
            outputs["loss"]["ttc_hand"] = {
                "ttcs": dets["ttcs"][:, :k], "valid": dets["valid"][:, :k]
            }
        stacked, metrics = compute_losses(
            outputs["loss"], batch, jax.random.key(1), loss_cfg, noun_w, verb_w
        )
        # Validation stack excludes the RPN slot ([bbox, noun, verb, ttc, lm],
        # ego_nao_trainer.py:420); the objectness term is still logged.
        val_stack = jnp.stack([stacked[0], stacked[2], stacked[3], stacked[4], stacked[5]])
        total = jnp.sum(val_stack * loss_w) if loss_cfg.agg_mean else jnp.sum(val_stack)
        return dets, {"loss": total, **metrics}

    return jax.jit(step_fn, static_argnums=(3,))


def init_state(model, tx, batch, rng) -> TrainState:
    # Init under jit: eager flax init dispatches thousands of tiny ops, each
    # paying a full host->device round trip (minutes through a remote-TPU
    # relay); one compiled init program is a single dispatch and lands in the
    # persistent compilation cache.
    variables = jax.jit(
        lambda r: model.init(
            {"params": r, "sampling": jax.random.key(1), "dropout": jax.random.key(2)},
            batch,
            True,
        )
    )(rng)
    params = variables["params"]
    return TrainState(
        step=jnp.asarray(0),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats"),
    )
