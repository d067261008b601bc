"""Training losses, masked static-shape versions of the reference's.

Sources: ``runner/metrics_losses/losses.py:98-135`` (box loss, beta=1/9,
sum-reduced over positive rows' class-specific regression, normalized by the
number of sampled proposals), torchvision RPN ``compute_loss`` (sampled BCE
objectness + smooth-L1 box, beta=1/9), and the trainer's class-weighted CE
with bg handling (``runner/abc_nao_trainer.py:32-67``,
``runner/nao/ego_nao_trainer.py:283-374``).

Every function takes explicit validity masks: padded rows (label -1) simply
drop out of the sums with the same normalizations the dynamic-shape
reference computes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from transfusion_tpu.models.roi_heads import IGNORE_VERB_IDX_BG
from transfusion_tpu.ops import BoxCoder, balanced_sample_idx


def smooth_l1(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def box_loss(box_regression, noun_labels, reg_targets):
    """losses.py:98-135: smooth-L1 (beta=1/9) over positive rows'
    class-specific deltas, sum / max(num_sampled, 1).

    box_regression: [B, S, 4*C]; noun_labels: [B, S] (-1 padding, 0 bg);
    reg_targets: [B, S, 4].
    """
    box_regression = box_regression.astype(jnp.float32)
    b, s, _ = box_regression.shape
    reg = box_regression.reshape(b, s, -1, 4)
    cls = jnp.clip(noun_labels, 0)
    per_row = jnp.take_along_axis(reg, cls[..., None, None].astype(jnp.int32), axis=2)[:, :, 0]
    losses = smooth_l1(per_row - reg_targets, beta=1.0 / 9.0).sum(-1)
    pos = noun_labels > 0
    total = jnp.sum(jnp.where(pos, losses, 0.0))
    count = jnp.maximum(jnp.sum(noun_labels >= 0), 1)
    return total / count


def rpn_loss(key, objectness, pred_deltas, labels, matches, anchors, gt_boxes,
             batch_size_per_image, positive_fraction=0.5):
    """torchvision RPN compute_loss with the fixed per-image sampling budget
    (config rpn_batch_size_per_image, ``ego_vis_det_ego4dv2.yml:35``).

    objectness [B, A], pred_deltas [B, A, 4], labels [B, A] in {1, 0, -1},
    matches [B, A] clamped GT index, anchors [A, 4], gt_boxes [B, G, 4].
    Returns (objectness_loss, box_loss).

    Index-form: samples S = batch_size_per_image anchors per image and
    gathers/encodes only those rows, instead of torchvision's dense
    [B, A, 4] encode-everything-then-mask (see assign_targets_to_anchors).
    """
    bsz, s = labels.shape[0], batch_size_per_image

    def per_image(k, lab, match, deltas, obj, gtb):
        idx, sampled_valid = balanced_sample_idx(
            k, lab, jnp.ones_like(lab, dtype=bool), s, positive_fraction)
        lab_s = lab[idx]
        pos = sampled_valid & (lab_s > 0)
        n_sampled = jnp.sum(sampled_valid)

        matched_gt = gtb[match[idx]]
        reg_targets = BoxCoder((1.0, 1.0, 1.0, 1.0)).encode(matched_gt, anchors[idx])
        box = smooth_l1(deltas[idx] - reg_targets, beta=1.0 / 9.0).sum(-1)
        box_total = jnp.sum(jnp.where(pos, box, 0.0))

        logits = obj[idx]
        targets = (lab_s > 0).astype(logits.dtype)
        bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        obj_total = jnp.sum(jnp.where(sampled_valid, bce, 0.0))
        return obj_total, box_total, n_sampled

    keys = jax.random.split(key, bsz)
    obj_t, box_t, n_s = jax.vmap(per_image)(keys, labels, matches, pred_deltas, objectness, gt_boxes)
    denom = jnp.maximum(jnp.sum(n_s), 1)
    return jnp.sum(obj_t) / denom, jnp.sum(box_t) / denom


def weighted_cross_entropy(logits, targets, weights, valid):
    """torch CrossEntropyLoss(weight=w, reduction="mean") with validity mask:
    sum(w_t * nll) / sum(w_t) over valid rows."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    t = jnp.clip(targets, 0)
    nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    w = weights[t] * valid.astype(logits.dtype)
    denom = jnp.maximum(jnp.sum(w), 1e-12)
    return jnp.sum(nll * w) / denom


def noun_loss(class_logits, noun_labels, noun_weights):
    """Class-weighted noun CE over all sampled rows incl. background
    (ego_nao_trainer.py:307-310; the +1e-6 logit shift is a no-op for
    softmax and omitted)."""
    valid = noun_labels >= 0
    return weighted_cross_entropy(class_logits, noun_labels, noun_weights, valid)


def verb_loss(verb_logits, verb_labels, verb_weights, verb_bg: bool):
    """ego_nao_trainer.py:312-322: bg verbs (code 999) remap to the last
    class when verb_bg, else bg rows are excluded entirely."""
    num_verbs = verb_logits.shape[-1]
    is_bg = verb_labels == IGNORE_VERB_IDX_BG
    valid = verb_labels >= 0
    targets = jnp.where(is_bg, num_verbs - 1, verb_labels)
    if not verb_bg:
        valid = valid & ~is_bg
    return weighted_cross_entropy(verb_logits, targets, verb_weights, valid)


def ttc_loss(ttc_preds, ttc_targets, verb_labels, beta: float, ttc_bg: bool = False, ttc_bg_val: float = 0.0):
    """SmoothL1(beta) over rows whose verb target is not background
    (ego_nao_trainer.py:346-359 uses the verb bg code to select rows)."""
    is_bg = verb_labels == IGNORE_VERB_IDX_BG
    valid = verb_labels >= 0
    if ttc_bg:
        targets = jnp.where(is_bg, ttc_bg_val, ttc_targets)
    else:
        targets = ttc_targets
        valid = valid & ~is_bg
    losses = smooth_l1(ttc_preds - targets, beta)
    count = jnp.sum(valid)
    total = jnp.sum(jnp.where(valid, losses, 0.0))
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def ttc_hand_loss(ttc_preds, det_valid, gt_ttcs, beta: float):
    """Transformer-TTC-head criterion (ego_nao_trainer.py:326-359): each
    image's first GT TTC is repeated over its detections; NaN targets and
    invalid/negative-placeholder detections drop out; SmoothL1(beta) mean."""
    tgt = jnp.broadcast_to(gt_ttcs[:, :1], ttc_preds.shape)
    valid = det_valid & jnp.isfinite(tgt) & (ttc_preds >= 0)
    losses = smooth_l1(ttc_preds - jnp.where(valid, tgt, 0.0), beta)
    count = jnp.sum(valid)
    total = jnp.sum(jnp.where(valid, losses, 0.0))
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def lm_loss(lm_outputs, targets, last_noun_idx):
    """LM auxiliary CE (ego_nao_trainer.py:361-374): per-image first gt noun
    (remapping the moved class back to 0) and verb; mean of the two CEs."""
    noun_t = targets["nouns"][:, 0]
    noun_t = jnp.where(noun_t == last_noun_idx, 0, noun_t)
    logp_n = jax.nn.log_softmax(lm_outputs["noun_logits"], axis=-1)
    noun_t = jnp.clip(noun_t, 0, logp_n.shape[-1] - 1)
    l_n = -jnp.take_along_axis(logp_n, noun_t[:, None], axis=-1).mean()
    if lm_outputs.get("verb_logits") is None:
        return l_n
    verb_t = targets["verbs"][:, 0]
    logp_v = jax.nn.log_softmax(lm_outputs["verb_logits"], axis=-1)
    verb_t = jnp.clip(verb_t, 0, logp_v.shape[-1] - 1)
    l_v = -jnp.take_along_axis(logp_v, verb_t[:, None], axis=-1).mean()
    return (l_n + l_v) / 2.0


def build_class_weights(noun_weights, verb_weights, bg_weight: float, verb_bg: bool, all_class_w: bool):
    """abc_nao_trainer.py:32-54: optionally balanced per-class weights,
    bg slot handling for nouns (index 0) and verbs (appended last)."""
    import numpy as np

    n = np.asarray(noun_weights, dtype=np.float64).copy() if all_class_w else np.ones(len(noun_weights))
    v = np.asarray(verb_weights, dtype=np.float64).copy() if all_class_w else np.ones(len(verb_weights))
    if bg_weight != 1:
        n[0] = bg_weight
        if verb_bg:
            v = np.append(v, bg_weight)
    else:
        n[0] = n.mean()
        v = np.append(v, v.mean())
    return jnp.asarray(n, jnp.float32), jnp.asarray(v, jnp.float32)


def hmap_criterion(criterion: dict, pixel_w):
    """Heatmap loss factory for the legacy snao family — ``get_hmap_criterion``
    + ``w_loss`` (runner/metrics_losses/losses.py:25-42,69-98).

    Returns ``fn(preds, targets, fg_perc, bg_perc) -> scalar``. ``pixel_w``
    reweights foreground (target > 0) vs background pixels: a scalar ``w``
    splits as fg = 1 - 1/(1+w), bg = 1/(1+w); the string ``"reg"`` weights by
    the per-sample (1 - fg_perc)/(1 - bg_perc) columns (the reference
    hardcodes both percs to 0.5, base_nao_dataset.py:166-168). ``agg ==
    "sum"`` sums over pixels then means over the batch; anything else is a
    plain mean. The reference's "focal" slot constructs the same
    BCEWithLogits as "ce" (losses.py:35-36) — reproduced.

    ``kl_div`` matches torch ``nn.KLDivLoss``: elementwise
    ``target * (log(target) - pred)`` with preds already log-probabilities
    (the model applies log-softmax when ``kl_div`` is in the criterion) and
    zero where target == 0.
    """
    agg = criterion.get("agg", "mean")

    if criterion.get("mae", 0):
        base = lambda p, t: jnp.abs(p - t)  # noqa: E731
    elif criterion.get("smooth_mae", 0):
        base = lambda p, t: smooth_l1(p - t, beta=1.0)  # noqa: E731
    elif "mse" in criterion:
        base = lambda p, t: (p - t) ** 2  # noqa: E731
    elif "ce" in criterion or "focal" in criterion:
        def base(p, t):  # BCEWithLogitsLoss(reduction="none")
            return jnp.maximum(p, 0) - p * t + jnp.log1p(jnp.exp(-jnp.abs(p)))
    elif "kl_div" in criterion:
        def base(p, t):
            return jnp.where(t > 0, t * (jnp.log(jnp.where(t > 0, t, 1.0)) - p), 0.0)
    else:
        base = lambda p, t: jnp.abs(p - t)  # noqa: E731

    weighted = pixel_w != 1
    if weighted and pixel_w != "reg":
        fg_w = 1.0 - 1.0 / (1.0 + pixel_w)
        bg_w = 1.0 / (1.0 + pixel_w)

    def apply(preds, targets, fg_perc=None, bg_perc=None):
        bs = preds.shape[0]
        losses = base(preds.astype(jnp.float32), targets.astype(jnp.float32))
        t = targets.reshape(bs, -1)
        losses = losses.reshape(bs, -1)
        if pixel_w == "reg":
            fw = (1.0 - fg_perc)[:, None]
            bw = (1.0 - bg_perc)[:, None]
            losses = jnp.where(t > 0, losses * fw, losses * bw)
        elif weighted:
            losses = jnp.where(t > 0, losses * fg_w, losses * bg_w)
        if agg == "sum":
            return losses.sum(axis=-1).mean()
        return losses.mean()

    return apply


def sample_heatmap_coords(key, gt_heatmap, no_samples: int):
    """Draw ``no_samples`` distinct pixel coordinates per image weighted by
    heatmap mass, mapped to the multivar coordinate frame — the sampling half
    of ``multivar_n_loss`` (runner/metrics_losses/losses.py:49-60):
    ``torch.multinomial(replacement=False)`` over the flattened map, unravel,
    then interp y -> [-MAX_STD*h/w, MAX_STD*h/w], x -> [-MAX_STD, MAX_STD].

    Without-replacement sampling uses the Gumbel-top-k trick (exactly the
    multinomial-without-replacement distribution); zero-mass pixels get -inf
    keys and are never drawn. Returns [B, no_samples, 2] as (y, x).
    """
    from transfusion_tpu.data.heatmaps import MAX_STD

    b, h, w = gt_heatmap.shape
    flat = gt_heatmap.reshape(b, h * w).astype(jnp.float32)
    logw = jnp.where(flat > 0, jnp.log(jnp.maximum(flat, 1e-30)), -jnp.inf)
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, flat.shape, minval=1e-12, maxval=1.0)))
    _, idx = jax.lax.top_k(logw + gumbel, no_samples)  # [B, S]
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    sy = h / w
    ys = ys / h * (2 * MAX_STD * sy) - MAX_STD * sy  # np.interp over [0, h]
    xs = xs / w * (2 * MAX_STD) - MAX_STD
    return jnp.stack([ys, xs], axis=-1)


def mvn_nll(loc, scale_tril, samples):
    """Mean negative log-likelihood of ``samples`` [B, S, 2] under the 2-D
    Gaussian N(loc, L L^T) — ``-distribution.log_prob(samples).mean()``
    (losses.py:61) with the 2x2 lower-triangular solve written out."""
    d = (samples - loc[:, None, :]).astype(jnp.float32)
    l00 = scale_tril[:, 0, 0][:, None]
    l10 = scale_tril[:, 1, 0][:, None]
    l11 = scale_tril[:, 1, 1][:, None]
    z0 = d[..., 0] / l00
    z1 = (d[..., 1] - l10 * z0) / l11
    logdet = jnp.log(jnp.abs(l00)) + jnp.log(jnp.abs(l11))
    logp = -0.5 * (z0 ** 2 + z1 ** 2) - logdet - jnp.log(2 * jnp.pi)
    return -logp.mean()


def multivar_n_loss(criterion: dict):
    """``multivar_n_loss`` (runner/metrics_losses/losses.py:44-63): sample
    ``no_samples`` heatmap-weighted coordinates and score them under the
    predicted Gaussian. ``dist`` is the model's {"loc", "scale_tril"} dict
    (models/resnet_nao.ResnetNao under ``multivar_n``)."""
    no_samples = criterion["no_samples"]

    def loss(dist, gt_heatmap, key):
        samples = sample_heatmap_coords(key, gt_heatmap, no_samples)
        return mvn_nll(dist["loc"], dist["scale_tril"], samples)

    return loss
