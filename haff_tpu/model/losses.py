"""Loss stack with exact reference semantics (reference: 2Haff/model/
LISA.py:16-59 dice/sigmoid-ce, 346-430 gating/normalization).

All losses take an optional per-pixel validity mask so that padded-canvas
training (static shapes) matches the reference's original-resolution loss:
the reference postprocesses predictions to each GT's resolution and never
sees padding pixels; here GT and predictions live on the fixed square
canvas and padding is masked out of every mean/sum.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dice_loss(inputs: jnp.ndarray, targets: jnp.ndarray, num_masks,
              valid: Optional[jnp.ndarray] = None, scale: float = 1000.0,
              eps: float = 1e-6) -> jnp.ndarray:
    """inputs/targets: (N, H, W) logits / binary. Scaled dice exactly as
    the reference (sigmoid -> /scale -> 1 - (2*inter+eps)/(sum+eps),
    summed over masks / (num_masks + 1e-8))."""
    probs = jax.nn.sigmoid(inputs.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    if valid is not None:
        probs = probs * valid
        t = t * valid
    probs = probs.reshape(probs.shape[0], -1)
    t = t.reshape(t.shape[0], -1)
    numerator = 2.0 * jnp.sum(probs / scale * t, axis=-1)
    denominator = jnp.sum(probs / scale, axis=-1) + jnp.sum(t / scale, axis=-1)
    loss = 1.0 - (numerator + eps) / (denominator + eps)
    return jnp.sum(loss) / (num_masks + 1e-8)


def sigmoid_ce_loss(inputs: jnp.ndarray, targets: jnp.ndarray, num_masks,
                    valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-pixel BCE-with-logits, per-mask pixel mean, summed over masks
    / (num_masks + 1e-8). `valid` masks padding out of the per-mask mean."""
    x = inputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    # log(1 + exp(x)) - x*t, numerically stable
    per_pixel = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if valid is not None:
        v = valid.astype(jnp.float32)
        per_mask = (jnp.sum((per_pixel * v).reshape(x.shape[0], -1), -1)
                    / jnp.maximum(jnp.sum(v.reshape(x.shape[0], -1), -1), 1.0))
    else:
        per_mask = jnp.mean(per_pixel.reshape(x.shape[0], -1), axis=-1)
    return jnp.sum(per_mask) / (num_masks + 1e-8)


def language_model_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                        ignore_index: int = -100) -> jnp.ndarray:
    """HF-style shifted next-token CE, mean over non-ignored targets
    (reference: llava_llama.py:103-118)."""
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def taxonomy_ce_loss(pred_taxonomy_probs: jnp.ndarray,
                     gt_taxonomy: jnp.ndarray,
                     sample_weight=None,
                     logit_ce: bool = False) -> jnp.ndarray:
    """Reference quirk reproduced deliberately (default): the taxonomy head
    already softmaxes its logits (mask_decoder.py predict_taxonomy) and
    CrossEntropyLoss(mean) with soft targets then applies log_softmax AGAIN
    over the probabilities (LISA.py taxonomy_ce_loss). Training-dynamics
    parity requires the same double softmax. sample_weight averages over
    real batch rows only (padded rows excluded).

    logit_ce=True (ModelConfig.taxonomy_logit_ce) breaks the gradient trap:
    log_softmax over log-probabilities is the identity (the log-probs
    already logsumexp to 0), so CE on the head's pre-softmax logits equals
    -sum(t * log(probs)) computed from the probabilities the head returns.
    The backward through the head's softmax is then the healthy
    softmax(z) - t instead of the vanishing double-softmax Jacobian."""
    p = pred_taxonomy_probs.astype(jnp.float32)
    if logit_ce:
        # probs are an f32 softmax output; clamp only guards exact-0
        # underflow (logits spread > ~87) without changing finite grads.
        logp = jnp.log(jnp.maximum(p, 1e-30))
    else:
        logp = jax.nn.log_softmax(p, -1)
    per_sample = -jnp.sum(gt_taxonomy.astype(jnp.float32) * logp, axis=-1)

    if sample_weight is None:
        return jnp.mean(per_sample)
    w = sample_weight.astype(jnp.float32)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def bimanual_mask_losses(pred_left, pred_right, gt_left, gt_right,
                         gt_taxonomy, valid=None, sample_weight=None,
                         bce_weight: float = 2.0, dice_weight: float = 0.5):
    """Taxonomy-gated mask losses (reference LISA.py:359-422).

    pred_*: (B, H, W) logits; gt_*: (B, H, W) binary; gt_taxonomy (B, 4);
    valid: optional (B, H, W) canvas validity; sample_weight: optional
    (B,) 0/1 for padded batch rows.

    Gates: left *= tax[0] + tax[2] + tax[3]; right *= tax[1]+tax[2]+tax[3].
    """
    w_left = gt_taxonomy[:, 0] + gt_taxonomy[:, 2] + gt_taxonomy[:, 3]
    w_right = gt_taxonomy[:, 1] + gt_taxonomy[:, 2] + gt_taxonomy[:, 3]
    pl_ = pred_left * w_left[:, None, None]
    pr_ = pred_right * w_right[:, None, None]
    if sample_weight is None:
        sample_weight = jnp.ones(pred_left.shape[0], jnp.float32)
    num_masks = jnp.sum(sample_weight)

    if valid is not None:
        valid = valid * sample_weight[:, None, None]
    else:
        valid = jnp.broadcast_to(
            sample_weight[:, None, None],
            pred_left.shape).astype(jnp.float32)

    bce = (sigmoid_ce_loss(pl_, gt_left, num_masks, valid)
           + sigmoid_ce_loss(pr_, gt_right, num_masks, valid)) * bce_weight
    dice = (dice_loss(pl_, gt_left, num_masks, valid)
            + dice_loss(pr_, gt_right, num_masks, valid)) * dice_weight
    return bce, dice
