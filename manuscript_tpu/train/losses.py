"""Training losses (jit-friendly, no data-dependent branches).

EAST loss semantics per the reference (reference:
src/manuscript/detectors/_east/loss.py:5-62): dice on the score map + per-
pixel L1 summed over the 8 geometry channels, masked by the GT score map;
optional focal re-weighting (1−e^{−L})^γ; optional per-sample OHEM top-k over
a fixed pixel ratio; zero loss (with gradient flow) when a batch has no
positive pixels — expressed as ``jnp.where`` guards instead of Python
branches so one compiled program serves every batch.

TRBA loss: cross-entropy with PAD ignored (reference: train.py:478).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def dice_loss(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """1 − 2·|gt∩pred| / (|gt|+|pred|); global over the batch."""
    inter = jnp.sum(gt * pred)
    union = jnp.sum(gt) + jnp.sum(pred) + 1e-5
    return 1.0 - (2.0 * inter / union)


def east_loss(
    gt_score: jnp.ndarray,  # (B, H, W) or (B, H, W, 1)
    pred_score: jnp.ndarray,
    gt_geo: jnp.ndarray,  # (B, H, W, 8)
    pred_geo: jnp.ndarray,
    use_ohem: bool = False,
    ohem_ratio: float = 0.5,
    use_focal_geo: bool = False,
    focal_gamma: float = 2.0,
) -> jnp.ndarray:
    if gt_score.ndim == 4:
        gt_score = gt_score[..., 0]
    if pred_score.ndim == 4:
        pred_score = pred_score[..., 0]

    n_pos = jnp.sum(gt_score)
    dice = dice_loss(gt_score, pred_score)

    geo_loss_map = jnp.sum(jnp.abs(gt_geo - pred_geo), axis=-1)  # (B, H, W)
    if use_focal_geo:
        focal_weight = (1.0 - jnp.exp(-geo_loss_map)) ** focal_gamma
        geo_loss_map = geo_loss_map * focal_weight
    geo_loss_map = geo_loss_map * gt_score

    if use_ohem:
        b = geo_loss_map.shape[0]
        flat = geo_loss_map.reshape(b, -1)
        k = max(int(ohem_ratio * flat.shape[1]), 1)
        topk, _ = jax.lax.top_k(flat, k)  # static k → single program
        geo_loss = jnp.mean(jnp.mean(topk, axis=1))
    else:
        geo_loss = jnp.sum(geo_loss_map) / (n_pos + 1e-5)

    total = dice + geo_loss
    # no positive pixels anywhere → zero loss, gradient still defined
    return jnp.where(n_pos < 1.0, 0.0 * total, total)


def soft_dice_coefficient(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Validation-quality metric: 2|gt·pred|/(|gt|+|pred|)."""
    inter = jnp.sum(gt * pred)
    union = jnp.sum(gt) + jnp.sum(pred) + 1e-5
    return 2.0 * inter / union


def trba_ce_loss(
    logits: jnp.ndarray,  # (B, T, V)
    targets: jnp.ndarray,  # (B, T) int
    pad_id: int,
) -> jnp.ndarray:
    """Token cross-entropy averaged over non-PAD positions."""
    mask = (targets != pad_id).astype(logits.dtype)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
