"""Losses: weighted BCE, binary focal loss, orthogonality constraint.

Equivalents of the reference's loss surface:
- ``weighted_bce_with_logits`` ≙ ``BCEWithLogitsLoss(pos_weight=...)`` — the
  actual training criterion (/root/reference/train.py:270-272).
- ``binary_focal_loss`` ≙ ``BinaryFocalLoss`` (/root/reference/config/focal_loss.py:17-52)
  — imported but unused by the reference's train loop; provided for parity.
- ``orthogonal_loss`` ≙ normalized cross-covariance off-diagonal penalty
  (/root/reference/train.py:55-67).
- ``combined_loss`` ≙ cls + ramped orthogonality (/root/reference/train.py:69-91):
  no orth term before 20% of epochs, then λ ramps linearly to 1 over the next
  50% of epochs.

All losses compute in float32 regardless of model compute dtype.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def weighted_bce_with_logits(logits, targets, pos_weight=1.0,
                             reduction: str = "mean"):
    """torch BCEWithLogitsLoss(pos_weight): -[w*y*log σ(x) + (1-y)*log(1-σ(x))]."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def binary_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0,
                      reduction: str = "mean"):
    """sigmoid -> BCE -> (1-p_t)^gamma modulation -> per-class alpha weighting."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    ce = -(targets * jax.nn.log_sigmoid(logits)
           + (1.0 - targets) * jax.nn.log_sigmoid(-logits))
    p = jax.nn.sigmoid(logits)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    alpha_w = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    loss = alpha_w * (1.0 - p_t) ** gamma * ce
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def orthogonal_loss(space_feats, freq_feats):
    """Off-diagonal Frobenius² of the normalized cross-covariance (train.py:55-67)."""
    space = space_feats.astype(jnp.float32)
    freq = freq_feats.astype(jnp.float32)
    feat_dim = space.shape[1]
    space = space / jnp.maximum(
        jnp.linalg.norm(space, axis=1, keepdims=True), 1e-12)
    freq = freq / jnp.maximum(
        jnp.linalg.norm(freq, axis=1, keepdims=True), 1e-12)
    cov = space.T @ freq                                   # [D, D]
    off = cov * (1.0 - jnp.eye(feat_dim, dtype=jnp.float32))
    return jnp.sum(off**2) / (feat_dim * (feat_dim - 1))


def orth_lambda(epoch, max_epochs, start_frac: float = 0.2,
                ramp_frac: float = 0.5):
    """λ schedule: 0 before start_frac*max, then linear to 1 over ramp_frac*max."""
    e = jnp.asarray(epoch, jnp.float32)
    m = jnp.asarray(max_epochs, jnp.float32)
    lam = jnp.clip((e - start_frac * m) / (ramp_frac * m), 0.0, 1.0)
    return jnp.where(e < start_frac * m, 0.0, lam)


def combined_loss(outputs: Dict, labels, criterion, epoch, max_epochs,
                  valid_mask=None) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """cls loss + ramped orthogonality between space/freq feats (train.py:69-91).

    ``criterion`` is a callable (logits, targets) -> scalar. ``epoch`` may be a
    traced value; the gate is a jnp.where so the step stays jittable.

    ``valid_mask`` (``[B]`` 0/1 floats, optional): excludes rows from BOTH
    loss terms — used by the eval path to keep ``pad_last`` loader padding
    out of reported losses. With a mask of ``n`` ones the result is
    identical to computing on the first ``n`` rows alone: the cls loss
    becomes a masked mean, and zeroed (row-normalized) feature rows
    contribute nothing to the orthogonality cross-covariance, whose
    normalization is by feature dim only (train.py:66).
    """
    logits = outputs["logits"]
    labels = labels.reshape(-1, 1).astype(jnp.float32)
    if valid_mask is None:
        cls_loss = criterion(logits, labels)
        space = outputs.get("space")
        freq = outputs.get("freq")
    else:
        m = valid_mask.reshape(-1, 1).astype(jnp.float32)
        per_row = criterion(logits, labels, reduction="none")
        cls_loss = (per_row * m).sum() / jnp.maximum(m.sum(), 1.0)
        space = outputs.get("space")
        freq = outputs.get("freq")
        if space is not None and freq is not None:
            space = space * m
            freq = freq * m
    if space is not None and freq is not None:
        loss_orth = orthogonal_loss(space, freq)
    else:
        loss_orth = jnp.asarray(0.0, jnp.float32)
    lam = orth_lambda(epoch, max_epochs)
    total = cls_loss + lam * loss_orth
    return total, {"cls_loss": cls_loss, "orth_loss": loss_orth,
                   "lambda_orth": lam}
