"""Loss parity tests against torch CPU oracles (reference criterion semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ewvit_tpu.train.losses import (
    binary_focal_loss,
    combined_loss,
    orth_lambda,
    orthogonal_loss,
    weighted_bce_with_logits,
)

torch = pytest.importorskip("torch")


def test_weighted_bce_matches_torch(rng):
    logits = rng.standard_normal((16, 1)).astype(np.float32)
    targets = (rng.random((16, 1)) > 0.5).astype(np.float32)
    pw = 0.73
    ours = float(weighted_bce_with_logits(jnp.asarray(logits),
                                          jnp.asarray(targets), pw))
    ref = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([pw]))(
        torch.tensor(logits), torch.tensor(targets)).item()
    assert abs(ours - ref) < 2e-5


def test_focal_loss_matches_reference_formula(rng):
    """Oracle: the reference BinaryFocalLoss math (focal_loss.py:31-48) in torch."""
    logits = rng.standard_normal((32, 1)).astype(np.float32)
    targets = (rng.random((32, 1)) > 0.5).astype(np.float32)
    alpha, gamma = 0.25, 2.0
    ours = float(binary_focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                                   alpha, gamma))
    t_in, t_tg = torch.tensor(logits), torch.tensor(targets)
    p = torch.sigmoid(t_in)
    ce = torch.nn.functional.binary_cross_entropy(p, t_tg, reduction="none")
    p_t = p * t_tg + (1 - p) * (1 - t_tg)
    ref = ((alpha * t_tg + (1 - alpha) * (1 - t_tg))
           * (1 - p_t) ** gamma * ce).mean().item()
    assert abs(ours - ref) < 2e-5


def test_orthogonal_loss_matches_torch(rng):
    """Oracle: the reference orthogonal_loss math (train.py:55-67) in torch."""
    s = rng.standard_normal((8, 128)).astype(np.float32)
    f = rng.standard_normal((8, 128)).astype(np.float32)
    ours = float(orthogonal_loss(jnp.asarray(s), jnp.asarray(f)))
    ts = torch.nn.functional.normalize(torch.tensor(s), p=2, dim=1)
    tf = torch.nn.functional.normalize(torch.tensor(f), p=2, dim=1)
    cov = ts.T @ tf
    off = cov * (1 - torch.eye(128))
    ref = (torch.norm(off, p="fro") ** 2 / (128 * 127)).item()
    assert abs(ours - ref) < 2e-5


def test_orthogonal_loss_zero_for_diagonal_cross_covariance():
    """Loss penalizes only OFF-diagonal cross-covariance (train.py:60-67):
    when space/freq features occupy matching dims, cov is diagonal -> loss 0."""
    s = jnp.eye(4, 8)
    f = jnp.eye(4, 8)
    assert float(orthogonal_loss(s, f)) < 1e-10
    # disjoint-support features -> off-diagonal mass -> strictly positive
    g = jnp.roll(jnp.eye(4, 8), 4, axis=1)
    assert float(orthogonal_loss(s, g)) > 1e-3


def test_orth_lambda_ramp():
    """λ=0 before 20% of epochs, 1 from 70% on, linear between (train.py:76-86)."""
    assert float(orth_lambda(0, 30)) == 0.0
    assert float(orth_lambda(5, 30)) == 0.0
    np.testing.assert_allclose(float(orth_lambda(6, 30)), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(orth_lambda(13.5, 30)), 0.5, atol=1e-6)
    assert float(orth_lambda(21, 30)) == 1.0
    assert float(orth_lambda(29, 30)) == 1.0


def test_combined_loss_gating(rng):
    outputs = {
        "logits": jnp.asarray(rng.standard_normal((4, 1)).astype(np.float32)),
        "space": jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32)),
        "freq": jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32)),
    }
    labels = jnp.asarray([0.0, 1.0, 1.0, 0.0])
    crit = lambda lg, tg: weighted_bce_with_logits(lg, tg, 1.0)  # noqa: E731
    early, parts_e = combined_loss(outputs, labels, crit, epoch=0, max_epochs=30)
    late, parts_l = combined_loss(outputs, labels, crit, epoch=29, max_epochs=30)
    assert float(parts_e["lambda_orth"]) == 0.0
    assert float(parts_l["lambda_orth"]) == 1.0
    np.testing.assert_allclose(float(early), float(parts_e["cls_loss"]), atol=1e-7)
    np.testing.assert_allclose(
        float(late),
        float(parts_l["cls_loss"]) + float(parts_l["orth_loss"]), atol=1e-6)
