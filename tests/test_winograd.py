"""Winograd F(2x2,3x3) conv vs the direct-conv oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ewvit_tpu.ops.winograd import conv3x3_winograd, transform_weights


def _direct(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if b is None else y + b


@pytest.mark.parametrize("shape,cout", [((2, 16, 12, 5), 7),
                                        ((1, 8, 8, 3), 4),
                                        ((3, 4, 6, 2), 2)])
def test_winograd_matches_direct_fp32(rng, shape, cout):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, shape[-1], cout))
                    .astype(np.float32))
    b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(conv3x3_winograd(x, w, b)),
        np.asarray(_direct(x, w, b)), atol=1e-4, rtol=1e-4)


def test_weight_transform_shape(rng):
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 9)).astype(np.float32))
    u = transform_weights(w)
    assert u.shape == (4, 4, 6, 9)


def test_winograd_grad_flows(rng):
    """All-linear transform: autodiff works (gradients are finite)."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4)).astype(np.float32))
    g = jax.grad(lambda w: conv3x3_winograd(x, w).sum())(w)
    gd = jax.grad(lambda w: _direct(x, w).sum())(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd), atol=1e-3)
