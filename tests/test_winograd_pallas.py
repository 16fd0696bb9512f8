"""Pallas Winograd kernel vs direct conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ewvit_tpu.ops.winograd_pallas import conv3x3_winograd_pallas


def _direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape,cout,tile_rows", [
    ((2, 16, 12, 5), 7, 4),
    ((1, 8, 8, 3), 4, 2),
    ((2, 24, 16, 6), 8, 4),
])
def test_pallas_winograd_matches_direct_fp32(rng, shape, cout, tile_rows):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, shape[-1], cout))
                    .astype(np.float32))
    ours = conv3x3_winograd_pallas(x, w, tile_rows=tile_rows, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(_direct(x, w)),
                               atol=1e-4, rtol=1e-4)


def test_pallas_winograd_bf16_tolerance(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 8, 4)) * 0.1)
                    .astype(np.float32))
    ours = conv3x3_winograd_pallas(
        x.astype(jnp.bfloat16), w, tile_rows=4, interpret=True)
    ref = _direct(x, w)
    # bf16 transform-domain multiplies: ~1e-2 relative
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref),
        atol=0.05 * float(jnp.abs(ref).max()))
