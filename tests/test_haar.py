"""Haar DWT unit tests against a NumPy oracle (SURVEY.md §4 test plan (a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ewvit_tpu.ops.haar import (
    haar_dwt2d,
    haar_dwt2d_multilevel,
    haar_dwt2d_pallas,
    haar_idwt2d,
)


def numpy_haar_oracle(x: np.ndarray):
    """Independent NumPy implementation of the 2x2 Haar block butterfly."""
    n, h, w, c = x.shape
    a = x[:, 0::2, 0::2, :]
    b = x[:, 0::2, 1::2, :]
    cc = x[:, 1::2, 0::2, :]
    d = x[:, 1::2, 1::2, :]
    ll = (a + b + cc + d) / 2
    lh = (a + b - cc - d) / 2
    hl = (a - b + cc - d) / 2
    hh = (a - b - cc + d) / 2
    hf = np.stack([lh, hl, hh], axis=-1).reshape(n, h // 2, w // 2, 3 * c)
    return ll, hf


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 224, 224, 3), (3, 56, 28, 5)])
def test_matches_numpy_oracle(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    ll, hf = jax.jit(haar_dwt2d)(jnp.asarray(x))
    ll_o, hf_o = numpy_haar_oracle(x)
    np.testing.assert_allclose(np.asarray(ll), ll_o, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hf), hf_o, atol=1e-6)


def test_energy_preservation(rng):
    """Orthonormal transform: total energy is preserved."""
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ll, hf = haar_dwt2d(jnp.asarray(x))
    e_in = float(jnp.sum(jnp.asarray(x) ** 2))
    e_out = float(jnp.sum(ll**2) + jnp.sum(hf**2))
    assert abs(e_in - e_out) / e_in < 1e-6


def test_perfect_reconstruction(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
    ll, hf = haar_dwt2d(x)
    xr = haar_idwt2d(ll, hf)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-6)


def test_constant_input_has_zero_highpass():
    x = jnp.full((1, 8, 8, 2), 3.0, dtype=jnp.float32)
    ll, hf = haar_dwt2d(x)
    np.testing.assert_allclose(np.asarray(ll), 6.0, atol=1e-6)  # 3 * 4 / 2
    np.testing.assert_allclose(np.asarray(hf), 0.0, atol=1e-6)


def test_channel_interleave_matches_reference_reshape(rng):
    """Channel index must be c*3 + band (mwt.py:77 reshape semantics)."""
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    _, hf = haar_dwt2d(jnp.asarray(x))
    # Per-channel transform of channel 1 alone:
    _, hf_c1 = haar_dwt2d(jnp.asarray(x[..., 1:2]))
    np.testing.assert_allclose(
        np.asarray(hf[..., 3:6]), np.asarray(hf_c1), atol=1e-6
    )


def test_pallas_matches_jnp(rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ll_p, hf_p = haar_dwt2d_pallas(x, interpret=True)
    ll, hf = haar_dwt2d(x)
    np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hf_p), np.asarray(hf), atol=1e-6)


def test_multilevel_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 224, 224, 3)).astype(np.float32))
    ll, hfs = haar_dwt2d_multilevel(x, levels=3)
    assert ll.shape == (2, 28, 28, 3)
    assert [h.shape for h in hfs] == [
        (2, 112, 112, 9),
        (2, 56, 56, 9),
        (2, 28, 28, 9),
    ]


def test_odd_size_raises():
    with pytest.raises(ValueError):
        haar_dwt2d(jnp.zeros((1, 7, 8, 3)))


def test_grad_flows(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))

    def f(x):
        ll, hf = haar_dwt2d(x)
        return jnp.sum(ll**2) + jnp.sum(hf**2)

    g = jax.grad(f)(x)
    # d/dx of energy of an orthonormal transform = 2x
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x), atol=1e-5)


def test_pallas_reuse_across_jit_traces_no_tracer_leak(rng):
    """Regression: _analysis_matrices was lru_cached as jnp arrays; first
    populating the cache inside one jit trace and reusing it in another
    raised UnexpectedTracerError (seen through the detector scan,
    2026-08-17). The cache now stores numpy only."""
    from ewvit_tpu.ops import haar

    haar._analysis_matrices_np.cache_clear()
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))

    @jax.jit
    def first(x):  # populates the cache inside this trace
        ll, _ = haar.haar_dwt2d_pallas(x, interpret=True)
        return ll

    @jax.jit
    def second(x):  # must not see a leaked tracer from `first`'s trace
        ll, _ = haar.haar_dwt2d_pallas(x, interpret=True)
        return ll

    np.testing.assert_allclose(
        np.asarray(first(x)), np.asarray(second(x)), atol=1e-6)
