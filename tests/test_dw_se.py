"""Tests for the fused depthwise+BN+SiLU+SE-mean kernel (ops/dw_se.py) and
its MBConv wiring (models/efficientnet.py, ``use_pallas_dwse``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ewvit_tpu.ops.dw_se import dw_bn_silu_mean

INTERPRET = jax.default_backend() != "tpu"


def _oracle(x, wk, scale, shift, k):
    c = x.shape[-1]
    h = jax.lax.conv_general_dilated(
        x, wk, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    y = jax.nn.silu(h * scale + shift)
    return y, jnp.mean(y, axis=(1, 2))


@pytest.mark.parametrize("shape,k", [
    ((3, 14, 14, 256), 3),
    ((2, 7, 7, 384), 3),
    ((2, 14, 14, 136), 3),   # non-multiple-of-128 channels
    ((2, 14, 14, 192), 5),   # B0's 5x5 depthwise
    ((1, 2, 2, 128), 3),     # spatial smaller than the halo
])
def test_kernel_exact_fp32(shape, k):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    n, h, w, c = shape
    x = jax.random.normal(ks[0], shape, jnp.float32)
    wk = jax.random.normal(ks[1], (k, k, 1, c), jnp.float32) * 0.2
    scale = jnp.abs(jax.random.normal(ks[2], (c,))) + 0.5
    shift = jax.random.normal(ks[3], (c,)) * 0.1
    yo, mo = _oracle(x, wk, scale, shift, k)
    y, m = dw_bn_silu_mean(x, wk.reshape(k * k, c) * scale, shift,
                           kernel=k, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yo),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(mo),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("variant", ["v2s", "b0"])
def test_backbone_flag_matches_direct(variant):
    """Flag on == flag off through the full backbone (fp32, 64px)."""
    from ewvit_tpu.models.efficientnet import EfficientNetB0, EfficientNetV2S

    cls = EfficientNetV2S if variant == "v2s" else EfficientNetB0
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3), jnp.float32)
    m0 = cls(dtype=jnp.float32)
    m1 = cls(use_pallas_dwse=True, dtype=jnp.float32)
    variables = m0.init(jax.random.PRNGKey(1), x)
    r0 = np.asarray(m0.apply(variables, x))
    r1 = np.asarray(m1.apply(variables, x))
    np.testing.assert_allclose(r1, r0, rtol=2e-4, atol=2e-4)


def test_param_tree_identical_under_flag():
    """Init with the flag on must produce the same tree (converter parity)."""
    from ewvit_tpu.models.efficientnet import EfficientNetV2S

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v0 = EfficientNetV2S(dtype=jnp.float32).init(jax.random.PRNGKey(0), x)
    v1 = EfficientNetV2S(use_pallas_dwse=True,
                         dtype=jnp.float32).init(jax.random.PRNGKey(0), x)
    p0 = jax.tree_util.tree_map(lambda a: a.shape, v0)
    p1 = jax.tree_util.tree_map(lambda a: a.shape, v1)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    assert p0 == p1


def test_train_path_unaffected():
    """The fused path must not engage under train=True (it has no VJP)."""
    from ewvit_tpu.models.efficientnet import MBConv

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16), jnp.float32)
    m = MBConv(16, 16, 3, 1, 4, 0.25, 0.0, False, 0.9, use_pallas_dwse=True,
               dtype=jnp.float32)
    variables = m.init({"params": jax.random.PRNGKey(1)}, x)

    def loss(p):
        out, _ = m.apply({**variables, "params": p}, x, train=True,
                         mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
