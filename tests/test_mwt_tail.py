"""Fused MWT tail (phase convs + Pallas Winograd multiscale + phase freq).

Exactness contract: in fp32 every piece matches the direct XLA formulation
(reference semantics, /root/reference/network/mwt.py:60-72, :113-117) to
float tolerance; in bf16 only reassociation rounding differs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ewvit_tpu.ops.mwt_tail import (
    freq_from_phases,
    fused_multiscale_winograd,
    multiscale_winograd_u,
    phase_conv_paddings,
)


def _conv(x, w, strides=(1, 1), padding=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _phase_split(dense):
    """Dense [N,H,W,C] -> 4 PC arrays [N,H/2,W/2,C] in the module convention
    PC[p][q][n,k,m] = dense[n, 2k+(1-p), 2m+(1-q)] (p=0 odd rows, p=1 even)."""
    out = []
    for p in (0, 1):
        for q in (0, 1):
            out.append(dense[:, (1 - p)::2, (1 - q)::2, :])
    return out


def test_phase_conv_paddings_match_dense(rng):
    """Stride-2 conv with phase paddings == phases of the stride-1 conv."""
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 5)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)).astype(np.float32))
    expect = _phase_split(_conv(x, w))
    for idx, (p, q) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        got = _conv(x, w, strides=(2, 2), padding=phase_conv_paddings(p, q))
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect[idx]),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,h,w,c,levels,tile_rows", [
    (1, 16, 16, 8, 3, 4),
    (2, 16, 24, 4, 2, 2),
    (1, 32, 16, 8, 1, 8),
])
def test_fused_multiscale_winograd_fp32(rng, n, h, w, c, levels, tile_rows):
    ys = [jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))
          for _ in range(levels)]
    kern = jnp.asarray(
        rng.standard_normal((3, 3, levels * c, c)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))

    expect = jax.nn.relu(_conv(jnp.concatenate(ys, -1), kern) * scale + bias)

    phases = []
    for y in ys:
        phases.extend(_phase_split(y))
    u = multiscale_winograd_u(kern, scale, levels, jnp.float32)
    got = fused_multiscale_winograd(phases, u, bias, tile_rows=tile_rows,
                                    interpret=True)
    # reassemble dense from output phases (fused[r][s][t,b] = out[2t+r,2b+s])
    dense = jnp.stack([jnp.stack([got[0], got[1]], -2),
                       jnp.stack([got[2], got[3]], -2)], 2)
    dense = dense.reshape(n, h, w, c)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(expect),
                               rtol=2e-4, atol=2e-4)


def test_freq_from_phases_matches_strided_conv(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 5)).astype(np.float32))
    expect = _conv(x, w, strides=(2, 2))
    # CLEAN [N, H/2, W/2, C] phases (fused[r][s][t,b] = x[2t+r, 2b+s])
    phases = [x[:, r::2, s::2, :] for r in (0, 1) for s in (0, 1)]
    got = freq_from_phases(phases, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def _mwt_pair(use_fused, dtype, size=32):
    from ewvit_tpu.models.mwt import MWT

    m = MWT(dama_dim=16, levels=3, use_fused_tail=use_fused, dtype=dtype)
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, size, size, 3)),
        dtype)
    return m, x


def test_mwt_fused_tail_matches_direct_fp32():
    m0, x = _mwt_pair(False, jnp.float32)
    m1, _ = _mwt_pair(True, jnp.float32)
    variables = m0.init(jax.random.PRNGKey(0), x)
    # same param tree either way (checkpoint compatibility)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v1)
    ref = m0.apply(variables, x)
    got = m1.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_mwt_fused_tail_bf16_close():
    m0, x = _mwt_pair(False, jnp.bfloat16)
    m1, _ = _mwt_pair(True, jnp.bfloat16)
    variables = m0.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m0.apply(variables, x), np.float32)
    got = np.asarray(m1.apply(variables, x), np.float32)
    denom = max(1e-3, float(np.abs(ref).max()))
    assert np.max(np.abs(got - ref)) / denom < 0.05


def test_mwt_fused_tail_train_falls_back():
    """train=True must take the direct path (Pallas kernel has no VJP)."""
    m1, x = _mwt_pair(True, jnp.float32)
    variables = m1.init(jax.random.PRNGKey(0), x)

    def loss(params):
        out, _ = m1.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
