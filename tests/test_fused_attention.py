"""Fused Pallas DAMA attention vs the unfused XLA path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ewvit_tpu.models.layers import BidirectionalCrossTransformer
from ewvit_tpu.ops.fused_attention import (
    fused_bidirectional_cross_attention,
    params_from_module_tree,
    supports,
)

DIM, HEADS, DEPTH = 128, 4, 2


@pytest.fixture(scope="module")
def setup(request):
    rng = np.random.default_rng(7)
    s = jnp.asarray(rng.standard_normal((5, 1, DIM)).astype(np.float32))
    f = jnp.asarray(rng.standard_normal((5, 1, DIM)).astype(np.float32))
    m = BidirectionalCrossTransformer(dim=DIM, depth=DEPTH, heads=HEADS,
                                      dim_head=DIM // HEADS)
    v = m.init(jax.random.PRNGKey(0), s, f)
    return m, v, s, f


def test_supports_gating():
    assert supports(128, 1, True)
    assert not supports(128, 2, True)      # multi-token
    assert not supports(96, 1, True)       # not lane-aligned
    assert not supports(128, 1, False)     # dropout active


def test_fused_matches_unfused(setup):
    m, v, s, f = setup
    s_ref, f_ref = m.apply(v, s, f, deterministic=True)

    flat = params_from_module_tree(v["params"], DEPTH)
    so, fo = fused_bidirectional_cross_attention(
        s[:, 0, :], f[:, 0, :], flat, depth=DEPTH, heads=HEADS,
        interpret=True)
    np.testing.assert_allclose(np.asarray(so), np.asarray(s_ref)[:, 0, :],
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fo), np.asarray(f_ref)[:, 0, :],
                               atol=2e-5, rtol=1e-5)


def test_fused_module_param_tree_identical(setup):
    """use_fused=True must create the exact same param tree."""
    m, v, s, f = setup
    mf = BidirectionalCrossTransformer(dim=DIM, depth=DEPTH, heads=HEADS,
                                       dim_head=DIM // HEADS, use_fused=True)
    vf = mf.init(jax.random.PRNGKey(0), s, f)

    def paths(tree, p=()):
        out = {}
        for k, val in tree.items():
            if isinstance(val, dict):
                out.update(paths(val, p + (k,)))
            else:
                out[p + (k,)] = val.shape
        return out

    assert paths(v["params"]) == paths(vf["params"])


def test_fused_module_forward_matches_unfused_weights(setup):
    """Same weights through the fused module == unfused module outputs.

    The fused kernel runs in interpret mode off-TPU; on CPU the pallas_call
    inside the module would need interpret=True, so drive the kernel function
    directly with the module's params (covered above) and the module wiring
    via param-tree identity. On TPU the full module path is exercised by the
    verify flow (ModelConfig.use_pallas_dama)."""
    m, v, s, f = setup
    # ensure the flag plumbs through DAMA config without error at trace time
    from ewvit_tpu.configs import ModelConfig

    cfg = ModelConfig(use_pallas_dama=True)
    assert cfg.use_pallas_dama
