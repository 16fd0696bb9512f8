"""Numeric parity of the attention stack vs. a torch oracle.

The oracle re-implements the reference math (sfe.py:42-70 Attention,
dama.py:15-53 CrossAttention with kv_include_self, dama.py:56-78 bidirectional
stack) directly in torch inside the test, weights injected from the flax
params, so agreement validates our layout/transpose/softmax choices without
importing reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ewvit_tpu.models.layers import (  # noqa: E402
    Attention,
    BidirectionalCrossTransformer,
    CrossAttention,
)

DIM, HEADS, DH = 32, 4, 8


def _t(x):
    return torch.tensor(np.asarray(x, np.float32))


def _torch_mha(q, k, v, heads):
    b, n, inner = q.shape
    dh = inner // heads
    q = q.reshape(b, n, heads, dh).permute(0, 2, 1, 3)
    k = k.reshape(b, k.shape[1], heads, dh).permute(0, 2, 1, 3)
    v = v.reshape(b, v.shape[1], heads, dh).permute(0, 2, 1, 3)
    dots = torch.einsum("bhid,bhjd->bhij", q, k) * dh ** -0.5
    attn = dots.softmax(-1)
    out = torch.einsum("bhij,bhjd->bhid", attn, v)
    return out.permute(0, 2, 1, 3).reshape(b, n, inner)


def test_self_attention_matches_torch_oracle(rng):
    x = rng.standard_normal((2, 5, DIM)).astype(np.float32)
    m = Attention(DIM, heads=HEADS, dim_head=DH)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(m.apply(v, jnp.asarray(x)))

    p = v["params"]
    qkv = _t(x) @ _t(p["to_qkv"]["kernel"])
    q, k, vv = qkv.chunk(3, dim=-1)
    out = _torch_mha(q, k, vv, HEADS)
    out = out @ _t(p["to_out"]["kernel"]) + _t(p["to_out"]["bias"])
    np.testing.assert_allclose(ours, out.numpy(), atol=2e-5)


def test_cross_attention_kv_include_self_matches_oracle(rng):
    x = rng.standard_normal((2, 1, DIM)).astype(np.float32)
    ctx = rng.standard_normal((2, 1, DIM)).astype(np.float32)
    m = CrossAttention(DIM, heads=HEADS, dim_head=DH)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx),
               kv_include_self=True)
    ours = np.asarray(m.apply(v, jnp.asarray(x), jnp.asarray(ctx),
                              kv_include_self=True))

    p = v["params"]
    context = torch.cat([_t(x), _t(ctx)], dim=1)  # dama.py:38-39
    q = _t(x) @ _t(p["to_q"]["kernel"])
    kv = context @ _t(p["to_kv"]["kernel"])
    k, vv = kv.chunk(2, dim=-1)
    out = _torch_mha(q, k, vv, HEADS)
    out = out @ _t(p["to_out"]["kernel"]) + _t(p["to_out"]["bias"])
    np.testing.assert_allclose(ours, out.numpy(), atol=2e-5)


def test_bidirectional_stack_second_direction_sees_updated_space(rng):
    """freq attends the UPDATED space tokens (dama.py:72-76 ordering)."""
    s = rng.standard_normal((1, 1, DIM)).astype(np.float32)
    f = rng.standard_normal((1, 1, DIM)).astype(np.float32)
    m = BidirectionalCrossTransformer(DIM, depth=1, heads=HEADS, dim_head=DH)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(s), jnp.asarray(f))
    s_out, f_out = m.apply(v, jnp.asarray(s), jnp.asarray(f))

    def ln(x, p):
        mu = x.mean(-1, keepdim=True)
        var = x.var(-1, unbiased=False, keepdim=True)
        return (x - mu) / torch.sqrt(var + 1e-6) * _t(p["scale"]) + _t(p["bias"])

    def cross(x, ctx, p):
        context = torch.cat([x, ctx], dim=1)
        q = x @ _t(p["to_q"]["kernel"])
        k, vv = (context @ _t(p["to_kv"]["kernel"])).chunk(2, dim=-1)
        out = _torch_mha(q, k, vv, HEADS)
        return out @ _t(p["to_out"]["kernel"]) + _t(p["to_out"]["bias"])

    p = v["params"]
    ts, tf = _t(s), _t(f)
    ts = ts + cross(ln(ts, p["space_norm_0"]), tf, p["space_attend_freq_0"])
    tf = tf + cross(ln(tf, p["freq_norm_0"]), ts, p["freq_attend_space_0"])
    np.testing.assert_allclose(np.asarray(s_out), ts.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(f_out), tf.numpy(), atol=2e-5)
