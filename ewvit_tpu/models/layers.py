"""Transformer building blocks (self- and cross-attention).

Behavioral equivalents of the reference's attention stack:
- ``Attention`` / ``FeedForward`` / ``Transformer``: /root/reference/network/sfe.py:29-85
- ``CrossAttention`` (with ``kv_include_self``) and
  ``BidirectionalCrossTransformer``: /root/reference/network/dama.py:15-78

TPU notes: sequences here are tiny (1-2 tokens at reference config), so the
implementation leans on XLA fusion of the QKV projections and keeps the
softmax in float32. All matmuls run in the module ``dtype`` (bfloat16 by
default in the full model) with float32 params.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _gelu(x):
    # torch nn.GELU default is the exact erf formulation (sfe.py:34).
    return nn.gelu(x, approximate=False)


class FeedForward(nn.Module):
    """MLP block: Linear -> GELU -> Dropout -> Linear -> Dropout (sfe.py:29-40)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = _gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


def _mha(q, k, v, heads: int, dtype):
    """Shared multi-head attention core. q,k,v: [B, N, inner_dim]."""
    b, n, inner = q.shape
    dh = inner // heads
    scale = dh ** -0.5
    q = q.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, k.shape[1], heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, v.shape[1], heads, dh).transpose(0, 2, 1, 3)
    dots = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.float32) * scale
    attn = nn.softmax(dots, axis=-1).astype(dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
    return out, attn


class Attention(nn.Module):
    """Multi-head self-attention (sfe.py:42-70).

    ``to_qkv`` is a single bias-free projection; output projection + dropout
    only when ``project_out`` (heads != 1 or dim_head != dim).
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, return_attn: bool = False):
        inner = self.dim_head * self.heads
        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out, attn = _mha(q, k, v, self.heads, self.dtype)
        if project_out:
            out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if return_attn:
            return out, attn
        return out


class Transformer(nn.Module):
    """Pre-norm ViT encoder: x += attn(LN(x)); x += ff(LN(x)) (sfe.py:72-85).

    The reference hardcodes FeedForward dropout to 0 (sfe.py:79); only the
    attention path uses the configured dropout.
    """

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i in range(self.depth):
            h = nn.LayerNorm(dtype=self.dtype, name=f"attn_norm_{i}")(x)
            x = x + Attention(
                self.dim, heads=self.heads, dim_head=self.dim_head,
                dropout=self.dropout, dtype=self.dtype, name=f"attn_{i}",
            )(h, deterministic=deterministic)
            h = nn.LayerNorm(dtype=self.dtype, name=f"ff_norm_{i}")(x)
            x = x + FeedForward(
                self.dim, self.mlp_dim, dropout=0.0, dtype=self.dtype,
                name=f"ff_{i}",
            )(h, deterministic=deterministic)
        return x


class CrossAttention(nn.Module):
    """Cross-attention with optional self-inclusive KV (dama.py:15-53).

    ``kv_include_self=True`` prepends the queries' own tokens to the context
    before the KV projection (dama.py:38-39).
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, kv_include_self: bool = False,
                 deterministic: bool = True, return_attn: bool = False):
        inner = self.dim_head * self.heads
        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        context = x if context is None else context
        if kv_include_self:
            context = jnp.concatenate([x, context], axis=1)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)
        out, attn = _mha(q, k, v, self.heads, self.dtype)
        if project_out:
            out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if return_attn:
            return out, attn
        return out


class _DenseShell(nn.Module):
    """Declares nn.Dense-shaped params without applying them (fused path)."""

    din: int
    dout: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.din, self.dout), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros_init(),
                        (self.dout,), jnp.float32)
             if self.use_bias else None)
        return k, b


class _NormShell(nn.Module):
    """Declares nn.LayerNorm-shaped params without applying them."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(), (self.dim,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(), (self.dim,),
                       jnp.float32)
        return s, b


class _AttShell(nn.Module):
    """Declares CrossAttention's param tree (to_q/to_kv/to_out) unapplied."""

    dim: int
    inner: int

    @nn.compact
    def __call__(self):
        qk, _ = _DenseShell(self.dim, self.inner, use_bias=False,
                            name="to_q")()
        kvk, _ = _DenseShell(self.dim, self.inner * 2, use_bias=False,
                             name="to_kv")()
        ok, ob = _DenseShell(self.inner, self.dim, use_bias=True,
                             name="to_out")()
        return {"to_q": {"kernel": qk}, "to_kv": {"kernel": kvk},
                "to_out": {"kernel": ok, "bias": ob}}


class BidirectionalCrossTransformer(nn.Module):
    """Stacked bidirectional cross-attention (dama.py:56-78).

    Per layer: space += CA(LN(space), freq); then freq += CA(LN(freq),
    *updated* space) — the second direction sees the first's output
    (dama.py:72-76). Both directions use kv_include_self=True.

    ``use_fused=True`` routes the whole stack through the single Pallas
    kernel (ewvit_tpu.ops.fused_attention) when the configuration supports
    it (deterministic, 1 token per branch, lane-aligned dim); the param tree
    is identical in both paths, so checkpoints are interchangeable.
    """

    dim: int
    depth: int = 1
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    use_fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, space_tokens, freq_tokens, *, deterministic: bool = True,
                 return_attn: bool = False):
        inner = self.dim_head * self.heads
        n, t, d = space_tokens.shape

        if self.use_fused and not return_attn and inner == d:
            from ewvit_tpu.ops.fused_attention import supports

            if supports(d, t, deterministic):
                return self._fused(space_tokens, freq_tokens, inner)

        # ----- unfused XLA path (params created inline, canonical names) ---
        attns = []
        for i in range(self.depth):
            s_norm = nn.LayerNorm(dtype=self.dtype, name=f"space_norm_{i}")(space_tokens)
            s_out = CrossAttention(
                self.dim, heads=self.heads, dim_head=self.dim_head,
                dropout=self.dropout, dtype=self.dtype, name=f"space_attend_freq_{i}",
            )(s_norm, freq_tokens, kv_include_self=True,
              deterministic=deterministic, return_attn=return_attn)
            if return_attn:
                s_out, s_attn = s_out
                attns.append(s_attn)
            space_tokens = space_tokens + s_out

            f_norm = nn.LayerNorm(dtype=self.dtype, name=f"freq_norm_{i}")(freq_tokens)
            f_out = CrossAttention(
                self.dim, heads=self.heads, dim_head=self.dim_head,
                dropout=self.dropout, dtype=self.dtype, name=f"freq_attend_space_{i}",
            )(f_norm, space_tokens, kv_include_self=True,
              deterministic=deterministic, return_attn=return_attn)
            if return_attn:
                f_out, f_attn = f_out
                attns.append(f_attn)
            freq_tokens = freq_tokens + f_out
        if return_attn:
            return space_tokens, freq_tokens, attns
        return space_tokens, freq_tokens

    def _fused(self, space_tokens, freq_tokens, inner: int):
        """Pallas path: declare the identical param tree via shell modules
        (same names/shapes/inits as the unfused Dense/LayerNorm children, so
        checkpoints are interchangeable), then run the single fused kernel."""
        from ewvit_tpu.ops.fused_attention import (
            fused_bidirectional_cross_attention,
            params_from_module_tree,
        )

        tree = {}
        for i in range(self.depth):
            for norm in (f"space_norm_{i}", f"freq_norm_{i}"):
                s, b = _NormShell(self.dim, name=norm)()
                tree[norm] = {"scale": s, "bias": b}
            for att in (f"space_attend_freq_{i}", f"freq_attend_space_{i}"):
                tree[att] = _AttShell(self.dim, inner, name=att)()
        flat = params_from_module_tree(tree, self.depth)
        import jax

        so, fo = fused_bidirectional_cross_attention(
            space_tokens[:, 0, :], freq_tokens[:, 0, :], flat,
            depth=self.depth, heads=self.heads,
            interpret=jax.default_backend() != "tpu")
        return (so[:, None, :].astype(space_tokens.dtype),
                fo[:, None, :].astype(freq_tokens.dtype))

