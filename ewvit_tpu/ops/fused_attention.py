"""Fused Pallas kernel for DAMA's bidirectional cross-attention stack.

The reference runs 2 layers x 2 directions of cross-attention over ONE token
per branch (dama.py:143-145; SFE emits a single patch at reference config,
sfe.py:121), i.e. ~20 tiny ops with HBM round-trips between them. This kernel
fuses the ENTIRE stack — LayerNorms, QKV projections, per-head softmax over
the 2-entry {self, other} context (kv_include_self, dama.py:38-39), output
projections, and residuals — into one `pallas_call`: both token matrices stay
in VMEM for the whole computation.

Key shape insight: with sequence length 1, attention per head reduces to a
scalar gate between v_self and v_other:

    gate_h = softmax([q.k_self, q.k_ctx])_0
    out_h  = gate_h * v_self_h + (1 - gate_h) * v_ctx_h

Per-head dot products are computed on the MXU as ``(q * k) @ M`` where
``M[i, h] = [i // dh == h]`` is the head-segment indicator, and gates
broadcast back to lanes via ``gate @ M.T`` — no lane-splitting reshapes,
which Mosaic cannot lower (see .claude/skills/verify gotchas).

Numerics match ewvit_tpu.models.layers.BidirectionalCrossTransformer in
deterministic mode exactly (same LN epsilon, fp32 softmax); used for
inference/serving via ``ModelConfig.use_pallas_dama``. Falls back to the XLA
path when shapes don't meet the TPU tiling constraints (dim % 128, token
count 1) or when dropout is active.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


def supports(dim: int, tokens: int, deterministic: bool) -> bool:
    """Whether the fused kernel covers this configuration."""
    return deterministic and tokens == 1 and dim % 128 == 0


def _ln(x, scale, bias, eps=1e-6):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


_DOT = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


def _cross_1tok(x_norm, ctx, wq, wkv, wo, bo, head_mask, scale):
    """One CrossAttention with kv_include_self at seq len 1.

    x_norm: [N, D] normed queries; ctx: [N, D] raw other-branch tokens.
    head_mask: [D, H] segment indicator; scale: dh**-0.5.
    """
    d = x_norm.shape[-1]
    q = _DOT(x_norm, wq)
    kv_self = _DOT(x_norm, wkv)
    kv_ctx = _DOT(ctx, wkv)
    k_self, v_self = kv_self[:, :d], kv_self[:, d:]
    k_ctx, v_ctx = kv_ctx[:, :d], kv_ctx[:, d:]
    # per-head dots on the MXU: (q ⊙ k) @ M -> [N, H]
    ds = _DOT(q * k_self, head_mask) * scale
    dc = _DOT(q * k_ctx, head_mask) * scale
    m = jnp.maximum(ds, dc)
    es = jnp.exp(ds - m)
    ec = jnp.exp(dc - m)
    gate = es / (es + ec)                               # [N, H]
    gate_l = _DOT(gate, head_mask.T)                    # [N, D]
    attn = gate_l * v_self + (1.0 - gate_l) * v_ctx
    return _DOT(attn, wo) + bo


def _kernel(depth: int, heads: int, space_ref, freq_ref, mats_ref,
            smalls_ref, so_ref, fo_ref):
    """mats: [2*depth, D, 4D] = wq | wkv(2D) | wo per attention block;
    smalls: [2*depth, 3, D] = (norm_scale, norm_bias, out_bias).
    Block order: layer-major, space direction then freq (dama.py:70-76)."""
    space = space_ref[:].astype(jnp.float32)
    freq = freq_ref[:].astype(jnp.float32)
    d = space.shape[-1]
    dh = d // heads
    scale = dh ** -0.5
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, heads), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (d, heads), 1)
    head_mask = (lane // dh == head).astype(jnp.float32)

    def block(j, x, ctx):
        mats = mats_ref[j]
        wq, wkv, wo = mats[:, :d], mats[:, d:3 * d], mats[:, 3 * d:]
        sm = smalls_ref[j]
        x_norm = _ln(x, sm[0:1, :], sm[1:2, :])
        return x + _cross_1tok(x_norm, ctx, wq, wkv, wo, sm[2:3, :],
                               head_mask, scale)

    for i in range(depth):
        space = block(2 * i, space, freq)
        freq = block(2 * i + 1, freq, space)

    so_ref[:] = space.astype(so_ref.dtype)
    fo_ref[:] = freq.astype(fo_ref.dtype)


def params_from_module_tree(tree: Dict[str, Any], depth: int) -> Dict[str, Any]:
    """Flatten a BidirectionalCrossTransformer param subtree to kernel inputs.

    ``tree`` uses the module naming (space_norm_i, space_attend_freq_i{to_q,
    to_kv,to_out}, freq_...) shared with the torch converter.
    """
    p = {}
    for i in range(depth):
        p[f"sn{i}_scale"] = tree[f"space_norm_{i}"]["scale"]
        p[f"sn{i}_bias"] = tree[f"space_norm_{i}"]["bias"]
        s = tree[f"space_attend_freq_{i}"]
        p[f"s{i}_wq"] = s["to_q"]["kernel"]
        p[f"s{i}_wkv"] = s["to_kv"]["kernel"]
        p[f"s{i}_wo"] = s["to_out"]["kernel"]
        p[f"s{i}_bo"] = s["to_out"]["bias"]
        p[f"fn{i}_scale"] = tree[f"freq_norm_{i}"]["scale"]
        p[f"fn{i}_bias"] = tree[f"freq_norm_{i}"]["bias"]
        f = tree[f"freq_attend_space_{i}"]
        p[f"f{i}_wq"] = f["to_q"]["kernel"]
        p[f"f{i}_wkv"] = f["to_kv"]["kernel"]
        p[f"f{i}_wo"] = f["to_out"]["kernel"]
        p[f"f{i}_bo"] = f["to_out"]["bias"]
    return p


@functools.partial(jax.jit,
                   static_argnames=("depth", "heads", "interpret"))
def fused_bidirectional_cross_attention(
    space: jax.Array,                  # [N, D] (single token per row)
    freq: jax.Array,                   # [N, D]
    params: Dict[str, jax.Array],      # from params_from_module_tree
    *,
    depth: int = 2,
    heads: int = 4,
    interpret: bool = False,
):
    """Fused stack; returns (space_out, freq_out), both [N, D]."""
    n, d = space.shape
    assert d % 128 == 0, f"dim {d} must be lane-aligned (128)"
    pad = (-n) % 8                      # fp32 sublane tile
    if pad:
        space = jnp.pad(space, ((0, pad), (0, 0)))
        freq = jnp.pad(freq, ((0, pad), (0, 0)))
    np_ = space.shape[0]

    # Pack the 24 weight arrays into two stacked operands (dispatch overhead
    # of many tiny pallas operands dominated the first measurement).
    mats, smalls = [], []
    for i in range(depth):
        for side in ("s", "f"):
            mats.append(jnp.concatenate(
                [params[f"{side}{i}_wq"], params[f"{side}{i}_wkv"],
                 params[f"{side}{i}_wo"]], axis=1).astype(jnp.float32))
            prefix = "sn" if side == "s" else "fn"
            smalls.append(jnp.stack(
                [params[f"{prefix}{i}_scale"], params[f"{prefix}{i}_bias"],
                 params[f"{side}{i}_bo"]]).astype(jnp.float32))
    mats = jnp.stack(mats)              # [2*depth, D, 4D]
    smalls = jnp.stack(smalls)          # [2*depth, 3, D]

    def spec(shape=None):
        if _HAS_PLTPU and not interpret:
            return pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape)

    kernel = functools.partial(_kernel, depth, heads)
    so, fo = pl.pallas_call(
        kernel,
        in_specs=[spec()] * 4,
        out_specs=(spec(), spec()),
        out_shape=(jax.ShapeDtypeStruct((np_, d), space.dtype),
                   jax.ShapeDtypeStruct((np_, d), space.dtype)),
        interpret=interpret,
    )(space, freq, mats, smalls)
    if pad:
        so, fo = so[:n], fo[:n]
    return so, fo
