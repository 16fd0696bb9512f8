"""Fused MWT tail: multiscale_fusion as a VMEM-resident Winograd kernel.

The MWT frequency branch ends in a chain (reference
/root/reference/network/mwt.py:60-72, :113-117):

    y_l   = relu(bn(conv3x3(merged_l)))          # hf_fusion, 3 levels, shared
    multi = concat(y_0, y_1, y_2)                # 384 ch @ 112^2
    fused = relu(bn(conv3x3(multi)))             # multiscale_fusion
    freq  = relu(bn(conv3x3_s2(fused)))          # freq_conv

``multiscale_fusion`` is the model's FLOP-dominant op (11.1 GF/frame; it runs
at 98% of bf16 MXU peak as a direct XLA conv — see BASELINE.md roofline), so
the only way past it is a MAC reduction: Winograd F(2x2,3x3) (2.25x fewer
MACs). A plain XLA Winograd is HBM-bound (ops/winograd.py measured 5x slower);
this module keeps the transform domain in VMEM:

1. ``hf_fusion`` is evaluated as FOUR standard stride-2 "phase convs" per
   level (exact: the even/odd rows x cols of a stride-1 conv are stride-2
   convs with shifted SAME padding), producing y directly in the PHASE-SPLIT
   layout the Winograd kernel needs — even 56-sized outputs that run at
   full conv efficiency (a first cut that emitted odd 57-sized phases with
   the zero ring baked in measured 470us/conv vs ~150us for standard
   stride-2 shapes — the ring is assembled in VMEM instead).
2. ``fused_multiscale_winograd`` (Pallas): per (image, row-block) grid cell,
   assembles ring-padded phase planes in VMEM scratch (zero-init + one
   offset copy — this is where the stride-1 conv's SAME-padding ring comes
   from), builds the 16 Winograd phases with VPU adds, runs 16xL
   ``[R*B, C] x [C, C]`` MXU dots per level (K = C = 128: full MXU
   utilization), inverse-transforms via +-1 accumulation, and applies the
   folded BN epilogue — transform-domain tensors never touch HBM.
3. ``freq_from_phases``: the stride-2 freq_conv consumes the phase-split
   output directly as four trimmed sub-convs (1x1 + 1x2 + 2x1 + 2x2 = the
   original 9 taps), so the phases never need interleaving.

Phase-array convention (shared with models/mwt.py): for an [N, 2A, 2B, C]
hf_fusion input/output y, phase array PC[p][q] has shape [N, A, B, C] with

    PC[p][q][n, k, m] = y[n, 2k + (1 - p), 2m + (1 - q)]

i.e. p=0 carries the ODD rows of y, p=1 the EVEN rows (this indexing makes
tile a of the Winograd input read padded rows 2a+p where padded = SAME-pad(y);
the p=0 phase's padded row 0 and the p=1 phase's padded row 2A+1 are the
zero-padding ring, which exists only in VMEM).

Inference-only: the backward of the Pallas kernel is not defined; training
uses the direct-conv path (models/mwt.py).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

from ewvit_tpu.ops.winograd import transform_weights

# A^T for F(2x2, 3x3): output phase r from transform phase u.
# AT = [[1, 1, 1, 0], [0, 1, -1, -1]]
_AT_NONZERO = {  # column u -> [(output phase r, sign)]
    0: [(0, 1.0)],
    1: [(0, 1.0), (1, 1.0)],
    2: [(0, 1.0), (1, -1.0)],
    3: [(1, -1.0)],
}


def _bt4(rows):
    """B^T combination along one axis (rows: 4 arrays) — adds only."""
    return (rows[0] - rows[2], rows[1] + rows[2],
            rows[2] - rows[1], rows[1] - rows[3])


def multiscale_winograd_u(kernel: jax.Array, bn_scale: jax.Array,
                          levels: int, dtype) -> jax.Array:
    """Transform multiscale weights -> [levels, 16, C, C] (BN scale folded).

    kernel: [3, 3, levels*C, C]; bn_scale: [C] (gamma * rsqrt(var + eps)).
    Folding the output-channel scale into the weights keeps the kernel
    epilogue to one add.
    """
    c = kernel.shape[-1]
    w = kernel.astype(jnp.float32) * bn_scale.astype(jnp.float32)
    us = [transform_weights(w[:, :, l * c:(l + 1) * c, :]).reshape(16, c, c)
          for l in range(levels)]
    return jnp.stack(us).astype(dtype)


def phase_conv_paddings(p: int, q: int):
    """lax.conv padding so a stride-2 conv emits phase (p, q) of the stride-1
    SAME conv in the PC convention above (output [A, B], standard even size).

    Output k covers input rows 2k+(1-p)-1 .. 2k+(1-p)+1: p=0 -> rows
    2k..2k+2 (pad (0,1)), p=1 -> rows 2k-1..2k+1 (pad (1,0)); same in q.
    """
    return ((p, 1 - p), (q, 1 - q))


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def fused_multiscale_winograd(
    y_phases: Sequence[jax.Array],   # levels*4 arrays [N, A, B, C]
    u: jax.Array,                    # [levels, 16, C, C]
    bias: jax.Array,                 # [C] fp32 (conv bias + BN, scale-folded)
    *,
    tile_rows: int = 8,
    interpret: bool = False,
) -> List[jax.Array]:
    """relu(scale*conv3x3(concat(y)) + bias) on phase-split y, phase-split out.

    Returns 4 arrays fused[r][s] of [N, A, B, C] with
    fused[r][s][n, t, b] = out[n, 2t+r, 2b+s] of the stride-1 SAME conv.
    (The BN scale is pre-folded into ``u`` by :func:`multiscale_winograd_u`.)
    """
    levels = len(y_phases) // 4
    n, A, B, c = y_phases[0].shape
    R = tile_rows
    assert A % R == 0 and A >= R + 1, f"A={A} vs tile_rows={R}"
    cdt = y_phases[0].dtype

    grid = (n, A // R)

    def y_spec(p):
        # Tile-row block g needs padded rows a in [gR, gR+R+1):
        #   p=0: PC row k = a-1  -> rows [gR-1, gR+R), clamped up at g=0
        #   p=1: PC row k = a    -> rows [gR, gR+R+1), clamped down at g=last
        # The kernel re-aligns the clamped cells via the scratch copy offset.
        if p == 0:
            imap = lambda ni, gi: (ni, jnp.maximum(gi * R - 1, 0), 0, 0)
        else:
            imap = lambda ni, gi: (ni, jnp.minimum(gi * R, A - R - 1), 0, 0)
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(R + 1), pl.Element(B), pl.Element(c)),
            imap)

    u_spec = pl.BlockSpec((levels, 16, c, c), lambda ni, gi: (0, 0, 0, 0))
    bias_spec = pl.BlockSpec((1, c), lambda ni, gi: (0, 0))
    out_spec = pl.BlockSpec((1, R, B, c), lambda ni, gi: (ni, gi, 0, 0))

    def kernel_fn(*refs):
        yrefs = refs[:4 * levels]
        u_ref, bias_ref = refs[4 * levels], refs[4 * levels + 1]
        orefs = refs[4 * levels + 2:4 * levels + 6]
        scratch = refs[4 * levels + 6:]  # 4 VMEM buffers [R+3, B+1, c]
        gi = pl.program_id(1)
        g_first = gi == 0
        g_last = gi == pl.num_programs(1) - 1

        accs = [[jnp.zeros((R * B, c), jnp.float32) for _ in range(2)]
                for _ in range(2)]
        for lvl in range(levels):
            # Assemble ring-padded planes: scratch[(p,q)] row s holds padded
            # row a = gR + s - 1, cols hold padded col 2m+q over b in [0, B].
            for p in (0, 1):
                for q in (0, 1):
                    sref = scratch[2 * p + q]
                    blk = yrefs[lvl * 4 + 2 * p + q][0]  # [R+1, B, c]
                    sref[...] = jnp.zeros((R + 3, B + 1, c), cdt)
                    # row s of data: p=0: s(k) = k+1 - gR + 1 with block
                    # start max(gR-1,0); p=1: s(k) = k - gR + 1, start
                    # min(gR, A-R-1). Both reduce to s0 = start - gR + 2 - p.
                    if p == 0:
                        s0 = jnp.where(g_first, 2, 1)
                    else:
                        s0 = jnp.where(g_last, jnp.int32(A - R - 1) - gi * R
                                       + 1, 1)
                    c0, c1 = (1, B + 1) if q == 0 else (0, B)
                    sref[pl.ds(s0, R + 1), c0:c1, :] = blk

            def plane(i, j):
                sref = scratch[2 * (i % 2) + (j % 2)]
                return sref[1 + i // 2:1 + i // 2 + R,
                            j // 2:j // 2 + B, :].astype(jnp.float32)

            vrows = [_bt4([plane(i, j) for j in range(4)]) for i in range(4)]
            for vv in range(4):
                vcol = _bt4([vrows[i][vv] for i in range(4)])
                for uu in range(4):
                    v = vcol[uu].astype(cdt).reshape(R * B, c)
                    m = jax.lax.dot(v, u_ref[lvl, 4 * uu + vv],
                                    preferred_element_type=jnp.float32)
                    for r, sr in _AT_NONZERO[uu]:
                        for s, ss in _AT_NONZERO[vv]:
                            accs[r][s] = accs[r][s] + (sr * ss) * m

        b_vec = bias_ref[0].astype(jnp.float32)
        for r in (0, 1):
            for s in (0, 1):
                out = jnp.maximum(accs[r][s] + b_vec, 0.0)
                orefs[2 * r + s][0] = out.reshape(R, B, c).astype(cdt)

    out_shapes = tuple(
        jax.ShapeDtypeStruct((n, A, B, c), cdt) for _ in range(4))
    assert _HAS_PLTPU, "fused MWT tail needs pallas TPU scratch support"
    scratch_shapes = [pltpu.VMEM((R + 3, B + 1, c), cdt) for _ in range(4)]
    return list(pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[y_spec(p) for _ in range(levels)
                  for p in (0, 0, 1, 1)] + [u_spec, bias_spec],
        out_specs=tuple(out_spec for _ in range(4)),
        out_shape=out_shapes,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*y_phases, u, bias.reshape(1, c).astype(jnp.float32)))


def freq_from_phases(phases: Sequence[jax.Array],
                     kernel: jax.Array) -> jax.Array:
    """Stride-2 3x3 SAME conv consuming phase-split input, dense output.

    phases: 4 arrays [N, A, B, C] (fused[r][s] from the Winograd kernel,
    convention fused[r][s][n,t,b] = x[n, 2t+r, 2b+s]); kernel: [3,3,C,Cout].
    Returns conv(x, stride 2, SAME)[N, A, B, Cout] — identical to
    ``lax.conv_general_dilated(x, kernel, (2,2), ((1,1),(1,1)))``.

    Each phase contributes its taps as a trimmed sub-conv (1+2+2+4 = 9 taps
    total, exactly the original MACs): tap row di of the 3x3 kernel reads
    x row 2i+di-1 = phase r=(di+1)%2 at tile row i + ki - 1, ki=(di+1-r)//2.
    """
    out = None
    for r in (0, 1):
        for s in (0, 1):
            kis = [(1, 1)] if r == 0 else [(0, 0), (1, 2)]  # (ki, di)
            kjs = [(1, 1)] if s == 0 else [(0, 0), (1, 2)]
            sub = jnp.stack(
                [jnp.stack([kernel[di, dj] for _, dj in kjs], axis=0)
                 for _, di in kis], axis=0)  # [kr, kc, C, Cout]
            pad_r = (1, 0) if r == 1 else (0, 0)
            pad_c = (1, 0) if s == 1 else (0, 0)
            y = jax.lax.conv_general_dilated(
                phases[2 * r + s], sub, (1, 1), (pad_r, pad_c),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = y if out is None else out + y
    return out
