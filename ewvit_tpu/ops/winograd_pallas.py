"""Pallas Winograd F(2x2,3x3) conv — VMEM-resident transforms.

The XLA-level Winograd (ops/winograd.py) is HBM-bound: the 16 transform-domain
tensors round-trip to HBM (measured 5x slower than the direct conv). This
kernel keeps the whole pipeline in VMEM per grid cell: load an input strip,
build the 16 Winograd phases with +-1 adds, contract against the transformed
weights on the MXU, inverse-transform, store.

Mosaic cannot lower strided vector slices or lane-merging reshapes (see
.claude/skills/verify), so the stride-2 tile phases are realized by a
PHASE-SPLIT LAYOUT computed outside the kernel:

    xp  = pad(x, 1)                                  # [N, H+2, W+2, C]
    xs[pq][n, a, b, c] = xp[n, 2a+p, 2b+q, c]        # 4 arrays, p,q in {0,1}

Inside the kernel, tile phase (i, j) is a CONTIGUOUS slice of xs[i%2, j%2]
offset by (i//2, j//2) — no strides anywhere. Outputs come back as 4
phase-split arrays y[kl] [N, H/2, W/2, Cout], interleaved outside.

Grid: (N, H/2 tile-rows in blocks of R). Per cell VMEM at R=4, Cin=384:
4 input blocks (~0.9 MB bf16) + U (1.6 MB) + 16 V tiles + 16 M tiles — well
under the 16 MB budget. The transform-domain contraction runs as 16x R dots
[56, Cin] x [Cin, Cout] on the MXU with fp32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

from ewvit_tpu.ops.winograd import transform_weights


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def conv3x3_winograd_pallas(
    x: jax.Array,          # [N, H, W, Cin], H, W even
    w: jax.Array,          # [3, 3, Cin, Cout]
    *,
    tile_rows: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Same contract as lax.conv 3x3 stride-1 SAME (no bias)."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    h2, w2 = h // 2, wd // 2
    R = tile_rows
    assert h2 % R == 0, f"H/2={h2} must divide tile_rows={R}"

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # phase-split: xs[pq][n, a, b, c] = xp[n, 2a+p, 2b+q, c]; sizes
    # (h2+1, w2+1) so offset +1 slices stay in range.
    xs = [xp[:, p:p + 2 * h2 + 1:2, q:q + 2 * w2 + 1:2, :]
          for p in (0, 1) for q in (0, 1)]  # each [N, h2+1, w2+1, C]

    # multiply in the input dtype (bf16 model => bf16 MXU passes, matching
    # XLA's own conv behavior; fp32 inputs stay fp32 => exact vs direct conv)
    mult_dtype = x.dtype
    u = transform_weights(w).reshape(16, cin, cout).astype(mult_dtype)

    grid = (n, h2 // R)

    def in_spec():
        # rows OVERLAP by one between consecutive tile-row blocks, so the
        # row dim uses Element indexing (index_map returns an element
        # offset, ri*R, for an (R+1)-row window)
        # Mosaic requires all dims Element or none; all index-map entries
        # below are ELEMENT offsets.
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(R + 1), pl.Element(w2 + 1),
             pl.Element(cin)),
            lambda ni, ri: (ni, ri * R, 0, 0),
        )

    def u_spec():
        return pl.BlockSpec((16, cin, cout), lambda ni, ri: (0, 0, 0))

    def out_spec():
        return pl.BlockSpec((1, R, w2, cout), lambda ni, ri: (ni, ri, 0, 0))

    def kernel_fn(x00, x01, x10, x11, u_ref, y00, y01, y10, y11):
        blocks = [x00[0], x01[0], x10[0], x11[0]]
        outs = _run(R, w2, blocks, u_ref, mult_dtype)
        y00[0] = outs[0][0].astype(y00.dtype)
        y01[0] = outs[0][1].astype(y01.dtype)
        y10[0] = outs[1][0].astype(y10.dtype)
        y11[0] = outs[1][1].astype(y11.dtype)

    y_shapes = tuple(
        jax.ShapeDtypeStruct((n, h2, w2, cout), x.dtype) for _ in range(4))
    y00, y01, y10, y11 = pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[in_spec()] * 4 + [u_spec()],
        out_specs=tuple(out_spec() for _ in range(4)),
        out_shape=y_shapes,
        interpret=interpret,
    )(*xs, u)

    # interleave the 4 output phases back to [N, H, W, Cout]
    y = jnp.stack([jnp.stack([y00, y01], axis=-2),
                   jnp.stack([y10, y11], axis=-2)], axis=2)
    # y: [N, h2, 2(row phase), w2, 2(col phase), Cout]
    return y.reshape(n, h, wd, cout)


def _run(R, W2, blocks, u_ref, mult_dtype=jnp.bfloat16):
    """Pure computation on materialized blocks (shared by kernel + tests)."""
    bl = ((blocks[0], blocks[1]), (blocks[2], blocks[3]))

    def phase(i, j):
        b = bl[i % 2][j % 2]
        return b[i // 2:i // 2 + R, j // 2:j // 2 + W2, :].astype(jnp.float32)

    def bt(rows):
        return (rows[0] - rows[2], rows[1] + rows[2],
                rows[2] - rows[1], rows[1] - rows[3])

    Vrows = [bt([phase(i, j) for j in range(4)]) for i in range(4)]
    V = [[None] * 4 for _ in range(4)]
    for v in range(4):
        col = bt([Vrows[i][v] for i in range(4)])
        for uu in range(4):
            V[uu][v] = col[uu]

    cout = u_ref.shape[-1]
    M = [[None] * 4 for _ in range(4)]
    for uu in range(4):
        for v in range(4):
            # one [R*W2, Cin] x [Cin, Cout] dot per (u, v): full-height MXU
            # passes instead of R half-empty M=56 ones
            vt = V[uu][v].astype(mult_dtype).reshape(R * W2, -1)
            uw = u_ref[4 * uu + v]
            M[uu][v] = jax.lax.dot(
                vt, uw, preferred_element_type=jnp.float32
            ).reshape(R, W2, cout)

    def at(rows):
        return (rows[0] + rows[1] + rows[2], rows[1] - rows[2] - rows[3])

    Yrows = [at([M[uu][v] for v in range(4)]) for uu in range(4)]
    out = [[None, None], [None, None]]
    for l in range(2):
        col = at([Yrows[uu][l] for uu in range(4)])
        for k in range(2):
            out[k][l] = col[k]
    return out
