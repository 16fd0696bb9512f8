"""Winograd F(2x2, 3x3) convolution for the MWT's FLOP-dominant 3x3 convs.

The MWT frequency branch spends 94% of its FLOPs in two stride-1 3x3 convs at
112x112 (hf_fusion 54->128 per level and multiscale_fusion 384->128,
/root/reference/network/mwt.py:60-72); MWT in turn is ~60% of the whole
model's runtime at 65% of MXU peak — FLOP-bound. Winograd F(2x2,3x3) computes
each 2x2 output tile with 16 transform-domain multiplies instead of 36 MACs:
a 2.25x MAC reduction on exactly these shapes.

Math (standard Winograd minimal filtering):
    Y = A^T [ (G g G^T) ⊙ (B^T d B) ] A        per 4x4 input tile d
with
    B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
    G   = [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]]
    A^T = [[1,1,1,0],[0,1,-1,-1]]

Implementation notes (TPU):
- the 16 tile phases come from stride-2 slices of the padded input (cheap
  forward; this path is inference-oriented — training uses the direct conv,
  whose backward is a conv);
- the input/output transforms are +-1/+-0.5 combinations (VPU adds, no
  multiplies except x0.5 on the tiny weight tensor);
- the transform-domain contraction is ONE batched matmul
  [16, tiles, Cin] x [16, Cin, Cout] — ideal MXU shape;
- multiplies run in the input dtype (bf16) with fp32 accumulation, matching
  XLA's own conv accumulation behavior.

Reference technique paper: "DWM: A Decomposable Winograd Method" (PAPERS.md)
— only the classic F(2x2,3x3) case is needed here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


def transform_weights(w: jax.Array) -> jax.Array:
    """[3, 3, Cin, Cout] -> transform-domain U [4, 4, Cin, Cout] (fp32)."""
    g = jnp.asarray(_G)
    return jnp.einsum("ua,vb,abio->uvio", g, g, w.astype(jnp.float32))


def conv3x3_winograd(x: jax.Array, w: jax.Array, b=None) -> jax.Array:
    """3x3 stride-1 SAME conv via Winograd F(2x2,3x3).

    x: [N, H, W, Cin] with H, W even; w: [3, 3, Cin, Cout]; returns
    [N, H, W, Cout] matching
    ``lax.conv_general_dilated(x, w, (1,1), [(1,1),(1,1)], NHWC)``.
    """
    n, h, wd, cin = x.shape
    assert h % 2 == 0 and wd % 2 == 0, "H, W must be even"
    cout = w.shape[-1]
    nh, nw = h // 2, wd // 2

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # 16 tile phases P[i][j][n, th, tw, c] = xp[n, 2*th+i, 2*tw+j, c]
    P = [[xp[:, i:i + 2 * nh:2, j:j + 2 * nw:2, :] for j in range(4)]
         for i in range(4)]

    # V[u][v] = sum_ij BT[u,i] BT[v,j] P[i][j] — ±1 combinations only.
    def bt_combine(rows):
        # rows: list of 4 arrays; returns 4 combinations per _BT
        return [rows[0] - rows[2],
                rows[1] + rows[2],
                rows[2] - rows[1],
                rows[1] - rows[3]]

    # combine along j (inner), then along i, exploiting separability
    Vrows = [bt_combine([P[i][j] for j in range(4)]) for i in range(4)]
    V = [[None] * 4 for _ in range(4)]
    for v in range(4):
        col = bt_combine([Vrows[i][v] for i in range(4)])
        for u in range(4):
            V[u][v] = col[u]

    Vs = jnp.stack([V[u][v] for u in range(4) for v in range(4)])  # [16,N,nh,nw,Cin]
    Vs = Vs.reshape(16, n * nh * nw, cin)

    U = transform_weights(w).reshape(16, cin, cout).astype(x.dtype)

    # transform-domain contraction: one batched matmul on the MXU
    M = jax.lax.dot_general(
        Vs.astype(x.dtype), U,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [16, B, Cout]
    M = M.reshape(4, 4, n, nh, nw, cout)

    # Y[k][l] = sum_uv AT[k,u] AT[l,v] M[u][v]
    def at_combine(rows):
        return [rows[0] + rows[1] + rows[2],
                rows[1] - rows[2] - rows[3]]

    Yrows = [at_combine([M[u, v] for v in range(4)]) for u in range(4)]
    Y = [[None] * 2 for _ in range(2)]
    for l in range(2):
        col = at_combine([Yrows[u][l] for u in range(4)])
        for k in range(2):
            Y[k][l] = col[k]

    out = jnp.stack([Y[0][0], Y[0][1], Y[1][0], Y[1][1]])  # [4,N,nh,nw,Cout]
    out = out.reshape(2, 2, n, nh, nw, cout).transpose(2, 3, 0, 4, 1, 5)
    out = out.reshape(n, h, wd, cout)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)
