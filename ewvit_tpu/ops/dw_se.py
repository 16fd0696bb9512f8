"""Fused depthwise-conv + BN + SiLU + spatial-mean Pallas kernel (inference).

Why: in the V2-S backbone every SE-bearing MBConv computes

    y = silu(bn(dwconv3x3(x)));  s = mean(y, (1,2));  out = y * gate(s)

and the global mean is a separate HBM pass over ``y`` (~60us per block at
[64,14,14,960]; ~1.8 ms/call across the 28 SE blocks in the in-model device
trace — see BASELINE.md). A device-trace shootout of every XLA-level
formulation (fused/two-stage/f32/bn-folded/barrier, tools/
profile_se_variants.py) showed they are all equivalent: the re-read of ``y``
is structural. This kernel emits ``y`` AND its spatial mean in the single
pass that produces ``y``, so the reduce pass disappears.

Replaces the depthwise ConvBN + the SE pooling of
torchvision's MBConv (reference consumer: /root/reference/network/sfe.py:111-113
via torchvision efficientnet_v2_s); the TPU-native module wiring is
models/efficientnet.py (MBConv with ``use_pallas_dwse``).

Kernel shape notes (Mosaic):
- layout [N, H, W, C]: W -> sublanes, C -> lanes, H untiled. All in-kernel
  slices are unit-stride (tap shifts dh on the untiled dim, dw as unit-stride
  sublane offsets) — within Mosaic's no-strided-slice constraint.
- SAME padding ring is assembled in a VMEM scratch [H+k-1, W+k-1, C]
  (zero-init + one interior copy), never in HBM.
- stride-1 odd-k depthwise only (SAME == symmetric); the two stride-2 SE
  blocks in V2-S stay on the XLA path.
- BN scale is pre-folded into the weights by the caller; the kernel applies
  ``silu(acc + shift)`` with f32 accumulation and taps converted to f32
  (matches XLA's bf16-conv-with-f32-accumulate semantics).

Inference-only: no custom VJP; training uses the XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


@functools.partial(jax.jit, static_argnames=("kernel", "interpret"))
def dw_bn_silu_mean(
    x: jax.Array,        # [N, H, W, C]
    w_eff: jax.Array,    # [k*k, C] f32 — depthwise taps with BN scale folded
    shift: jax.Array,    # [C] f32 — BN shift (beta - mean * scale)
    *,
    kernel: int = 3,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (y, mean): y = silu(dw_same(x) * bn_scale + bn_shift) in
    x.dtype, mean = spatial mean of y over (H, W) in f32, shape [N, C].

    Equivalent (up to BN-fold rounding) to the XLA chain
    ``silu(bn(lax.conv(x, w, groups=C, SAME)))`` followed by
    ``jnp.mean(y, (1, 2))``.
    """
    n, h, w, c = x.shape
    k = kernel
    assert k % 2 == 1, "stride-1 SAME fusion needs odd kernel"
    p = k // 2
    cdt = x.dtype
    inv_hw = 1.0 / float(h * w)

    def kernel_fn(x_ref, w_ref, b_ref, y_ref, m_ref, xpad):
        xpad[...] = jnp.zeros((h + 2 * p, w + 2 * p, c), cdt)
        xpad[p:p + h, p:p + w, :] = x_ref[0]
        acc = jnp.zeros((h, w, c), jnp.float32)
        for dh in range(k):
            for dw in range(k):
                tap = xpad[dh:dh + h, dw:dw + w, :].astype(jnp.float32)
                acc = acc + tap * w_ref[dh * k + dw][None, None, :]
        acc = acc + b_ref[0][None, None, :]
        y = acc * jax.nn.sigmoid(acc)          # SiLU in f32
        yc = y.astype(cdt)
        y_ref[0] = yc
        m_ref[0, 0] = jnp.sum(yc.astype(jnp.float32), axis=(0, 1)) * inv_hw

    assert _HAS_PLTPU, "dw_se needs pallas TPU scratch support"
    y, m = pl.pallas_call(
        kernel_fn,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda ni: (ni, 0, 0, 0)),
            pl.BlockSpec((k * k, c), lambda ni: (0, 0)),
            pl.BlockSpec((1, c), lambda ni: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, h, w, c), lambda ni: (ni, 0, 0, 0)),
            # mean block is [1, 1, c]: Mosaic requires the last two block
            # dims be (8,128)-divisible OR full-size — (1, c) is full-size.
            pl.BlockSpec((1, 1, c), lambda ni: (ni, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, w, c), cdt),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((h + 2 * p, w + 2 * p, c), cdt)],
        interpret=interpret,
    )(x, w_eff.astype(jnp.float32),
      shift.reshape(1, c).astype(jnp.float32))
    return y, m.reshape(n, c)
