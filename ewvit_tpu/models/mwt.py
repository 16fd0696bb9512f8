"""MWT — multi-level wavelet frequency extractor (Flax, NHWC).

Behavioral equivalent of the reference MWT (/root/reference/network/mwt.py:7-119):
a 3-level Haar pyramid where each level's highpass bands are upsampled to the
level-1 size, passed through per-input-channel conv stacks, fused, and finally
reduced to a ``[N, 1, 1, dama_dim]`` frequency descriptor.

Per level (mwt.py:74-90):
  DWT -> hf channels interleaved c*3+band -> bilinear upsample to (H/2, W/2)
  -> 3 convs C->6C on the per-input-channel slices (mwt.py:85: ``hf[:, i*C:(i+1)*C]``
  slices all three orientations of input channel i when C == 3)
  -> concat(18C) -> fusion conv -> dama_dim; LL recurses (mwt.py:107-111).
Then: concat 3 levels -> multiscale_fusion conv (mwt.py:113-114) -> stride-2
freq_conv (mwt.py:33-36) -> maxpool + stride-2 conv + GAP (mwt.py:38-44).

Conv padding is torch-style symmetric ``(k-1)//2``; BN uses torch defaults
(eps 1e-5, EMA decay 0.9). The DWT itself runs either as the fused XLA
butterfly or the Pallas MXU matmul kernel (ops/haar.py).
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from ewvit_tpu.ops.haar import haar_dwt2d_conv, haar_dwt2d_pallas

Dtype = Any

_SYM = lambda k: (((k - 1) // 2, (k - 1) // 2),) * 2  # noqa: E731


class _ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=_SYM(self.kernel), dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class MWT(nn.Module):
    """Multi-level wavelet frequency branch. Input [N,H,W,C] -> [N,1,1,dama_dim]."""

    in_channels: int = 3
    dama_dim: int = 128
    levels: int = 3
    use_pallas_dwt: bool = False
    dtype: Dtype = jnp.float32

    def _dwt(self, x):
        if self.use_pallas_dwt:
            return haar_dwt2d_pallas(x)
        # conv formulation: forward AND backward are stride-2 convs on the
        # MXU; the strided-slice butterfly's gradient lowers to scatters
        # (~20x slower backward, measured on v5e — see ops/haar.py)
        return haar_dwt2d_conv(x)

    @nn.compact
    def __call__(self, x, *, train: bool = False, return_intermediates: bool = False):
        n, h, w, c = x.shape
        target = (h // 2, w // 2)
        inter = {}

        # hf_conv stack is built once and SHARED across pyramid levels, exactly
        # like the reference's single ModuleDict used per level (mwt.py:47-65,
        # applied inside wavelet_transform at :85-88).
        hf_sep = [
            _ConvBNRelu(6 * self.in_channels, dtype=self.dtype, name=f"hf_sep_{i}")
            for i in range(3)
        ]
        hf_fusion = _ConvBNRelu(self.dama_dim, dtype=self.dtype, name="hf_fusion")

        current = x
        high_freqs: List[jax.Array] = []
        for lvl in range(self.levels):
            ll, hf = self._dwt(current)
            if self.levels > 1 and hf.shape[1:3] != target:
                # bilinear, half-pixel centers == torch align_corners=False
                hf = jax.image.resize(
                    hf, (n, target[0], target[1], hf.shape[-1]), method="bilinear"
                ).astype(hf.dtype)
            processed = []
            for i in range(3):
                # slice = all 3 orientations of input channel i (mwt.py:85)
                sl = hf[..., i * c : (i + 1) * c]
                processed.append(hf_sep[i](sl, train=train))
            merged = jnp.concatenate(processed, axis=-1)  # 18*C channels
            compressed = hf_fusion(merged, train=train)
            high_freqs.append(compressed)
            if return_intermediates and lvl == 0:
                inter["hf_level0"] = compressed
            current = ll

        multi = jnp.concatenate(high_freqs, axis=-1)
        fused = _ConvBNRelu(self.dama_dim, dtype=self.dtype,
                            name="multiscale_fusion")(multi, train=train)
        freq = _ConvBNRelu(self.dama_dim, stride=2, dtype=self.dtype,
                           name="freq_conv")(fused, train=train)
        # freq_pool: MaxPool(2,2) -> stride-2 conv+BN+ReLU -> global avg pool
        freq = nn.max_pool(freq, (2, 2), strides=(2, 2))
        freq = _ConvBNRelu(self.dama_dim, stride=2, dtype=self.dtype,
                           name="freq_pool_conv")(freq, train=train)
        freq = jnp.mean(freq, axis=(1, 2), keepdims=True)  # [N,1,1,dama_dim]
        if return_intermediates:
            inter["freq_out"] = freq
            return freq, inter
        return freq
