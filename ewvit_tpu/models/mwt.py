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

``use_fused_tail`` (inference only) replaces the hf_fusion -> concat ->
multiscale_fusion -> freq_conv chain with the phase-split Winograd pipeline in
ops/mwt_tail.py: hf_fusion becomes four exact stride-2 phase convs per level,
multiscale_fusion runs as a VMEM-resident Pallas Winograd kernel (2.25x MAC
cut on the model's FLOP-dominant conv), and freq_conv consumes the phase-split
output directly. Same parameters, same math (exact in fp32; bf16 differs only
by reassociation rounding).
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ewvit_tpu.models.norm import TorchBatchNorm
from ewvit_tpu.ops.haar import haar_dwt2d_conv, haar_dwt2d_pallas
from ewvit_tpu.ops.mwt_tail import (
    freq_from_phases,
    fused_multiscale_winograd,
    multiscale_winograd_u,
    phase_conv_paddings,
)

Dtype = Any

_SYM = lambda k: (((k - 1) // 2, (k - 1) // 2),) * 2  # noqa: E731


class _ConvParams(nn.Module):
    """Bare conv parameters, named "conv" so the tree matches nn.Conv
    (kernel [k,k,in,out] + bias [out]; torch_convert.py depends on this)."""

    features: int
    in_features: int
    kernel: int = 3

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _ConvBNRelu(nn.Module):
    """conv3x3 + BN + ReLU with three call modes:

    - default: stride-``stride`` SAME conv (the reference Sequential,
      mwt.py:47-72) — numerically identical to the previous nn.Conv-based
      implementation;
    - ``phase=(p, q)``: the stride-2 phase conv emitting phase (p,q) of the
      stride-1 output in the ops/mwt_tail.py layout (sized [A+1, B+1]);
    - ``mode="tail_params"``: returns (kernel, conv_bias, bn_scale, bn_shift)
      for BN folding into the Pallas kernel. The BN affine is extracted by
      evaluating the (eval-mode) BN at 0 and 1 — exact up to one rounding.
    - ``mode="from_phases"``: x is a tuple of 4 phase arrays; applies the
      stride-2 conv via trimmed sub-convs (freq_conv consuming the Winograd
      kernel's phase-split output).
    - ``mode="conv_params"``: returns (kernel, bias) without applying —
      lets MWT assemble the block-diagonal hf_sep conv (train fast path);
    - ``mode="bn_relu"``: applies only this module's BN + ReLU to ``x``
      (the block-diagonal conv's output slice) — BN statistics see exactly
      the values the per-slice conv would have produced, so the fast path
      is semantics-identical.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    in_features: Optional[int] = None  # required only for mode="tail_params"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x=None, *, train: bool = False, phase=None,
                 mode: str = "apply"):
        if mode == "tail_params" or phase is not None:
            assert not train, "fused MWT tail is inference-only"
        in_f = (self.in_features
                if x is None or mode in ("from_phases", "bn_relu")
                else x.shape[-1])
        kern, cbias = _ConvParams(self.features, in_f, self.kernel,
                                  name="conv")()
        bn = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")
        if mode == "tail_params":
            probe = jnp.zeros((1, 1, 1, self.features), self.dtype)
            y0 = bn(probe)
            y1 = bn(probe + 1)
            scale = (y1 - y0).reshape(-1).astype(jnp.float32)
            shift = y0.reshape(-1).astype(jnp.float32)
            return kern, cbias, scale, shift
        if mode == "conv_params":
            return kern, cbias
        if mode == "bn_relu":
            return nn.relu(bn(x))

        kern = kern.astype(self.dtype)
        if mode == "from_phases":
            y = freq_from_phases([p.astype(self.dtype) for p in x], kern)
        else:
            if phase is None:
                strides, padding = (self.stride,) * 2, _SYM(self.kernel)
            else:
                strides, padding = (2, 2), phase_conv_paddings(*phase)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kern, strides, padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + cbias.astype(self.dtype)
        y = bn(y)
        return nn.relu(y)


def _tail_tile_rows(a: int) -> int:
    for r in (8, 7, 4, 2, 1):
        if a % r == 0 and a >= 2 * r:  # kernel needs >= 2 row blocks
            return r
    return 1


class MWT(nn.Module):
    """Multi-level wavelet frequency branch. Input [N,H,W,C] -> [N,1,1,dama_dim]."""

    in_channels: int = 3
    dama_dim: int = 128
    levels: int = 3
    use_pallas_dwt: bool = False
    use_fused_tail: bool = False
    # False | True (levels batched on the batch axis) | "level" (per-level
    # block-diagonal hf_sep conv, per-level hf_fusion on the contiguous
    # result). Eval-only fast paths; see BASELINE.md round-2 measurements.
    fused_eval_pyramid: Any = "level"
    # Train-mode analogue of fused_eval_pyramid="level": ONE block-diagonal
    # hf_sep conv per level (9 low-channel convs -> 3 in forward AND
    # backward), with each hf_sep BN applied to its channel slice so
    # statistics/updates are semantics-identical (BN is per-channel, so
    # BN(slice of blockconv) == BN(separate conv) exactly). Targets the
    # diagnosed train-backward long tail of small 112² low-lane fusions
    # (BASELINE.md train-step attribution). Off by default until measured.
    fused_train_pyramid: bool = False
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
            _ConvBNRelu(6 * self.in_channels, in_features=self.in_channels,
                        dtype=self.dtype, name=f"hf_sep_{i}")
            for i in range(3)
        ]
        hf_fusion = _ConvBNRelu(self.dama_dim,
                                in_features=18 * self.in_channels,
                                dtype=self.dtype, name="hf_fusion")
        multiscale_fusion = _ConvBNRelu(
            self.dama_dim, in_features=self.levels * self.dama_dim,
            dtype=self.dtype, name="multiscale_fusion")
        freq_conv = _ConvBNRelu(self.dama_dim, stride=2,
                                in_features=self.dama_dim,
                                dtype=self.dtype, name="freq_conv")

        current = x
        hfs: List[jax.Array] = []
        for lvl in range(self.levels):
            ll, hf = self._dwt(current)
            if self.levels > 1 and hf.shape[1:3] != target:
                # bilinear, half-pixel centers == torch align_corners=False
                hf = jax.image.resize(
                    hf, (n, target[0], target[1], hf.shape[-1]), method="bilinear"
                ).astype(hf.dtype)
            hfs.append(hf)
            current = ll

        def level_merged(hf):
            """Per-level hf_sep stack: [N,H2,W2,3C] -> [N,H2,W2,18C]."""
            if self.fused_train_pyramid and train:
                return level_merged_block(hf)
            processed = []
            for i in range(3):
                # slice = all 3 orientations of input channel i (mwt.py:85)
                sl = hf[..., i * c : (i + 1) * c]
                processed.append(hf_sep[i](sl, train=train))
            return jnp.concatenate(processed, axis=-1)

        def level_merged_block(hf):
            """Train fast path: the 3 hf_sep convs as ONE block-diagonal
            conv [3,3,3C,18C] (zeros off-block; gradients slice back into
            the 3 reference-shaped kernels through the .at[].set trace),
            then each hf_sep BN+ReLU on its channel slice — BN is
            per-channel, so statistics, normalization, and running-stat
            updates are identical to the separate-conv formulation."""
            parts = [hf_sep[i](mode="conv_params") for i in range(3)]
            big_k = jnp.zeros((3, 3, 3 * c, 18 * c), jnp.float32)
            for i, (k, _) in enumerate(parts):
                big_k = big_k.at[:, :, i * c:(i + 1) * c,
                                 i * 6 * c:(i + 1) * 6 * c].set(k)
            big_b = jnp.concatenate([b for _, b in parts])
            y = jax.lax.conv_general_dilated(
                hf.astype(self.dtype), big_k.astype(self.dtype), (1, 1),
                _SYM(3), dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + big_b.astype(self.dtype)
            return jnp.concatenate(
                [hf_sep[i](y[..., i * 6 * c:(i + 1) * 6 * c],
                           train=train, mode="bn_relu")
                 for i in range(3)], axis=-1)

        fused_tail = (self.use_fused_tail and not train
                      and not return_intermediates
                      and target[0] % 2 == 0 and target[1] % 2 == 0
                      and target[0] // 2 >= 4)
        fast_pyramid = (self.fused_eval_pyramid and not train
                        and not return_intermediates and not fused_tail)
        if fast_pyramid:
            # Eval-mode fast path (same parameters, same math): the 9
            # per-level/per-slice hf_sep convs are bandwidth-bound 3-channel
            # ops (~850us/call of the 13ms v5e forward, BASELINE.md round-2
            # trace) and the 3 shared-weight hf_fusion convs run at 63% of
            # MXU peak. Stack the pyramid levels on the BATCH axis and apply
            #   (a) ONE block-diagonal conv [3,3,3C,18C] == the 3 hf_sep
            #       convs on their channel slices (zeros off-block), and
            #   (b) ONE batched hf_fusion conv (weights are shared across
            #       levels in the reference, mwt.py:47-65, so batching
            #       levels is exact),
            # with each eval-mode BN folded into the conv weights. Batch
            # slices then feed the usual channel-concat -> multiscale conv,
            # which XLA fuses exactly as in the per-level formulation.
            def folded(mod):
                kern, cbias, scale, shift = mod(mode="tail_params")
                # round the kernel to the compute dtype BEFORE folding so the
                # result is identical whether params arrive f32 or pre-cast
                # (utils/params.cast_kernels_for_inference)
                kf = kern.astype(self.dtype).astype(jnp.float32) * scale
                bf = cbias.astype(jnp.float32) * scale + shift
                return kf, bf

            seps = [folded(hf_sep[i]) for i in range(3)]
            big_k = jnp.zeros((3, 3, 3 * c, 18 * c), jnp.float32)
            for i, (kf, _) in enumerate(seps):
                big_k = big_k.at[:, :, i * c:(i + 1) * c,
                                 i * 6 * c:(i + 1) * 6 * c].set(kf)
            big_b = jnp.concatenate([bf for _, bf in seps])
            fk, fb = folded(hf_fusion)

            def conv(x, k, b):
                y = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), k.astype(self.dtype), (1, 1),
                    _SYM(3), dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return nn.relu(y + b.astype(self.dtype))

            if self.fused_eval_pyramid == "level":
                # per level: ONE block-diagonal hf_sep conv, then hf_fusion
                # on its contiguous 18C-channel output (no batch stacking,
                # no slicing — only the 3-source in-fusion concat goes away)
                high_freqs = [conv(conv(hf, big_k, big_b), fk, fb)
                              for hf in hfs]
            else:
                stacked = jnp.concatenate(hfs, axis=0)  # [L*N, H2, W2, 3C]
                hf_out = conv(conv(stacked, big_k, big_b), fk, fb)
                high_freqs = [hf_out[lvl * n:(lvl + 1) * n]
                              for lvl in range(self.levels)]
            multi = jnp.concatenate(high_freqs, axis=-1)
            fused = multiscale_fusion(multi, train=False)
            freq = freq_conv(fused, train=False)
        elif fused_tail:
            mergeds = [level_merged(hf) for hf in hfs]
            # hf_fusion as 4 exact stride-2 phase convs per level (shared
            # weights), feeding the VMEM-resident Winograd multiscale kernel;
            # freq_conv consumes the phase-split result directly.
            phases = [hf_fusion(m, train=False, phase=(p, q))
                      for m in mergeds for p in (0, 1) for q in (0, 1)]
            kern, cbias, scale, shift = multiscale_fusion(mode="tail_params")
            u = multiscale_winograd_u(kern, scale, self.levels,
                                      phases[0].dtype)
            bias = cbias.astype(jnp.float32) * scale + shift
            fused_ph = fused_multiscale_winograd(
                phases, u, bias,
                tile_rows=_tail_tile_rows(target[0] // 2),
                interpret=jax.default_backend() != "tpu")
            freq = freq_conv(tuple(fused_ph), train=False, mode="from_phases")
        else:
            mergeds = [level_merged(hf) for hf in hfs]
            high_freqs = [hf_fusion(m, train=train) for m in mergeds]
            if return_intermediates:
                inter["hf_level0"] = high_freqs[0]
            multi = jnp.concatenate(high_freqs, axis=-1)
            fused = multiscale_fusion(multi, train=train)
            freq = freq_conv(fused, train=train)

        # freq_pool: MaxPool(2,2) -> stride-2 conv+BN+ReLU -> global avg pool
        freq = nn.max_pool(freq, (2, 2), strides=(2, 2))
        freq = _ConvBNRelu(self.dama_dim, stride=2, dtype=self.dtype,
                           name="freq_pool_conv")(freq, train=train)
        freq = jnp.mean(freq, axis=(1, 2), keepdims=True)  # [N,1,1,dama_dim]
        if return_intermediates:
            inter["freq_out"] = freq
            return freq, inter
        return freq
