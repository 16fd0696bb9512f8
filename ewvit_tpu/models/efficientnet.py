"""EfficientNet-B0 and EfficientNetV2-S backbones in Flax (NHWC, bf16-ready).

TPU-native re-implementations of the two backbones the reference pulls from
third-party packages:

- ``EfficientNetB0`` ≙ ``efficientnet_pytorch.EfficientNet.from_pretrained(
  'efficientnet-b0').extract_features`` (/root/reference/network/sfe.py:108-109,
  :148) — TF-style asymmetric 'SAME' padding, BN(eps=1e-3, decay=0.99), swish,
  squeeze-excitation sized from block *input* channels, drop-connect 0.2
  linearly scaled over blocks. Output: [N, 7, 7, 1280] at 224 input.
- ``EfficientNetV2S`` ≙ ``torchvision.models.efficientnet_v2_s(...).features``
  (/root/reference/network/sfe.py:111-113, :150) — symmetric (k-1)//2 padding,
  BN(eps=1e-3, torch momentum 0.1 => EMA decay 0.9), SiLU, Fused-MBConv early
  stages, SE squeeze = block input // 4, stochastic depth 0.2 (row mode).
  Output: [N, 7, 7, 1280] at 224 input.

The first-6-parameter freeze policy of the reference (sfe.py:115-119) is
provided as :func:`frozen_param_paths` returning the flax param-tree paths
that correspond to the first 6 tensors of torch ``named_parameters`` order
(stem conv kernel, stem BN scale/bias, first block's first conv kernel and
its BN scale/bias).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ewvit_tpu.models.norm import TorchBatchNorm
from ewvit_tpu.ops.dw_se import dw_bn_silu_mean
from ewvit_tpu.ops.dwconv import depthwise_conv

Dtype = Any


@dataclasses.dataclass(frozen=True)
class BlockCfg:
    repeats: int
    kernel: int
    stride: int
    expand: int
    in_ch: int
    out_ch: int
    se_ratio: float = 0.25
    fused: bool = False


# efficientnet_pytorch 'efficientnet-b0' blocks_args (width/depth multiplier 1.0)
B0_BLOCKS: Tuple[BlockCfg, ...] = (
    BlockCfg(1, 3, 1, 1, 32, 16),
    BlockCfg(2, 3, 2, 6, 16, 24),
    BlockCfg(2, 5, 2, 6, 24, 40),
    BlockCfg(3, 3, 2, 6, 40, 80),
    BlockCfg(3, 5, 1, 6, 80, 112),
    BlockCfg(4, 5, 2, 6, 112, 192),
    BlockCfg(1, 3, 1, 6, 192, 320),
)

# torchvision efficientnet_v2_s inverted_residual_setting
V2S_BLOCKS: Tuple[BlockCfg, ...] = (
    BlockCfg(2, 3, 1, 1, 24, 24, se_ratio=0.0, fused=True),
    BlockCfg(4, 3, 2, 4, 24, 48, se_ratio=0.0, fused=True),
    BlockCfg(4, 3, 2, 4, 48, 64, se_ratio=0.0, fused=True),
    BlockCfg(6, 3, 2, 4, 64, 128, se_ratio=0.25),
    BlockCfg(9, 3, 1, 6, 128, 160, se_ratio=0.25),
    BlockCfg(15, 3, 2, 6, 160, 256, se_ratio=0.25),
)


@dataclasses.dataclass(frozen=True)
class BackboneSpec:
    """Override for the backbone's block stack (hashable, jit-static-safe).

    Used by small-but-real configs (ModelConfig.micro) that must compile
    quickly on XLA:CPU — the full B0/V2-S stacks (16/40 blocks x 3 backbone
    instances) take ~18 min to compile for an 8-device CPU mesh on a 1-core
    host, which is what made the driver's multichip dryrun time out in
    rounds 1-2. The truncated stacks keep every REAL component on the path:
    stem, MBConv+SE, FusedMBConv, stride-2 downsampling, droppath residuals.
    """

    blocks: Tuple[BlockCfg, ...]
    stem_ch: int
    head_ch: int


# Micro stacks: 3 real blocks each, two stride-2 stages after the stem so a
# 32px input lands on a 4x4 feature map (patch_size 4 => the reference's
# 1-patch invariant, sfe.py:121). B0 flavor keeps TF-SAME padding + SE-from-
# input; V2-S flavor keeps symmetric padding + FusedMBConv early stages.
B0_MICRO = BackboneSpec(
    blocks=(
        BlockCfg(1, 3, 1, 1, 8, 8),      # MBConv no-expand + SE + droppath
        BlockCfg(1, 3, 2, 2, 8, 16),     # expand + stride-2 + SE
        BlockCfg(1, 3, 2, 2, 16, 16),    # second stride-2 stage
    ),
    stem_ch=8, head_ch=32,
)
V2S_MICRO = BackboneSpec(
    blocks=(
        BlockCfg(1, 3, 1, 1, 8, 8, se_ratio=0.0, fused=True),   # FusedMBConv
        BlockCfg(1, 3, 2, 2, 8, 16, se_ratio=0.0, fused=True),  # fused s2
        BlockCfg(1, 3, 2, 2, 16, 16, se_ratio=0.25),            # MBConv + SE
    ),
    stem_ch=8, head_ch=32,
)


def _pad_for(kernel: int, stride: int, tf_same: bool):
    """'SAME' (TF asymmetric) for B0, symmetric (k-1)//2 for torchvision V2."""
    if tf_same:
        return "SAME"
    p = (kernel - 1) // 2
    return ((p, p), (p, p))


class _Kernel(nn.Module):
    """Bare conv kernel parameter, named "conv" so the param tree matches
    nn.Conv(use_bias=False) exactly (utils/torch_convert.py keys on it)."""

    features: int
    in_features: int
    kernel: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, self.in_features, self.features))


class ConvBN(nn.Module):
    """Conv + BatchNorm (+ optional SiLU). Layout NHWC, kernel HWIO.

    ``mode="params"`` (inference only; used by the fused Pallas depthwise+SE
    path) returns ``(kernel_f32, bn_scale, bn_shift)`` without applying —
    the BN affine extracted in f32 by probing the eval-mode BN at 0 and 1.
    The default mode replicates nn.Conv's apply (dtype promotion +
    lax.conv_general_dilated) so numerics are unchanged.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    tf_same: bool = True
    act: bool = True
    bn_eps: float = 1e-3
    bn_momentum: float = 0.99
    s2d: bool = False   # space-to-depth formulation for stride-2 3x3 (exact)
    dtype: Dtype = jnp.float32

    def _s2d_conv(self, x, kern):
        """Stride-2 3x3 conv via 2x2 space-to-depth + a stride-1 2x2 conv.

        Exact rewrite (same dot products, zero taps added): low-channel
        stride-2 convs (the 3-channel stems) underfeed the MXU contracting
        dimension (k*k*cin = 27); in s2d layout the same conv contracts over
        2*2*4*cin = 48 with 4x fewer rows. Parameters are untouched — the
        [3,3,cin,out] kernel is rearranged at call time, so checkpoints and
        gradients are unchanged.
        """
        n, h, w, cin = x.shape
        xs = x.reshape(n, h // 2, 2, w // 2, 2, cin)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * cin)
        # direct-conv input row = 2*y + dy - pad_begin; in block coords
        # (block A offset a) the row is 2*(y+A) + a, so dy = 2A + a - off.
        off = 0 if self.tf_same else 1  # TF-SAME even-input pad is (0,1)
        k4 = jnp.zeros((2, 2, 2, 2, cin, self.features), kern.dtype)
        for A in (0, 1):
            for a in (0, 1):
                dy = 2 * A + a - off
                if not 0 <= dy < 3:
                    continue
                for B in (0, 1):
                    for b in (0, 1):
                        dx = 2 * B + b - off
                        if 0 <= dx < 3:
                            k4 = k4.at[A, B, a, b].set(kern[dy, dx])
        ks2d = k4.reshape(2, 2, 4 * cin, self.features)  # (a,b,i) chan order
        bp = ((0, 1), (0, 1)) if self.tf_same else ((1, 0), (1, 0))
        return jax.lax.conv_general_dilated(
            xs, ks2d, (1, 1), bp, dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @nn.compact
    def __call__(self, x=None, *, train: bool = False, mode: str = "apply"):
        in_feats = (self.features if x is None else x.shape[-1])
        kern = _Kernel(self.features, in_feats // self.groups, self.kernel,
                       name="conv")()
        if mode == "params":
            assert not train, "ConvBN params mode is inference-only"
            bn = TorchBatchNorm(use_running_average=True,
                                momentum=self.bn_momentum, epsilon=self.bn_eps,
                                dtype=jnp.float32, name="bn")
            probe = jnp.zeros((1, 1, 1, self.features), jnp.float32)
            y0 = bn(probe)
            y1 = bn(probe + 1)
            scale = (y1 - y0).reshape(-1)
            shift = y0.reshape(-1)
            return kern.astype(jnp.float32), scale, shift

        x = x.astype(self.dtype)
        if (self.s2d and self.kernel == 3 and self.stride == 2
                and self.groups == 1
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            x = self._s2d_conv(x, kern.astype(self.dtype))
        elif self.groups > 1 and self.groups == x.shape[-1]:
            # depthwise: SPMD-exact custom backward — the native
            # batch_group_count filter-grad conv is miscompiled by GSPMD
            # under partially-sharded batches (ops/dwconv.py)
            x = depthwise_conv(
                x, kern.astype(self.dtype), self.stride,
                _pad_for(self.kernel, self.stride, self.tf_same))
        else:
            x = jax.lax.conv_general_dilated(
                x, kern.astype(self.dtype),
                (self.stride, self.stride),
                _pad_for(self.kernel, self.stride, self.tf_same),
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act:
            x = nn.silu(x)
        return x


class SqueezeExcite(nn.Module):
    """SE block: GAP -> 1x1 reduce -> SiLU -> 1x1 expand -> sigmoid gate."""

    squeeze_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mean=None):
        # Two-stage spatial mean (H then W): the single fused (1,2)-axis
        # reduce runs at ~half HBM peak on v5e (~108us for [64,14,14,960]);
        # the staged reduce measured 1.44x faster (BASELINE.md). When the
        # fused Pallas depthwise kernel already produced the mean (ops/
        # dw_se.py), it is passed in and the reduce pass disappears.
        if mean is not None:
            s = mean.astype(x.dtype)
        else:
            s = jnp.mean(x, axis=1)
            s = jnp.mean(s, axis=1)[:, None, None, :]
        s = nn.Conv(self.squeeze_ch, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(s)
        return x * jax.nn.sigmoid(s)


def _stochastic_depth(x, rate: float, deterministic: bool, rng):
    """Row-mode stochastic depth on a residual branch (scales by 1/keep)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, mask_shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class MBConv(nn.Module):
    """Inverted-residual MBConv block.

    ``se_from_input=True`` (B0): squeeze channels = max(1, in_ch * se_ratio).
    ``se_from_input=False`` (V2): squeeze channels = in_ch // 4.
    """

    cfg_in: int
    cfg_out: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float
    drop_rate: float
    tf_same: bool
    bn_momentum: float
    use_pallas_dwse: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inp = x
        expanded = self.cfg_in * self.expand
        if self.expand != 1:
            x = ConvBN(expanded, 1, 1, tf_same=self.tf_same,
                       bn_momentum=self.bn_momentum, dtype=self.dtype,
                       name="expand_conv")(x, train=train)
        dw = ConvBN(expanded, self.kernel, self.stride, groups=expanded,
                    tf_same=self.tf_same, bn_momentum=self.bn_momentum,
                    dtype=self.dtype, name="depthwise")
        fuse_dwse = (self.use_pallas_dwse and not train
                     and self.stride == 1 and self.se_ratio > 0)
        if fuse_dwse:
            # Fused depthwise+BN+SiLU+mean Pallas kernel (ops/dw_se.py):
            # the SE global mean rides the pass that writes the activated
            # tensor, eliminating its separate HBM read (BASELINE.md).
            kern, scale, shift = dw(mode="params")
            w_eff = kern.reshape(self.kernel * self.kernel, expanded) * scale
            y, m = dw_bn_silu_mean(
                x, w_eff, shift, kernel=self.kernel,
                interpret=jax.default_backend() != "tpu")
            squeeze = max(1, int(self.cfg_in * self.se_ratio))
            x = SqueezeExcite(squeeze, dtype=self.dtype, name="se")(
                y, mean=m[:, None, None, :])
        else:
            x = dw(x, train=train)
            if self.se_ratio > 0:
                squeeze = max(1, int(self.cfg_in * self.se_ratio))
                x = SqueezeExcite(squeeze, dtype=self.dtype, name="se")(x)
        x = ConvBN(self.cfg_out, 1, 1, tf_same=self.tf_same, act=False,
                   bn_momentum=self.bn_momentum, dtype=self.dtype,
                   name="project")(x, train=train)
        if self.stride == 1 and self.cfg_in == self.cfg_out:
            rng = self.make_rng("droppath") if train and self.drop_rate > 0 else None
            x = inp + _stochastic_depth(x, self.drop_rate, not train, rng)
        return x


class FusedMBConv(nn.Module):
    """Fused MBConv (V2 early stages): full kxk conv replaces expand+depthwise."""

    cfg_in: int
    cfg_out: int
    kernel: int
    stride: int
    expand: int
    drop_rate: float
    bn_momentum: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inp = x
        if self.expand != 1:
            x = ConvBN(self.cfg_in * self.expand, self.kernel, self.stride,
                       tf_same=False, bn_momentum=self.bn_momentum,
                       dtype=self.dtype, name="fused_expand")(x, train=train)
            x = ConvBN(self.cfg_out, 1, 1, tf_same=False, act=False,
                       bn_momentum=self.bn_momentum, dtype=self.dtype,
                       name="project")(x, train=train)
        else:
            x = ConvBN(self.cfg_out, self.kernel, self.stride, tf_same=False,
                       bn_momentum=self.bn_momentum, dtype=self.dtype,
                       name="fused_expand")(x, train=train)
        if self.stride == 1 and self.cfg_in == self.cfg_out:
            rng = self.make_rng("droppath") if train and self.drop_rate > 0 else None
            x = inp + _stochastic_depth(x, self.drop_rate, not train, rng)
        return x


class _EfficientNet(nn.Module):
    blocks: Tuple[BlockCfg, ...]
    stem_ch: int
    head_ch: int
    tf_same: bool
    bn_momentum: float
    drop_connect_rate: float = 0.2
    use_pallas_dwse: bool = False
    use_s2d_stem: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = ConvBN(self.stem_ch, 3, 2, tf_same=self.tf_same,
                   bn_momentum=self.bn_momentum, s2d=self.use_s2d_stem,
                   dtype=self.dtype, name="stem")(x, train=train)
        total = sum(c.repeats for c in self.blocks)
        idx = 0
        for si, cfg in enumerate(self.blocks):
            for r in range(cfg.repeats):
                in_ch = cfg.in_ch if r == 0 else cfg.out_ch
                stride = cfg.stride if r == 0 else 1
                rate = self.drop_connect_rate * idx / total
                if cfg.fused:
                    x = FusedMBConv(
                        in_ch, cfg.out_ch, cfg.kernel, stride, cfg.expand,
                        rate, self.bn_momentum, dtype=self.dtype,
                        name=f"block_{si}_{r}")(x, train=train)
                else:
                    x = MBConv(
                        in_ch, cfg.out_ch, cfg.kernel, stride, cfg.expand,
                        cfg.se_ratio, rate, self.tf_same, self.bn_momentum,
                        use_pallas_dwse=self.use_pallas_dwse,
                        dtype=self.dtype, name=f"block_{si}_{r}")(x, train=train)
                idx += 1
        x = ConvBN(self.head_ch, 1, 1, tf_same=self.tf_same,
                   bn_momentum=self.bn_momentum, dtype=self.dtype,
                   name="head")(x, train=train)
        return x


class EfficientNetB0(nn.Module):
    """B0 feature extractor: [N,224,224,3] -> [N,7,7,1280] (sfe.py:108-109)."""

    use_pallas_dwse: bool = False
    use_s2d_stem: bool = False
    spec: Optional[BackboneSpec] = None   # block-stack override (micro configs)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        s = self.spec or BackboneSpec(B0_BLOCKS, stem_ch=32, head_ch=1280)
        return _EfficientNet(
            s.blocks, stem_ch=s.stem_ch, head_ch=s.head_ch, tf_same=True,
            bn_momentum=0.99, use_pallas_dwse=self.use_pallas_dwse,
            use_s2d_stem=self.use_s2d_stem,
            dtype=self.dtype, name="net")(x, train=train)


class EfficientNetV2S(nn.Module):
    """V2-S feature extractor: [N,224,224,3] -> [N,7,7,1280] (sfe.py:111-113)."""

    use_pallas_dwse: bool = False
    use_s2d_stem: bool = False
    spec: Optional[BackboneSpec] = None   # block-stack override (micro configs)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        s = self.spec or BackboneSpec(V2S_BLOCKS, stem_ch=24, head_ch=1280)
        return _EfficientNet(
            s.blocks, stem_ch=s.stem_ch, head_ch=s.head_ch, tf_same=False,
            bn_momentum=0.9, use_pallas_dwse=self.use_pallas_dwse,
            use_s2d_stem=self.use_s2d_stem,
            dtype=self.dtype, name="net")(x, train=train)


def frozen_param_paths(variant: str) -> Sequence[Tuple[str, ...]]:
    """Param-tree paths frozen by the reference's first-6 policy (sfe.py:115-119).

    torch ``named_parameters`` order for both backbones starts with: stem conv
    weight, stem BN weight, stem BN bias, first-block first conv weight, its
    BN weight, its BN bias. (For B0 the first block has no expand conv, so its
    first conv is the depthwise one.)
    """
    if variant == "b0":
        first_conv = ("net", "block_0_0", "depthwise")
    elif variant == "v2s":
        first_conv = ("net", "block_0_0", "fused_expand")
    else:
        raise ValueError(f"unknown variant {variant!r}")
    stem = ("net", "stem")
    return [
        stem + ("conv", "kernel"),
        stem + ("bn", "scale"),
        stem + ("bn", "bias"),
        first_conv + ("conv", "kernel"),
        first_conv + ("bn", "scale"),
        first_conv + ("bn", "bias"),
    ]
