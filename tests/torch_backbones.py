"""Torch ORACLE implementations of the two third-party backbones.

No pretrained weights (or even the packages) exist in this environment, so
these modules re-create, in torch, the exact architectures the reference
loads (/root/reference/network/sfe.py:108-113):

- ``TorchEfficientNetB0`` ≙ ``efficientnet_pytorch.EfficientNet.from_pretrained
  ('efficientnet-b0')``: attribute names (``_conv_stem``, ``_bn0``,
  ``_blocks.N._expand_conv/...``), TF static 'SAME' padding, BN(eps=1e-3,
  torch momentum 0.01), swish, SE squeeze = max(1, int(block_input * 0.25)),
  and the ImageNet ``_fc`` head the reference never strips.
- ``TorchEfficientNetV2SFeatures`` ≙ ``torchvision.models.efficientnet_v2_s()
  .features``: ``features.S.R.block.*`` Sequential layout, symmetric
  (k-1)//2 padding, BN(eps=1e-3), SiLU, FusedMBConv stages 1-3, MBConv with
  SqueezeExcitation(fc1/fc2, squeeze = block_input // 4) stages 4-6.

Their ``state_dict()`` key/shape inventories are cross-checked against the
independently transcribed tables in tests/test_checkpoint_inventory.py, and
their eval-mode forwards are the numerical parity oracle for
``ewvit_tpu/models/efficientnet.py`` + ``utils/torch_convert.py``
(tests/test_backbone_oracle.py) — the closest possible stand-in for real
pretrained-weight parity until weights are available (PARITY.md Known gaps).
"""

from __future__ import annotations

import torch
from torch import nn
from torch.nn import functional as F

# (expand, kernel, stride, in, out) per repeated block — transcribed from
# efficientnet_pytorch's decoded blocks_args for 'efficientnet-b0'
# (r1_k3_s11_e1_i32_o16 ... r1_k3_s11_e6_i192_o320, multipliers 1.0).
B0_BLOCK_ARGS = [
    (1, 3, 1, 32, 16),
    (6, 3, 2, 16, 24), (6, 3, 1, 24, 24),
    (6, 5, 2, 24, 40), (6, 5, 1, 40, 40),
    (6, 3, 2, 40, 80), (6, 3, 1, 80, 80), (6, 3, 1, 80, 80),
    (6, 5, 1, 80, 112), (6, 5, 1, 112, 112), (6, 5, 1, 112, 112),
    (6, 5, 2, 112, 192), (6, 5, 1, 192, 192), (6, 5, 1, 192, 192),
    (6, 5, 1, 192, 192),
    (6, 3, 1, 192, 320),
]

# (repeats, expand, kernel, stride, in, out, fused) per stage — transcribed
# from torchvision's efficientnet_v2_s inverted_residual_setting.
V2S_STAGE_ARGS = [
    (2, 1, 3, 1, 24, 24, True),
    (4, 4, 3, 2, 24, 48, True),
    (4, 4, 3, 2, 48, 64, True),
    (6, 4, 3, 2, 64, 128, False),
    (9, 6, 3, 1, 128, 160, False),
    (15, 6, 3, 2, 160, 256, False),
]


class _TFSameConv2d(nn.Conv2d):
    """DYNAMIC TF 'SAME' padding: total pad = max((ceil(in/s)-1)*s + k - in,
    0), split begin = total//2 (extra at end), computed from the RUNTIME
    input size. efficientnet_pytorch's Conv2dStaticSamePadding instead fixes
    the pads at construction from image_size=224 — the two coincide exactly
    when the model runs at its construction size (224, the production
    config, and what the oracle tests use for B0), and can diverge at other
    input sizes once stride-2 stages see odd/mismatched runtime sizes. The
    'asymmetric' padding exercised at 224 comes from even inputs to the
    stride-2 convs (pad (0,1) each side-pair), not from odd inputs."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        sh, sw = self.stride
        kh, kw = self.kernel_size
        ph = max((-(-ih // sh) - 1) * sh + kh - ih, 0)
        pw = max((-(-iw // sw) - 1) * sw + kw - iw, 0)
        if ph or pw:
            x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


class _B0Block(nn.Module):
    """efficientnet_pytorch MBConvBlock (eval path; drop_connect train-only)."""

    def __init__(self, expand, kernel, stride, cin, cout):
        super().__init__()
        self.expand, self.stride, self.cin, self.cout = expand, stride, cin, cout
        exp = cin * expand
        if expand != 1:
            self._expand_conv = _TFSameConv2d(cin, exp, 1, bias=False)
            self._bn0 = nn.BatchNorm2d(exp, eps=1e-3, momentum=0.01)
        self._depthwise_conv = _TFSameConv2d(exp, exp, kernel, stride=stride,
                                             groups=exp, bias=False)
        self._bn1 = nn.BatchNorm2d(exp, eps=1e-3, momentum=0.01)
        se = max(1, int(cin * 0.25))
        self._se_reduce = _TFSameConv2d(exp, se, 1, bias=True)
        self._se_expand = _TFSameConv2d(se, exp, 1, bias=True)
        self._project_conv = _TFSameConv2d(exp, cout, 1, bias=False)
        self._bn2 = nn.BatchNorm2d(cout, eps=1e-3, momentum=0.01)

    def forward(self, x):
        inp = x
        if self.expand != 1:
            x = F.silu(self._bn0(self._expand_conv(x)))
        x = F.silu(self._bn1(self._depthwise_conv(x)))
        s = F.adaptive_avg_pool2d(x, 1)
        s = self._se_expand(F.silu(self._se_reduce(s)))
        x = torch.sigmoid(s) * x
        x = self._bn2(self._project_conv(x))
        if self.stride == 1 and self.cin == self.cout:
            x = x + inp
        return x


class TorchEfficientNetB0(nn.Module):
    """State-dict-identical stand-in for efficientnet_pytorch 'efficientnet-b0'."""

    def __init__(self):
        super().__init__()
        self._conv_stem = _TFSameConv2d(3, 32, 3, stride=2, bias=False)
        self._bn0 = nn.BatchNorm2d(32, eps=1e-3, momentum=0.01)
        self._blocks = nn.ModuleList(
            [_B0Block(*args) for args in B0_BLOCK_ARGS])
        self._conv_head = _TFSameConv2d(320, 1280, 1, bias=False)
        self._bn1 = nn.BatchNorm2d(1280, eps=1e-3, momentum=0.01)
        self._fc = nn.Linear(1280, 1000)

    def extract_features(self, x):
        """The method the reference actually calls (sfe.py:148)."""
        x = F.silu(self._bn0(self._conv_stem(x)))
        for blk in self._blocks:
            x = blk(x)
        return F.silu(self._bn1(self._conv_head(x)))

    forward = extract_features


class _ConvNormAct(nn.Sequential):
    """torchvision Conv2dNormActivation: Conv(0) + BN(1) [+ SiLU], symmetric pad."""

    def __init__(self, cin, cout, kernel, stride, groups=1, act=True):
        layers = [
            nn.Conv2d(cin, cout, kernel, stride, padding=(kernel - 1) // 2,
                      groups=groups, bias=False),
            nn.BatchNorm2d(cout, eps=1e-3),
        ]
        if act:
            layers.append(nn.SiLU(inplace=True))
        super().__init__(*layers)


class _SqueezeExcitation(nn.Module):
    """torchvision ops.SqueezeExcitation (fc1/fc2 1x1 convs with bias)."""

    def __init__(self, channels, squeeze):
        super().__init__()
        self.fc1 = nn.Conv2d(channels, squeeze, 1)
        self.fc2 = nn.Conv2d(squeeze, channels, 1)

    def forward(self, x):
        s = F.adaptive_avg_pool2d(x, 1)
        s = self.fc2(F.silu(self.fc1(s)))
        return x * torch.sigmoid(s)


class _V2Block(nn.Module):
    """torchvision MBConv / FusedMBConv: `.block` Sequential + residual
    (StochasticDepth is identity in eval mode and holds no parameters)."""

    def __init__(self, expand, kernel, stride, cin, cout, fused):
        super().__init__()
        self.use_res = stride == 1 and cin == cout
        exp = cin * expand
        if fused:
            if expand != 1:
                block = [_ConvNormAct(cin, exp, kernel, stride),
                         _ConvNormAct(exp, cout, 1, 1, act=False)]
            else:
                block = [_ConvNormAct(cin, cout, kernel, stride)]
        else:
            block = [
                _ConvNormAct(cin, exp, 1, 1),
                _ConvNormAct(exp, exp, kernel, stride, groups=exp),
                _SqueezeExcitation(exp, max(1, cin // 4)),
                _ConvNormAct(exp, cout, 1, 1, act=False),
            ]
        self.block = nn.Sequential(*block)

    def forward(self, x):
        r = self.block(x)
        return x + r if self.use_res else r


class TorchEfficientNetV2SFeatures(nn.Module):
    """State-dict-identical stand-in for torchvision efficientnet_v2_s().features
    (the reference replaces avgpool/classifier and only uses .features)."""

    def __init__(self):
        super().__init__()
        stages = [_ConvNormAct(3, 24, 3, 2)]
        for repeats, expand, kernel, stride, cin, cout, fused in V2S_STAGE_ARGS:
            stage = []
            for r in range(repeats):
                stage.append(_V2Block(expand, kernel,
                                      stride if r == 0 else 1,
                                      cin if r == 0 else cout, cout, fused))
            stages.append(nn.Sequential(*stage))
        stages.append(_ConvNormAct(256, 1280, 1, 1))
        self.features = nn.Sequential(*stages)

    def forward(self, x):
        return self.features(x)


@torch.no_grad()
def randomize_bn_stats_(module: nn.Module, seed: int) -> None:
    """Perturb every BN's affine + running stats (seeded) so converted-forward
    parity actually exercises the running_mean/var -> batch_stats mapping
    (fresh torch BNs are the identity: mean 0, var 1, weight 1, bias 0)."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g)
                                 * 0.05)
            m.running_var.copy_(0.8 + 0.4 * torch.rand(m.running_var.shape,
                                                       generator=g))
            m.weight.copy_(1.0 + 0.1 * torch.randn(m.weight.shape, generator=g))
            m.bias.copy_(0.05 * torch.randn(m.bias.shape, generator=g))
