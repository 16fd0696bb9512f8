"""torch → flax checkpoint conversion for the DeepfakeDetector.

Lets users of the reference bring trained ``.pth`` checkpoints
(/root/reference/train.py:306-319 layouts) into this framework. Operates on a
flat ``{name: np.ndarray}`` state dict (use :func:`load_torch_state_dict`) and
emits the flax ``{'params', 'batch_stats'}`` variables for
:class:`ewvit_tpu.models.detector.DeepfakeDetector`.

Name sources (reference, for the mapping tables below):
- detector children: model.py:35-68 (dama, mwt, sfe, sfe_cls, fusion_gate,
  classifier)
- DAMA children: dama.py:86-128 (sfe, mwt, gate_net, cross_att, fusion_gate)
- MWT children: mwt.py:20-72 (freq_conv, freq_pool, hf_conv.seperate/fusion,
  multiscale_fusion)
- EfficientViT children: sfe.py:120-142 (pos_embedding, patch_to_embedding,
  cls_token, transformer.layers, mlp_head, feat_map) and the third-party
  backbones (efficientnet_pytorch B0 `_conv_stem/_blocks.N/...`;
  torchvision V2-S `features.S.R.block...`).

Weight-layout transforms:
- Linear  [out, in]        -> kernel [in, out]
- Conv2d  [out, in, kh, kw]-> HWIO  [kh, kw, in, out]   (also depthwise)
- BatchNorm weight/bias/running_mean/running_var
    -> params.{scale,bias} + batch_stats.{mean,var}
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ewvit_tpu.models.efficientnet import B0_BLOCKS, V2S_BLOCKS


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth into numpy, tolerating the three checkpoint
    layouts the reference emits (raw state_dict / model_state_dict /
    state_dict — eval.py:65-74) plus DataParallel 'module.' prefixes."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model_state_dict", "state_dict"):
            if key in obj:
                obj = obj[key]
                break
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


# (torch->flax, flax->torch) array transforms per entry kind
_TRANSFORMS = {
    "linear_w": (lambda w: w.T, lambda k: k.T),
    "conv_w": (lambda w: w.transpose(2, 3, 1, 0),
               lambda k: k.transpose(3, 2, 0, 1)),
    "identity": (lambda v: v, lambda v: v),
}


class _TreeBuilder:
    """Accumulates (torch name, flax path, kind) entries and converts.

    Every mapping is also recorded in ``entries`` so tests can round-trip:
    flax init tree -> synthetic torch state dict -> converter -> flax tree.
    """

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.params: Dict = {}
        self.stats: Dict = {}
        self.used: set = set()
        self.missing: list = []
        # (torch_name, collection, flax_path, kind)
        self.entries: list = []

    def _set(self, tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def _map(self, tname, collection, fpath, kind):
        self.entries.append((tname, collection, fpath, kind))
        if tname not in self.sd:
            self.missing.append(tname)
            return
        self.used.add(tname)
        tree = self.params if collection == "params" else self.stats
        self._set(tree, fpath, _TRANSFORMS[kind][0](self.sd[tname]))

    def linear(self, tname: str, fpath: Tuple[str, ...], bias: bool = True):
        self._map(f"{tname}.weight", "params", fpath + ("kernel",), "linear_w")
        if bias:
            self._map(f"{tname}.bias", "params", fpath + ("bias",), "identity")

    def conv(self, tname: str, fpath: Tuple[str, ...], bias: bool = False):
        self._map(f"{tname}.weight", "params", fpath + ("kernel",), "conv_w")
        if bias:
            self._map(f"{tname}.bias", "params", fpath + ("bias",), "identity")

    def bn(self, tname: str, fpath: Tuple[str, ...]):
        self._map(f"{tname}.weight", "params", fpath + ("scale",), "identity")
        self._map(f"{tname}.bias", "params", fpath + ("bias",), "identity")
        self._map(f"{tname}.running_mean", "stats", fpath + ("mean",),
                  "identity")
        self._map(f"{tname}.running_var", "stats", fpath + ("var",),
                  "identity")
        self.used.add(f"{tname}.num_batches_tracked")

    def layernorm(self, tname: str, fpath: Tuple[str, ...]):
        self._map(f"{tname}.weight", "params", fpath + ("scale",), "identity")
        self._map(f"{tname}.bias", "params", fpath + ("bias",), "identity")

    def raw(self, tname: str, fpath: Tuple[str, ...], transform=None):
        assert transform is None, "raw() only supports identity"
        self._map(tname, "params", fpath, "identity")


# ---------------------------------------------------------------------------
# Sub-module converters
# ---------------------------------------------------------------------------


def _convert_mwt(b: _TreeBuilder, t: str, f: Tuple[str, ...]):
    """mwt.py:20-72 -> ewvit_tpu.models.mwt.MWT param tree."""
    for i in range(3):
        b.conv(f"{t}.hf_conv.seperate.{i}.0", f + (f"hf_sep_{i}", "conv"),
               bias=True)
        b.bn(f"{t}.hf_conv.seperate.{i}.1", f + (f"hf_sep_{i}", "bn"))
    b.conv(f"{t}.hf_conv.fusion.0", f + ("hf_fusion", "conv"), bias=True)
    b.bn(f"{t}.hf_conv.fusion.1", f + ("hf_fusion", "bn"))
    b.conv(f"{t}.multiscale_fusion.0", f + ("multiscale_fusion", "conv"),
           bias=True)
    b.bn(f"{t}.multiscale_fusion.1", f + ("multiscale_fusion", "bn"))
    b.conv(f"{t}.freq_conv.0", f + ("freq_conv", "conv"), bias=True)
    b.bn(f"{t}.freq_conv.1", f + ("freq_conv", "bn"))
    b.conv(f"{t}.freq_pool.1", f + ("freq_pool_conv", "conv"), bias=True)
    b.bn(f"{t}.freq_pool.2", f + ("freq_pool_conv", "bn"))


def _convert_transformer(b: _TreeBuilder, t: str, f: Tuple[str, ...],
                         depth: int = 2):
    """sfe.py:72-85 Transformer -> layers.Transformer param tree."""
    for i in range(depth):
        L = f"{t}.layers.{i}"
        b.layernorm(f"{L}.0.norm", f + (f"attn_norm_{i}",))
        b.linear(f"{L}.0.fn.to_qkv", f + (f"attn_{i}", "to_qkv"), bias=False)
        b.linear(f"{L}.0.fn.to_out.0", f + (f"attn_{i}", "to_out"))
        b.layernorm(f"{L}.1.norm", f + (f"ff_norm_{i}",))
        b.linear(f"{L}.1.fn.net.0", f + (f"ff_{i}", "fc1"))
        b.linear(f"{L}.1.fn.net.3", f + (f"ff_{i}", "fc2"))


def _convert_b0(b: _TreeBuilder, t: str, f: Tuple[str, ...]):
    """efficientnet_pytorch B0 -> EfficientNetB0 ('net') param tree."""
    n = f + ("net",)
    b.conv(f"{t}._conv_stem", n + ("stem", "conv"))
    b.bn(f"{t}._bn0", n + ("stem", "bn"))
    idx = 0
    for si, cfg in enumerate(B0_BLOCKS):
        for r in range(cfg.repeats):
            blk = f"{t}._blocks.{idx}"
            fb = n + (f"block_{si}_{r}",)
            if cfg.expand != 1:
                b.conv(f"{blk}._expand_conv", fb + ("expand_conv", "conv"))
                b.bn(f"{blk}._bn0", fb + ("expand_conv", "bn"))
            b.conv(f"{blk}._depthwise_conv", fb + ("depthwise", "conv"))
            b.bn(f"{blk}._bn1", fb + ("depthwise", "bn"))
            b.conv(f"{blk}._se_reduce", fb + ("se", "reduce"), bias=True)
            b.conv(f"{blk}._se_expand", fb + ("se", "expand"), bias=True)
            b.conv(f"{blk}._project_conv", fb + ("project", "conv"))
            b.bn(f"{blk}._bn2", fb + ("project", "bn"))
            idx += 1
    b.conv(f"{t}._conv_head", n + ("head", "conv"))
    b.bn(f"{t}._bn1", n + ("head", "bn"))


def _convert_v2s(b: _TreeBuilder, t: str, f: Tuple[str, ...]):
    """torchvision efficientnet_v2_s.features -> EfficientNetV2S param tree."""
    n = f + ("net",)
    b.conv(f"{t}.features.0.0", n + ("stem", "conv"))
    b.bn(f"{t}.features.0.1", n + ("stem", "bn"))
    for si, cfg in enumerate(V2S_BLOCKS):
        for r in range(cfg.repeats):
            blk = f"{t}.features.{si + 1}.{r}.block"
            fb = n + (f"block_{si}_{r}",)
            if cfg.fused:
                if cfg.expand != 1:
                    b.conv(f"{blk}.0.0", fb + ("fused_expand", "conv"))
                    b.bn(f"{blk}.0.1", fb + ("fused_expand", "bn"))
                    b.conv(f"{blk}.1.0", fb + ("project", "conv"))
                    b.bn(f"{blk}.1.1", fb + ("project", "bn"))
                else:
                    b.conv(f"{blk}.0.0", fb + ("fused_expand", "conv"))
                    b.bn(f"{blk}.0.1", fb + ("fused_expand", "bn"))
            else:
                b.conv(f"{blk}.0.0", fb + ("expand_conv", "conv"))
                b.bn(f"{blk}.0.1", fb + ("expand_conv", "bn"))
                b.conv(f"{blk}.1.0", fb + ("depthwise", "conv"))
                b.bn(f"{blk}.1.1", fb + ("depthwise", "bn"))
                b.conv(f"{blk}.2.fc1", fb + ("se", "reduce"), bias=True)
                b.conv(f"{blk}.2.fc2", fb + ("se", "expand"), bias=True)
                b.conv(f"{blk}.3.0", fb + ("project", "conv"))
                b.bn(f"{blk}.3.1", fb + ("project", "bn"))
    b.conv(f"{t}.features.7.0", n + ("head", "conv"))
    b.bn(f"{t}.features.7.1", n + ("head", "bn"))


def _infer_depth(sd: Dict[str, np.ndarray], probe_fmt: str,
                 default: int = 2) -> int:
    """Count transformer layers present in a state dict (``{i}`` in
    ``probe_fmt`` is the layer index). Empty/plan-building dicts keep the
    reference default (depth 2, architecture.yaml:7) so conversion_plan()
    and flax_to_torch export stay full-depth."""
    if not sd:
        return default
    d = 0
    while probe_fmt.format(i=d) in sd:
        d += 1
    return d or default


def _convert_efficientvit(b: _TreeBuilder, t: str, f: Tuple[str, ...],
                          variant: str):
    """sfe.py:87-142 EfficientViT -> models.sfe.EfficientViT param tree."""
    if variant == "b0":
        _convert_b0(b, f"{t}.efficient_net", f + ("efficient_net",))
    else:
        _convert_v2s(b, f"{t}.efficient_net", f + ("efficient_net",))
    b.raw(f"{t}.pos_embedding", f + ("pos_embedding",))
    b.raw(f"{t}.cls_token", f + ("cls_token",))
    b.linear(f"{t}.patch_to_embedding", f + ("patch_to_embedding",))
    depth = _infer_depth(b.sd, f"{t}.transformer.layers.{{i}}.0.norm.weight")
    _convert_transformer(b, f"{t}.transformer", f + ("transformer",),
                         depth=depth)
    b.linear(f"{t}.mlp_head.0", f + ("mlp_head_fc1",))
    b.linear(f"{t}.mlp_head.2", f + ("mlp_head_fc2",))
    b.linear(f"{t}.feat_map.0", f + ("feat_map",))


def _convert_cross_transformer(b: _TreeBuilder, t: str, f: Tuple[str, ...],
                               depth: int = 2):
    """dama.py:56-66 BidirectionalCrossTransformer param tree."""
    for i in range(depth):
        L = f"{t}.layers.{i}"
        b.layernorm(f"{L}.0", f + (f"space_norm_{i}",))
        b.linear(f"{L}.1.to_q", f + (f"space_attend_freq_{i}", "to_q"),
                 bias=False)
        b.linear(f"{L}.1.to_kv", f + (f"space_attend_freq_{i}", "to_kv"),
                 bias=False)
        b.linear(f"{L}.1.to_out.0", f + (f"space_attend_freq_{i}", "to_out"))
        b.layernorm(f"{L}.2", f + (f"freq_norm_{i}",))
        b.linear(f"{L}.3.to_q", f + (f"freq_attend_space_{i}", "to_q"),
                 bias=False)
        b.linear(f"{L}.3.to_kv", f + (f"freq_attend_space_{i}", "to_kv"),
                 bias=False)
        b.linear(f"{L}.3.to_out.0", f + (f"freq_attend_space_{i}", "to_out"))


def _convert_dama(b: _TreeBuilder, t: str, f: Tuple[str, ...]):
    """dama.py:86-128 DAMA -> models.dama.DAMA param tree."""
    _convert_efficientvit(b, f"{t}.sfe", f + ("sfe",), "v2s")
    _convert_mwt(b, f"{t}.mwt", f + ("mwt",))
    _convert_cross_transformer(
        b, f"{t}.cross_att", f + ("cross_att",),
        depth=_infer_depth(b.sd, f"{t}.cross_att.layers.{{i}}.0.weight"))
    b.conv(f"{t}.fusion_gate.0", f + ("fusion_gate_conv",), bias=True)
    b.bn(f"{t}.fusion_gate.1", f + ("fusion_gate_bn",))
    b.linear(f"{t}.gate_net.2", f + ("gate_fc1",))
    b.linear(f"{t}.gate_net.5", f + ("gate_fc2",))


def convert_detector_state_dict(sd: Dict[str, np.ndarray]):
    """Full DeepfakeDetector (model.py:9-68) state dict -> flax variables.

    Returns (variables, report) where report lists unmapped torch keys and
    torch keys that were expected but missing.
    """
    b = _TreeBuilder(sd)
    _convert_dama(b, "dama", ("dama",))
    _convert_mwt(b, "mwt", ("mwt",))
    _convert_efficientvit(b, "sfe", ("sfe",), "b0")
    _convert_efficientvit(b, "sfe_cls", ("sfe_cls",), "b0")
    b.linear("fusion_gate.0", ("fusion_gate_fc",))
    b.linear("classifier.0", ("classifier_fc1",))
    b.linear("classifier.3", ("classifier_fc2",))
    unused = sorted(set(sd) - b.used)
    variables = {"params": b.params, "batch_stats": b.stats}
    report = {"unmapped_torch_keys": unused, "missing_torch_keys": b.missing}
    return variables, report


def convert_checkpoint(path: str):
    """Convenience: .pth path -> (flax variables, report)."""
    return convert_detector_state_dict(load_torch_state_dict(path))


def conversion_plan():
    """The full (torch_name, collection, flax_path, kind) mapping table.

    Used by tests to round-trip a flax init tree through a synthetic torch
    state dict, and by users to audit the mapping.
    """
    b = _TreeBuilder({})
    _convert_dama(b, "dama", ("dama",))
    _convert_mwt(b, "mwt", ("mwt",))
    _convert_efficientvit(b, "sfe", ("sfe",), "b0")
    _convert_efficientvit(b, "sfe_cls", ("sfe_cls",), "b0")
    b.linear("fusion_gate.0", ("fusion_gate_fc",))
    b.linear("classifier.0", ("classifier_fc1",))
    b.linear("classifier.3", ("classifier_fc2",))
    return b.entries


def flax_to_torch_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse conversion: flax variables -> reference-named state dict.

    Lets models trained here be exported back to the reference's .pth naming
    (for its eval.py / plot tools). Round-trip identity with
    :func:`convert_detector_state_dict` is covered by tests.
    """
    sd: Dict[str, np.ndarray] = {}
    for tname, collection, fpath, kind in conversion_plan():
        tree = variables["params" if collection == "params" else "batch_stats"]
        node = tree
        ok = True
        for p in fpath:
            if not isinstance(node, dict) or p not in node:
                ok = False
                break
            node = node[p]
        if ok:
            sd[tname] = _TRANSFORMS[kind][1](np.asarray(node))
    return sd
