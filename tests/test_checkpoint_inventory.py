"""End-to-end converter test against the REAL third-party key inventory.

No pretrained weights exist in this environment (PARITY.md), so this test
hard-codes the exact state-dict key inventory — names AND shapes — of the two
third-party backbones the reference loads:

- ``efficientnet_pytorch.EfficientNet.from_pretrained('efficientnet-b0')``
  (/root/reference/network/sfe.py:108-109): keys ``_conv_stem/_bn0/_blocks.N.
  {_expand_conv,_bn0,_depthwise_conv,_bn1,_se_reduce,_se_expand,_project_conv,
  _bn2}/_conv_head/_bn1/_fc``; SE squeeze = max(1, int(block_input * 0.25)).
- ``torchvision.models.efficientnet_v2_s(IMAGENET1K_V1)``
  (/root/reference/network/sfe.py:111-113): keys ``features.S.R.block.*`` with
  FusedMBConv stages 1-3 and MBConv (SE squeeze = block_input // 4) stages
  4-6; the reference replaces ``classifier`` with Identity.

The tables below are transcribed from the public package sources — NOT from
this repo's ``B0_BLOCKS``/``V2S_BLOCKS`` — so a wrong block table here fails
this test rather than silently agreeing with itself. A synthetic
full-detector state dict (reference layout, model.py:9-68 module names) is
pushed through ``plan -> convert -> tree/shape match -> forward eval_shape``,
which would catch any mapping error before real weights ever arrive
(VERDICT.md r1, next-round #4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ewvit_tpu.configs import ModelConfig
from ewvit_tpu.models.detector import create_detector
from ewvit_tpu.utils.torch_convert import convert_detector_state_dict

# ---------------------------------------------------------------------------
# Hard-coded third-party inventories (names + shapes)
# ---------------------------------------------------------------------------

# efficientnet_pytorch 'efficientnet-b0' per-block (expand, kernel, in, out),
# 16 blocks — transcribed from the package's decoded blocks_args
# r1_k3_s11_e1_i32_o16 / r2_k3_s22_e6_i16_o24 / r2_k5_s22_e6_i24_o40 /
# r3_k3_s22_e6_i40_o80 / r3_k5_s11_e6_i80_o112 / r4_k5_s22_e6_i112_o192 /
# r1_k3_s11_e6_i192_o320 (width/depth multiplier 1.0 => filters unchanged).
_B0_TORCH_BLOCKS = [
    (1, 3, 32, 16),
    (6, 3, 16, 24), (6, 3, 24, 24),
    (6, 5, 24, 40), (6, 5, 40, 40),
    (6, 3, 40, 80), (6, 3, 80, 80), (6, 3, 80, 80),
    (6, 5, 80, 112), (6, 5, 112, 112), (6, 5, 112, 112),
    (6, 5, 112, 192), (6, 5, 192, 192), (6, 5, 192, 192), (6, 5, 192, 192),
    (6, 3, 192, 320),
]

# torchvision efficientnet_v2_s inverted_residual_setting:
# (stage feature index, repeats, expand, in, out, fused?)
_V2S_TORCH_STAGES = [
    (1, 2, 1, 24, 24, True),
    (2, 4, 4, 24, 48, True),
    (3, 4, 4, 48, 64, True),
    (4, 6, 4, 64, 128, False),
    (5, 9, 6, 128, 160, False),
    (6, 15, 6, 160, 256, False),
]


def _bn(inv, name, ch):
    inv[f"{name}.weight"] = (ch,)
    inv[f"{name}.bias"] = (ch,)
    inv[f"{name}.running_mean"] = (ch,)
    inv[f"{name}.running_var"] = (ch,)
    inv[f"{name}.num_batches_tracked"] = ()


def _conv(inv, name, out_ch, in_ch, k, bias=False):
    inv[f"{name}.weight"] = (out_ch, in_ch, k, k)
    if bias:
        inv[f"{name}.bias"] = (out_ch,)


def _linear(inv, name, out_f, in_f, bias=True):
    inv[f"{name}.weight"] = (out_f, in_f)
    if bias:
        inv[f"{name}.bias"] = (out_f,)


def b0_inventory(inv, p):
    """Keys+shapes of the full efficientnet_pytorch B0 module under prefix p
    (including the `_fc` head the reference never strips)."""
    _conv(inv, f"{p}._conv_stem", 32, 3, 3)
    _bn(inv, f"{p}._bn0", 32)
    for i, (e, k, cin, cout) in enumerate(_B0_TORCH_BLOCKS):
        blk = f"{p}._blocks.{i}"
        exp = cin * e
        if e != 1:
            _conv(inv, f"{blk}._expand_conv", exp, cin, 1)
            _bn(inv, f"{blk}._bn0", exp)
        inv[f"{blk}._depthwise_conv.weight"] = (exp, 1, k, k)
        _bn(inv, f"{blk}._bn1", exp)
        se = max(1, int(cin * 0.25))
        _conv(inv, f"{blk}._se_reduce", se, exp, 1, bias=True)
        _conv(inv, f"{blk}._se_expand", exp, se, 1, bias=True)
        _conv(inv, f"{blk}._project_conv", cout, exp, 1)
        _bn(inv, f"{blk}._bn2", cout)
    _conv(inv, f"{p}._conv_head", 1280, 320, 1)
    _bn(inv, f"{p}._bn1", 1280)
    _linear(inv, f"{p}._fc", 1000, 1280)


def v2s_inventory(inv, p):
    """Keys+shapes of torchvision efficientnet_v2_s.features under prefix p
    (classifier omitted: the reference sets it to nn.Identity())."""
    _conv(inv, f"{p}.features.0.0", 24, 3, 3)
    _bn(inv, f"{p}.features.0.1", 24)
    for s, repeats, e, cin_stage, cout, fused in _V2S_TORCH_STAGES:
        for r in range(repeats):
            cin = cin_stage if r == 0 else cout
            exp = cin * e
            blk = f"{p}.features.{s}.{r}.block"
            if fused:
                if e != 1:
                    _conv(inv, f"{blk}.0.0", exp, cin, 3)
                    _bn(inv, f"{blk}.0.1", exp)
                    _conv(inv, f"{blk}.1.0", cout, exp, 1)
                    _bn(inv, f"{blk}.1.1", cout)
                else:
                    _conv(inv, f"{blk}.0.0", cout, cin, 3)
                    _bn(inv, f"{blk}.0.1", cout)
            else:
                se = max(1, cin // 4)
                _conv(inv, f"{blk}.0.0", exp, cin, 1)
                _bn(inv, f"{blk}.0.1", exp)
                inv[f"{blk}.1.0.weight"] = (exp, 1, 3, 3)
                _bn(inv, f"{blk}.1.1", exp)
                _conv(inv, f"{blk}.2.fc1", se, exp, 1, bias=True)
                _conv(inv, f"{blk}.2.fc2", exp, se, 1, bias=True)
                _conv(inv, f"{blk}.3.0", cout, exp, 1)
                _bn(inv, f"{blk}.3.1", cout)
    _conv(inv, f"{p}.features.7.0", 1280, 256, 1)
    _bn(inv, f"{p}.features.7.1", 1280)


def evit_inventory(inv, p, backbone):
    """EfficientViT wrapper params (sfe.py:120-142): arch yaml dim=512,
    mlp-dim=2048, emb-dim=64, heads=8, dim-head=64, channels=1280, patch 7."""
    (b0_inventory if backbone == "b0" else v2s_inventory)(
        inv, f"{p}.efficient_net")
    inv[f"{p}.pos_embedding"] = (64, 1, 512)
    inv[f"{p}.cls_token"] = (1, 1, 512)
    _linear(inv, f"{p}.patch_to_embedding", 512, 1280 * 7 * 7)
    for i in range(2):  # Transformer depth 2 (sfe.py:72-85)
        L = f"{p}.transformer.layers.{i}"
        inv[f"{L}.0.norm.weight"] = (512,)
        inv[f"{L}.0.norm.bias"] = (512,)
        _linear(inv, f"{L}.0.fn.to_qkv", 3 * 512, 512, bias=False)
        _linear(inv, f"{L}.0.fn.to_out.0", 512, 512)
        inv[f"{L}.1.norm.weight"] = (512,)
        inv[f"{L}.1.norm.bias"] = (512,)
        _linear(inv, f"{L}.1.fn.net.0", 2048, 512)
        _linear(inv, f"{L}.1.fn.net.3", 512, 2048)
    _linear(inv, f"{p}.mlp_head.0", 2048, 512)
    _linear(inv, f"{p}.mlp_head.2", 1, 2048)
    _linear(inv, f"{p}.feat_map.0", 128, 512)


def mwt_inventory(inv, p):
    """MWT convs (mwt.py:22-72): in_channels=3, dama_dim=128."""
    for i in range(3):
        _conv(inv, f"{p}.hf_conv.seperate.{i}.0", 18, 3, 3, bias=True)
        _bn(inv, f"{p}.hf_conv.seperate.{i}.1", 18)
    _conv(inv, f"{p}.hf_conv.fusion.0", 128, 54, 3, bias=True)
    _bn(inv, f"{p}.hf_conv.fusion.1", 128)
    _conv(inv, f"{p}.multiscale_fusion.0", 128, 384, 3, bias=True)
    _bn(inv, f"{p}.multiscale_fusion.1", 128)
    _conv(inv, f"{p}.freq_conv.0", 128, 128, 3, bias=True)
    _bn(inv, f"{p}.freq_conv.1", 128)
    _conv(inv, f"{p}.freq_pool.1", 128, 128, 3, bias=True)
    _bn(inv, f"{p}.freq_pool.2", 128)


def cross_att_inventory(inv, p):
    """BidirectionalCrossTransformer depth 2 (dama.py:56-66, heads=4,
    dim_head=32 => inner 128)."""
    for i in range(2):
        L = f"{p}.layers.{i}"
        for j in (0, 2):  # LayerNorms
            inv[f"{L}.{j}.weight"] = (128,)
            inv[f"{L}.{j}.bias"] = (128,)
        for j in (1, 3):  # CrossAttentions
            _linear(inv, f"{L}.{j}.to_q", 128, 128, bias=False)
            _linear(inv, f"{L}.{j}.to_kv", 256, 128, bias=False)
            _linear(inv, f"{L}.{j}.to_out.0", 128, 128)


def detector_inventory():
    """Complete reference DeepfakeDetector state dict (model.py:9-68)."""
    inv = {}
    # DAMA (dama.py:86-128)
    evit_inventory(inv, "dama.sfe", "v2s")
    mwt_inventory(inv, "dama.mwt")
    _linear(inv, "dama.gate_net.2", 64, 256)
    _linear(inv, "dama.gate_net.5", 3, 64)
    cross_att_inventory(inv, "dama.cross_att")
    _conv(inv, "dama.fusion_gate.0", 128, 256, 3, bias=True)
    _bn(inv, "dama.fusion_gate.1", 128)
    # standalone MWT + B0 SFEs (model.py:37-51)
    mwt_inventory(inv, "mwt")
    evit_inventory(inv, "sfe", "b0")
    evit_inventory(inv, "sfe_cls", "b0")
    # top-level heads (model.py:54-68)
    _linear(inv, "fusion_gate.0", 2, 256)
    _linear(inv, "classifier.0", 64, 128)
    _linear(inv, "classifier.3", 1, 64)
    return inv


# The only keys in a real detector .pth the converter intentionally ignores:
# the B0 packages keep their ImageNet `_fc` heads (the reference never uses
# them — sfe.py:148 calls extract_features).
_KNOWN_UNMAPPED = {
    "sfe.efficient_net._fc.weight", "sfe.efficient_net._fc.bias",
    "sfe_cls.efficient_net._fc.weight", "sfe_cls.efficient_net._fc.bias",
}


def synthetic_state_dict():
    rng = np.random.default_rng(0)
    sd = {}
    for k, shape in detector_inventory().items():
        if k.endswith("num_batches_tracked"):
            sd[k] = np.asarray(100, np.int64)
        elif k.endswith("running_var"):
            sd[k] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        else:
            sd[k] = rng.standard_normal(shape).astype(np.float32) * 0.02
    return sd


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def converted():
    return convert_detector_state_dict(synthetic_state_dict())


def test_zero_missing_zero_unexpected_unmapped(converted):
    _, report = converted
    assert report["missing_torch_keys"] == [], (
        f"converter expects keys absent from the real inventory: "
        f"{report['missing_torch_keys'][:10]}")
    assert set(report["unmapped_torch_keys"]) == _KNOWN_UNMAPPED, (
        f"real checkpoint keys the converter does not consume: "
        f"{sorted(set(report['unmapped_torch_keys']) - _KNOWN_UNMAPPED)[:10]}")


def test_all_leaves_land_with_matching_shapes(converted):
    """Converted tree is EXACTLY the detector's init tree (names + shapes)."""
    variables, _ = converted
    cfg = ModelConfig(compute_dtype="float32")
    model = create_detector(cfg)
    dummy = jnp.zeros((1, cfg.arch.image_size, cfg.arch.image_size, 3),
                      jnp.float32)
    expected = jax.eval_shape(
        lambda r: model.init({"params": r}, dummy, train=False),
        jax.random.PRNGKey(0))

    def paths(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(paths(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = tuple(v.shape)
        return out

    for coll in ("params", "batch_stats"):
        got = paths(variables[coll])
        want = paths(dict(expected[coll]))
        assert set(got) == set(want), (
            f"{coll}: only-in-converted "
            f"{sorted(set(got) - set(want))[:5]} / only-in-init "
            f"{sorted(set(want) - set(got))[:5]}")
        for path, shape in want.items():
            assert got[path] == shape, (
                f"{coll} {'/'.join(path)}: converted {got[path]} vs init "
                f"{shape}")


def test_converted_forward_compiles(converted):
    """The converted variables drive the full-detector forward (eval_shape:
    validates every shape contract without paying a 224px CPU forward)."""
    from ewvit_tpu.models.detector import video_forward

    variables, _ = converted
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    cfg = ModelConfig(compute_dtype="float32")
    model = create_detector(cfg)
    clip = jax.ShapeDtypeStruct(
        (1, 4, cfg.arch.image_size, cfg.arch.image_size, 3), jnp.float32)
    out, _ = jax.eval_shape(
        lambda v, c: video_forward(model, v, c, mode="dynamic",
                                   frame_chunk=4, train=False, remat=False),
        variables, clip)
    assert out["logits"].shape == (1, 1)
