"""Numerics parity against the REFERENCE'S OWN torch code.

These tests import the reference modules from the read-only mount at
``/root/reference`` and compare them to this framework on random weights,
with parameters flowing through :mod:`ewvit_tpu.utils.torch_convert` — so
they exercise converter + module parity end-to-end against the actual
upstream implementation (not an in-test re-derivation).

Only the third-party packages absent from this environment are shimmed, and
only as far as the tested modules need:

- ``pytorch_wavelets.DWTForward(J=1, 'haar', 'zero')`` — implemented exactly
  (orthonormal Haar block butterfly; pywt band order (cH, cV, cD) == the
  (LH, HL, HH) stacking pytorch_wavelets emits; for even sizes zero-padding
  never touches data).
- ``efficientnet_pytorch`` / ``torchvision.models`` / ``facenet_pytorch`` —
  import-time attribute stubs; the tested code paths never instantiate them
  (the full-backbone parity remains environment-blocked, PARITY.md "Known
  gaps").

Everything is skipped when /root/reference is not mounted.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "network")),
    reason="reference tree not mounted")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _install_shims():
    if "pytorch_wavelets" not in sys.modules:
        mod = types.ModuleType("pytorch_wavelets")

        class DWTForward(torch.nn.Module):
            def __init__(self, J=1, wave="haar", mode="zero"):
                assert (J, wave, mode) == (1, "haar", "zero"), (
                    "shim implements exactly the reference's configuration "
                    "(mwt.py:20)")
                super().__init__()

            def forward(self, x):
                a = x[..., 0::2, 0::2]
                b = x[..., 0::2, 1::2]
                c = x[..., 1::2, 0::2]
                d = x[..., 1::2, 1::2]
                ll = (a + b + c + d) / 2
                lh = (a + b - c - d) / 2   # pywt cH
                hl = (a - b + c - d) / 2   # pywt cV
                hh = (a - b - c + d) / 2   # pywt cD
                return ll, [torch.stack([lh, hl, hh], dim=2)]

        mod.DWTForward = DWTForward
        sys.modules["pytorch_wavelets"] = mod

    if "efficientnet_pytorch" not in sys.modules:
        mod = types.ModuleType("efficientnet_pytorch")
        mod.EfficientNet = type("EfficientNet", (), {})
        sys.modules["efficientnet_pytorch"] = mod

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.efficientnet_v2_s = lambda *a, **k: None
        tvm.EfficientNet_V2_S_Weights = type(
            "EfficientNet_V2_S_Weights", (), {"IMAGENET1K_V1": None})
        tv.models = tvm
        tvt = types.ModuleType("torchvision.transforms")

        # transforms.py:5 imports this; any attribute works as a no-op class.
        # Dunders must NOT resolve (inspect probes module.__file__ etc.).
        def _tvt_getattr(name):
            if name.startswith("__"):
                raise AttributeError(name)
            return type(name, (), {"__init__": lambda self, *a, **k: None,
                                   "__call__": lambda self, x: x})

        tvt.__getattr__ = _tvt_getattr
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.transforms"] = tvt

    if "facenet_pytorch" not in sys.modules:
        mod = types.ModuleType("facenet_pytorch")
        mod.MTCNN = type("MTCNN", (), {"__init__": lambda self, **k: None})
        sys.modules["facenet_pytorch"] = mod

    if REF not in sys.path:
        sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def ref():
    """Imported reference modules with shims installed."""
    _install_shims()
    mods = {}
    mods["mwt"] = importlib.import_module("network.mwt")
    mods["dama"] = importlib.import_module("network.dama")
    mods["focal"] = importlib.import_module("config.focal_loss")
    return mods


def _prefixed_sd(module: torch.nn.Module, prefix: str):
    return {f"{prefix}.{k}": v.detach().cpu().numpy()
            for k, v in module.state_dict().items()}


def _randomize_bn_stats(module: torch.nn.Module, seed: int = 0):
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(
                m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(
                m.running_var.shape, generator=g) + 0.5)


def test_dwt_shim_matches_our_haar(ref):
    """The shim (pytorch_wavelets semantics) == ops/haar.py, including the
    reference's [B, 3C, H/2, W/2] channel interleave (mwt.py:77)."""
    from ewvit_tpu.ops.haar import haar_dwt2d

    x = torch.randn(2, 3, 16, 16, generator=torch.Generator().manual_seed(0))
    dwt = sys.modules["pytorch_wavelets"].DWTForward(
        J=1, wave="haar", mode="zero")
    yl, yh = dwt(x)
    ref_hf = yh[0].reshape(2, 9, 8, 8)          # mwt.py:77 interleave

    ll, hf = haar_dwt2d(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ll), yl.numpy().transpose(0, 2, 3, 1), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(hf), ref_hf.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_mwt_parity_vs_reference(ref):
    """Full MWT branch: reference torch code vs our Flax MWT, weights through
    the converter, eval mode, random weights + randomized BN stats."""
    from ewvit_tpu.models.mwt import MWT
    from ewvit_tpu.utils.torch_convert import _TreeBuilder, _convert_mwt

    torch.manual_seed(0)
    tm = ref["mwt"].MWT(in_channels=3, dama_dim=128)
    tm.eval()
    _randomize_bn_stats(tm)

    b = _TreeBuilder(_prefixed_sd(tm, "m"))
    _convert_mwt(b, "m", ("m",))
    assert not b.missing, b.missing
    variables = {"params": b.params["m"], "batch_stats": b.stats["m"]}

    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        t_out = tm(x).numpy()                    # [B, 128, 1, 1]

    ours = MWT(in_channels=3, dama_dim=128, dtype=jnp.float32)
    j_out = np.asarray(ours.apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(
        j_out.reshape(2, 128), t_out.reshape(2, 128), rtol=2e-4, atol=2e-4)


def test_cross_transformer_parity_vs_reference(ref):
    """BidirectionalCrossTransformer (dama.py:56-78): reference torch code vs
    our Flax stack, weights through the converter."""
    from ewvit_tpu.models.layers import BidirectionalCrossTransformer
    from ewvit_tpu.utils.torch_convert import (
        _TreeBuilder, _convert_cross_transformer)

    torch.manual_seed(0)
    tc = ref["dama"].BidirectionalCrossTransformer(
        128, depth=2, heads=4, dim_head=32, dropout=0.1)
    tc.eval()

    b = _TreeBuilder(_prefixed_sd(tc, "c"))
    _convert_cross_transformer(b, "c", ("c",))
    assert not b.missing, b.missing
    variables = {"params": b.params["c"]}

    g = torch.Generator().manual_seed(1)
    space = torch.randn(3, 1, 128, generator=g)
    freq = torch.randn(3, 1, 128, generator=g)
    with torch.no_grad():
        t_space, t_freq = tc(space, freq)

    ours = BidirectionalCrossTransformer(
        dim=128, depth=2, heads=4, dim_head=32, dropout=0.1,
        dtype=jnp.float32)
    j_space, j_freq = ours.apply(
        variables, jnp.asarray(space.numpy()), jnp.asarray(freq.numpy()),
        deterministic=True)
    np.testing.assert_allclose(np.asarray(j_space), t_space.numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_freq), t_freq.numpy(),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("alpha,gamma,reduction", [
    (0.25, 2.0, "mean"), (0.5, 1.0, "sum"), (0.75, 3.0, "none"),
])
def test_focal_loss_parity_vs_reference(ref, alpha, gamma, reduction):
    from ewvit_tpu.train.losses import binary_focal_loss

    g = torch.Generator().manual_seed(0)
    logits = torch.randn(32, generator=g) * 3
    targets = (torch.rand(32, generator=g) > 0.6).float()

    crit = ref["focal"].BinaryFocalLoss(
        alpha=alpha, gamma=gamma, reduction=reduction)
    with torch.no_grad():
        t_loss = crit(logits, targets).numpy()

    j_loss = np.asarray(binary_focal_loss(
        jnp.asarray(logits.numpy()), jnp.asarray(targets.numpy()),
        alpha=alpha, gamma=gamma, reduction=reduction))
    np.testing.assert_allclose(j_loss, t_loss, rtol=1e-5, atol=1e-6)


def test_orthogonal_and_combined_loss_parity_vs_reference(ref):
    """train.py:55-91 loss functions vs ours, including the λ-ramp gate."""
    train_mod = importlib.import_module("train")
    from ewvit_tpu.train.losses import (
        combined_loss, orthogonal_loss, weighted_bce_with_logits)

    g = torch.Generator().manual_seed(0)
    space = torch.randn(4, 128, generator=g)
    freq = torch.randn(4, 128, generator=g)
    logits = torch.randn(4, 1, generator=g)
    labels = (torch.rand(4, generator=g) > 0.5).float()

    t_orth = train_mod.orthogonal_loss(space, freq).item()
    j_orth = float(orthogonal_loss(jnp.asarray(space.numpy()),
                                   jnp.asarray(freq.numpy())))
    np.testing.assert_allclose(j_orth, t_orth, rtol=1e-4, atol=1e-5)

    criterion_t = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor(1.3))
    outputs_t = {"logits": logits, "space": space, "freq": freq}
    for epoch, max_epochs in [(0, 30), (10, 30), (25, 30)]:
        t_total, t_parts = train_mod.combined_loss(
            outputs_t, labels, criterion_t, epoch, max_epochs)
        t_cls = torch.tensor(t_parts["cls_loss"])
        j_total, parts = combined_loss(
            {"logits": jnp.asarray(logits.numpy()),
             "space": jnp.asarray(space.numpy()),
             "freq": jnp.asarray(freq.numpy())},
            jnp.asarray(labels.numpy()),
            lambda lo, la: weighted_bce_with_logits(lo, la, pos_weight=1.3),
            epoch, max_epochs)
        np.testing.assert_allclose(float(j_total), t_total.item(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(parts["cls_loss"]), t_cls.item(),
                                   rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Host-side behavior parity: FF++ loader (SURVEY C6) and eval metrics
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ff_fixture(tmp_path_factory):
    """Reference-layout frames-on-disk fixture (same shape as test_data.py)."""
    import json as _json

    import cv2

    root = tmp_path_factory.mktemp("refpar_ffpp")
    base = root / "faceforensics" / "ff++"
    methods = ["Deepfakes", "Face2Face", "FaceSwap", "NeuralTextures",
               "FaceShifter"]
    pairs = [[f"{i:03d}", f"{i + 100:03d}"] for i in range(6)]
    os.makedirs(base / "splits")
    for split in ("train", "val", "test"):
        with open(base / "splits" / f"{split}.json", "w") as f:
            _json.dump(pairs, f)

    def write(dirpath, seed):
        os.makedirs(dirpath, exist_ok=True)
        rng = np.random.default_rng(seed)
        for i in range(4):
            img = rng.integers(0, 255, (32, 32, 3), np.uint8)
            cv2.imwrite(os.path.join(dirpath, f"{i:03d}.png"), img)

    for si, (target, _) in enumerate(pairs):
        write(str(base / "frames" / "original" / target), si)
    for mi, m in enumerate(methods):
        for si, (target, source) in enumerate(pairs):
            write(str(base / "frames" / m / f"{target}_{source}"),
                  100 + mi * 10 + si)
    return str(root)


def _ref_loader(ref, root, **kw):
    mod = importlib.import_module("config.data_loader")
    return mod.FaceForensicsLoader(root=root, **kw)


def test_ff_loader_manifest_parity(ref, ff_fixture):
    """Manifest construction (data_loader.py:83-169): real list, 1:1 fake
    balancing with least-represented-method-first, single_method filter —
    reference loader vs ours on the same fixture."""
    from ewvit_tpu.data.datasets import FaceForensicsDataset

    for split in ("train", "test"):
        tref = _ref_loader(ref, ff_fixture, split=split, frame_count=4)
        ours = FaceForensicsDataset(ff_fixture, split=split, frame_count=4)
        assert len(tref) == len(ours)
        assert list(tref.real_videos) == list(ours.real_videos)
        assert ({v["path"] for v in tref.fake_videos}
                == {v["path"] for v in ours.fake_videos})
        ref_counts = {}
        for v in tref.fake_videos:
            ref_counts[v["method"]] = ref_counts.get(v["method"], 0) + 1
        our_counts = {}
        for v in ours.fake_videos:
            our_counts[v["method"]] = our_counts.get(v["method"], 0) + 1
        assert ref_counts == our_counts

    # test-split single-method filter selects exactly that method's pairs
    tref = _ref_loader(ref, ff_fixture, split="test", frame_count=4,
                       single_method="Face2Face")
    ours = FaceForensicsDataset(ff_fixture, split="test", frame_count=4,
                                single_method="Face2Face")
    assert ({v["path"] for v in tref.fake_videos}
            == {v["path"] for v in ours.fake_videos})
    assert all(v["method"] == "Face2Face" for v in ours.fake_videos)


@pytest.mark.parametrize("frame_count", [3, 8])
def test_ff_getitem_frame_parity(ref, ff_fixture, frame_count):
    """__getitem__ pixel parity (data_loader.py:270-339): linspace frame
    selection (count < files) and last-frame padding (count > files),
    BGR->RGB, identical bytes for the same underlying video."""
    from ewvit_tpu.data.datasets import FaceForensicsDataset

    to_tensor = lambda img: torch.from_numpy(  # noqa: E731
        np.ascontiguousarray(img)).permute(2, 0, 1)
    tref = _ref_loader(ref, ff_fixture, split="test",
                       frame_count=frame_count, transform=to_tensor)
    ours = FaceForensicsDataset(ff_fixture, split="test",
                                frame_count=frame_count)

    # real sample: same index space (reals first, split order)
    t_frames, t_label = tref[0]
    o_frames, o_label = ours[0]
    assert (t_label, o_label) == (0, 0)
    np.testing.assert_array_equal(
        t_frames.numpy().transpose(0, 2, 3, 1), o_frames)

    # fake sample: match by path (fake ordering is shuffled independently)
    t_fake = tref.fake_videos[0]
    o_index = len(ours.real_videos) + [
        v["path"] for v in ours.fake_videos].index(t_fake["path"])
    t_frames, t_label = tref[len(tref.real_videos)]
    o_frames, o_label = ours[o_index]
    assert (t_label, o_label) == (1, 1)
    np.testing.assert_array_equal(
        t_frames.numpy().transpose(0, 2, 3, 1), o_frames)


def test_ff_curriculum_schedule_parity(ref, ff_fixture):
    """update_sampling_strategy (data_loader.py:229-268): the fixed/novelty
    ratio schedule and current_fake sizing match the reference epoch by
    epoch (membership differs by documented RNG divergence, PARITY.md)."""
    from ewvit_tpu.data.datasets import FaceForensicsDataset

    tref = _ref_loader(ref, ff_fixture, split="train", frame_count=4)
    ours = FaceForensicsDataset(ff_fixture, split="train", frame_count=4)
    max_epochs = 10
    for epoch in range(max_epochs):
        tref.update_sampling_strategy(epoch, max_epochs)
        ours.update_sampling_strategy(epoch, max_epochs)
        assert tref.fixed_sample_ratio == pytest.approx(
            ours.fixed_sample_ratio)
        assert tref.novelty_ratio == pytest.approx(ours.novelty_ratio)
        assert len(tref.current_fake) == len(ours.current_fake)
        assert len(tref) == len(ours)


def test_calculate_eer_parity(ref):
    """eval.py:79-94 EER + threshold vs utils/metrics.calculate_eer."""
    eval_mod = importlib.import_module("eval")
    from ewvit_tpu.utils.metrics import calculate_eer

    rng = np.random.default_rng(0)
    labels = (rng.random(200) > 0.5).astype(int)
    scores = np.clip(rng.normal(labels * 0.6 + 0.2, 0.25), 0, 1)
    t_eer, t_thr = eval_mod.calculate_eer(labels, scores)
    o_eer, o_thr = calculate_eer(labels, scores)
    np.testing.assert_allclose(o_eer, t_eer, atol=1e-9)
    np.testing.assert_allclose(o_thr, t_thr, atol=1e-9)


# ---------------------------------------------------------------------------
# Full-detector logit parity with stub backbones injected on BOTH sides
# ---------------------------------------------------------------------------
#
# The real EfficientNet backbones need packages absent from this environment;
# everything around them — the EfficientViT glue (patchify, batch-indexed
# pos-embedding quirk, transformer, heads), MWT, DAMA (cross-attention +
# both gates + branch fusion), the K-frame chunk loop with running mean, and
# all three ablation forwards of model.py — is compared end-to-end against
# the reference's own code by giving both implementations the SAME tiny conv
# backbone (3 -> 1280, k32 s32: preserves the 7x7x1280 feature-map contract,
# sfe.py:148-150).


from flax import linen as fnn  # noqa: E402


class StubBackboneFlax(fnn.Module):
    """[N,224,224,3] -> [N,7,7,1280]; params under efficient_net/conv."""

    dtype: object = jnp.float32

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        return fnn.Conv(1280, (32, 32), strides=(32, 32), padding="VALID",
                        dtype=self.dtype, name="conv")(x.astype(self.dtype))


def _torch_stubs():
    class TorchStubB0(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Conv2d(3, 1280, 32, 32)

        def extract_features(self, x):
            return self.conv(x)

    class TorchStubV2S(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = torch.nn.Conv2d(3, 1280, 32, 32)
            self.classifier = torch.nn.Identity()

    return TorchStubB0, TorchStubV2S


@pytest.fixture()
def ref_detector(ref, monkeypatch):
    """Reference DeepfakeDetector built with stub backbones, eval mode."""
    TorchStubB0, TorchStubV2S = _torch_stubs()
    monkeypatch.setattr(
        sys.modules["efficientnet_pytorch"].EfficientNet, "from_pretrained",
        staticmethod(lambda name: TorchStubB0()), raising=False)
    sfe_mod = importlib.import_module("network.sfe")
    monkeypatch.setattr(sfe_mod, "EfficientNet",
                        sys.modules["efficientnet_pytorch"].EfficientNet)
    monkeypatch.setattr(sfe_mod, "efficientnet_v2_s",
                        lambda weights=None: TorchStubV2S())
    model_mod = importlib.import_module("network.model")
    cwd = os.getcwd()
    os.chdir(REF)   # model.py:31 / dama.py:94 open config/ CWD-relative
    try:
        torch.manual_seed(0)
        det = model_mod.DeepfakeDetector(
            in_channels=3, dama_dim=128, batch_size=2)
    finally:
        os.chdir(cwd)
    det.eval()
    _randomize_bn_stats(det)
    return det


def _convert_stub_detector(sd):
    from ewvit_tpu.utils.torch_convert import (
        _TreeBuilder, _convert_cross_transformer, _convert_mwt,
        _convert_transformer)

    b = _TreeBuilder(sd)

    def evit(t, f, variant):
        tconv = f"{t}.efficient_net." + (
            "conv" if variant == "b0" else "features")
        b.conv(tconv, f + ("efficient_net", "conv"), bias=True)
        b.raw(f"{t}.pos_embedding", f + ("pos_embedding",))
        b.raw(f"{t}.cls_token", f + ("cls_token",))
        b.linear(f"{t}.patch_to_embedding", f + ("patch_to_embedding",))
        _convert_transformer(b, f"{t}.transformer", f + ("transformer",))
        b.linear(f"{t}.mlp_head.0", f + ("mlp_head_fc1",))
        b.linear(f"{t}.mlp_head.2", f + ("mlp_head_fc2",))
        b.linear(f"{t}.feat_map.0", f + ("feat_map",))

    evit("dama.sfe", ("dama", "sfe"), "v2s")
    _convert_mwt(b, "dama.mwt", ("dama", "mwt"))
    _convert_cross_transformer(b, "dama.cross_att", ("dama", "cross_att"))
    b.conv("dama.fusion_gate.0", ("dama", "fusion_gate_conv"), bias=True)
    b.bn("dama.fusion_gate.1", ("dama", "fusion_gate_bn"))
    b.linear("dama.gate_net.2", ("dama", "gate_fc1"))
    b.linear("dama.gate_net.5", ("dama", "gate_fc2"))
    _convert_mwt(b, "mwt", ("mwt",))
    evit("sfe", ("sfe",), "b0")
    evit("sfe_cls", ("sfe_cls",), "b0")
    b.linear("fusion_gate.0", ("fusion_gate_fc",))
    b.linear("classifier.0", ("classifier_fc1",))
    b.linear("classifier.3", ("classifier_fc2",))
    assert not b.missing, b.missing
    return {"params": b.params, "batch_stats": b.stats}


@pytest.mark.parametrize("mode", ["dynamic", "sfe_only", "sfe_mwt"])
def test_full_detector_logit_parity_vs_reference(ref_detector, mode):
    """North-star check (BASELINE.md: logits within 1e-3) against the
    reference's own model.py, as far as this environment allows: stub
    backbones, everything else real, all three ablation forwards, K-frame
    chunking (K=4, chunk=2 — evenly divisible; ragged-tail parity incl.
    train-mode BN statistics is covered by
    test_full_detector_train_mode_ragged_tail_parity)."""
    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.models.detector import DeepfakeDetector, video_forward

    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_detector.state_dict().items()}
    variables = _convert_stub_detector(sd)

    x = torch.randn(2, 4, 3, 224, 224,
                    generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        t_out = ref_detector(x, batch_size=2, ablation=mode)
    t_logits = t_out["logits"].numpy().reshape(2)

    cfg = ModelConfig(compute_dtype="float32", frame_chunk=2,
                      backbone_factory=StubBackboneFlax)
    model = DeepfakeDetector(cfg)
    out, _ = video_forward(
        model, variables, jnp.asarray(x.numpy().transpose(0, 1, 3, 4, 2)),
        mode=mode, frame_chunk=2, train=False, remat=False)
    j_logits = np.asarray(out["logits"]).reshape(2)

    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-3, atol=1e-3)
    if mode == "dynamic":
        for key in ("fused", "space", "freq"):
            np.testing.assert_allclose(
                np.asarray(out[key]).reshape(2, 128),
                t_out[key].numpy().reshape(2, 128), rtol=1e-3, atol=1e-3)


def test_full_detector_train_mode_ragged_tail_parity(ref_detector, monkeypatch):
    """TRAIN-mode parity on a RAGGED clip: K=5, chunk=2 => chunks [2,2,1].

    The reference's eager loop runs a genuinely smaller tail chunk whose
    BatchNorms see B*tail rows of batch statistics (dama.py:179-186,
    model.py:103-105); video_forward must reproduce that (round-2 VERDICT
    weak #2: zero-padding the tail polluted every BN's batch stats). This
    asserts BOTH the logits and EVERY BN running statistic after one
    train-mode forward — including dama.fusion_gate_bn, whose 1x1 feature
    map makes the batch-row count (4 full / 2 tail) small enough that both
    the tail raggedness and torch's unbiased running-var update
    (models/norm.py) are observable.

    Dropout is zeroed on both sides (the only stochastic difference at
    play; the stub backbones have no droppath).
    """
    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.models.detector import DeepfakeDetector, video_forward

    det = ref_detector
    det.train()
    for m in det.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    # .copy() is load-bearing: .numpy() returns VIEWS of the torch buffers,
    # and the train-mode forward below mutates running stats IN PLACE — the
    # "pre-forward" snapshot would silently become post-forward (CLAUDE.md
    # zero-copy trap; same class as the adam test).
    sd = {k: v.detach().cpu().numpy().copy()
          for k, v in det.state_dict().items()}
    variables = _convert_stub_detector(sd)

    x = torch.randn(2, 5, 3, 224, 224,
                    generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        t_out = det(x, batch_size=2, ablation="dynamic")
    t_logits = t_out["logits"].detach().numpy().reshape(2)
    sd_after = {k: v.detach().cpu().numpy()
                for k, v in det.state_dict().items()}
    t_stats = _convert_stub_detector(sd_after)["batch_stats"]

    # flax dropout rates are hardcoded at the reference's values; identity
    # them out for the deterministic comparison
    monkeypatch.setattr(
        fnn.Dropout, "__call__",
        lambda self, x, deterministic=None, rng=None: x)
    cfg = ModelConfig(compute_dtype="float32", frame_chunk=2,
                      backbone_factory=StubBackboneFlax)
    model = DeepfakeDetector(cfg)
    out, upd = video_forward(
        model, variables, jnp.asarray(x.numpy().transpose(0, 1, 3, 4, 2)),
        mode="dynamic", frame_chunk=2, train=True,
        rng=jax.random.PRNGKey(0), remat=False)

    j_logits = np.asarray(out["logits"], np.float32).reshape(2)
    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-3, atol=1e-3)

    j_flat = jax.tree_util.tree_leaves_with_path(upd["batch_stats"])
    t_flat = dict(jax.tree_util.tree_leaves_with_path(t_stats))
    assert j_flat and len(j_flat) == len(t_flat)
    for path, leaf in j_flat:
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(t_flat[path], np.float32),
            rtol=1e-3, atol=1e-4,
            err_msg=f"BN running stat diverged at {jax.tree_util.keystr(path)}")


def test_adam_update_parity_vs_torch(ref):
    """The reference optimizer is torch.optim.Adam(lr=1e-4, weight_decay=1e-4)
    (train.py:273) — coupled L2, NOT AdamW. Our optax chain
    (add_decayed_weights -> scale_by_adam -> lr) must produce identical
    parameter trajectories; run 3 steps on a random tree with fresh grads."""
    import optax

    from ewvit_tpu.train.optimizer import cosine_annealing_schedule

    g = torch.Generator().manual_seed(0)
    shapes = [(7, 5), (5,), (3, 3, 2, 4)]
    t_params = [torch.nn.Parameter(torch.randn(s, generator=g, dtype=torch.float32))
                for s in shapes]
    # np.array COPY is load-bearing: on the CPU backend jnp.asarray over a
    # torch .numpy() view is ZERO-COPY, so torch's in-place opt.step() would
    # silently mutate the jax array too (cost a debugging session).
    j_params = [jnp.asarray(np.array(p.detach().numpy())) for p in t_params]

    lr, wd, epochs = 1e-2, 1e-3, 10
    t_opt = torch.optim.Adam(t_params, lr=lr, weight_decay=wd)
    sched = cosine_annealing_schedule(lr, epochs, steps_per_epoch=1000)
    tx = optax.flatten(optax.chain(
        optax.add_decayed_weights(wd),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(lambda step: lr),  # epoch 0 == base lr
    ))
    j_state = tx.init(j_params)
    assert float(sched(jnp.zeros((), jnp.int32))) == pytest.approx(lr)

    for step in range(3):
        grads_t = [torch.randn(s, generator=g, dtype=torch.float32)
                   for s in shapes]
        for p, gr in zip(t_params, grads_t):
            p.grad = gr.clone()
        t_opt.step()
        grads_j = [jnp.asarray(gr.numpy()) for gr in grads_t]
        updates, j_state = tx.update(grads_j, j_state, j_params)
        j_params = optax.apply_updates(j_params, updates)
        for tp, jp in zip(t_params, j_params):
            np.testing.assert_allclose(
                np.asarray(jp), tp.detach().numpy(), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Full-detector logit parity with REAL backbone architectures (torch oracles)
# ---------------------------------------------------------------------------
#
# tests/torch_backbones.py re-creates efficientnet_pytorch B0 and torchvision
# V2-S exactly (inventory- and forward-parity-tested in
# tests/test_backbone_oracle.py). Injecting them where the reference loads
# the third-party packages (sfe.py:108-113) lets the reference's OWN model.py
# run with NOTHING stubbed — the complete detector, real backbone
# architectures — and the PRODUCTION converter (convert_detector_state_dict,
# not a test-local mapping) carries its full state dict across. This is the
# strongest parity statement available without ImageNet weight values.


@pytest.fixture()
def ref_detector_real(ref, monkeypatch):
    """Reference DeepfakeDetector over torch-oracle backbones, eval mode."""
    from tests.torch_backbones import (
        TorchEfficientNetB0,
        TorchEfficientNetV2SFeatures,
    )

    monkeypatch.setattr(
        sys.modules["efficientnet_pytorch"].EfficientNet, "from_pretrained",
        staticmethod(lambda name: TorchEfficientNetB0()), raising=False)
    sfe_mod = importlib.import_module("network.sfe")
    monkeypatch.setattr(sfe_mod, "EfficientNet",
                        sys.modules["efficientnet_pytorch"].EfficientNet)
    monkeypatch.setattr(sfe_mod, "efficientnet_v2_s",
                        lambda weights=None: TorchEfficientNetV2SFeatures())
    model_mod = importlib.import_module("network.model")
    cwd = os.getcwd()
    os.chdir(REF)   # model.py:31 / dama.py:94 open config/ CWD-relative
    try:
        torch.manual_seed(0)
        det = model_mod.DeepfakeDetector(
            in_channels=3, dama_dim=128, batch_size=2)
    finally:
        os.chdir(cwd)
    det.eval()
    _randomize_bn_stats(det)
    return det


def test_reference_detector_state_dict_matches_inventory(ref_detector_real):
    """The reference's real module tree == the hand-transcribed inventory
    that test_checkpoint_inventory.py builds its converter guarantees on."""
    from tests.test_checkpoint_inventory import detector_inventory

    inv = detector_inventory()
    sd = ref_detector_real.state_dict()
    assert set(sd) == set(inv), (
        f"only-reference {sorted(set(sd) - set(inv))[:5]} / "
        f"only-inventory {sorted(set(inv) - set(sd))[:5]}")
    for k, v in sd.items():
        assert tuple(v.shape) == tuple(inv[k]), (k, tuple(v.shape), inv[k])


def test_full_detector_logit_parity_real_backbones(ref_detector_real):
    """North-star logit parity (BASELINE.json: within 1e-3) against the
    reference's own model.py with REAL backbone architectures — dynamic mode
    exercises every component (DAMA incl. V2-S SFE + MWT + cross-attention +
    gates, standalone MWT, both B0 SFEs, fusion gate, classifier) through
    the production checkpoint converter."""
    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.models.detector import DeepfakeDetector, video_forward
    from ewvit_tpu.utils.torch_convert import convert_detector_state_dict

    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_detector_real.state_dict().items()}
    variables, report = convert_detector_state_dict(sd)
    assert report["missing_torch_keys"] == []
    assert set(report["unmapped_torch_keys"]) == {
        "sfe.efficient_net._fc.weight", "sfe.efficient_net._fc.bias",
        "sfe_cls.efficient_net._fc.weight", "sfe_cls.efficient_net._fc.bias",
    }
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    x = torch.randn(2, 4, 3, 224, 224,
                    generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        t_out = ref_detector_real(x, batch_size=2, ablation="dynamic")
    t_logits = t_out["logits"].numpy().reshape(2)

    cfg = ModelConfig(compute_dtype="float32", frame_chunk=2)
    model = DeepfakeDetector(cfg)
    out, _ = video_forward(
        model, variables,
        jnp.asarray(np.array(x.numpy()).transpose(0, 1, 3, 4, 2)),
        mode="dynamic", frame_chunk=2, train=False, remat=False)
    j_logits = np.asarray(out["logits"]).reshape(2)

    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-3, atol=1e-3)
    for key in ("fused", "space", "freq"):
        np.testing.assert_allclose(
            np.asarray(out[key]).reshape(2, 128),
            t_out[key].numpy().reshape(2, 128), rtol=1e-3, atol=2e-3)
