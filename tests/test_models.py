"""Model-zoo unit tests: shapes, modes, chunk-invariance (SURVEY.md §4 plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ewvit_tpu.configs import ArchConfig, ModelConfig
from ewvit_tpu.models import (
    DAMA,
    DeepfakeDetector,
    EfficientNetB0,
    EfficientNetV2S,
    EfficientViT,
    MWT,
)
from ewvit_tpu.models.detector import init_detector, video_forward
from ewvit_tpu.models.efficientnet import frozen_param_paths

ARCH = ArchConfig.reference()


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


@pytest.mark.parametrize("cls,variant", [(EfficientNetB0, "b0"),
                                         (EfficientNetV2S, "v2s")])
def test_backbone_shapes_and_frozen_paths(cls, variant):
    m = cls()
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(m.apply)(variables, x)
    assert y.shape == (1, 7, 7, 1280)
    for path in frozen_param_paths(variant):
        leaf = _get(variables["params"], path)
        assert leaf is not None and leaf.size > 0


def test_efficientvit_cls_and_feature_modes():
    x = jnp.zeros((2, 224, 224, 3), jnp.float32)
    m_cls = EfficientViT(arch=ARCH, selected_efficient_net=0, output_mode="cls")
    v = jax.jit(m_cls.init)(jax.random.PRNGKey(0), x)
    logits = jax.jit(m_cls.apply)(v, x)
    assert logits.shape == (2, 1)

    m_feat = EfficientViT(arch=ARCH, selected_efficient_net=0,
                          output_mode="feature_map", feat_dim=128)
    v = jax.jit(m_feat.init)(jax.random.PRNGKey(0), x)
    f = jax.jit(m_feat.apply)(v, x)
    assert f.shape == (2, 1, 1, 128)
    assert bool(jnp.all(f >= 0))  # ReLU head


def test_efficientvit_batch_indexed_pos_embedding_quirk():
    """Batch elements get different pos embeddings; >emb_dim raises."""
    m = EfficientViT(arch=ARCH, output_mode="feature_map")
    with pytest.raises(ValueError, match="emb_dim"):
        m.init(jax.random.PRNGKey(0),
               jnp.zeros((ARCH.emb_dim + 1, 224, 224, 3), jnp.float32))


@pytest.mark.parametrize("tf_same", [True, False])
def test_s2d_stride2_conv_is_exact(rng, tf_same):
    """The space-to-depth stride-2 3x3 formulation must equal the direct
    conv: same parameter tree, identical math (only zero taps added)."""
    from ewvit_tpu.models.efficientnet import ConvBN

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    direct = ConvBN(8, 3, 2, tf_same=tf_same)
    s2d = ConvBN(8, 3, 2, tf_same=tf_same, s2d=True)
    v = direct.init(jax.random.PRNGKey(0), x)
    y_d = jax.jit(direct.apply)(v, x)
    y_s = jax.jit(s2d.apply)(v, x)
    assert y_s.shape == y_d.shape == (2, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_d),
                               rtol=1e-5, atol=1e-6)
    # gradients flow through the kernel rearrangement identically
    g_d = jax.grad(lambda v: jnp.sum(direct.apply(v, x) ** 2))(v)
    g_s = jax.grad(lambda v: jnp.sum(s2d.apply(v, x) ** 2))(v)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), g_d, g_s)


def test_s2d_stem_full_backbone_exact(rng):
    """use_s2d_stem flips only the stem formulation; backbone outputs match."""
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    base = EfficientNetV2S()
    fast = EfficientNetV2S(use_s2d_stem=True)
    v = jax.jit(base.init)(jax.random.PRNGKey(0), x)
    y_b = jax.jit(base.apply)(v, x)
    y_f = jax.jit(fast.apply)(v, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_b),
                               rtol=1e-4, atol=1e-5)


def test_pos_mode_tile_extends_the_reference_semantics():
    """pos_mode='tile' equals 'reference' below the emb_dim cap and lifts
    the cap above it (row i % emb_dim) instead of raising."""
    arch = ArchConfig(image_size=32, patch_size=1, dim=16, depth=1,
                      dim_head=8, heads=2, mlp_dim=16, emb_dim=4)
    ref = EfficientViT(arch=arch, output_mode="feature_map", feat_dim=8)
    tile = EfficientViT(arch=arch, output_mode="feature_map", feat_dim=8,
                        pos_mode="tile")
    x_small = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 32, 32, 3)).astype(np.float32))
    v = ref.init(jax.random.PRNGKey(0), x_small)
    np.testing.assert_array_equal(
        np.asarray(tile.apply(v, x_small)), np.asarray(ref.apply(v, x_small)))

    x_big = jnp.concatenate([x_small, x_small], axis=0)   # 8 > emb_dim=4
    y_big = tile.apply(v, x_big)                           # must not raise
    assert y_big.shape[0] == 8
    # rows 4..7 reuse pos rows 0..3 -> identical outputs for identical frames
    np.testing.assert_allclose(np.asarray(y_big[:4]), np.asarray(y_big[4:]),
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="emb_dim"):
        ref.apply(v, x_big)


def test_pos_mode_row0_reproduces_per_frame_reference_semantics():
    """pos_mode='row0' batches what the reference's per-frame eval does one
    frame at a time (/root/reference/utils/plot_celebdf_roc.py:31-72: each
    frame is its own [1,1,C,H,W] clip, so N=1 and pos[0:1] applies): every
    batched row must equal the same frame run alone in 'reference' mode,
    and the emb_dim cap must not apply."""
    arch = ArchConfig(image_size=32, patch_size=1, dim=16, depth=1,
                      dim_head=8, heads=2, mlp_dim=16, emb_dim=4)
    ref = EfficientViT(arch=arch, output_mode="feature_map", feat_dim=8)
    row0 = EfficientViT(arch=arch, output_mode="feature_map", feat_dim=8,
                        pos_mode="row0")
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (6, 32, 32, 3)).astype(np.float32))        # 6 > emb_dim=4
    v = ref.init(jax.random.PRNGKey(0), x[:1])
    y = row0.apply(v, x)                           # must not raise
    assert y.shape[0] == 6
    for i in range(6):
        yi = ref.apply(v, x[i:i + 1])              # the reference N=1 path
        np.testing.assert_allclose(np.asarray(y[i:i + 1]), np.asarray(yi),
                                   rtol=1e-5, atol=1e-6)


def test_micro_config_keeps_real_components(rng):
    """ModelConfig.micro: truncated-but-real backbones (BackboneSpec), all
    three ablation modes produce finite logits, ragged K exercises the
    tail path; block inventory is exactly the 3 configured blocks per
    backbone flavor."""
    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.models.detector import init_detector_fast

    cfg = ModelConfig.micro()
    model, variables = init_detector_fast(cfg, seed=0)
    # block inventory: 3 blocks in each backbone (B0 flavor under sfe,
    # V2-S flavor under dama.sfe), with the right block types
    b0 = variables["params"]["sfe"]["efficient_net"]["net"]
    v2s = variables["params"]["dama"]["sfe"]["efficient_net"]["net"]
    blocks = {k for k in b0 if k.startswith("block_")}
    assert blocks == {"block_0_0", "block_1_0", "block_2_0"}
    assert "se" in b0["block_0_0"]              # MBConv + SE
    assert "fused_expand" in v2s["block_0_0"]   # FusedMBConv
    assert "se" in v2s["block_2_0"]             # V2 MBConv + SE

    x = jnp.asarray(rng.standard_normal((1, 3, 32, 32, 3)).astype(np.float32))
    for mode in ("dynamic", "sfe_only", "sfe_mwt"):
        out, _ = video_forward(model, variables, x, mode=mode,
                               frame_chunk=2, train=False, remat=False)
        assert out["logits"].shape == (1, 1)
        assert np.isfinite(np.asarray(out["logits"])).all()


def test_mwt_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    m = MWT(dama_dim=128, levels=3)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(m.apply)(v, x)
    assert y.shape == (2, 1, 1, 128)


@pytest.mark.parametrize("mode", [True, "level"])
def test_mwt_fused_eval_pyramid_matches_per_level(rng, mode):
    """Both eval fast paths (block-diagonal hf_sep conv with folded BN;
    'level' per-level form and True batched-levels form) must match the
    reference-structured per-level formulation. Same parameter tree, eval
    mode, f32."""
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    fast = MWT(dama_dim=128, levels=3, fused_eval_pyramid=mode)
    slow = MWT(dama_dim=128, levels=3, fused_eval_pyramid=False)
    v = jax.jit(slow.init)(jax.random.PRNGKey(0), x)
    y_fast = jax.jit(fast.apply)(v, x)
    y_slow = jax.jit(slow.apply)(v, x)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_slow),
                               rtol=1e-4, atol=1e-5)
    # train mode ignores the flag entirely (identical program)
    yt_fast, _ = fast.apply(v, x, train=True, mutable=["batch_stats"])
    yt_slow, _ = slow.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(yt_fast), np.asarray(yt_slow))


def test_mwt_fused_train_pyramid_matches_per_level(rng):
    """The train fast path (ONE block-diagonal hf_sep conv per level,
    per-slice BN) must match the reference-structured formulation in TRAIN
    mode: outputs, updated batch_stats, AND parameter gradients. Exact in
    principle (BN is per-channel, the block conv computes the same dots);
    f32 tolerances cover conv-reduction reassociation."""
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    fast = MWT(dama_dim=64, levels=2, fused_train_pyramid=True)
    slow = MWT(dama_dim=64, levels=2)
    v = jax.jit(slow.init)(jax.random.PRNGKey(0), x)

    def run(m):
        def loss(params):
            y, upd = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(y ** 2), (y, upd["batch_stats"])

        (val, (y, bstats)), grads = jax.value_and_grad(
            loss, has_aux=True)(v["params"])
        return y, bstats, grads

    y_f, bs_f, g_f = run(fast)
    y_s, bs_s, g_s = run(slow)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_s),
                               rtol=1e-5, atol=1e-5)
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(bs_s),
            jax.tree_util.tree_leaves_with_path(bs_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"batch_stats diverged at {p}")
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_s),
            jax.tree_util.tree_leaves_with_path(g_f)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4,
            atol=1e-5 * max(1.0, float(np.abs(np.asarray(a)).max())),
            err_msg=f"gradient diverged at {p}")
    # eval mode ignores the flag entirely
    np.testing.assert_array_equal(
        np.asarray(jax.jit(fast.apply)(v, x)),
        np.asarray(jax.jit(slow.apply)(v, x)))


def test_cast_kernels_for_inference_is_bit_identical_under_compute_dtype(rng):
    """Pre-casting large f32 kernels to the compute dtype must not change
    outputs when the module already computes in that dtype."""
    from ewvit_tpu.utils.params import cast_kernels_for_inference

    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    m = MWT(dama_dim=128, levels=3, dtype=jnp.bfloat16)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    v_cast = cast_kernels_for_inference(v, "bfloat16", min_elems=1)
    # at least the big conv kernels actually changed dtype
    assert v_cast["params"]["multiscale_fusion"]["conv"]["kernel"].dtype == jnp.bfloat16
    # batch_stats and BN params untouched
    assert all(l.dtype == jnp.float32 for l in
               jax.tree_util.tree_leaves(v_cast["batch_stats"]))
    assert v_cast["params"]["hf_fusion"]["bn"]["scale"].dtype == jnp.float32
    y = jax.jit(m.apply)(v, x)
    y_cast = jax.jit(m.apply)(v_cast, x)
    np.testing.assert_array_equal(np.asarray(y, np.float32),
                                  np.asarray(y_cast, np.float32))


def test_mwt_batch_stats_update(rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    m = MWT(dama_dim=32, levels=2)
    v = m.init(jax.random.PRNGKey(0), x)
    y, upd = m.apply(v, x, train=True, mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(v["batch_stats"])
    new = jax.tree_util.tree_leaves(upd["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_dama_output_dict(rng):
    x = jnp.asarray(rng.standard_normal((2, 224, 224, 3)).astype(np.float32))
    m = DAMA(arch=ARCH, dim=128)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(m.apply)(v, x)
    assert set(out) == {"fused", "space", "freq"}
    for k in out:
        assert out[k].shape == (2, 128)
        assert np.isfinite(np.asarray(out[k])).all()


CFG = ModelConfig(compute_dtype="float32")


@pytest.fixture(scope="module")
def detector():
    model, variables = init_detector(CFG, jax.random.PRNGKey(0))
    return model, variables


@pytest.mark.parametrize("mode,extra_keys", [
    ("dynamic", {"fused", "space", "freq"}),
    ("sfe_only", set()),
    ("sfe_mwt", {"sfe", "mwt"}),
])
def test_video_forward_modes(detector, rng, mode, extra_keys):
    model, variables = detector
    x = jnp.asarray(rng.standard_normal((2, 4, 224, 224, 3)).astype(np.float32))
    out, updates = video_forward(model, variables, x, mode=mode,
                                 frame_chunk=2, train=False)
    assert out["logits"].shape == (2, 1)
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert extra_keys <= set(out)
    assert updates is None


def _equalize_pos_embeddings(variables):
    """Neutralize the reference's batch-indexed pos-embedding quirk
    (sfe.py:158-159): with all rows equal, outputs can't depend on an
    element's position within the flattened chunk, so the frame-scan
    chunking/masking logic can be tested for exact invariance."""

    def fix(tree):
        for k, v in tree.items():
            if k == "pos_embedding":
                tree[k] = jnp.broadcast_to(v[:1], v.shape)
            elif isinstance(v, dict):
                fix(v)

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # deep copy
    import flax

    variables = flax.core.unfreeze(variables)
    fix(variables["params"])
    return variables


def test_video_forward_chunk_invariance_with_padding(detector, rng):
    """K=3 with chunk=2 (ragged, padded+masked) == chunk=1 == chunk=3
    (pos-embedding quirk neutralized — see _equalize_pos_embeddings)."""
    model, variables = detector
    variables = _equalize_pos_embeddings(variables)
    x = jnp.asarray(rng.standard_normal((1, 3, 224, 224, 3)).astype(np.float32))
    outs = [
        video_forward(model, variables, x, mode="dynamic",
                      frame_chunk=c, train=False, remat=False)[0]
        for c in (1, 2, 3)
    ]
    for k in ("logits", "fused"):
        np.testing.assert_allclose(
            np.asarray(outs[0][k]), np.asarray(outs[1][k]), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(outs[0][k]), np.asarray(outs[2][k]), atol=1e-5)


def test_video_forward_train_updates_batch_stats(detector, rng):
    model, variables = detector
    x = jnp.asarray(rng.standard_normal((1, 2, 224, 224, 3)).astype(np.float32))
    out, updates = video_forward(model, variables, x, mode="dynamic",
                                 frame_chunk=2, train=True,
                                 rng=jax.random.PRNGKey(1))
    assert updates is not None and "batch_stats" in updates
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))
    assert np.isfinite(np.asarray(out["logits"])).all()
