"""Sharded-vs-unsharded numerical exactness of the training step.

The mesh tests in test_train_stack.py check that distributed training *runs*;
these check the stronger claim (VERDICT.md next-round #6): one `train_step`
on an 8-device ('dcn','data','frames') mesh produces the same loss, the same
predictions, and the same parameter update as the single-device run, for two
different mesh shapes. Frame-axis sharding is exact by construction — frames
never attend to each other and the video descriptor is a mean over K
(/root/reference/network/dama.py:197-199) — and GSPMD preserves batch-reduce
semantics (BN batch statistics, gradient mean) up to float reassociation.

SGD (not Adam) is the optimizer under test so the parameter delta is linear
in the gradient: post-step param comparison IS a gradient comparison, without
Adam's sign-amplification of near-zero gradients making tolerances flaky.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ewvit_tpu.configs import ModelConfig
from ewvit_tpu.models.detector import init_detector
from ewvit_tpu.parallel.mesh import (
    batch_sharding,
    label_sharding,
    make_mesh,
    replicate_tree,
)
from ewvit_tpu.train.steps import TrainState, create_train_state, train_step

CFG = ModelConfig.tiny()


@pytest.mark.parametrize("stride", [1, 2])
def test_depthwise_filter_grad_exact_under_partial_sharding(stride):
    """GSPMD (jax 0.9.0) miscompiles the batch_group_count filter-grad conv
    of a depthwise conv whenever the batch shards over only PART of the
    mesh: the grad comes back exactly (n_devices / n_batch_shards)x too big
    — measured 2x on this (4,2) mesh, 4x inside the full detector (every
    V2-S depthwise kernel, c_fit +4.0000). ops/dwconv.py replaces the
    backward with per-tap multiply+reduce; this pins both the exactness
    under the triggering sharding AND parity with the native autodiff
    backward when unsharded."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ewvit_tpu.ops.dwconv import _conv, depthwise_conv

    b, h, w_, c = 16, 8, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w_, c), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 1, c), jnp.float32)
    pads = ((1, 1), (1, 1))

    def loss(fn):
        return lambda w_, x_: jnp.mean(jnp.square(fn(x_, w_, stride, pads)))

    g_fixed = jax.jit(jax.grad(loss(depthwise_conv)))
    g_native = jax.jit(jax.grad(loss(_conv)))

    ref = np.asarray(g_native(w, x))
    np.testing.assert_allclose(np.asarray(g_fixed(w, x)), ref,
                               rtol=1e-5, atol=1e-6,
                               err_msg="fixed backward != native (unsharded)")

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("data", "frames"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    with mesh:
        sharded = np.asarray(g_fixed(ws, xs))
    np.testing.assert_allclose(sharded, ref, rtol=1e-5, atol=1e-6,
                               err_msg="filter grad diverged under the "
                                       "partial-mesh sharding")


def _bn_fed_paths(params):
    """Module prefixes owning a child whose name mentions 'bn'.

    A conv sitting next to a BN at the same tree level feeds it in this
    codebase (ConvBN's conv/bn pair, DAMA's fusion_gate_conv /
    fusion_gate_bn) — those convs' grads are mean-removed by the BN
    backward and carry amplified reassociation noise under resharding.
    """
    prefixes = set()

    def walk(node, prefix):
        if not hasattr(node, "items"):  # array leaf
            return
        if any("bn" in str(k) for k in node):
            prefixes.add(prefix)
        for k, v in node.items():
            walk(v, prefix + (str(k),))

    walk(params, ())
    return prefixes


def _leaf_is_bn_fed(path, bn_prefixes):
    keys = tuple(getattr(k, "key", str(k)) for k in path)
    return any(keys[:i] in bn_prefixes and "conv" in str(keys[i])
               for i in range(len(keys)))


@pytest.fixture(scope="module")
def setup():
    model, variables = init_detector(CFG, jax.random.PRNGKey(0))
    tx = optax.sgd(0.1)
    state, _ = create_train_state(variables, tx)
    return model, tx, state


def _batch(rng):
    # micro-batch 8 divides every dp-axis product used below (8 and 4);
    # K = 2 chunks of frame_chunk so both the scan and 'frames'-axis
    # sharding are exercised
    b, k = 2 * 8, 2 * CFG.frame_chunk
    s = CFG.arch.image_size
    frames = jnp.asarray(
        rng.standard_normal((b, k, s, s, 3)).astype(np.float32))
    labels = jnp.asarray((np.arange(b) % 2).astype(np.float32))
    return frames, labels


def _step(state, frames, labels, model, tx):
    return train_step(
        state, frames, labels, jax.random.PRNGKey(7), model=model, tx=tx,
        mode="dynamic", frame_chunk=CFG.frame_chunk, accum_steps=2,
        pos_weight=1.3, epoch=1, max_epochs=2)


@pytest.mark.parametrize("mesh_kwargs,frame_axis", [
    # NOTE: accum_steps=1 over a multi-device mesh segfaults this host's
    # XLA:CPU compiler at the tail of kernel codegen (reproduced standalone
    # on (1,8,1) and (1,4,2) meshes, scan and direct forms alike; accum>=2
    # compiles everywhere tried — see CLAUDE.md). _step uses accum_steps=2
    # and both shapes below are probe-validated.
    ({"data": 4, "frames": 2, "dcn": 1}, True),    # dp x frame-sharded
    ({"data": 2, "frames": 2, "dcn": 2}, True),    # 2 slices x 2 dp x 2 fp
])
def test_sharded_train_step_matches_unsharded(setup, rng, mesh_kwargs,
                                              frame_axis):
    model, tx, state = setup
    frames, labels = _batch(rng)

    ref_state, ref_metrics = _step(state, frames, labels, model, tx)

    mesh = make_mesh(**mesh_kwargs)
    sh_state = TrainState(*replicate_tree(mesh, tuple(state)))
    sh_frames = jax.device_put(
        frames, batch_sharding(mesh, frame_axis=frame_axis))
    sh_labels = jax.device_put(labels, label_sharding(mesh))
    with mesh:
        out_state, out_metrics = _step(sh_state, sh_frames, sh_labels,
                                       model, tx)

    np.testing.assert_allclose(
        float(out_metrics["loss"]), float(ref_metrics["loss"]),
        rtol=1e-5, err_msg="loss diverged under sharding")
    np.testing.assert_allclose(
        np.asarray(out_metrics["preds"]), np.asarray(ref_metrics["preds"]),
        rtol=1e-4, atol=1e-6, err_msg="preds diverged under sharding")

    # param delta is -0.1 * grad (SGD): compare each leaf's update
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_state.params)
    flat_out = dict(jax.tree_util.tree_leaves_with_path(out_state.params))
    flat_old = dict(jax.tree_util.tree_leaves_with_path(state.params))
    bn_fed = _bn_fed_paths(state.params)
    violations = []
    for path, ref_leaf in flat_ref:
        ref_delta = np.asarray(ref_leaf - flat_old[path], np.float32)
        out_delta = np.asarray(flat_out[path] - flat_old[path], np.float32)
        scale = np.abs(ref_delta).max()
        if scale < 1e-7:
            # Mathematically-zero gradient (e.g. a conv bias immediately
            # re-centered by a train-mode BN): both runs produce pure
            # float-reassociation noise at ~1e-9, so an elementwise
            # comparison is comparing noise against noise. Just pin both
            # sides to zero.
            assert np.abs(out_delta).max() < 1e-7, (
                f"zero-grad leaf {path} got a real update under sharding")
            continue
        # Elementwise tolerance is three-tier (ADVICE r3): leaves feeding a
        # train-mode BN get 3e-2 of leaf max — their grads are near-zero
        # residuals of heavily cancelling sums (BN removes the mean), so
        # elements ~100x below the leaf max carry f32 reassociation error
        # comparable to their own magnitude once GSPMD reorders the
        # batch/frame reductions (measured: up to 2e-2 of leaf max on
        # freq_conv's kernel). BN scale/bias leaves get 1e-2: their grads
        # are batch reductions of the same mean-removed upstream signal
        # (measured 5e-3 of leaf max on mwt/hf_fusion/bn/bias). Everything
        # else (attention, dense, embeddings) has well-conditioned grads
        # and keeps the tight 5e-4 bound. The per-leaf relative-L2 bound
        # stays the systematic-error detector — a missing psum
        # normalization or a polluted reduction shows up as relL2 ~ O(1).
        keys = tuple(str(getattr(k, "key", k)) for k in path)
        if _leaf_is_bn_fed(path, bn_fed):
            atol = 3e-2
        elif any("bn" in k for k in keys):
            atol = 1e-2
        else:
            atol = 5e-4
        rel_l2 = (np.linalg.norm(out_delta - ref_delta)
                  / max(np.linalg.norm(ref_delta), 1e-12))
        if rel_l2 >= 1e-2:
            violations.append(f"{keys}: relL2={rel_l2:.3e}")
            continue
        # absolute floor 5e-8: leaves just above the zero-grad cutoff
        # (scale ~1e-7..1e-4) carry plain f32 accumulation noise of a few
        # e-8 regardless of magnitude (measured 3e-8 on a block_5_10 SE
        # kernel with leaf max 5.5e-5) — below that, it's noise-vs-noise
        err = np.abs(out_delta - ref_delta).max()
        if err > atol * scale + 5e-8:
            violations.append(
                f"{keys}: elementwise err {err:.3e} > {atol:.0e} of leaf "
                f"max {scale:.3e} (ratio {err / scale:.3e})")
    assert not violations, (
        "gradients diverged under sharding at "
        f"{len(violations)} leaves:\n" + "\n".join(violations))

    # BN batch statistics must also agree (GSPMD global batch reduce).
    # atol: one update writes (1-momentum)=0.01-scaled batch stats, so the
    # deepest BNs' near-zero running means sit at ~1e-4..1e-2 with f32
    # reassociation error from the 8-way resharded batch reduce measured at
    # 2.8e-6 absolute (identical across both mesh shapes — deterministic
    # reduce-order difference vs the single-device sum, not a systematic
    # error, which would scale with the stat itself and trip rtol).
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_state.batch_stats),
            jax.tree_util.tree_leaves_with_path(out_state.batch_stats)):
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32),
            rtol=1e-4, atol=1e-5, err_msg=f"batch_stats diverged at {path}")


def test_flagship_sharded_train_step_traces():
    """The FLAGSHIP (224px, full stacks) train step lowers over the
    production 8-device ('dcn','data','frames') mesh (VERDICT r3 #5).

    The exactness tests above run tiny()/micro() because XLA:CPU cannot
    compile the flagship sharded step on this host — but nothing else even
    *traced* it sharded, so a flagship-only sharding regression (e.g. a
    shape-dependent PartitionSpec) would ship invisible. ``lower()`` is
    tracing + StableHLO emission only (no XLA:CPU compile, so no segfault /
    18-min-compile exposure) and everything stays abstract via
    ``jax.eval_shape`` — no 149M-param tree is ever materialized.
    """
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ewvit_tpu.models.detector import create_detector
    from ewvit_tpu.train.optimizer import make_optimizer

    cfg = ModelConfig()  # the flagship config, bf16 compute
    assert cfg.arch.image_size == 224
    model = create_detector(cfg)
    size = cfg.arch.image_size
    dt = jnp.dtype(cfg.compute_dtype)
    variables = jax.eval_shape(
        functools.partial(model.init, train=False),
        {"params": jax.random.PRNGKey(0)},
        jax.ShapeDtypeStruct((1, size, size, 3), dt))
    tx = make_optimizer(variables["params"])
    state_abs = jax.eval_shape(lambda v: create_train_state(v, tx)[0],
                               variables)

    mesh = make_mesh(data=2, frames=2, dcn=2)  # the dryrun's mesh shape
    repl = NamedSharding(mesh, P())
    state_sds = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl),
        state_abs)

    accum, dp = 2, mesh.shape["dcn"] * mesh.shape["data"]
    b, k = accum * dp, 2 * cfg.frame_chunk
    frames_sds = jax.ShapeDtypeStruct(
        (b, k, size, size, 3), dt,
        sharding=batch_sharding(mesh, frame_axis=True))
    labels_sds = jax.ShapeDtypeStruct((b,), jnp.float32,
                                      sharding=label_sharding(mesh))

    lowered = train_step.lower(
        state_sds, frames_sds, labels_sds, jax.random.PRNGKey(3),
        model=model, tx=tx, mode="dynamic", frame_chunk=cfg.frame_chunk,
        accum_steps=accum, pos_weight=1.2, epoch=1, max_epochs=30,
        remat=True)
    txt = lowered.as_text()
    # the lowered module must carry the input sharding annotations: the
    # frames arg is split over ('dcn','data') x 'frames' of its 5-D shape.
    # Shardy emits sdy.sharding attrs; the GSPMD fallback emits
    # mhlo.sharding devices= strings — accept either partitioner.
    assert "sdy.sharding" in txt or "mhlo.sharding" in txt, (
        "lowered HLO carries no sharding annotations")
    frames_spec = '[{"dcn", "data"}, {"frames"}, {}, {}, {}]'
    assert frames_spec in txt or "devices=[4,2,1,1,1]" in txt, (
        "frames argument lost its ('dcn','data')x'frames' sharding")
