"""InferenceEngine tests (tiny config, CPU)."""

import numpy as np
import jax
import pytest

from ewvit_tpu.configs import ModelConfig
from ewvit_tpu.models.detector import init_detector
from ewvit_tpu.serving import InferenceEngine

CFG = ModelConfig.tiny()


@pytest.fixture(scope="module")
def engine():
    model, variables = init_detector(CFG, jax.random.PRNGKey(0))
    return InferenceEngine(model, variables, frame_chunk=CFG.frame_chunk)


def _clips(n=2, k=4):
    g = np.random.default_rng(0)
    s = CFG.arch.image_size
    return g.integers(0, 255, (n, k, s, s, 3), np.uint8)


def test_predict_probabilities(engine):
    probs = engine.predict(_clips())
    assert probs.shape == (2,)
    assert ((probs >= 0) & (probs <= 1)).all()


def test_predict_deterministic(engine):
    c = _clips()
    np.testing.assert_array_equal(engine.predict(c), engine.predict(c))


def test_predict_stream_order_and_values(engine):
    c = _clips()
    batches = [c, c[:, ::-1], c]
    outs = list(engine.predict_stream(iter(batches)))
    assert len(outs) == 3
    np.testing.assert_array_equal(outs[0], outs[2])
    direct = engine.predict(batches[1])
    np.testing.assert_allclose(outs[1], direct, atol=1e-6)


def test_warmup_compiles(engine):
    engine.warmup(2, 4, CFG.arch.image_size)


@pytest.mark.parametrize("mesh_kw,frame_axis", [
    (dict(data=4, frames=1), False),   # pure DP
    (dict(data=2, frames=2), True),    # DP + frame-axis (context) sharding
])
def test_mesh_serving_matches_single_device(engine, mesh_kw, frame_axis):
    """Mesh-sharded serving is exact vs the single-device engine, including
    the zero-padded tail batch (B=3 on a 4-wide batch divisor)."""
    from ewvit_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(**mesh_kw, dcn=2)
    model, variables = init_detector(CFG, jax.random.PRNGKey(0))
    sharded = InferenceEngine(model, variables, frame_chunk=CFG.frame_chunk,
                              mesh=mesh, frame_axis=frame_axis)
    c = _clips(n=3, k=4)   # 3 % (dcn*data) != 0 -> exercises tail padding
    got = sharded.predict(c)
    want = engine.predict(c)
    assert got.shape == (3,)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # streamed path pads/unpads per batch too
    outs = list(sharded.predict_stream(iter([c, c[:2]])))
    np.testing.assert_allclose(outs[0], want, atol=1e-5)
    np.testing.assert_allclose(outs[1], want[:2], atol=1e-5)


def test_mesh_serving_rejects_undivisible_frames(engine):
    from ewvit_tpu.parallel.mesh import make_mesh

    model, variables = init_detector(CFG, jax.random.PRNGKey(0))
    sharded = InferenceEngine(model, variables, frame_chunk=CFG.frame_chunk,
                              mesh=make_mesh(data=2, frames=2, dcn=2),
                              frame_axis=True)
    with pytest.raises(ValueError, match="frames"):
        sharded.predict(_clips(n=2, k=3))
