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
