"""Metrics (vs sklearn oracle) and on-device preprocessing tests."""

import numpy as np
import jax
import jax.numpy as jnp

from ewvit_tpu.ops.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    color_jitter,
    preprocess_batch,
)
from ewvit_tpu.utils.metrics import binary_metrics, calculate_eer


def test_binary_metrics_perfect_classifier():
    labels = [0, 0, 1, 1]
    scores = [0.1, 0.2, 0.8, 0.9]
    m = binary_metrics(labels, scores)
    assert m["accuracy"] == 1.0 and m["auc"] == 1.0 and m["f1"] == 1.0
    assert m["eer"] == 0.0
    assert m["confusion_matrix"] == [[2, 0], [0, 2]]


def test_binary_metrics_single_class_safe():
    m = binary_metrics([1, 1, 1], [0.6, 0.7, 0.8])
    assert np.isnan(m["auc"]) and m["accuracy"] == 1.0


def test_eer_symmetry():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 200)
    scores = np.clip(labels * 0.5 + rng.normal(0, 0.3, 200) + 0.25, 0, 1)
    eer, thr = calculate_eer(labels, scores)
    assert 0.0 <= eer <= 0.5 and 0.0 <= thr <= 1.0


def test_preprocess_eval_matches_reference_normalize():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (2, 3, 8, 8, 3), np.uint8)
    out = preprocess_batch(jnp.asarray(frames), train=False,
                           dtype_name="float32")
    ref = (frames.astype(np.float32) / 255.0
           - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_color_jitter_bounds_and_determinism():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((4, 8, 8, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    a = color_jitter(x, key)
    b = color_jitter(x, key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.min(a)) >= 0.0 and float(jnp.max(a)) <= 1.0
    # 1% jitter stays within ~2% of the input
    assert float(jnp.max(jnp.abs(a - x))) < 0.05
