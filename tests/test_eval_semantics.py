"""Eval-harness semantics: pad_last invariance of reported losses, per-batch
orthogonality series, and the per-frame loader expansion.

Round-2 VERDICT weak #4: ``pad_last`` loaders zero-pad the tail batch and
``evaluate`` trimmed the METRICS but averaged the loss columns over padded
rows too. The fix masks pad rows out of both loss terms inside ``eval_step``
(ewvit_tpu/train/losses.py ``valid_mask``), so eval losses must now be
identical with and without padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ewvit_tpu.configs import ModelConfig
from ewvit_tpu.data.pipeline import BatchLoader
from ewvit_tpu.evaluation import evaluate
from ewvit_tpu.models.detector import init_detector_fast


class SyntheticClips:
    """In-memory (uint8 clip, label) dataset, BatchLoader-compatible."""

    def __init__(self, n: int, frames: int = 2, size: int = 32, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.clips = rng.integers(0, 255, (n, frames, size, size, 3),
                                  np.uint8)
        self.labels = (rng.random(n) > 0.5).astype(np.int32)

    def __len__(self):
        return len(self.clips)

    def __getitem__(self, i):
        return self.clips[i], self.labels[i]


@pytest.fixture(scope="module")
def micro_model():
    cfg = ModelConfig.micro()
    model, variables = init_detector_fast(cfg, seed=0)
    return cfg, model, variables


def test_eval_loss_is_pad_last_invariant(micro_model):
    """6 clips, batch 4 => tail of 2. The padded run (tail zero-padded to 4)
    must report the SAME loss/orth columns as the unpadded ragged run
    (which is what the reference's torch DataLoader produces)."""
    cfg, model, variables = micro_model
    ds = SyntheticClips(6)
    kw = dict(mode="dynamic", frame_chunk=cfg.frame_chunk,
              compute_dtype="float32")
    m_pad = evaluate(model, variables,
                     BatchLoader(ds, 4, pad_last=True, num_workers=0), **kw)
    m_raw = evaluate(model, variables,
                     BatchLoader(ds, 4, pad_last=False, num_workers=0), **kw)
    assert m_pad["loss"] == pytest.approx(m_raw["loss"], rel=1e-5)
    assert m_pad["orth_loss"] == pytest.approx(m_raw["orth_loss"], rel=1e-5)
    np.testing.assert_allclose(m_pad["preds"], m_raw["preds"], rtol=1e-5)
    assert m_pad["labels"] == m_raw["labels"]
    # per-batch orthogonality series for the eval scatter (reference
    # eval.py:157-158, utils/visualization.py:102-121)
    assert len(m_pad["orth_losses"]) == 2
    np.testing.assert_allclose(m_pad["orth_losses"], m_raw["orth_losses"],
                               rtol=1e-5)


def test_per_frame_loader_expansion(micro_model):
    """PerFrameLoader: [B,K,...] -> [B*K,1,...], labels repeated K times,
    expanded dataset length drives evaluate()'s pad trimming so the score
    count equals videos*K exactly (reference plot_celebdf_roc.py:31-72)."""
    import plot_celebdf_roc as roc

    cfg, model, variables = micro_model
    cfg = cfg.replace(pos_mode="row0")
    ds = SyntheticClips(3, frames=2)          # 3 videos x 2 frames
    inner = BatchLoader(ds, 2, pad_last=True, num_workers=0)
    loader = roc.PerFrameLoader(inner, frame_count=2)
    assert loader.true_len() == 6            # loader protocol (pipeline.py)

    batches = list(loader)
    assert batches[0][0].shape == (4, 1, 32, 32, 3)   # B*K single-frame clips
    np.testing.assert_array_equal(
        batches[0][1], np.repeat(ds.labels[:2], 2))

    m = evaluate(model, variables, loader, mode="dynamic", frame_chunk=1,
                 compute_dtype="float32")
    assert len(m["preds"]) == 6
    np.testing.assert_array_equal(m["labels"], np.repeat(ds.labels, 2))


def test_per_frame_scores_equal_single_frame_clips(micro_model):
    """Batched per-frame scoring (row0) == each frame evaluated as its own
    [1,1,...] clip, the reference's eager per-frame loop."""
    from ewvit_tpu.models.detector import video_forward

    cfg, model, variables = micro_model
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 3, 32, 32, 3)).astype(np.float32))

    # row0-batched: all 6 frames in one forward
    model_row0 = type(model)(cfg.replace(pos_mode="row0"))
    flat = x.reshape(6, 1, 32, 32, 3)
    out, _ = video_forward(model_row0, variables, flat, mode="dynamic",
                           frame_chunk=1, train=False, remat=False)
    batched = np.asarray(out["logits"]).reshape(6)

    # reference-style loop: one [1,1,...] clip per frame, 'reference' mode
    singles = []
    for i in range(6):
        o, _ = video_forward(model, variables, flat[i:i + 1], mode="dynamic",
                             frame_chunk=1, train=False, remat=False)
        singles.append(float(np.asarray(o["logits"]).reshape(())))
    np.testing.assert_allclose(batched, singles, rtol=1e-5, atol=1e-6)
