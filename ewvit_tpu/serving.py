"""Sustained-throughput inference engine (serving path).

The reference has no serving story beyond the eager ``test.py`` harness
(/root/reference/test.py:30-113); production deployment needs a pipelined
driver. This engine:

- compiles ONE XLA program per (batch, frames) shape (static shapes keep the
  MXU tiling fixed; pad the tail batch instead of recompiling);
- ships uint8 NHWC clips (4x less H2D than float32) and runs preprocessing
  on device, fused ahead of the first conv;
- double-buffers: batch N+1's H2D transfer overlaps batch N's compute (jax
  async dispatch — we only block on the *previous* result);
- scales over a ``jax.sharding.Mesh``: pass ``mesh=`` to shard the batch over
  ('dcn','data') and (optionally) frames over 'frames' — the TPU-native
  replacement for the reference's ``nn.DataParallel`` replicate-gather at
  serving time, exact because frames never attend to each other
  (parallel/mesh.py). Tail batches are zero-padded to the mesh's batch
  divisor and the pad rows dropped on the way out;
- returns sigmoid probabilities on host.

Usage:
    engine = InferenceEngine.from_checkpoint(path)         # or from variables
    probs = engine.predict(clips_uint8)                    # one batch
    for probs in engine.predict_stream(batch_iter): ...    # pipelined
    engine = InferenceEngine.from_checkpoint(path, mesh=make_mesh())  # DP
"""

from __future__ import annotations

import functools
from typing import Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ewvit_tpu.configs import ModelConfig
from ewvit_tpu.models.detector import DeepfakeDetector, video_forward
from ewvit_tpu.ops.preprocess import preprocess_batch


class InferenceEngine:
    def __init__(self, model: DeepfakeDetector, variables, *,
                 mode: str = "dynamic", frame_chunk: int = 32,
                 mesh=None, frame_axis: bool = False):
        from ewvit_tpu.utils.params import cast_kernels_for_inference

        self.model = model
        # bit-identical under bf16 compute; halves every large weight read
        self.variables = cast_kernels_for_inference({
            k: v for k, v in variables.items()
            if k in ("params", "batch_stats")
        }, model.cfg.compute_dtype)
        self.mode = mode
        self.frame_chunk = frame_chunk
        self.mesh = mesh
        self._batch_divisor = 1
        self._frame_divisor = 1
        if mesh is not None:
            from ewvit_tpu.parallel.mesh import (
                batch_sharding, replicate_tree)

            self.variables = replicate_tree(mesh, self.variables)
            self._in_sharding = batch_sharding(mesh, frame_axis=frame_axis)
            self._batch_divisor = mesh.shape["dcn"] * mesh.shape["data"]
            self._frame_divisor = mesh.shape["frames"] if frame_axis else 1
        self._fwd = jax.jit(
            functools.partial(self._forward, mode=mode))

    def _place(self, clips_u8) -> jax.Array:
        """Host batch -> device(s), zero-padding the tail batch on a mesh."""
        if self.mesh is None:
            return jnp.asarray(clips_u8)
        b, k = clips_u8.shape[:2]
        if k % self._frame_divisor:
            raise ValueError(
                f"frame count {k} not divisible by the mesh 'frames' axis "
                f"({self._frame_divisor}); frame padding would bias the "
                "video mean — resample the clip instead")
        pad = -b % self._batch_divisor
        if pad:
            clips_u8 = np.concatenate(
                [clips_u8, np.zeros((pad, *clips_u8.shape[1:]),
                                    clips_u8.dtype)], axis=0)
        return jax.device_put(clips_u8, self._in_sharding)

    @classmethod
    def from_checkpoint(cls, path: Optional[str],
                        cfg: Optional[ModelConfig] = None, **kw):
        from ewvit_tpu.evaluation import load_model

        cfg = cfg or ModelConfig()
        model, variables = load_model(path, cfg)
        return cls(model, variables, **kw)

    # ----- compiled core ---------------------------------------------------

    def _forward(self, variables, clips_u8, *, mode):
        x = preprocess_batch(clips_u8, train=False,
                             dtype_name=self.model.cfg.compute_dtype)
        k = clips_u8.shape[1]
        out, _ = video_forward(
            self.model, variables, x, mode=mode,
            frame_chunk=min(self.frame_chunk, k), train=False, remat=False)
        return jax.nn.sigmoid(out["logits"].astype(jnp.float32))[:, 0]

    # ----- public API ------------------------------------------------------

    def warmup(self, batch: int, frames: int, image_size: int = 224):
        clip = np.zeros((batch, frames, image_size, image_size, 3),
                        np.uint8)
        jax.block_until_ready(self._fwd(self.variables, self._place(clip)))

    def predict(self, clips_u8: np.ndarray) -> np.ndarray:
        """clips_u8: [B, K, H, W, 3] uint8 -> probabilities [B]."""
        n = clips_u8.shape[0]
        probs = self._fwd(self.variables, self._place(clips_u8))
        return np.asarray(probs)[:n]

    def predict_stream(
        self, batches: Iterable[np.ndarray]
    ) -> Iterator[np.ndarray]:
        """Pipelined inference over a stream of equal-shaped uint8 batches.

        Dispatches batch N+1 before blocking on batch N's result, so H2D and
        compute overlap; with a prefetching loader upstream the chip never
        waits on the host.
        """
        pending, n_pending = None, 0
        for batch in batches:
            fut = self._fwd(self.variables, self._place(batch))
            if pending is not None:
                yield np.asarray(pending)[:n_pending]
            pending, n_pending = fut, batch.shape[0]
        if pending is not None:
            yield np.asarray(pending)[:n_pending]
