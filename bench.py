"""Headline benchmark: flagship inference throughput (frames/sec/chip).

TPU-native equivalent of the reference latency harness
(/root/reference/test.py:30-113): random [B, K, 3, 224, 224] input, warmup,
timed runs bracketed by device sync — here ``jax.block_until_ready`` instead
of ``torch.cuda.synchronize``. The flagship path is DeepfakeDetector 'dynamic'
(full DAMA: V2-S EfficientViT + MWT + cross-attention fusion) in bfloat16.

Prints ONE JSON line:
  {"metric": "inference_throughput", "value": N, "unit": "frames/sec",
   "vs_baseline": N / 5000}
vs_baseline is against the BASELINE.json north star (>=5,000 frames/sec/chip
@224px on TPU v5e); the reference publishes no numbers of its own
(SURVEY.md §6).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

# Persistent XLA compile cache: the first bench run pays ~minutes of compile,
# subsequent runs (and the driver's end-of-round run) hit the disk cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/ewvit_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 2          # flattened chunk = BATCH * FRAME_CHUNK <= emb_dim (64)
FRAMES = 30        # reference test.py default K (test.py:20-23)
FRAME_CHUNK = 30
WARMUP = 5
RUNS = 30
NORTH_STAR_FPS = 5000.0


def main() -> int:
    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.models.detector import init_detector, video_forward

    cfg = ModelConfig()  # bfloat16 compute, fp32 params
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))

    size = cfg.arch.image_size
    clip = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, FRAMES, size, size, 3),
        jnp.dtype(cfg.compute_dtype))

    def forward(variables, clip):
        outputs, _ = video_forward(
            model, variables, clip, mode="dynamic",
            frame_chunk=FRAME_CHUNK, train=False, remat=False)
        return outputs["logits"]

    fwd = jax.jit(forward)
    for _ in range(WARMUP):
        jax.block_until_ready(fwd(variables, clip))

    t0 = time.perf_counter()
    for _ in range(RUNS):
        jax.block_until_ready(fwd(variables, clip))
    dt = time.perf_counter() - t0

    frames_per_sec = BATCH * FRAMES * RUNS / dt
    print(json.dumps({
        "metric": "inference_throughput",
        "value": round(frames_per_sec, 2),
        "unit": "frames/sec",
        "vs_baseline": round(frames_per_sec / NORTH_STAR_FPS, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
