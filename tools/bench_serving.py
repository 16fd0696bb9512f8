"""Benchmark the serving path (InferenceEngine) on the real chip (VERDICT r3 #3).

The 5,087 f/s headline (bench.py) times the raw jitted forward on a
device-resident bf16 clip. The deployment claim is the serving program:
uint8 clips -> on-device preprocess (jitter-free normalize) -> dynamic
forward -> sigmoid probs. This harness measures

1. ``device``: the serving program's device rate, slope method with a
   serial dependency folded inside jit exactly like bench.py — directly
   comparable to the headline; the delta IS the pipeline compute overhead
   (uint8 convert + normalize + sigmoid + f32 cast).
2. ``stream``: ``InferenceEngine.predict_stream`` end-to-end wall rate over
   fresh host uint8 batches, slope over two stream lengths. Through the
   axon dev tunnel this includes ~1.5 s/batch of D2H pull latency and
   tunnel H2D bandwidth (CLAUDE.md measurement traps) — artifacts of the
   tunnel, not the engine; on a real TPU VM host both are microseconds.
   Reported for honesty, interpreted with that caveat.

Usage: python tools/bench_serving.py [--batch 2] [--frames 64] [--chunk 32]
       [--stream-batches 4] [--reps 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ewvit_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--n-short", type=int, default=2)
    ap.add_argument("--n-long", type=int, default=12)
    ap.add_argument("--stream-batches", type=int, default=4,
                    help="short stream length (long = 3x)")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.models.detector import init_detector, video_forward
    from ewvit_tpu.ops.preprocess import preprocess_batch
    from ewvit_tpu.serving import InferenceEngine

    cfg = ModelConfig()
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))
    engine = InferenceEngine(model, variables, frame_chunk=args.chunk)
    size = cfg.arch.image_size
    rng = np.random.default_rng(0)
    clip_u8 = rng.integers(0, 255, (args.batch, args.frames, size, size, 3),
                           np.uint8)
    frames_per_batch = args.batch * args.frames

    # ---- 1. serving-program device rate (bench.py methodology) ------------
    clip_dev = jnp.asarray(clip_u8)

    def serving_program(v, clips_u8, acc):
        x = preprocess_batch(clips_u8, train=False,
                             dtype_name=cfg.compute_dtype)
        x = x + acc.astype(x.dtype)          # serial dependency, fused
        out, _ = video_forward(model, v, x, mode="dynamic",
                               frame_chunk=args.chunk, train=False,
                               remat=False)
        return jax.nn.sigmoid(out["logits"].astype(jnp.float32))[:, 0]

    fwd = jax.jit(serving_program)

    def chain(n: int) -> float:
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n):
            acc = acc + fwd(engine.variables, clip_dev, acc).sum() * 1e-9
        float(np.asarray(acc))
        return time.perf_counter() - t0

    chain(1)
    chain(args.n_short)
    t_short = min(chain(args.n_short)
                  for _ in range(2 * args.reps))
    t_long = min(chain(args.n_long)
                 for _ in range(2 * args.reps))
    per_call = (t_long - t_short) / (args.n_long - args.n_short)
    device_fps = frames_per_batch / per_call
    print(f"device-rate serving program: {per_call * 1e3:.2f} ms/batch = "
          f"{device_fps:,.0f} frames/s "
          f"(B={args.batch} K={args.frames} chunk={args.chunk})")

    # ---- 2. predict_stream end-to-end (host uint8 in, probs out) ----------
    engine.warmup(args.batch, args.frames, size)

    def stream(n_batches: int) -> float:
        batches = [clip_u8 + np.uint8(i % 2) for i in range(n_batches)]
        t0 = time.perf_counter()
        out = list(engine.predict_stream(iter(batches)))
        dt = time.perf_counter() - t0
        assert len(out) == n_batches and all(
            len(p) == args.batch for p in out)
        return dt

    stream(1)  # warm the pull path
    g1, g2 = args.stream_batches, 3 * args.stream_batches
    t1 = min(stream(g1) for _ in range(args.reps))
    t2 = min(stream(g2) for _ in range(args.reps))
    per_batch = (t2 - t1) / (g2 - g1)
    stream_fps = frames_per_batch / per_batch
    print(f"predict_stream e2e (through the dev tunnel): "
          f"{per_batch * 1e3:.1f} ms/batch = {stream_fps:,.0f} frames/s "
          f"sustained  [includes tunnel H2D + ~1.5 s/batch D2H pull "
          f"latency — see BASELINE.md serving section]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
