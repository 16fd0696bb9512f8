#!/usr/bin/env python
"""Inference latency / throughput benchmark for the detector.

CLI-compatible rebuild of the reference latency harness
(/root/reference/test.py:16-28 flags; :30-113 procedure): load weights (or run
fresh-initialized with ``--weights none``), count parameters, random
[B, K, 224, 224, 3] input, warmup runs, timed runs bracketed by device sync —
``jax.block_until_ready`` replacing ``torch.cuda.synchronize`` (test.py:86-95)
— reporting avg ms per video batch and frames/sec.
"""

from __future__ import annotations

import argparse
import time


def parse_args():
    p = argparse.ArgumentParser(
        description="Benchmark DeepfakeDetector inference time (TPU)")
    p.add_argument("--weights", type=str, default="none",
                   help="Checkpoint path, or 'none' for fresh init")
    p.add_argument("--batch-size", "--bs", type=int, default=1)
    p.add_argument("--frame-count", "--fc", type=int, default=30)
    p.add_argument("--dim", "--d", type=int, default=128)
    p.add_argument("--runs", type=int, default=100)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--mode", type=str, default="dynamic",
                   choices=["dynamic", "sfe_only", "sfe_mwt"])
    p.add_argument("--frame-chunk", type=int, default=30)
    p.add_argument("--pos-mode", type=str, default="reference",
                   choices=["reference", "tile"],
                   help="'tile' lifts the flattened<=emb_dim cap (row i %% "
                        "emb_dim) so larger --frame-chunk values are allowed")
    p.add_argument("--s2d-stem", action="store_true",
                   help="space-to-depth stem conv (exact rewrite)")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler device trace of 5 runs "
                        "into DIR (view with tensorboard/xprof)")
    p.add_argument("--tiny", action="store_true",
                   help="ModelConfig.tiny() (64px) — smoke tests / CI only")
    return p.parse_args()


def main():
    args = parse_args()

    from ewvit_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("EWVIT_PLATFORM") != "cpu":
        # TPU-only cache: cached XLA:CPU AOT loads can abort (CLAUDE.md)
        jax.config.update("jax_compilation_cache_dir", "/tmp/ewvit_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.evaluation import load_model
    from ewvit_tpu.models.detector import video_forward

    if args.tiny:
        cfg = ModelConfig.tiny().replace(pos_mode=args.pos_mode,
                                         use_s2d_stem=args.s2d_stem)
    else:
        cfg = ModelConfig(dama_dim=args.dim, frame_chunk=args.frame_chunk,
                          pos_mode=args.pos_mode, use_s2d_stem=args.s2d_stem)
    weights = None if args.weights in ("none", "") else args.weights
    model, variables = load_model(weights, cfg)
    from ewvit_tpu.utils.params import cast_kernels_for_inference

    # bit-identical under bf16 compute; halves every large weight read
    variables = cast_kernels_for_inference(variables, cfg.compute_dtype)

    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"Parameters: {n_params / 1e6:.2f}M")
    print(f"Device: {jax.devices()[0]}")

    size = cfg.arch.image_size
    clip = jax.random.normal(
        jax.random.PRNGKey(0),
        (args.batch_size, args.frame_count, size, size, 3),
        jnp.dtype(cfg.compute_dtype))

    chunk = min(args.frame_chunk, args.frame_count)
    n_chunks = -(-args.frame_count // chunk)
    padded = n_chunks * chunk
    if padded != args.frame_count:
        print(f"Note: frame_count={args.frame_count} scans in {n_chunks} "
              f"chunks of {chunk} (last one padded) — compute is "
              f"proportional to {padded} frames; pick --frame-chunk "
              f"dividing frame_count for peak throughput")

    def forward(variables, clip):
        out, _ = video_forward(
            model, variables, clip, mode=args.mode, frame_chunk=chunk,
            train=False, remat=False)
        return out["logits"]

    import numpy as np

    fwd = jax.jit(forward)
    t0 = time.perf_counter()
    jax.block_until_ready(fwd(variables, clip))
    print(f"Compile + first run: {time.perf_counter() - t0:.1f}s")

    if args.profile:
        with jax.profiler.trace(args.profile):
            for _ in range(5):
                r = fwd(variables, clip)
            jax.block_until_ready(r)
        print(f"Profiler trace written to {args.profile}")

    # Serial-dependency chain + single host pull, timed at two lengths; the
    # slope is the per-call device time. Robust to runtimes where
    # block_until_ready returns before remote completion (see bench.py).
    def chain(n: int) -> float:
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n):
            c = clip + acc.astype(clip.dtype)
            acc = acc + fwd(variables, c).astype(jnp.float32).sum() * 1e-9
        float(np.asarray(acc))
        return time.perf_counter() - t0

    chain(1)
    for _ in range(max(1, args.warmup // 5)):
        chain(2)
    n_short, n_long = max(2, args.runs // 10), args.runs
    t_short = min(chain(n_short) for _ in range(2))
    t_long = min(chain(n_long) for _ in range(2))
    per_call = (t_long - t_short) / (n_long - n_short)

    avg_ms = per_call * 1000
    fps = args.batch_size * args.frame_count / per_call
    print(f"Average inference time: {avg_ms:.2f} ms "
          f"({args.batch_size}x{args.frame_count} frames @ {size}px)")
    print(f"Throughput: {fps:.1f} frames/sec")


if __name__ == "__main__":
    main()
