"""Sweep XLA:TPU compiler flags over the INFERENCE program (VERDICT r3 #4a).

Same methodology as tools/bench_train_flags.py (AOT-compile the identical
lowered program under each flag set, slope-time interleaved in one process)
but on bench.py's exact headline forward (B=2 K=64 chunk=32 bf16, serial
dependency folded inside jit). A winning flag becomes a bench.py
compiler_options default => real margin over the 5,000 f/s north star
instead of noise-floor hardening alone.

Usage: python tools/bench_infer_flags.py [--reps 3] [--n 10] [--only a b]
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

FLAG_SETS = [
    ("baseline", {}),
    ("vmem_48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("aggr_loop_fusion",
     {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("no_dot_sr", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("dot_dot_fusion", {"xla_tpu_dot_dot_fusion_duplicated": "true"}),
]

BATCH, FRAMES, FRAME_CHUNK = 2, 64, 32  # == bench.py headline config


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.models.detector import init_detector, video_forward
    from ewvit_tpu.utils.params import cast_kernels_for_inference

    cfg = ModelConfig()
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))
    variables = cast_kernels_for_inference(variables, cfg.compute_dtype)
    size = cfg.arch.image_size
    base = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, FRAMES, size, size, 3),
        jnp.dtype(cfg.compute_dtype))

    def fwd(v, c, a):
        return video_forward(
            model, v, c + a.astype(c.dtype), mode="dynamic",
            frame_chunk=FRAME_CHUNK, train=False, remat=False)[0]["logits"]

    lowered = jax.jit(fwd).lower(variables, base, jnp.zeros((), jnp.float32))

    names = [n for n, _ in FLAG_SETS
             if args.only is None or n in args.only]
    compiled = {}
    for name, flags in FLAG_SETS:
        if name not in names:
            continue
        t0 = time.perf_counter()
        try:
            compiled[name] = lowered.compile(compiler_options=flags or None)
            print(f"# compiled {name} ({flags}) in "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
        except Exception as e:
            print(f"# {name}: COMPILE FAILED ({type(e).__name__}: "
                  f"{str(e)[:160]})", flush=True)
    names = [n for n in names if n in compiled]

    def chain(fn, n):
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n):
            acc = acc + fn(variables, base, acc).astype(
                jnp.float32).sum() * 1e-9
        float(np.asarray(acc))
        return time.perf_counter() - t0

    for name in names:
        chain(compiled[name], 1)

    per_call = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            t_short = chain(compiled[name], 2)
            t_long = chain(compiled[name], 2 + args.n)
            per_call[name].append((t_long - t_short) / args.n)
        print(f"# rep {rep}: " + "  ".join(
            f"{n}={per_call[n][-1] * 1e3:.2f}ms" for n in names), flush=True)

    base_t = min(per_call["baseline"]) if "baseline" in per_call else None
    print(f"\nconfig: B={BATCH} K={FRAMES} chunk={FRAME_CHUNK} (bench.py)")
    for name in names:
        t = min(per_call[name])
        fps = BATCH * FRAMES / t
        rel = f"  ({base_t / t:.3f}x baseline)" if base_t else ""
        print(f"{name:20s} {t * 1e3:7.2f} ms/call  {fps:6.0f} f/s{rel}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
