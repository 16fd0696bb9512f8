"""Sweep XLA:TPU compiler flags over the compiled INFERENCE program (VERDICT r3 #4a).

The headline margin over the 5,000 f/s north star is ~2% while cross-process
tunnel swing is larger; the train-side flag sweep (tools/bench_train_flags.py,
BASELINE.md) was all-negative, but the inference program is a different
(forward-only, conv-dominated) schedule, so the fusion knobs get their own
measurement. This harness AOT-compiles bench.py's EXACT forward program
(serial dependency folded inside the jit, same shapes/dtypes) under each flag
set (``jit(...).lower(...).compile(compiler_options=...)``) and slope-times
them interleaved in one process (cross-process numbers on identical code swing
~15% with tunnel state — CLAUDE.md).

``no_dot_sr`` from the train sweep is omitted: disabling dot strength
reduction was a catastrophic 1.55x train regression on the same small
18/54-lane contractions this forward also contains.

Note AOT ``lowered.compile(compiler_options=...)`` BYPASSES the persistent
compile cache — every variant pays its full compile each run.

Usage: python tools/bench_infer_flags.py [--reps 4] [--only baseline vmem_48m]
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

# NO persistent compile cache here: a second run of this harness hits the
# cache for its AOT lowered.compile() calls ("compiled in 1s") and the first
# EXECUTION of the deserialized executable then hangs indefinitely through
# the axon tunnel (observed 2026-08-21: 4 cache-hit variants, warmup chain
# never returned in 18 min; the fresh-compile run minutes earlier timed all
# 6 variants fine). Fresh compiles each run are the price of reliability.

# bench.py's headline config — measure what we ship.
BATCH = 2
FRAMES = 64
FRAME_CHUNK = 32
N_SHORT, N_LONG = 2, 12

FLAG_SETS = [
    ("baseline", {}),
    # Bigger per-fusion VMEM budget -> fewer, fatter fusions.
    ("vmem_48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    # Loop-fusion layout aggressiveness (fuses through layout changes).
    ("aggr_loop_fusion",
     {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
    # Reduce+broadcast fusion off (SE-mean chains re-broadcast).
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    # Allow duplicating a dot into multiple consumers' fusions.
    ("dot_dot_fusion", {"xla_tpu_dot_dot_fusion_duplicated": "true"}),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
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

    # Identical to bench.py's fwd: serial dependency through the scalar `a`
    # added to the clip INSIDE the jit so the chain has a real data
    # dependency without materializing a fresh clip per call.
    def fwd_fn(v, c, a):
        return video_forward(
            model, v, c + a.astype(c.dtype), mode="dynamic",
            frame_chunk=FRAME_CHUNK, train=False, remat=False)[0]["logits"]

    acc0 = jnp.zeros((), jnp.float32)
    lowered = jax.jit(fwd_fn).lower(variables, base, acc0)

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
        except Exception as e:  # unknown flag / compile failure
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

    for name in names:                     # warm every variant + pull path
        chain(compiled[name], 1)

    shorts = {n: [] for n in names}
    longs = {n: [] for n in names}
    for rep in range(args.reps):           # interleaved round-robin
        for name in names:
            shorts[name].append(chain(compiled[name], N_SHORT))
            longs[name].append(chain(compiled[name], N_LONG))
        print(f"# rep {rep}: " + "  ".join(
            f"{n}={(longs[n][-1] - shorts[n][-1]) / (N_LONG - N_SHORT) * 1e3:.1f}ms"
            for n in names), flush=True)

    # min(t_long) - min(t_short) across reps, NOT min of per-pair slopes:
    # a single inflated t_short in one pair fakes a small slope (= a fake
    # win); independent minima reject inflation on both ends (bench.py's
    # documented policy).
    def slope(name):
        return (min(longs[name]) - min(shorts[name])) / (N_LONG - N_SHORT)

    base_t = slope("baseline") if "baseline" in names else None
    print(f"\nconfig: B={BATCH} K={FRAMES} chunk={FRAME_CHUNK} 224px bf16")
    for name in names:
        t = slope(name)
        if t <= 0:
            print(f"{name:20s} non-positive slope (glitched)")
            continue
        fps = BATCH * FRAMES / t
        rel = f"  ({base_t / t:.3f}x baseline)" if base_t and base_t > 0 else ""
        print(f"{name:20s} {t * 1e3:7.2f} ms/call  {fps:6.0f} f/s{rel}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
