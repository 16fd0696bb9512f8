"""Sweep XLA:TPU compiler flags over the compiled train step (VERDICT r2 #7).

The train backward's remaining gap over ideal is a long tail of hundreds of
sub-0.5 ms backbone grad fusions (BASELINE.md train-step attribution) — a
fusion/scheduling-shaped problem, so the next cheap lever is the compiler's
own fusion knobs. This harness AOT-compiles the SAME lowered train step under
each flag set (``jit(...).lower(...).compile(compiler_options=...)``) and
slope-times them interleaved in one process (cross-process numbers on
identical code swing ~15% with tunnel state — CLAUDE.md / tools/bench_ab.py).

Unknown flags on this libtpu raise at compile; they are caught and reported
as ``unknown-flag`` rather than crashing the sweep.

Usage: python tools/bench_train_flags.py [--frames 64] [--chunk 64]
       [--no-remat] [--pos-mode tile] [--reps 3] [--n 6]
(defaults = the round-2 best recipe: tile chunk=64 K=64 no-remat)
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

# Each entry: (name, {flag: value}). Baseline first — every comparison is
# against it within the same interleaved process.
FLAG_SETS = [
    ("baseline", {}),
    # Bigger per-fusion VMEM budget -> fewer, fatter fusions (the long tail
    # is many small ones). v5e has 128 MiB VMEM/core; default scoped limit
    # is ~16 MiB.
    ("vmem_48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    # Loop-fusion layout aggressiveness (fuses through layout changes).
    ("aggr_loop_fusion",
     {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
    # Reduce+broadcast fusion off (SE-mean chains re-broadcast; check the
    # default isn't hurting the backward).
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    # Dot strength reduction off (small 18/54-lane contractions may be
    # getting strength-reduced onto the VPU).
    ("no_dot_sr", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    # Allow duplicating a dot into multiple consumers' fusions.
    ("dot_dot_fusion", {"xla_tpu_dot_dot_fusion_duplicated": "true"}),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--mode", default="dynamic")
    ap.add_argument("--no-remat", action="store_true", default=True)
    ap.add_argument("--remat", dest="no_remat", action="store_false")
    ap.add_argument("--pos-mode", default="tile",
                    choices=["reference", "tile"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n", type=int, default=6,
                    help="steps per timed chain (slope vs a 2-step chain)")
    ap.add_argument("--only", nargs="*", default=None,
                    help="flag-set names to run (default: all)")
    args = ap.parse_args()

    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.models.detector import init_detector
    from ewvit_tpu.train.optimizer import make_optimizer
    from ewvit_tpu.train.steps import create_train_state, train_step

    cfg = ModelConfig(pos_mode=args.pos_mode)
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(variables["params"], lr=1e-4, weight_decay=1e-4,
                        epochs=30, steps_per_epoch=100)
    state, _ = create_train_state(variables, tx)

    size = cfg.arch.image_size
    bt = args.batch * args.accum
    frames = jax.random.normal(
        jax.random.PRNGKey(1), (bt, args.frames, size, size, 3),
        jnp.dtype(cfg.compute_dtype))
    labels = jnp.ones((bt,), jnp.float32)

    # Non-donated step: one shared start state, each chain threads its own
    # serial dependency (live set = shared + one threaded state).
    lowered = train_step.lower(
        state, frames, labels, jax.random.PRNGKey(2), model=model, tx=tx,
        mode=args.mode, frame_chunk=args.chunk, accum_steps=args.accum,
        pos_weight=1.2, epoch=10, max_epochs=30, remat=not args.no_remat,
        remat_policy=None, unroll=1, grad_dtype=None)

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
        st = state
        rng = jax.random.PRNGKey(3)
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            rng, key = jax.random.split(rng)
            # AOT-compiled call: must repeat the traced (non-static) kwargs
            # the step was lowered with, with identical values/pytree
            st, m = fn(st, frames, labels, key,
                       pos_weight=1.2, epoch=10, max_epochs=30)
        float(np.asarray(m["loss"]))       # one host pull
        return time.perf_counter() - t0

    for name in names:                     # warm every variant once
        chain(compiled[name], 1)

    per_step = {n: [] for n in names}
    for rep in range(args.reps):           # interleaved round-robin
        for name in names:
            t_short = chain(compiled[name], 2)
            t_long = chain(compiled[name], 2 + args.n)
            per_step[name].append((t_long - t_short) / args.n)
        print(f"# rep {rep}: " + "  ".join(
            f"{n}={per_step[n][-1] * 1e3:.1f}ms" for n in names), flush=True)

    base = min(per_step["baseline"]) if "baseline" in per_step else None
    print(f"\nconfig: B={args.batch} K={args.frames} chunk={args.chunk} "
          f"accum={args.accum} remat={not args.no_remat} "
          f"pos_mode={args.pos_mode}")
    for name in names:
        t = min(per_step[name])
        fps = bt * args.frames / t
        rel = f"  ({base / t:.3f}x baseline)" if base else ""
        print(f"{name:20s} {t * 1e3:7.1f} ms/step  {fps:6.0f} f/s{rel}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
