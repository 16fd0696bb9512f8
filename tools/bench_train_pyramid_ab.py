"""Interleaved A/B: fused_train_pyramid on/off on the real chip.

The round-3 flag sweep came back all-negative, so this is the VERDICT r3 #1
structural experiment: the train-mode block-diagonal hf_sep conv
(models/mwt.py level_merged_block — 9 low-channel 112² convs -> 3 in
forward AND backward, per-slice BN, exactness-tested in
tests/test_models.py::test_mwt_fused_train_pyramid_matches_per_level)
measured at the best known recipe (tile chunk=64 K=64 no-remat, BASELINE.md
1,173 f/s row). Both variants share one process and one parameter tree;
slope-method timing interleaved per rep.

Usage: python tools/bench_train_pyramid_ab.py [--reps 3] [--n 6]
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
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--remat", action="store_true",
                    help="default is the no-remat best recipe")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n", type=int, default=6)
    args = ap.parse_args()

    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.models.detector import create_detector, init_detector
    from ewvit_tpu.train.optimizer import make_optimizer
    from ewvit_tpu.train.steps import create_train_state, train_step

    cfg_off = ModelConfig(pos_mode="tile")
    cfg_on = cfg_off.replace(fused_train_pyramid=True)
    model_off, variables = init_detector(cfg_off, jax.random.PRNGKey(0))
    model_on = create_detector(cfg_on)  # same parameter tree, new compute
    tx = make_optimizer(variables["params"], lr=1e-4, weight_decay=1e-4,
                        epochs=30, steps_per_epoch=100)
    state, _ = create_train_state(variables, tx)

    size = cfg_off.arch.image_size
    bt = args.batch * args.accum
    frames = jax.random.normal(
        jax.random.PRNGKey(1), (bt, args.frames, size, size, 3),
        jnp.dtype(cfg_off.compute_dtype))
    labels = jnp.ones((bt,), jnp.float32)

    def make_fn(model):
        def fn(st, key):
            return train_step(
                st, frames, labels, key, model=model, tx=tx,
                mode="dynamic", frame_chunk=args.chunk,
                accum_steps=args.accum, pos_weight=1.2, epoch=10,
                max_epochs=30, remat=args.remat)
        return fn

    fns = {"off": make_fn(model_off), "on": make_fn(model_on)}

    def chain(fn, n):
        st = state
        rng = jax.random.PRNGKey(3)
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            rng, key = jax.random.split(rng)
            st, m = fn(st, key)
        float(np.asarray(m["loss"]))
        return time.perf_counter() - t0

    for name, fn in fns.items():
        t0 = time.perf_counter()
        chain(fn, 1)
        print(f"# compiled+warm {name} in {time.perf_counter() - t0:.0f}s",
              flush=True)

    per_step = {n: [] for n in fns}
    for rep in range(args.reps):
        for name, fn in fns.items():
            t_short = chain(fn, 2)
            t_long = chain(fn, 2 + args.n)
            d = (t_long - t_short) / args.n
            if d > 0:
                per_step[name].append(d)
        print(f"# rep {rep}: " + "  ".join(
            f"{n}={per_step[n][-1] * 1e3:.1f}ms" if per_step[n] else f"{n}=?"
            for n in fns), flush=True)

    print(f"\nconfig: B={args.batch} K={args.frames} chunk={args.chunk} "
          f"accum={args.accum} remat={args.remat} pos_mode=tile")
    base = min(per_step["off"]) if per_step["off"] else None
    for name in fns:
        if not per_step[name]:
            print(f"{name:4s} no valid slope (tunnel glitch)")
            continue
        t = min(per_step[name])
        fps = bt * args.frames / t
        rel = f"  ({base / t:.3f}x off)" if base else ""
        print(f"{name:4s} {t * 1e3:7.1f} ms/step  {fps:6.0f} f/s{rel}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
