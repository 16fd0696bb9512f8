"""Measure train-step throughput (frames/sec trained) on the real chip.

TPU-native counterpart of the reference's training hot loop
(/root/reference/train.py:93-140: forward + backward + Adam step with
grad accumulation); the reference never publishes a number for it
(SURVEY.md §6). Slope-method timing (serial chain over the carried
TrainState, one host pull at the end — see bench.py / CLAUDE.md for why
block_until_ready cannot be trusted through the axon tunnel).

Usage: python tools/bench_train_step.py [--batch 2] [--frames 16]
       [--chunk 16] [--accum 2] [--mode dynamic]
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
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/ewvit_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--mode", default="dynamic")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--remat-policy", default=None, choices=[None, "dots"])
    ap.add_argument("--unroll", type=int, default=1,
                    help="micro-batch scan unroll factor")
    ap.add_argument("--donate", action="store_true",
                    help="donate the TrainState buffers (in-place update)")
    ap.add_argument("--bf16-grads", action="store_true",
                    help="accumulate gradients in bfloat16")
    ap.add_argument("--pos-mode", default="reference",
                    choices=["reference", "tile"])
    ap.add_argument("--s2d-stem", action="store_true")
    ap.add_argument("--n1", type=int, default=2)
    ap.add_argument("--n2", type=int, default=8)
    args = ap.parse_args()

    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.models.detector import init_detector
    from ewvit_tpu.train.optimizer import make_optimizer
    from ewvit_tpu.train.steps import (
        create_train_state, train_step, train_step_donated)

    cfg = ModelConfig(pos_mode=args.pos_mode, use_s2d_stem=args.s2d_stem)
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

    step_fn = train_step_donated if args.donate else train_step

    def step(st, rng):
        st, metrics = step_fn(
            st, frames, labels, rng, model=model, tx=tx, mode=args.mode,
            frame_chunk=args.chunk, accum_steps=args.accum,
            pos_weight=1.2, epoch=10, max_epochs=30,
            remat=not args.no_remat, remat_policy=args.remat_policy,
            unroll=args.unroll,
            grad_dtype="bfloat16" if args.bf16_grads else None)
        return st, metrics

    def chain(n, st):
        rng = jax.random.PRNGKey(2)
        t0 = time.perf_counter()
        m = None
        for i in range(n):
            rng, key = jax.random.split(rng)
            st, m = step(st, key)          # serial dependency via state
        float(np.asarray(m["loss"]))       # one host pull
        return time.perf_counter() - t0, st

    _, st = chain(1, state)                # compile
    _, st = chain(args.n1, st)             # warm

    def timed(n, st, reps=2):
        # thread the state through every rep: with --donate the previous
        # state's buffers are gone after each chain
        ts = []
        for _ in range(reps):
            t, st = chain(n, st)
            ts.append(t)
        return min(ts), st

    t1, st = timed(args.n1, st)
    t2, st = timed(args.n2, st)
    per_step = (t2 - t1) / (args.n2 - args.n1)
    fps = bt * args.frames / per_step
    print(f"train_step ({args.mode}, B={args.batch} K={args.frames} "
          f"chunk={args.chunk} accum={args.accum} "
          f"remat={not args.no_remat} policy={args.remat_policy} "
          f"unroll={args.unroll} donate={args.donate} "
          f"bf16_grads={args.bf16_grads}): "
          f"{per_step * 1e3:.1f} ms/step = {fps:.0f} frames/sec trained")
    return 0


if __name__ == "__main__":
    sys.exit(main())
