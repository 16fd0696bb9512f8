"""Interleaved in-model A/B bench for inference variants (one process).

Cross-process throughput numbers on IDENTICAL code swing 4.3-5.0k f/s with
tunnel/host state (BASELINE.md round-2 notes), so variant comparisons are
only trusted when interleaved within one process. This tool builds N
variants of the flagship dynamic forward — each a (ModelConfig overrides,
frame_chunk) pair sharing ONE parameter tree — and times them round-robin
with the serial-chain slope method from bench.py.

Usage:
    python tools/bench_ab.py                      # the VARIANTS table below
    python tools/bench_ab.py --reps 3 --frames 64

Edit VARIANTS to define an experiment; keep "default" as the control.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ewvit_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# name -> (ModelConfig.replace overrides, video_forward frame_chunk)
VARIANTS = {
    "default": ({}, 32),
    "tile_chunk64": ({"pos_mode": "tile"}, 64),
    "s2d_stem": ({"use_s2d_stem": True}, 32),
    "tile64+s2d": ({"pos_mode": "tile", "use_s2d_stem": True}, 64),
}

BATCH = 2
N_SHORT, N_LONG = 2, 12


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of VARIANTS keys to run")
    args = ap.parse_args()

    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.models.detector import create_detector, init_detector, video_forward
    from ewvit_tpu.utils.params import cast_kernels_for_inference

    base_cfg = ModelConfig()
    _, variables = init_detector(base_cfg, jax.random.PRNGKey(0))
    variables = cast_kernels_for_inference(variables, base_cfg.compute_dtype)

    size = base_cfg.arch.image_size
    clip = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, args.frames, size, size, 3),
        jnp.dtype(base_cfg.compute_dtype))

    names = [k for k in VARIANTS if args.only is None or k in args.only]
    fwds = {}
    for name in names:
        overrides, chunk = VARIANTS[name]
        model = create_detector(base_cfg.replace(**overrides))
        fwds[name] = jax.jit(
            lambda v, c, a, m=model, ck=chunk: video_forward(
                m, v, c + a.astype(c.dtype), mode="dynamic", frame_chunk=ck,
                train=False, remat=False)[0]["logits"])

    def chain(fwd, n: int) -> float:
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n):
            acc = acc + fwd(variables, clip, acc).astype(jnp.float32).sum() * 1e-9
        float(np.asarray(acc))
        return time.perf_counter() - t0

    # compile + warm each variant, and cross-check outputs agree
    outs = {}
    for name in names:
        chain(fwds[name], 1)
        chain(fwds[name], N_SHORT)
        outs[name] = np.asarray(
            fwds[name](variables, clip, jnp.zeros((), jnp.float32)))
    ref = outs[names[0]]
    for name in names[1:]:
        d = float(np.max(np.abs(outs[name] - ref)))
        print(f"# logits |Δ| vs {names[0]}: {name} = {d:.3e}"
              + ("  (pos rows differ by design)" if "tile" in name else ""))

    results = {name: {"short": [], "long": []} for name in names}
    for rep in range(args.reps):
        for name in names:
            results[name]["short"].append(chain(fwds[name], N_SHORT))
        for name in names:
            results[name]["long"].append(chain(fwds[name], N_LONG))

    print(f"# B={BATCH} K={args.frames} reps={args.reps} "
          f"(min over reps, slope method)")
    for name in names:
        t_s, t_l = min(results[name]["short"]), min(results[name]["long"])
        per_call = (t_l - t_s) / (N_LONG - N_SHORT)
        fps = BATCH * args.frames / per_call
        print(f"{name:>16s}: {per_call * 1e3:7.2f} ms/call  {fps:8.1f} f/s")
    return 0


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
