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

# name -> (ModelConfig.replace overrides, frame_chunk, batch, frames)
# batch/frames default to --batch/--frames when None: per-call dispatch
# amortization is itself a variant axis (flattened B*chunk stays <= 64).
VARIANTS = {
    "default": ({}, 32, None, None),
    "tile_chunk64": ({"pos_mode": "tile"}, 64, None, None),
    "s2d_stem": ({"use_s2d_stem": True}, 32, None, None),
    "tile64+s2d": ({"pos_mode": "tile", "use_s2d_stem": True}, 64, None, None),
    "b4_chunk16": ({}, 16, 4, None),
    "b2_k128": ({}, 32, None, 128),
    "b4_k128": ({}, 16, 4, 128),
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

    names = [k for k in VARIANTS if args.only is None or k in args.only]
    size = base_cfg.arch.image_size
    # size the shared clip for the SELECTED variants only (a full-size
    # (4,128,224,224,3) alloc is ~150 MB bf16 even when benchmarking
    # small variants)
    max_b = max(VARIANTS[k][2] or BATCH for k in names)
    max_k = max(VARIANTS[k][3] or args.frames for k in names)
    base_clip = jax.random.normal(
        jax.random.PRNGKey(1), (max_b, max_k, size, size, 3),
        jnp.dtype(base_cfg.compute_dtype))
    fwds, clips, shapes = {}, {}, {}
    for name in names:
        overrides, chunk, b, k = VARIANTS[name]
        b, k = b or BATCH, k or args.frames
        shapes[name] = (b, k)
        clips[name] = base_clip[:b, :k]
        model = create_detector(base_cfg.replace(**overrides))
        fwds[name] = jax.jit(
            lambda v, c, a, m=model, ck=chunk: video_forward(
                m, v, c + a.astype(c.dtype), mode="dynamic", frame_chunk=ck,
                train=False, remat=False)[0]["logits"])

    def chain(name, n: int) -> float:
        fwd, clip = fwds[name], clips[name]
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n):
            acc = acc + fwd(variables, clip, acc).astype(jnp.float32).sum() * 1e-9
        float(np.asarray(acc))
        return time.perf_counter() - t0

    # compile + warm each variant, and cross-check outputs agree on the
    # common [BATCH, frames] prefix (per-frame logits are batch-row local)
    outs = {}
    for name in names:
        chain(name, 1)
        chain(name, N_SHORT)
        outs[name] = np.asarray(
            fwds[name](variables, clips[name], jnp.zeros((), jnp.float32)))
    ref = outs[names[0]]
    for name in names[1:]:
        # compare on the common batch prefix (either side may be smaller
        # depending on --only ordering)
        n = min(outs[name].shape[0], ref.shape[0])
        d = float(np.max(np.abs(outs[name][:n] - ref[:n])))
        print(f"# logits |Δ| vs {names[0]}: {name} = {d:.3e}"
              + ("  (pos rows differ by design)" if "tile" in name else "")
              + ("  (clip-mean over different K differs by design)"
                 if shapes[name][1] != shapes[names[0]][1] else ""))

    results = {name: {"short": [], "long": []} for name in names}
    for rep in range(args.reps):
        for name in names:
            results[name]["short"].append(chain(name, N_SHORT))
        for name in names:
            results[name]["long"].append(chain(name, N_LONG))

    print(f"# reps={args.reps} (min over reps, slope method)")
    for name in names:
        t_s, t_l = min(results[name]["short"]), min(results[name]["long"])
        per_call = (t_l - t_s) / (N_LONG - N_SHORT)
        b, k = shapes[name]
        fps = b * k / per_call
        print(f"{name:>16s} (B={b} K={k:3d}): {per_call * 1e3:7.2f} ms/call"
              f"  {fps:8.1f} f/s")
    return 0


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
