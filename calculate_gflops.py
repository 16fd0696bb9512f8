#!/usr/bin/env python
"""Analytic FLOPs + parameter count per ablation mode.

Rebuild of the reference thop profiler
(/root/reference/utils/calculate_gflops.py:6-21, :23-61) using XLA's own cost
model: ``jax.jit(fn).lower(args).compile().cost_analysis()`` — the numbers come
from the compiled HLO, so fusion and layout choices are reflected (more honest
than thop's per-module accounting). Defaults match the reference: batch 1,
24 frames, 224px (calculate_gflops.py:36-44).
"""

from __future__ import annotations

import argparse

MODES = ["dynamic", "sfe_only", "sfe_mwt"]


def parse_args():
    p = argparse.ArgumentParser(
        description="Calculate GFLOPs for model ablations (XLA cost model)")
    p.add_argument("--ablation", type=str, default="all",
                   choices=MODES + ["all"])
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--frame-count", type=int, default=24)
    p.add_argument("--frame-chunk", type=int, default=24)
    p.add_argument("--tiny", action="store_true",
                   help="ModelConfig.tiny() (64px) — smoke tests / CI only")
    return p.parse_args()


def main():
    args = parse_args()

    from ewvit_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import jax
    import jax.numpy as jnp

    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.models.detector import init_detector, video_forward

    cfg = (ModelConfig.tiny() if args.tiny
           else ModelConfig(frame_chunk=args.frame_chunk))
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(variables["params"]))

    size = cfg.arch.image_size
    clip = jnp.zeros(
        (args.batch_size, args.frame_count, size, size, 3),
        jnp.dtype(cfg.compute_dtype))

    modes = MODES if args.ablation == "all" else [args.ablation]
    print(f"Parameters: {n_params / 1e6:.2f}M "
          f"(input {args.batch_size}x{args.frame_count}x{size}x{size}x3)")
    for mode in modes:
        def forward(variables, clip, _mode=mode):
            out, _ = video_forward(
                model, variables, clip, mode=_mode,
                frame_chunk=min(args.frame_chunk, args.frame_count),
                train=False, remat=False)
            return out["logits"]

        compiled = jax.jit(forward).lower(variables, clip).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = cost.get("flops", float("nan"))
        bytes_ = cost.get("bytes accessed", float("nan"))
        print(f"  {mode:>9}: {flops / 1e9:.2f} GFLOPs, "
              f"{bytes_ / 1e9:.3f} GB HBM traffic "
              f"({flops / max(bytes_, 1):.1f} FLOPs/byte)")


if __name__ == "__main__":
    main()
