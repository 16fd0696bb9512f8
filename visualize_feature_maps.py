#!/usr/bin/env python
"""Feature-map / attention visualizer for one input image.

Rebuild of the reference hook-based visualizer
(/root/reference/utils/visualize_feature_maps.py:25-198) the JAX way: instead
of forward hooks and monkey-patched ``CrossAttention.forward`` (:37-54), the
DAMA module returns intermediates explicitly (``return_intermediates=True``)
and flax ``capture_intermediates`` records every submodule output — no
mutation, works under jit. Renders overlay heatmaps for: backbone early
features, MWT level-0 highpass energy, SFE/MWT descriptors, fused map, gate
weights, and the bidirectional cross-attention matrices.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Visualize DAMA feature maps")
    p.add_argument("--image", required=True, help="Input image path")
    p.add_argument("--model-path", default=None,
                   help="Checkpoint (omit for fresh init)")
    p.add_argument("--output", default="./output/feature_maps")
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--tiny", action="store_true",
                   help="ModelConfig.tiny() (64px) — smoke tests / CI only")
    return p.parse_args()


def _overlay(img_u8: np.ndarray, heat: np.ndarray, path: str, title: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    heat = heat.astype(np.float32)
    heat = (heat - heat.min()) / (np.ptp(heat) + 1e-8)
    fig, axes = plt.subplots(1, 2, figsize=(8, 4))
    axes[0].imshow(img_u8); axes[0].set_title("input"); axes[0].axis("off")
    axes[1].imshow(img_u8)
    axes[1].imshow(heat, cmap="jet", alpha=0.5,
                   extent=(0, img_u8.shape[1], img_u8.shape[0], 0))
    axes[1].set_title(title); axes[1].axis("off")
    fig.tight_layout(); fig.savefig(path, dpi=120); plt.close(fig)


def _grid(mats, path: str, title: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(mats)
    fig, axes = plt.subplots(1, n, figsize=(3 * n, 3))
    if n == 1:
        axes = [axes]
    for ax, (name, m) in zip(axes, mats):
        ax.imshow(m, cmap="viridis"); ax.set_title(name, fontsize=8)
    fig.suptitle(title)
    fig.tight_layout(); fig.savefig(path, dpi=120); plt.close(fig)


def main():
    args = parse_args()
    os.makedirs(args.output, exist_ok=True)

    from ewvit_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import cv2
    import jax
    import jax.numpy as jnp

    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.data.transforms import FrameTransform
    from ewvit_tpu.evaluation import load_model
    from ewvit_tpu.models.dama import DAMA
    from ewvit_tpu.ops.preprocess import preprocess_batch

    cfg = (ModelConfig.tiny() if args.tiny
           else ModelConfig(dama_dim=args.dim))
    model, variables = load_model(args.model_path, cfg)

    size = cfg.arch.image_size
    img = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
    crop = FrameTransform(resize=max(1, round(size * 450 / 224)),
                          crop=size)(img)  # [size, size, 3] uint8
    x = preprocess_batch(jnp.asarray(crop[None, None]), train=False,
                         dtype_name="float32")[:, 0]  # [1, 224, 224, 3]

    # Run ONLY the DAMA per-frame path (≙ DAMA._process_frame at
    # visualize_feature_maps.py:167-168), capturing every submodule output.
    dama_vars = {"params": variables["params"]["dama"]}
    if "batch_stats" in variables:
        dama_vars["batch_stats"] = variables["batch_stats"]["dama"]
    dama = DAMA(arch=cfg.arch, in_channels=cfg.in_channels, dim=cfg.dama_dim,
                num_heads=cfg.num_heads, levels=cfg.levels)
    out, state = dama.apply(
        dama_vars, x, train=False, return_intermediates=True,
        capture_intermediates=True, mutable=["intermediates"])

    inter = out["intermediates"]
    cap = state["intermediates"]

    # 1) backbone early features: first captured conv output of the V2-S stem
    stem = np.asarray(
        cap["sfe"]["efficient_net"]["net"]["stem"]["__call__"][0],
        np.float32)  # [1, 112, 112, C]
    _overlay(crop, np.abs(stem[0]).mean(-1),
             os.path.join(args.output, "backbone_stem.png"),
             "V2-S stem |activation|")

    # 2) MWT level-0 highpass energy. The eval-mode "level" fast path folds
    # hf_fusion into block-diagonal convs (its captured __call__ entries are
    # parameter TUPLES, not feature maps — regression caught by
    # test_feature_map_cli), so run the MWT branch separately in its
    # reference form, which exposes the map as an explicit intermediate
    # (models/mwt.py hf_level0).
    from ewvit_tpu.models.mwt import MWT

    mwt_vars = {"params": variables["params"]["dama"]["mwt"]}
    if "batch_stats" in variables:
        mwt_vars["batch_stats"] = variables["batch_stats"]["dama"]["mwt"]
    mwt = MWT(in_channels=cfg.in_channels, dama_dim=cfg.dama_dim,
              levels=cfg.levels)
    _, mwt_inter = mwt.apply(mwt_vars, x, train=False,
                             return_intermediates=True)
    hf0 = np.asarray(mwt_inter["hf_level0"], np.float32)
    _overlay(crop, np.abs(hf0[0]).mean(-1),
             os.path.join(args.output, "mwt_hf_level0.png"),
             "MWT level-0 highpass")

    # 3) gate weights + descriptors
    gate = np.asarray(inter["gate_weights"], np.float32)[0]
    with open(os.path.join(args.output, "gate_weights.txt"), "w") as f:
        f.write(f"space={gate[0]:.4f} freq={gate[1]:.4f} fused={gate[2]:.4f}\n")
    print(f"gate weights: space={gate[0]:.4f} freq={gate[1]:.4f} "
          f"fused={gate[2]:.4f}")

    # 4) cross-attention matrices (2 layers x 2 directions, head-averaged)
    attns = inter["attention"]
    mats = []
    for i, a in enumerate(attns):
        a = np.asarray(a, np.float32)[0]  # [heads, q, k]
        direction = "space->freq" if i % 2 == 0 else "freq->space"
        mats.append((f"L{i // 2} {direction}", a.mean(0)))
    _grid(mats, os.path.join(args.output, "cross_attention.png"),
          "bidirectional cross-attention (head-avg)")

    print(f"Wrote visualizations to {args.output}")


if __name__ == "__main__":
    main()
