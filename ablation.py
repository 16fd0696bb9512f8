#!/usr/bin/env python
"""Ablation study runner: sfe_only vs sfe_mwt vs dynamic.

CLI-compatible rebuild of the reference ablation harness
(/root/reference/ablation.py:23-33 flags; :261-418 orchestration): trains a
fresh detector per mode in order [sfe_only, sfe_mwt, dynamic] (:332) with
plain BCE (:352) — no grad accumulation, no orthogonality loss, no curriculum
— keeps the best-val-AUC parameters (:108-113), saves ``{mode}_model`` per
mode (:378), evaluates on the test split (:382-389), and writes learning-curve
plots, ROC overlays, a ``metrics_comparison.csv`` table, and a config dump
into a timestamped output dir (:269-271, :402-416).
"""

from __future__ import annotations

import argparse
import csv
import os
import random
import time

import numpy as np

MODES = ["sfe_only", "sfe_mwt", "dynamic"]


def parse_args():
    p = argparse.ArgumentParser(
        description="Deepfake Detection Ablation Study (TPU)")
    p.add_argument("--root", type=str, default="/path/to/dataset")
    p.add_argument("--output", type=str, default="./output/ablation")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--frame-count", type=int, default=300)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--frame-chunk", type=int, default=16)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--tiny", action="store_true",
                   help="ModelConfig.tiny() (64px) — smoke tests / CI only")
    return p.parse_args()


def main():
    args = parse_args()
    random.seed(args.seed)
    np.random.seed(args.seed)

    from ewvit_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import jax
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import yaml

    from ewvit_tpu.configs import ModelConfig, TrainConfig
    from ewvit_tpu.data.datasets import FaceForensicsDataset
    from ewvit_tpu.data.pipeline import BatchLoader
    from ewvit_tpu.data.transforms import FrameTransform
    from ewvit_tpu.train.checkpoint import device_snapshot_state
    from ewvit_tpu.train.loop import Trainer

    out_dir = os.path.join(
        args.output, time.strftime("%Y%m%d_%H%M%S"))
    os.makedirs(out_dir, exist_ok=True)

    if args.tiny:
        model_cfg = ModelConfig.tiny()
    else:
        model_cfg = ModelConfig(dama_dim=args.dim,
                                frame_chunk=args.frame_chunk)
    size = model_cfg.arch.image_size
    transform = FrameTransform(resize=max(1, round(size * 450 / 224)),
                               crop=size)
    datasets = {
        split: FaceForensicsDataset(
            args.root, split=split, frame_count=args.frame_count,
            transform=transform, seed=args.seed)
        for split in ("train", "val", "test")
    }
    loaders = {
        "train": BatchLoader(datasets["train"], args.batch_size, shuffle=True,
                             drop_last=True, num_workers=args.num_workers,
                             seed=args.seed),
        "val": BatchLoader(datasets["val"], args.batch_size, pad_last=True,
                           num_workers=args.num_workers),
        "test": BatchLoader(datasets["test"], args.batch_size, pad_last=True,
                            num_workers=args.num_workers),
    }

    # Reference ablation trains with plain BCE and NO extras
    # (ablation.py:352, no accum / orth / curriculum).
    train_cfg = TrainConfig(
        batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
        frame_count=args.frame_count, accum_steps=1, seed=args.seed,
        orth_start_frac=10.0,  # λ gate never opens => pure BCE
    )

    results = {}
    curves = {}
    roc_data = {}
    for mode in MODES:
        print(f"\n======== Ablation: {mode} ========")
        trainer = Trainer(
            model_cfg, train_cfg, mode=mode, pos_weight=1.0,
            steps_per_epoch=len(loaders["train"]),
            checkpoint_dir=os.path.join(out_dir, f"{mode}_model"),
            rng=jax.random.PRNGKey(args.seed))
        hist = {"train_loss": [], "val_loss": [], "val_auc": []}
        best_auc, best_state = -1.0, None
        for epoch in range(args.epochs):
            tr = trainer.train_epoch(loaders["train"], epoch)
            va = trainer.eval_epoch(loaders["val"])
            auc = va.metrics.get("auc", float("nan"))
            hist["train_loss"].append(tr.loss)
            hist["val_loss"].append(va.loss)
            hist["val_auc"].append(auc)
            print(f"  epoch {epoch + 1}/{args.epochs}: train {tr.loss:.4f} "
                  f"val {va.loss:.4f} auc {auc:.4f}")
            if np.isfinite(auc) and auc > best_auc:
                # snapshot, don't alias: the next epoch's train_step DONATES
                # the live state's buffers (deleted on TPU; checkpoint.py)
                best_auc = float(auc)
                best_state = device_snapshot_state(trainer.state)
        if best_state is not None:  # best-val params for testing (:108-113)
            trainer.state = best_state
        trainer.ckpt.save_best(trainer.state, args.epochs - 1, best_auc)

        te = trainer.eval_epoch(loaders["test"])
        m = te.metrics
        results[mode] = {
            "accuracy": m["accuracy"], "precision": m["precision"],
            "f1": m["f1"], "auc": m["auc"],
        }
        curves[mode] = hist
        roc_data[mode] = (m["labels"], m["preds"])
        print(f"  test: acc {m['accuracy']:.4f} auc {m['auc']:.4f}")

    # learning curves (ablation.py:171-219)
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for ax, key in zip(axes, ("train_loss", "val_loss", "val_auc")):
        for mode in MODES:
            ax.plot(range(1, args.epochs + 1), curves[mode][key], label=mode)
        ax.set_title(key); ax.set_xlabel("epoch"); ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "learning_curves.png"), dpi=120)
    plt.close(fig)

    # ROC overlay (ablation.py:221-240)
    from sklearn.metrics import auc as sk_auc, roc_curve

    fig, ax = plt.subplots(figsize=(6, 6))
    for mode in MODES:
        labels, preds = roc_data[mode]
        if len(set(labels)) > 1:
            fpr, tpr, _ = roc_curve(labels, preds)
            ax.plot(fpr, tpr, label=f"{mode} (AUC={sk_auc(fpr, tpr):.4f})")
    ax.plot([0, 1], [0, 1], "k--", lw=0.8)
    ax.set_xlabel("FPR"); ax.set_ylabel("TPR"); ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "roc_curves.png"), dpi=120)
    plt.close(fig)

    # metrics table (ablation.py:242-259)
    with open(os.path.join(out_dir, "metrics_comparison.csv"), "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["mode", "accuracy", "precision", "f1", "auc"])
        for mode in MODES:
            r = results[mode]
            w.writerow([mode, r["accuracy"], r["precision"], r["f1"],
                        r["auc"]])

    # config dump (ablation.py:415-416)
    with open(os.path.join(out_dir, "config.yaml"), "w") as f:
        yaml.safe_dump({
            "root": args.root, "batch_size": args.batch_size,
            "epochs": args.epochs, "lr": args.lr, "dim": args.dim,
            "frame_count": args.frame_count, "seed": args.seed,
            "modes": MODES,
        }, f)

    print(f"\nAblation results written to {out_dir}")
    for mode, r in results.items():
        print(f"  {mode:>9}: acc {r['accuracy']:.4f} auc {r['auc']:.4f}")


if __name__ == "__main__":
    main()
