#!/usr/bin/env python
"""Overlay ROC curves of multiple checkpoints / baselines on Celeb-DF test.

Rebuild of the reference comparison tool
(/root/reference/utils/plot_celebdf_roc.py:15-192): evaluates N model
checkpoints on the Celeb-DF-v2 test split (video-level, or per-frame with
``--per-frame`` ≙ :31-72) and overlays their ROC curves. The reference's
hard import of a gitignored Xception package (:13) becomes a pluggable
baseline interface: ``--baseline-scores name=path.csv`` overlays any
externally-computed (label, score) CSV — Xception or otherwise.
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(
        description="Celeb-DF ROC comparison across checkpoints")
    p.add_argument("--root", "--r", type=str, default=None,
                   help="dataset root (required unless only baseline CSVs)")
    p.add_argument("--model-paths", "--mp", nargs="*", default=[],
                   help="name=checkpoint_path pairs (or bare paths)")
    p.add_argument("--tiny", action="store_true",
                   help="ModelConfig.tiny() (64px) — smoke tests / CI only")
    p.add_argument("--test-list", "--tl", type=str,
                   default="Celeb-DF-v2/List_of_testing_videos.txt")
    p.add_argument("--output", "--o", type=str, default="./output/roc")
    p.add_argument("--batch-size", "--bs", type=int, default=8)
    p.add_argument("--frame-count", "--fc", type=int, default=30)
    p.add_argument("--dim", "--d", type=int, default=128)
    p.add_argument("--per-frame", action="store_true",
                   help="score every frame independently (K=1 clips)")
    p.add_argument("--baseline-scores", nargs="*", default=[],
                   help="name=csv pairs with label,score columns")
    p.add_argument("--num-workers", type=int, default=4)
    return p.parse_args()


class PerFrameLoader:
    """Expands clip batches to per-frame clips: ``[B,K,...] -> [B*K,1,...]``.

    One score per frame of EVERY video — the reference's per-frame mode
    runs each frame as its own [1,1,C,H,W] clip
    (/root/reference/utils/plot_celebdf_roc.py:31-72, ``for n in range(N)``
    per video). Batching all B*K frames into one forward is exact because
    the model runs with ``pos_mode='row0'``: every row gets positional row
    0, exactly what each frame sees in the reference's N=1 loop. Labels
    repeat K times; row order is preserved, so ``evaluate``'s pad-row
    trimming keeps working against the expanded ``true_len()``.
    """

    def __init__(self, loader, frame_count: int):
        self._loader = loader
        self.frame_count = frame_count

    def __len__(self):
        return len(self._loader)

    def true_len(self) -> int:
        """Real item count under expansion (loader protocol, pipeline.py)."""
        return self._loader.true_len() * self.frame_count

    def __iter__(self):
        for frames, labels in self._loader:
            b, k = frames.shape[:2]
            yield (frames.reshape(b * k, 1, *frames.shape[2:]),
                   np.repeat(np.asarray(labels), k))


def _load_baseline_csv(path: str):
    labels, scores = [], []
    with open(path) as f:
        for row in csv.DictReader(f):
            labels.append(int(float(row["label"])))
            scores.append(float(row["score"]))
    return labels, scores


def main():
    args = parse_args()
    os.makedirs(args.output, exist_ok=True)
    if not args.model_paths and not args.baseline_scores:
        raise SystemExit("provide --model-paths and/or --baseline-scores")

    from ewvit_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.metrics import auc as sk_auc, roc_curve

    fig, ax = plt.subplots(figsize=(7, 7))
    results = {}

    if args.model_paths:
        from ewvit_tpu.configs import ModelConfig
        from ewvit_tpu.data.transforms import FrameTransform
        from ewvit_tpu.evaluation import evaluate, get_dataloader, load_model

        assert args.root, "--root is required with --model-paths"
        cfg = (ModelConfig.tiny() if args.tiny
               else ModelConfig(dama_dim=args.dim))
        if args.per_frame:
            # per-frame scoring batches B*K single-frame clips; 'row0'
            # reproduces the reference's N=1 positional row (see
            # PerFrameLoader) and lifts the emb_dim flattened-batch cap
            cfg = cfg.replace(pos_mode="row0")
        size = cfg.arch.image_size
        transform = FrameTransform(resize=max(1, round(size * 450 / 224)),
                                   crop=size)
        test_list = (args.test_list if os.path.isabs(args.test_list)
                     else os.path.join(args.root, args.test_list))
        # one loader shared across models (≙ dataloader caching at :124-144)
        loader, ds = get_dataloader(
            args.root, "celeb-df", batch_size=args.batch_size,
            frame_count=args.frame_count, test_list=test_list,
            num_workers=args.num_workers, transform=transform)
        if args.per_frame:
            loader = PerFrameLoader(loader, args.frame_count)
            print(f"Celeb-DF test: {len(ds)} videos x {args.frame_count} "
                  f"frames = {loader.true_len()} per-frame scores")
        else:
            print(f"Celeb-DF test: {len(ds)} videos (video-level)")

        for spec in args.model_paths:
            name, _, path = spec.rpartition("=")
            name = name or os.path.basename(path.rstrip("/"))
            model, variables = load_model(path, cfg)
            m = evaluate(model, variables, loader,
                         frame_chunk=(1 if args.per_frame
                                      else min(cfg.frame_chunk,
                                               args.frame_count)),
                         compute_dtype=cfg.compute_dtype)
            if args.per_frame:
                assert len(m["preds"]) == loader.true_len(), (
                    f"per-frame score count {len(m['preds'])} != "
                    f"{loader.true_len()} total frames")
            fpr, tpr, _ = roc_curve(m["labels"], m["preds"])
            a = sk_auc(fpr, tpr)
            ax.plot(fpr, tpr, label=f"{name} (AUC={a:.4f})")
            results[name] = a
            print(f"  {name}: AUC={a:.4f} EER={m['eer']:.4f}")

    for spec in args.baseline_scores:
        name, _, path = spec.rpartition("=")
        labels, scores = _load_baseline_csv(path)
        fpr, tpr, _ = roc_curve(labels, scores)
        a = sk_auc(fpr, tpr)
        ax.plot(fpr, tpr, "--", label=f"{name} (AUC={a:.4f})")
        results[name] = a

    ax.plot([0, 1], [0, 1], "k:", lw=0.8)
    ax.set_xlabel("False positive rate")
    ax.set_ylabel("True positive rate")
    mode = "per-frame" if args.per_frame else "video-level"
    ax.set_title(f"Celeb-DF-v2 ROC ({mode})")
    ax.legend(loc="lower right")
    fig.tight_layout()
    out = os.path.join(args.output, "celebdf_roc_comparison.png")
    fig.savefig(out, dpi=120)
    print(f"Saved {out}")


if __name__ == "__main__":
    main()
