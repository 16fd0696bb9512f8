#!/usr/bin/env python
"""Evaluate a trained detector: FF++ (overall + per-method), Celeb-DF, diffusion.

CLI-compatible rebuild of the reference eval harness
(/root/reference/eval.py:30-58 flags; :210-433 structure): overall pass, then
per-forgery-method loop for FF++ (5 methods, eval.py:228, :245-261), CSV +
confusion-matrix JSON export (:263-298), optional visualization (:300-321),
Celeb-DF (:324-365) and diffusion per-method (:366-433) branches.

Divergences (reference bugs fixed, SURVEY.md §7): ``--dim`` is a real flag
(commented out at eval.py:40-41 yet used at :224 — the reference CLI crashes);
orth loss recorded once per batch (not twice, eval.py:157-158/:168-169).
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import random

import numpy as np

FF_METHODS = ["Deepfakes", "Face2Face", "FaceSwap", "NeuralTextures",
              "FaceShifter"]
DIFFUSION_METHODS = ["DDPM", "DDIM", "LDM"]


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate Deepfake Detector (TPU)")
    p.add_argument("--root", "--r", type=str, default="/path/to/dataset")
    p.add_argument("--model-path", "--mp", type=str, required=True)
    p.add_argument("--output", "--o", type=str, default="./output/eval")
    p.add_argument("--batch-size", "--bs", type=int, default=8)
    p.add_argument("--dim", "--d", type=int, default=128)
    p.add_argument("--frame-count", "--fc", type=int, default=300)
    p.add_argument("--dataset", "--ds", type=str, default="ff++",
                   choices=["ff++", "celeb-df", "diffusion"])
    p.add_argument("--test-list", "--tl", type=str,
                   default="Celeb-DF-v2/List_of_testing_videos.txt")
    p.add_argument("--ablation", "-a", type=str, default="dynamic",
                   choices=["dynamic", "sfe_only", "sfe_mwt"])
    p.add_argument("--visualize", "--v", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--frame-chunk", type=int, default=16)
    p.add_argument("--pos-mode", type=str, default="reference",
                   choices=["reference", "tile", "row0"],
                   help="must match the training config when the checkpoint "
                        "was trained with pos_mode='tile'; 'row0' matches "
                        "plot_celebdf_roc.py --per-frame scoring")
    p.add_argument("--s2d-stem", action="store_true",
                   help="space-to-depth stem conv (exact; any checkpoint)")
    p.add_argument("--mesh", "--multi-chip", action="store_true",
                   help="data-parallel eval over all local devices "
                        "(batch sharded over the mesh, params replicated)")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--tiny", action="store_true",
                   help="ModelConfig.tiny() (64px) — smoke tests / CI only")
    return p.parse_args()


def _row(name, m):
    return {
        "name": name, "loss": m.get("loss"), "accuracy": m["accuracy"],
        "auc": m["auc"], "eer": m["eer"], "ap": m["ap"],
        "precision": m["precision"], "recall": m["recall"], "f1": m["f1"],
    }


def _render_viz(viz_dir, m):
    """Render the reference's 5 eval plots for one result dict.

    Mirrors the reference's ``EvalVisualization.plot_metrics`` call sites
    (/root/reference/eval.py:307, :319, :364, :431): confusion heatmap, ROC,
    PR, prediction KDE, and the orth-loss-vs-prediction scatter (per-batch
    orth losses expanded to one point per prediction, eval.py:157-169).
    """
    from ewvit_tpu.utils.visualization import EvalVisualization

    os.makedirs(viz_dir, exist_ok=True)
    viz = EvalVisualization(viz_dir)
    viz.confusion(m["confusion_matrix"])
    viz.roc(m["labels"], m["preds"])
    viz.precision_recall(m["labels"], m["preds"])
    viz.prediction_distribution(m["labels"], m["preds"])
    if m.get("orth_losses"):
        per_batch = np.asarray(m["orth_losses"], np.float32)
        bs = max(1, len(m["preds"]) // len(per_batch))
        expanded = np.repeat(per_batch, bs)[:len(m["preds"])]
        if len(expanded) < len(m["preds"]):
            expanded = np.pad(expanded, (0, len(m["preds"]) - len(expanded)),
                              mode="edge")
        viz.orth_scatter(expanded, m["preds"])


def _export(output, rows, confusions):
    os.makedirs(output, exist_ok=True)
    csv_path = os.path.join(output, "eval_results.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    with open(os.path.join(output, "confusion_matrices.json"), "w") as f:
        json.dump(confusions, f, indent=2)
    print(f"Saved results to {csv_path}")


def main():
    args = parse_args()
    random.seed(args.seed)
    np.random.seed(args.seed)

    from ewvit_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.data.transforms import FrameTransform
    from ewvit_tpu.evaluation import (
        evaluate, get_dataloader, load_model, print_metrics,
    )

    if args.tiny:
        cfg = ModelConfig.tiny().replace(
            pos_mode=args.pos_mode, use_s2d_stem=args.s2d_stem)
    else:
        cfg = ModelConfig(dama_dim=args.dim, frame_chunk=args.frame_chunk,
                          pos_mode=args.pos_mode, use_s2d_stem=args.s2d_stem)
    size = cfg.arch.image_size
    transform = FrameTransform(resize=max(1, round(size * 450 / 224)),
                               crop=size)
    model, variables = load_model(args.model_path, cfg)
    from ewvit_tpu.utils.params import cast_kernels_for_inference

    # bit-identical under bf16 compute; halves every large weight read
    variables = cast_kernels_for_inference(variables, cfg.compute_dtype)
    ev = dict(mode=args.ablation, frame_chunk=cfg.frame_chunk,
              compute_dtype=cfg.compute_dtype)
    if args.mesh:
        from ewvit_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()  # all local devices on the 'data' axis
        dp = mesh.shape["dcn"] * mesh.shape["data"]
        assert args.batch_size % dp == 0, (
            f"--batch-size {args.batch_size} must be divisible by the "
            f"mesh batch axes dcn*data = {dp}")
        ev["mesh"] = mesh
        print(f"Data-parallel eval mesh: {dict(mesh.shape)}")

    rows, confusions = [], {}
    viz_results = []  # (visualizations/<subdir>, result) pairs

    if args.dataset == "ff++":
        loader, _ = get_dataloader(
            args.root, "ff++", batch_size=args.batch_size,
            frame_count=args.frame_count, num_workers=args.num_workers,
            transform=transform)
        m = evaluate(model, variables, loader, **ev)
        print_metrics("FF++ overall", m)
        rows.append(_row("overall", m))
        confusions["overall"] = m["confusion_matrix"]
        viz_results.append(("all_methods", m))  # reference eval.py:304-307
        for method in FF_METHODS:  # per-method loop (eval.py:245-261)
            loader, _ = get_dataloader(
                args.root, "ff++", batch_size=args.batch_size,
                frame_count=args.frame_count, single_method=method,
                num_workers=args.num_workers, transform=transform)
            mm = evaluate(model, variables, loader, **ev)
            print_metrics(method, mm)
            rows.append(_row(method, mm))
            confusions[method] = mm["confusion_matrix"]
            viz_results.append((method, mm))  # reference eval.py:310-319
        last = m
    elif args.dataset == "celeb-df":
        test_list = (args.test_list if os.path.isabs(args.test_list)
                     else os.path.join(args.root, args.test_list))
        loader, _ = get_dataloader(
            args.root, "celeb-df", batch_size=args.batch_size,
            frame_count=args.frame_count, test_list=test_list,
            num_workers=args.num_workers, transform=transform)
        m = evaluate(model, variables, loader, **ev)
        print_metrics("Celeb-DF-v2", m)
        rows.append(_row("celeb-df", m))
        confusions["celeb-df"] = m["confusion_matrix"]
        last = m
    else:  # diffusion: per-method DDPM/DDIM/LDM (eval.py:366-433)
        last = None
        for method in [None] + DIFFUSION_METHODS:
            loader, _ = get_dataloader(
                args.root, "diffusion", batch_size=args.batch_size,
                single_method=method, num_workers=args.num_workers,
                transform=transform)
            name = method or "all"
            m = evaluate(model, variables, loader, **ev)
            print_metrics(f"diffusion/{name}", m)
            rows.append(_row(name, m))
            confusions[name] = m["confusion_matrix"]
            # reference eval.py:416-431 renders one dir per method; the
            # overall pass goes to all_methods/ for FF++ symmetry
            viz_results.append(("all_methods" if method is None else method,
                                m))
            last = last or m

    _export(args.output, rows, confusions)

    if args.visualize:
        if viz_results:  # ff++ / diffusion: visualizations/<name>/ per result
            print("Generating evaluation visualizations...")
            for name, m in viz_results:
                _render_viz(os.path.join(args.output, "visualizations", name),
                            m)
            print(f"Saved visualizations to "
                  f"{os.path.join(args.output, 'visualizations')}")
        elif last is not None:  # celeb-df: plots directly in the output dir
            _render_viz(args.output, last)  # reference eval.py:360-364


if __name__ == "__main__":
    main()
