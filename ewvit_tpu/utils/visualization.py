"""Training/eval visualization: PNG dashboards + history CSV (host-side).

Equivalent of the reference visualization suite
(/root/reference/utils/visualization.py): ``TrainVisualization`` (history dict,
EMA smoothing, loss/metric/LR curves, combined dashboard, ``save_metrics``
CSV, visualization.py:153-401) and ``EvalVisualization`` (confusion heatmap,
ROC, PR, prediction-distribution KDE, orthogonality-vs-prediction scatter,
visualization.py:9-151). Pure matplotlib/seaborn on host — framework-agnostic
by design, the TPU rebuild keeps it nearly as-is (SURVEY.md C14).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

try:
    import seaborn as sns

    _HAS_SNS = True
except ImportError:  # pragma: no cover
    _HAS_SNS = False


def _ema(values: Sequence[float], alpha: float = 0.6) -> List[float]:
    """Exponential smoothing as in visualization.py:206."""
    out: List[float] = []
    for v in values:
        out.append(v if not out else alpha * out[-1] + (1 - alpha) * v)
    return out


class TrainVisualization:
    """Accumulates per-epoch history; renders curves and a dashboard."""

    KEYS = ("train_loss", "train_cls_loss", "train_orth_loss", "val_loss",
            "train_acc", "val_acc", "train_auc", "val_auc", "lr",
            "epoch_time")

    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.history: Dict[str, List[float]] = {k: [] for k in self.KEYS}

    def update(self, **metrics: float) -> None:
        for k in self.KEYS:
            if k in metrics and metrics[k] is not None:
                self.history[k].append(float(metrics[k]))

    # ----- plots ------------------------------------------------------------

    def _epochs(self, key: str):
        return np.arange(1, len(self.history[key]) + 1)

    def plot_losses(self, fname: str = "loss_curves.png"):
        fig, ax = plt.subplots(figsize=(8, 5))
        for k, label in (("train_loss", "train"), ("val_loss", "val"),
                         ("train_cls_loss", "train cls"),
                         ("train_orth_loss", "train orth")):
            if self.history[k]:
                ax.plot(self._epochs(k), _ema(self.history[k]), label=label)
        ax.set_xlabel("epoch"); ax.set_ylabel("loss"); ax.legend()
        ax.set_title("Training / validation loss")
        fig.tight_layout()
        path = os.path.join(self.output_dir, fname)
        fig.savefig(path, dpi=120); plt.close(fig)
        return path

    def plot_metrics(self, fname: str = "metric_curves.png"):
        fig, ax = plt.subplots(figsize=(8, 5))
        for k in ("train_acc", "val_acc", "train_auc", "val_auc"):
            if self.history[k]:
                ax.plot(self._epochs(k), self.history[k], label=k)
        ax.set_xlabel("epoch"); ax.set_ylabel("metric"); ax.set_ylim(0, 1.05)
        ax.legend(); ax.set_title("Accuracy / AUC")
        fig.tight_layout()
        path = os.path.join(self.output_dir, fname)
        fig.savefig(path, dpi=120); plt.close(fig)
        return path

    def plot_lr(self, fname: str = "lr_schedule.png"):
        fig, ax = plt.subplots(figsize=(8, 4))
        if self.history["lr"]:
            ax.plot(self._epochs("lr"), self.history["lr"])
        ax.set_xlabel("epoch"); ax.set_ylabel("learning rate")
        ax.set_yscale("log"); ax.set_title("LR schedule")
        fig.tight_layout()
        path = os.path.join(self.output_dir, fname)
        fig.savefig(path, dpi=120); plt.close(fig)
        return path

    def plot_dashboard(self, fname: str = "dashboard.png"):
        fig, axes = plt.subplots(2, 2, figsize=(12, 8))
        (a, b), (c, d) = axes
        for k, lbl in (("train_loss", "train"), ("val_loss", "val")):
            if self.history[k]:
                a.plot(self._epochs(k), _ema(self.history[k]), label=lbl)
        a.set_title("loss"); a.legend()
        for k in ("train_auc", "val_auc"):
            if self.history[k]:
                b.plot(self._epochs(k), self.history[k], label=k)
        b.set_title("AUC"); b.set_ylim(0, 1.05); b.legend()
        for k in ("train_acc", "val_acc"):
            if self.history[k]:
                c.plot(self._epochs(k), self.history[k], label=k)
        c.set_title("accuracy"); c.set_ylim(0, 1.05); c.legend()
        if self.history["lr"]:
            d.plot(self._epochs("lr"), self.history["lr"])
            d.set_yscale("log")
        d.set_title("lr")
        fig.tight_layout()
        path = os.path.join(self.output_dir, fname)
        fig.savefig(path, dpi=120); plt.close(fig)
        return path

    def save_metrics(self, fname: str = "training_history.csv"):
        """CSV with one row per epoch (visualization.py:367-388 schema)."""
        import csv

        n = max((len(v) for v in self.history.values()), default=0)
        path = os.path.join(self.output_dir, fname)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["epoch"] + list(self.KEYS))
            for i in range(n):
                row = [i + 1] + [
                    self.history[k][i] if i < len(self.history[k]) else ""
                    for k in self.KEYS
                ]
                w.writerow(row)
        return path

    def render_all(self):
        self.plot_losses(); self.plot_metrics(); self.plot_lr()
        self.plot_dashboard(); self.save_metrics()


class EvalVisualization:
    """Per-evaluation plots (visualization.py:9-151)."""

    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)

    def confusion(self, cm, fname: str = "confusion_matrix.png",
                  labels=("real", "fake")):
        cm = np.asarray(cm)
        fig, ax = plt.subplots(figsize=(5, 4))
        if _HAS_SNS:
            sns.heatmap(cm, annot=True, fmt="d", cmap="Blues",
                        xticklabels=labels, yticklabels=labels, ax=ax)
        else:  # pragma: no cover
            ax.imshow(cm); ax.set_xticks([0, 1], labels); ax.set_yticks([0, 1], labels)
            for i in range(2):
                for j in range(2):
                    ax.text(j, i, int(cm[i, j]), ha="center")
        ax.set_xlabel("predicted"); ax.set_ylabel("true")
        ax.set_title("Confusion matrix")
        fig.tight_layout()
        path = os.path.join(self.output_dir, fname)
        fig.savefig(path, dpi=120); plt.close(fig)
        return path

    def roc(self, labels, scores, fname: str = "roc_curve.png",
            name: str = "model"):
        from sklearn.metrics import auc as sk_auc, roc_curve

        fpr, tpr, _ = roc_curve(labels, scores)
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.plot(fpr, tpr, label=f"{name} (AUC={sk_auc(fpr, tpr):.4f})")
        ax.plot([0, 1], [0, 1], "k--", lw=0.8)
        ax.set_xlabel("FPR"); ax.set_ylabel("TPR"); ax.legend()
        ax.set_title("ROC")
        fig.tight_layout()
        path = os.path.join(self.output_dir, fname)
        fig.savefig(path, dpi=120); plt.close(fig)
        return path

    def precision_recall(self, labels, scores, fname: str = "pr_curve.png"):
        from sklearn.metrics import average_precision_score, precision_recall_curve

        p, r, _ = precision_recall_curve(labels, scores)
        ap = average_precision_score(labels, scores)
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.plot(r, p, label=f"AP={ap:.4f}")
        ax.set_xlabel("recall"); ax.set_ylabel("precision"); ax.legend()
        ax.set_title("Precision-recall")
        fig.tight_layout()
        path = os.path.join(self.output_dir, fname)
        fig.savefig(path, dpi=120); plt.close(fig)
        return path

    def prediction_distribution(self, labels, scores,
                                fname: str = "pred_distribution.png"):
        labels = np.asarray(labels); scores = np.asarray(scores)
        fig, ax = plt.subplots(figsize=(6, 4))
        for cls, name in ((0, "real"), (1, "fake")):
            vals = scores[labels == cls]
            if len(vals):
                if _HAS_SNS:
                    sns.kdeplot(vals, ax=ax, label=name, fill=True)
                else:  # pragma: no cover
                    ax.hist(vals, bins=20, alpha=0.5, label=name, density=True)
        ax.set_xlabel("predicted probability"); ax.legend()
        ax.set_title("Prediction distribution")
        fig.tight_layout()
        path = os.path.join(self.output_dir, fname)
        fig.savefig(path, dpi=120); plt.close(fig)
        return path

    def orth_scatter(self, orth_losses, scores,
                     fname: str = "orth_vs_pred.png"):
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.scatter(orth_losses, scores, s=8, alpha=0.6)
        ax.set_xlabel("orthogonality loss"); ax.set_ylabel("prediction")
        ax.set_title("Orthogonality vs prediction")
        fig.tight_layout()
        path = os.path.join(self.output_dir, fname)
        fig.savefig(path, dpi=120); plt.close(fig)
        return path
