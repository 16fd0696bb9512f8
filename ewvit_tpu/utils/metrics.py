"""Evaluation metrics: ACC / AUC / EER / AP / precision / recall / F1 / confusion.

Host-side equivalents of the reference's sklearn metric suite
(/root/reference/eval.py:79-94, :176-192; ablation.py:150-163). Model forwards
run jitted on device; predictions come back as numpy and the metric math stays
on host exactly like the reference.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
from sklearn.metrics import (
    accuracy_score,
    average_precision_score,
    confusion_matrix,
    f1_score,
    precision_score,
    recall_score,
    roc_auc_score,
    roc_curve,
)


def calculate_eer(labels: Sequence[int], scores: Sequence[float]):
    """Equal error rate + its threshold from the ROC (eval.py:79-94).

    Matches the reference exactly: EER = fpr at the argmin of |fnr - fpr|
    (eval.py:92), not the symmetric (fpr+fnr)/2 average — parity of emitted
    numbers wins over the marginally better estimator
    (tests/test_reference_parity.py)."""
    fpr, tpr, thresholds = roc_curve(labels, scores)
    fnr = 1 - tpr
    idx = int(np.nanargmin(np.abs(fnr - fpr)))
    return float(fpr[idx]), float(thresholds[idx])


def binary_metrics(
    labels: Sequence[int],
    scores: Sequence[float],
    threshold: float = 0.5,
    loss: Optional[float] = None,
) -> Dict[str, object]:
    """Full metric dict matching the reference eval harness (eval.py:176-192)."""
    labels = np.asarray(labels)
    scores = np.asarray(scores, np.float64)
    preds = (scores > threshold).astype(np.int64)
    out: Dict[str, object] = {
        "accuracy": float(accuracy_score(labels, preds)),
        "precision": float(precision_score(labels, preds, zero_division=0)),
        "recall": float(recall_score(labels, preds, zero_division=0)),
        "f1": float(f1_score(labels, preds, zero_division=0)),
    }
    if loss is not None:
        out["loss"] = float(loss)
    # AUC/EER/AP are undefined for single-class label sets (sklearn raises);
    # mirror the reference's zero_division spirit with NaN.
    if len(np.unique(labels)) > 1:
        out["auc"] = float(roc_auc_score(labels, scores))
        eer, thr = calculate_eer(labels, scores)
        out["eer"] = eer
        out["eer_threshold"] = thr
        out["ap"] = float(average_precision_score(labels, scores))
    else:
        out["auc"] = float("nan")
        out["eer"] = float("nan")
        out["eer_threshold"] = float("nan")
        out["ap"] = float("nan")
    out["confusion_matrix"] = confusion_matrix(
        labels, preds, labels=[0, 1]).tolist()
    return out
