"""Orbax checkpointing with the reference's CLI semantics.

Equivalent of the reference's torch.save/load checkpoint flow
(/root/reference/train.py:276-319): per-epoch full checkpoints
(``checkpoint_{epoch+1}``), a ``best_model`` snapshot on new best val AUC, and
``--resume`` restoring model/optimizer/epoch/best — with the reference's
resume bug FIXED: the restored ``start_epoch`` actually skips completed epochs
(the reference computes it at train.py:282 but still loops ``range(epochs)``
at :287; documented divergence, SURVEY.md §7).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ewvit_tpu.train.steps import TrainState


def _to_pytree(state: TrainState, epoch: int, best_val_auc: float) -> Dict:
    return {
        "epoch": epoch,
        "best_val_auc": best_val_auc,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }


class CheckpointManager:
    """Thin wrapper over orbax for epoch checkpoints + best-model snapshots."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save_epoch(self, state: TrainState, epoch: int, best_val_auc: float):
        path = self._path(f"checkpoint_{epoch + 1}")
        self._ckptr.save(path, _to_pytree(state, epoch, best_val_auc),
                         force=True)
        self._ckptr.wait_until_finished()
        return path

    def save_best(self, state: TrainState, epoch: int, best_val_auc: float):
        path = self._path("best_model")
        self._ckptr.save(path, _to_pytree(state, epoch, best_val_auc),
                         force=True)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, path: str, template: TrainState,
                epoch: int = 0, best_val_auc: float = 0.0):
        """Restore a checkpoint into the template's structure.

        Returns (state, start_epoch, best_val_auc) where start_epoch is the
        next epoch to run (restored epoch + 1).
        """
        target = _to_pytree(template, epoch, best_val_auc)
        restored = self._ckptr.restore(os.path.abspath(path), target)
        state = TrainState(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        return state, int(restored["epoch"]) + 1, float(restored["best_val_auc"])


def load_params_flexible(path: str, template: TrainState):
    """Tolerant loader mirroring eval.py:60-77: accepts best/epoch checkpoints."""
    mgr = CheckpointManager(os.path.dirname(os.path.abspath(path)) or ".")
    state, _, _ = mgr.restore(path, template)
    return state
