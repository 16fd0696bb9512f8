"""Orbax checkpointing with the reference's CLI semantics.

Equivalent of the reference's torch.save/load checkpoint flow
(/root/reference/train.py:276-319): per-epoch full checkpoints
(``checkpoint_{epoch+1}``), a ``best_model`` snapshot on new best val AUC, and
``--resume`` restoring model/optimizer/epoch/best — with the reference's
resume bug FIXED: the restored ``start_epoch`` actually skips completed epochs
(the reference computes it at train.py:282 but still loops ``range(epochs)``
at :287; documented divergence, SURVEY.md §7).

Two hardening additions over round 4 (VERDICT r4 #4):

- **Crash-safe overwrites.** Orbax ``force=True`` DELETES the existing
  directory before writing the replacement, so a crash mid-save of
  ``best_model`` used to destroy the previous best. Every save now writes to
  a temp path and atomically swaps it in; the worst crash window leaves the
  previous checkpoint at ``<name>.old`` and :meth:`restore` falls back to it.
- **Async (overlapped) saves.** With ``async_save=True`` the save path is:
  one jitted on-device copy of the TrainState (so the trainer's donated
  buffers are never aliased by the in-flight save), async-started D2H, then
  host materialization + orbax write + swap on a single background worker
  thread. The epoch loop never blocks on the ~1.8 GB flagship TrainState
  D2H (90 s/epoch through the dev tunnel — BASELINE.md); device compute and
  the transfer overlap. Transient cost: one extra TrainState in HBM while a
  save is in flight. ``wait_until_finished()`` drains the queue (and
  re-raises worker errors); callers must invoke it before process exit.
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Dict, List, Optional

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


# One compiled program copies the whole tree on device (per-leaf jnp.copy
# would dispatch hundreds of tiny programs through the tunnel).
@jax.jit
def _device_snapshot(tree):
    return jax.tree_util.tree_map(lambda x: x.copy(), tree)


def device_snapshot_state(state: TrainState) -> TrainState:
    """On-device copy of a TrainState with buffers the caller OWNS.

    Required whenever a state is kept past the next ``train_step_donated``
    call (e.g. ablation.py's best-val snapshot): donation deletes the old
    buffers on TPU — CPU ignores donation, so the bug class only manifests
    on the chip ("Array has been deleted", caught live in round 5)."""
    return TrainState(*_device_snapshot(tuple(state)))


class CheckpointManager:
    """Thin wrapper over orbax for epoch checkpoints + best-model snapshots."""

    def __init__(self, directory: str, *, async_save: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.async_save = bool(async_save)
        # max_workers=1 serializes saves: best_model then checkpoint_N from
        # the same epoch queue in order and never race on the swap paths
        self._pool = (ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt")
                      if self.async_save else None)
        self._pending: List[Future] = []
        # Each queued async save pins one device-side TrainState snapshot
        # (~1.8 GB flagship) until its worker materializes it to host. Cap
        # the backlog so epochs shorter than a save can't stack snapshots
        # into an HBM OOM: at most one running + one queued; a third save
        # blocks on the oldest (bounded extra HBM = 2 snapshots).
        self._max_pending = 2

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    # ----- crash-safe write ------------------------------------------------

    def _write_swap(self, tree: Dict, final: str) -> None:
        """Write ``tree`` to ``final`` atomically, preserving any existing
        checkpoint at ``final`` until the replacement is fully on disk."""
        tmp = final + ".swap-in"
        old = final + ".old"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(old):
            if os.path.exists(final):
                shutil.rmtree(old)
            else:
                # A previous save crashed between its two renames: ``old`` is
                # the ONLY copy. Promote it back before writing anything so a
                # crash during THIS save still leaves a survivor (deleting it
                # here would make a double-crash lose every copy).
                os.rename(old, final)
        self._ckptr.save(tmp, tree, force=True)
        self._ckptr.wait_until_finished()
        if os.path.exists(final):
            os.rename(final, old)      # previous stays recoverable at .old
            os.rename(tmp, final)
            shutil.rmtree(old)
        else:
            os.rename(tmp, final)

    def _save(self, state: TrainState, epoch: int, best_val_auc: float,
              name: str) -> str:
        final = self._path(name)
        if not self.async_save:
            self._write_swap(_to_pytree(state, epoch, best_val_auc), final)
            return final
        # Async path: snapshot on device FIRST — the trainer donates the live
        # state's buffers into the next train_step, so the save must own its
        # own copies before this method returns.
        snap = TrainState(*_device_snapshot(tuple(state)))
        tree = _to_pytree(snap, epoch, best_val_auc)
        for leaf in jax.tree_util.tree_leaves(tree):
            if isinstance(leaf, jax.Array):
                leaf.copy_to_host_async()  # start D2H; overlaps device compute

        def worker() -> str:
            host = jax.tree_util.tree_map(
                lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
                tree)
            self._write_swap(host, final)
            return final

        done = [f for f in self._pending if f.done()]
        self._pending = [f for f in self._pending if not f.done()]
        for f in done:
            f.result()   # surface any completed worker's error, don't swallow
        while len(self._pending) >= self._max_pending:  # backpressure
            self._pending.pop(0).result()
        self._pending.append(self._pool.submit(worker))
        return final

    def save_epoch(self, state: TrainState, epoch: int, best_val_auc: float):
        return self._save(state, epoch, best_val_auc, f"checkpoint_{epoch + 1}")

    def save_best(self, state: TrainState, epoch: int, best_val_auc: float):
        return self._save(state, epoch, best_val_auc, "best_model")

    def wait_until_finished(self) -> None:
        """Drain in-flight async saves; re-raises the first worker error
        (every future is still waited on so no save is left mid-flight)."""
        pending, self._pending = self._pending, []
        first_error = None
        for f in pending:
            try:
                f.result()
            except BaseException as e:  # noqa: BLE001 — re-raised below
                if first_error is None:
                    first_error = e
        if first_error is not None:
            raise first_error

    def restore(self, path: str, template: TrainState,
                epoch: int = 0, best_val_auc: float = 0.0):
        """Restore a checkpoint into the template's structure.

        Returns (state, start_epoch, best_val_auc) where start_epoch is the
        next epoch to run (restored epoch + 1). If ``path`` is missing but a
        ``<path>.old`` survivor from an interrupted swap exists, it is used.
        """
        path = os.path.abspath(path)
        if not os.path.exists(path) and os.path.exists(path + ".old"):
            path = path + ".old"   # crash landed between the two swap renames
        target = _to_pytree(template, epoch, best_val_auc)
        restored = self._ckptr.restore(path, target)
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
