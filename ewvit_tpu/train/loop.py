"""High-level training loop: epochs, curriculum, metrics, checkpoints.

Library form of the reference train entry point (/root/reference/train.py:93-345)
rebuilt around compiled steps:

- the per-batch eager loop + ``loss.backward()`` every batch and
  ``optimizer.step()`` every ``accum_steps`` (train.py:108-115) becomes ONE
  jitted :func:`ewvit_tpu.train.steps.train_step` consuming ``accum_steps``
  micro-batches (identical math, one XLA program);
- curriculum refresh per epoch (train.py:290-291 → data_loader.py:229);
- cosine LR is folded into the optimizer schedule (train.py:274, :300);
- best-AUC + per-epoch checkpoints via Orbax (train.py:306-319) with working
  resume (reference bug fixed: start_epoch actually skips epochs);
- host metrics via sklearn on collected sigmoid predictions (train.py:121-135).

The loop is platform-agnostic: on a TPU mesh, pass ``sharding``/``mesh`` so
batches are distributed (params replicated; XLA inserts the gradient psum).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ewvit_tpu.configs import ModelConfig, TrainConfig
from ewvit_tpu.models.detector import init_detector
from ewvit_tpu.ops.preprocess import preprocess_batch
from ewvit_tpu.train.checkpoint import CheckpointManager
from ewvit_tpu.train.optimizer import make_optimizer
from ewvit_tpu.train.steps import (
    TrainState,
    create_train_state,
    eval_step,
    train_step_donated,
)
from ewvit_tpu.utils.metrics import binary_metrics


@dataclasses.dataclass
class EpochResult:
    loss: float
    cls_loss: float
    orth_loss: float
    metrics: Dict[str, Any]
    seconds: float


class Trainer:
    """Owns model/state/optimizer; runs train/val epochs over BatchLoaders."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig,
        *,
        mode: str = "dynamic",
        pos_weight: float = 1.0,
        steps_per_epoch: int = 1,
        checkpoint_dir: Optional[str] = None,
        rng: Optional[jax.Array] = None,
        mesh=None,
        remat: bool = True,
        save_every: int = 1,
        async_ckpt: bool = False,
        log: Callable[[str], None] = print,
    ):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.mode = mode
        self.pos_weight = float(pos_weight)
        # remat=False trades O(K) activation memory for +13% measured train
        # throughput (BASELINE.md round-2 lever table); safe for short clips
        self.remat = remat
        self.log = log
        rng = rng if rng is not None else jax.random.PRNGKey(train_cfg.seed)
        self.rng, init_rng = jax.random.split(rng)
        self.model, variables = init_detector(model_cfg, init_rng)
        self.tx = make_optimizer(
            variables["params"],
            lr=train_cfg.lr, weight_decay=train_cfg.weight_decay,
            epochs=train_cfg.epochs, steps_per_epoch=max(1, steps_per_epoch),
            eta_min=train_cfg.lr_min)
        self.state, _ = create_train_state(variables, self.tx)
        # Data parallelism (replaces the reference's nn.DataParallel,
        # train.py:249-251): params/opt state replicated over the mesh,
        # batches sharded on the 'data' axis; XLA GSPMD inserts the gradient
        # all-reduce over ICI.
        self.mesh = mesh
        if mesh is not None:
            from ewvit_tpu.parallel.mesh import replicate_tree

            self.state = TrainState(*replicate_tree(mesh, tuple(self.state)))
        # async_ckpt=True overlaps the full-TrainState D2H + disk write with
        # the next epoch's compute (safe under donation: the manager snapshots
        # the state on device before returning — checkpoint.py)
        self.ckpt = (CheckpointManager(checkpoint_dir, async_save=async_ckpt)
                     if checkpoint_dir else None)
        # save_every=1 keeps the reference's per-epoch checkpoint semantics
        # (train.py:313-319); higher values amortize the full-TrainState D2H
        # (~1.8 GB flagship — 90 s/epoch through the dev tunnel) on long runs
        self.save_every = max(1, int(save_every))
        self.start_epoch = 0
        self.best_val_auc = 0.0
        self._steps_per_epoch = max(1, steps_per_epoch)
        from ewvit_tpu.train.optimizer import cosine_annealing_schedule

        self._lr_schedule = cosine_annealing_schedule(
            train_cfg.lr, train_cfg.epochs, self._steps_per_epoch,
            train_cfg.lr_min)

    # ----- checkpointing ---------------------------------------------------

    def resume(self, path: str) -> None:
        assert self.ckpt is not None, "checkpoint_dir not configured"
        self.state, self.start_epoch, self.best_val_auc = self.ckpt.restore(
            path, self.state)
        self.log(f"Resumed from {path}: start_epoch={self.start_epoch} "
                 f"best_val_auc={self.best_val_auc:.4f}")

    # ----- single epochs ---------------------------------------------------

    def _frames_sharding(self):
        if self.mesh is None:
            return None
        from ewvit_tpu.parallel.mesh import batch_sharding

        return batch_sharding(self.mesh, frame_axis=False)

    def _prep(self, frames, train: bool, labels=None):
        """uint8 (host or prefetched-device) batch -> normalized device batch."""
        self.rng, key = jax.random.split(self.rng)
        x = jnp.asarray(frames)
        lb = (jnp.asarray(labels, jnp.float32)
              if labels is not None else None)
        if self.mesh is not None:
            from ewvit_tpu.parallel.mesh import label_sharding

            # no-op (fast path) when the DevicePrefetcher already placed x
            x = jax.device_put(x, self._frames_sharding())
            if lb is not None:
                lb = jax.device_put(lb, label_sharding(self.mesh))
        x = preprocess_batch(x, key, train=train,
                             dtype_name=self.model_cfg.compute_dtype)
        return x if lb is None else (x, lb)

    def train_epoch(self, loader, epoch: int) -> EpochResult:
        cfg = self.train_cfg
        t0 = time.time()
        losses, cls_losses, orth_losses = [], [], []
        all_preds: list = []
        all_labels: list = []

        def groups():
            """Collate accum_steps loader batches into one host super-batch."""
            group: list = []
            for batch in loader:
                group.append(batch)
                if len(group) == cfg.accum_steps:
                    yield (np.concatenate([b[0] for b in group]),
                           np.concatenate([b[1] for b in group]), len(group))
                    group = []
            if group:  # tail flush (train.py:125-127)
                yield (np.concatenate([b[0] for b in group]),
                       np.concatenate([b[1] for b in group]), len(group))

        # H2D of super-batch N+1 overlaps train_step N (SURVEY §7 hard part 3);
        # labels stay host-side for the epoch metrics.
        from ewvit_tpu.data.pipeline import DevicePrefetcher

        prefetched = DevicePrefetcher(
            groups(), sharding=self._frames_sharding(), put_labels=False)

        for frames, labels, n_micro in prefetched:
            x, lb = self._prep(frames, train=True, labels=labels)
            self.rng, key = jax.random.split(self.rng)
            # donated: the old state's buffers are reused in place (the
            # Trainer never reads a superseded state)
            self.state, metrics = train_step_donated(
                self.state, x, lb, key,
                model=self.model, tx=self.tx, mode=self.mode,
                frame_chunk=self.model_cfg.frame_chunk,
                accum_steps=n_micro, pos_weight=self.pos_weight,
                epoch=epoch, max_epochs=cfg.epochs, remat=self.remat)
            losses.append(float(metrics["loss"]))
            cls_losses.append(float(metrics["cls_loss"]))
            orth_losses.append(float(metrics["orth_loss"]))
            all_preds.extend(np.asarray(metrics["preds"]).tolist())
            all_labels.extend(labels.tolist())

        # epoch-level train metrics from the training forward's predictions
        # (train.py:121-135 parity)
        m = (binary_metrics(all_labels, all_preds) if all_labels else {})
        return EpochResult(
            loss=float(np.mean(losses)) if losses else float("nan"),
            cls_loss=float(np.mean(cls_losses)) if cls_losses else float("nan"),
            orth_loss=float(np.mean(orth_losses)) if orth_losses else float("nan"),
            metrics=m,
            seconds=time.time() - t0,
        )

    def eval_epoch(self, loader, epoch: Optional[int] = None,
                   max_epochs: Optional[int] = None) -> EpochResult:
        t0 = time.time()
        preds, labels = [], []
        # pad_last loaders zero-pad the ragged tail batch; trim those rows so
        # padded samples never enter the metrics
        if hasattr(loader, "true_len"):      # loader protocol (pipeline.py)
            remaining = loader.true_len()
        elif hasattr(loader, "dataset"):
            remaining = len(loader.dataset)
        else:
            remaining = None
        from ewvit_tpu.data.pipeline import DevicePrefetcher

        prefetched = DevicePrefetcher(
            loader, sharding=self._frames_sharding(), put_labels=False)
        loss_sum, n_total = 0.0, 0
        for frames, lbls in prefetched:
            n = len(lbls)
            if remaining is not None:
                n = min(n, remaining)
                remaining -= n
            # pad rows are masked out of the loss terms too (not only the
            # metrics) — reported val loss is pad_last-invariant
            valid = jnp.asarray(np.arange(len(lbls)) < n, jnp.float32)
            x, lb = self._prep(frames, train=False, labels=lbls)
            out = eval_step(
                self.state.params, self.state.batch_stats, x, lb, valid,
                model=self.model, mode=self.mode,
                frame_chunk=self.model_cfg.frame_chunk,
                pos_weight=self.pos_weight,
                epoch=epoch if epoch is not None else 1,
                max_epochs=max_epochs if max_epochs is not None else 1)
            loss_sum += float(out["loss"]) * n
            n_total += n
            preds.extend(np.asarray(out["preds"])[:n].tolist())
            labels.extend(np.asarray(lbls)[:n].tolist())
        m = binary_metrics(labels, preds,
                           loss=loss_sum / n_total if n_total else None)
        m["preds"] = preds
        m["labels"] = labels
        return EpochResult(
            loss=m.get("loss", float("nan")), cls_loss=float("nan"),
            orth_loss=float("nan"), metrics=m, seconds=time.time() - t0)

    # ----- full fit --------------------------------------------------------

    def fit(self, train_loader, val_loader, *, train_dataset=None,
            val_dataset=None, viz=None) -> Dict[str, Any]:
        cfg = self.train_cfg
        history = []
        for epoch in range(self.start_epoch, cfg.epochs):
            # curriculum refresh (train.py:290-291)
            if train_dataset is not None and hasattr(
                    train_dataset, "update_sampling_strategy"):
                train_dataset.update_sampling_strategy(epoch, cfg.epochs)
            if val_dataset is not None and hasattr(
                    val_dataset, "update_sampling_strategy"):
                val_dataset.update_sampling_strategy(epoch, cfg.epochs)

            tr = self.train_epoch(train_loader, epoch)
            va = self.eval_epoch(val_loader, epoch=epoch, max_epochs=cfg.epochs)
            val_auc = va.metrics.get("auc", float("nan"))
            lr = float(self._current_lr())
            self.log(
                f"Epoch {epoch + 1}/{cfg.epochs}: train_loss={tr.loss:.4f} "
                f"(cls {tr.cls_loss:.4f} orth {tr.orth_loss:.4f}) "
                f"val_loss={va.loss:.4f} val_auc={val_auc:.4f} "
                f"val_acc={va.metrics.get('accuracy', float('nan')):.4f} "
                f"lr={lr:.2e} [{tr.seconds:.1f}s+{va.seconds:.1f}s]")

            if viz is not None:
                viz.update(
                    train_loss=tr.loss, train_cls_loss=tr.cls_loss,
                    train_orth_loss=tr.orth_loss, val_loss=va.loss,
                    train_acc=tr.metrics.get("accuracy"),
                    train_auc=tr.metrics.get("auc"),
                    val_acc=va.metrics.get("accuracy"),
                    val_auc=val_auc, lr=lr,
                    epoch_time=tr.seconds + va.seconds)

            if np.isfinite(val_auc) and val_auc > self.best_val_auc:
                self.best_val_auc = float(val_auc)
                if self.ckpt is not None:
                    self.ckpt.save_best(self.state, epoch, self.best_val_auc)
            if self.ckpt is not None and (
                    (epoch + 1) % self.save_every == 0
                    or epoch == cfg.epochs - 1):
                self.ckpt.save_epoch(self.state, epoch, self.best_val_auc)

            history.append({"epoch": epoch, "train": dataclasses.asdict(tr),
                            "val": {k: v for k, v in va.metrics.items()
                                    if k not in ("preds", "labels",
                                                 "confusion_matrix")}})
        if viz is not None:
            viz.render_all()
        if self.ckpt is not None:
            # drain any in-flight async saves (and surface worker errors)
            self.ckpt.wait_until_finished()
        return {"history": history, "best_val_auc": self.best_val_auc}

    def _current_lr(self) -> float:
        return float(self._lr_schedule(int(self.state.step)))
