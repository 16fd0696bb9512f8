"""Evaluation harness: model loading, dataset eval, per-method breakdowns.

Library equivalent of the reference eval surface (/root/reference/eval.py):
``load_model`` (:60-77, tolerant checkpoint loading), ``get_dataloader``
(:96-133), ``evaluate`` (:135-194, full metric suite), plus the per-method
FF++/diffusion loops the CLI composes (:245-261, :366-433). Model forwards run
jitted on device; metrics are host-side sklearn (ewvit_tpu.utils.metrics).

Reference bugs fixed, not replicated (SURVEY.md §7): the ``--dim`` flag is a
real flag here (eval.py:40-41 commented it out yet used ``args.dim`` at :224),
and the per-batch orthogonality loss is recorded once, not twice
(eval.py:157-158 vs :168-169).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ewvit_tpu.configs import ModelConfig
from ewvit_tpu.data.datasets import (
    CelebDFDataset,
    DiffusionDataset,
    FaceForensicsDataset,
)
from ewvit_tpu.data.pipeline import BatchLoader
from ewvit_tpu.data.transforms import FrameTransform
from ewvit_tpu.models.detector import init_detector
from ewvit_tpu.ops.preprocess import preprocess_batch
from ewvit_tpu.train.steps import eval_step
from ewvit_tpu.utils.metrics import binary_metrics


def load_model(model_path: Optional[str], cfg: Optional[ModelConfig] = None):
    """Build the detector and (optionally) restore checkpointed variables.

    Accepts best/epoch Orbax checkpoints produced by CheckpointManager
    (tolerant layout handling ≙ eval.py:63-74), or a reference ``.pth``/
    ``.pt`` torch checkpoint converted on the fly (any of the three layouts
    the reference emits, train.py:306-319, incl. DataParallel prefixes).
    With ``model_path=None`` returns freshly-initialized variables (for
    smoke tests / benchmarks).
    """
    cfg = cfg or ModelConfig()
    if model_path and model_path.endswith((".pth", ".pt")):
        # torch checkpoint: the converted tree is complete (params +
        # batch_stats; round-trip-tested), so skip the expensive init
        from ewvit_tpu.models.detector import create_detector
        from ewvit_tpu.utils.torch_convert import convert_checkpoint

        converted, report = convert_checkpoint(model_path)
        if report["missing_torch_keys"]:
            raise ValueError(
                f"{model_path}: {len(report['missing_torch_keys'])} torch "
                "keys the converter expected are absent (first few: "
                f"{report['missing_torch_keys'][:5]}) — not a DeepfakeDetector "
                "checkpoint?")
        if report["unmapped_torch_keys"]:
            print(f"Warning: {len(report['unmapped_torch_keys'])} torch keys "
                  f"unmapped (e.g. {report['unmapped_torch_keys'][:3]})")
        converted = jax.tree_util.tree_map(jnp.asarray, converted)
        # Shape-check a few leaves against the configured model so a
        # mismatched --dim/--tiny fails with a clear message instead of an
        # opaque flax apply scope error later (ADVICE r3). classifier_fc1
        # pins dama_dim; the SFE patch embedding pins image_size/vit dim.
        p = converted.get("params", {})
        checks = [(("classifier_fc1", "kernel"), (cfg.dama_dim, 64))]
        if cfg.backbone_spec is None and cfg.backbone_factory is None:
            # full-stack backbones end at 1280 channels, map = size/32
            checks.append((("dama", "sfe", "patch_to_embedding", "kernel"),
                           ((cfg.arch.image_size // 32) ** 2 * 1280,
                            cfg.arch.dim)))
        for path, want in checks:
            leaf = p
            for k in path:
                leaf = leaf.get(k) if isinstance(leaf, dict) else None
                if leaf is None:
                    break
            if leaf is not None and tuple(leaf.shape) != tuple(want):
                raise ValueError(
                    f"{model_path}: converted param "
                    f"{'/'.join(path)} has shape {tuple(leaf.shape)} but the "
                    f"configured model (dim={cfg.dama_dim}, image_size="
                    f"{cfg.arch.image_size}) expects {tuple(want)} — check "
                    f"--dim/--tiny against the checkpoint's training config")
        return create_detector(cfg), converted
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))
    if model_path:
        import orbax.checkpoint as ocp

        from ewvit_tpu.train.optimizer import make_optimizer
        from ewvit_tpu.train.steps import create_train_state

        tx = make_optimizer(variables["params"])
        state, _ = create_train_state(variables, tx)
        target = {
            "epoch": 0, "best_val_auc": 0.0, "params": state.params,
            "batch_stats": state.batch_stats, "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(model_path), target)
        variables = {"params": restored["params"]}
        if restored.get("batch_stats") is not None:
            variables["batch_stats"] = restored["batch_stats"]
    return model, variables


def get_dataloader(
    root: str,
    dataset: str = "ff++",
    *,
    split: str = "test",
    batch_size: int = 8,
    frame_count: int = 300,
    single_method: Optional[str] = None,
    test_list: Optional[str] = None,
    num_workers: int = 4,
    transform=None,
) -> Tuple[BatchLoader, object]:
    """Dataset + loader factory (≙ eval.py:96-133). Returns (loader, dataset)."""
    transform = transform if transform is not None else FrameTransform()
    if dataset == "ff++":
        ds = FaceForensicsDataset(
            root, split=split, frame_count=frame_count, transform=transform,
            single_method=single_method)
    elif dataset == "celeb-df":
        ds = CelebDFDataset(
            root, split=[split], frame_count=frame_count, transform=transform,
            testing_file=test_list)
    elif dataset == "diffusion":
        ds = DiffusionDataset(root, transform=transform,
                              single_method=single_method)
    else:
        raise ValueError(f"Unknown dataset '{dataset}'")
    # pad_last keeps every batch the same shape => ONE compiled eval_step
    # (a ragged tail batch would trigger a second XLA compile); evaluate()
    # trims the padded rows out of the metrics.
    loader = BatchLoader(ds, batch_size, num_workers=num_workers,
                         pad_last=True)
    return loader, ds


def evaluate(
    model,
    variables,
    loader,
    *,
    mode: str = "dynamic",
    frame_chunk: int = 8,
    compute_dtype: str = "bfloat16",
    collect_outputs: bool = True,
    mesh=None,
) -> Dict:
    """Full-dataset eval: device forwards + host metrics (≙ eval.py:135-194).

    ``mesh``: a ('dcn','data','frames') Mesh (parallel/mesh.py) shards each
    batch over ('dcn','data') with replicated params — data-parallel eval,
    the reference's nn.DataParallel role. Exact: per-clip forwards are
    independent, and the loader's ``pad_last`` keeps every batch at
    batch_size (which must divide evenly over the mesh batch axes).
    """
    from ewvit_tpu.data.pipeline import DevicePrefetcher

    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    in_shard = None
    if mesh is not None:
        from ewvit_tpu.parallel.mesh import batch_sharding, replicate_tree

        params = replicate_tree(mesh, params)
        if batch_stats is not None:
            batch_stats = replicate_tree(mesh, batch_stats)
        in_shard = batch_sharding(mesh, frame_axis=False)
    orth_losses, preds, labels = [], [], []
    loss_sum, n_total = 0.0, 0
    if hasattr(loader, "true_len"):          # loader protocol (pipeline.py)
        remaining = loader.true_len()
    elif hasattr(loader, "dataset"):         # bare duck-typed loaders
        remaining = len(loader.dataset)
    else:
        remaining = None
    # H2D of batch N+1 overlaps batch N's forward; labels stay host-side.
    for frames, lbls in DevicePrefetcher(loader, sharding=in_shard,
                                         put_labels=False):
        n = len(lbls)
        if remaining is not None:  # pad_last rows in the tail batch
            n = min(n, remaining)
            remaining -= n
        # mask keeps pad rows out of BOTH loss terms (same shape every
        # batch => still one compiled eval_step)
        valid = jnp.asarray(np.arange(len(lbls)) < n, jnp.float32)
        x = preprocess_batch(jnp.asarray(frames), train=False,
                             dtype_name=compute_dtype)
        out = eval_step(
            params, batch_stats, x, jnp.asarray(lbls, jnp.float32), valid,
            model=model, mode=mode, frame_chunk=frame_chunk)
        # dataset mean = sum of per-row losses / N (≙ eval.py:162, :172:
        # the reference weights each batch's mean by its true batch size)
        loss_sum += float(out["loss"]) * n
        n_total += n
        orth_losses.append(float(out["orth_loss"]))
        preds.extend(np.asarray(out["preds"])[:n].tolist())
        labels.extend(np.asarray(lbls)[:n].tolist())
    results = binary_metrics(
        labels, preds, loss=loss_sum / n_total if n_total else None)
    results["orth_loss"] = float(np.mean(orth_losses)) if orth_losses else 0.0
    # per-batch series for the orthogonality-vs-prediction scatter
    # (≙ eval.py:157-158 collection, utils/visualization.py:102-121)
    results["orth_losses"] = orth_losses
    if collect_outputs:
        results["preds"] = preds
        results["labels"] = labels
    return results


def print_metrics(name: str, m: Dict) -> None:
    """Console report (≙ eval.py:196-208)."""
    print(f"\n===== {name} =====")
    for k in ("loss", "accuracy", "auc", "eer", "eer_threshold", "ap",
              "precision", "recall", "f1"):
        if k in m and m[k] is not None:
            print(f"  {k:>14}: {m[k]:.4f}")
    if "confusion_matrix" in m:
        cm = m["confusion_matrix"]
        print(f"  confusion: TN={cm[0][0]} FP={cm[0][1]} "
              f"FN={cm[1][0]} TP={cm[1][1]}")
