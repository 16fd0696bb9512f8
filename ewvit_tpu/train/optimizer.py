"""Optimizer/schedule construction with reference semantics.

- torch ``optim.Adam(lr, weight_decay=1e-4)`` (/root/reference/train.py:273)
  adds L2 decay to the gradient *before* the Adam moments — reproduced with
  ``optax.add_decayed_weights`` chained before ``scale_by_adam`` (NOT adamw's
  decoupled decay).
- ``CosineAnnealingLR(T_max=epochs, eta_min=1e-7)`` stepped once per epoch
  (/root/reference/train.py:274, :300) — reproduced as a per-step schedule
  that quantizes to the epoch index.
- The reference freezes the first 6 parameter tensors of every EfficientNet
  backbone it builds (sfe.py:115-119; instantiated 3x: model.py:38-51 with B0
  twice and dama.py:93-99 with V2-S) — reproduced with an optax mask over the
  corresponding flax param paths.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ewvit_tpu.models.efficientnet import frozen_param_paths


def cosine_annealing_schedule(base_lr: float, epochs: int,
                              steps_per_epoch: int, eta_min: float = 1e-7):
    """lr(e) = eta_min + (lr0 - eta_min) * (1 + cos(pi * e / T)) / 2."""

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, epochs)
        frac = epoch.astype(jnp.float32) / float(epochs)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * frac))

    return schedule


def detector_frozen_paths() -> Sequence[Tuple[str, ...]]:
    """Frozen param paths for all three backbones inside DeepfakeDetector."""
    paths = []
    for prefix, variant in (
        (("dama", "sfe", "efficient_net"), "v2s"),   # dama.py:93-99
        (("sfe", "efficient_net"), "b0"),            # model.py:38-43
        (("sfe_cls", "efficient_net"), "b0"),        # model.py:45-51
    ):
        for p in frozen_param_paths(variant):
            paths.append(prefix + p)
    return paths


def freeze_mask(params: Dict[str, Any], frozen: Sequence[Tuple[str, ...]]):
    """Pytree of labels: 'frozen' for matching paths, 'train' otherwise."""
    frozen_set = {tuple(p) for p in frozen}

    def label(path, _):
        keys = tuple(k.key for k in path)
        return "frozen" if keys in frozen_set else "train"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    params: Dict[str, Any],
    *,
    lr: float = 1e-4,
    weight_decay: float = 1e-4,
    epochs: int = 30,
    steps_per_epoch: int = 1,
    eta_min: float = 1e-7,
    freeze_backbone_prefixes: bool = True,
) -> optax.GradientTransformation:
    schedule = cosine_annealing_schedule(lr, epochs, steps_per_epoch, eta_min)
    adam = optax.flatten(optax.chain(
        optax.add_decayed_weights(weight_decay),   # torch-style coupled L2
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    ))
    # optax.flatten: the detector has ~600 parameter tensors and a per-tensor
    # Adam update is dispatch-bound on TPU (measured 37.6 ms/step for 149M
    # params = 7x off HBM peak); flattening runs the identical math over one
    # concatenated vector at bandwidth (BASELINE.md).
    if not freeze_backbone_prefixes:
        return adam
    labels = freeze_mask(params, detector_frozen_paths())
    return optax.multi_transform(
        {"train": adam, "frozen": optax.set_to_zero()}, labels)
