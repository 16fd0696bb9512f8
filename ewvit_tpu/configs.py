"""Structured configuration for the Efficient Wavelet ViT TPU framework.

Replaces the reference's scattered config surface — the ViT hyperparameters
in config/architecture.yaml (/root/reference/config/architecture.yaml:1-12),
per-script argparse defaults, and hardcoded constants — with typed
dataclasses. ``ArchConfig.reference()`` reproduces the reference YAML values
exactly so that parity checks share a single source of truth.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import yaml


@dataclasses.dataclass(frozen=True)
class ArchConfig:
    """ViT architecture hyperparameters.

    Field-for-field equivalent of config/architecture.yaml in the reference
    (image-size .. emb-dropout, /root/reference/config/architecture.yaml:2-12).
    """

    image_size: int = 224
    patch_size: int = 7
    num_classes: int = 1
    dim: int = 512
    depth: int = 2
    dim_head: int = 64
    heads: int = 8
    mlp_dim: int = 2048
    emb_dim: int = 64          # quirk: also the max supported flattened batch
    dropout: float = 0.15
    emb_dropout: float = 0.15

    @classmethod
    def reference(cls) -> "ArchConfig":
        return cls()

    @classmethod
    def from_yaml(cls, path: str) -> "ArchConfig":
        """Load from a reference-format YAML file (keys use dashes)."""
        with open(path, "r") as f:
            raw = yaml.safe_load(f)["model"]
        return cls(
            image_size=raw["image-size"],
            patch_size=raw["patch-size"],
            num_classes=raw["num-classes"],
            dim=raw["dim"],
            depth=raw["depth"],
            dim_head=raw["dim-head"],
            heads=raw["heads"],
            mlp_dim=raw["mlp-dim"],
            emb_dim=raw["emb-dim"],
            dropout=raw["dropout"],
            emb_dropout=raw["emb-dropout"],
        )

    def to_yaml_dict(self) -> dict:
        return {
            "model": {
                "image-size": self.image_size,
                "patch-size": self.patch_size,
                "num-classes": self.num_classes,
                "dim": self.dim,
                "depth": self.depth,
                "dim-head": self.dim_head,
                "heads": self.heads,
                "mlp-dim": self.mlp_dim,
                "emb-dim": self.emb_dim,
                "dropout": self.dropout,
                "emb-dropout": self.emb_dropout,
            }
        }


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Top-level DeepfakeDetector configuration.

    Mirrors DeepfakeDetector/DAMA/MWT constructor arguments
    (/root/reference/network/model.py:10, dama.py:86, mwt.py:13) plus
    TPU-specific knobs (compute dtype, frame chunking, remat).
    """

    arch: ArchConfig = dataclasses.field(default_factory=ArchConfig)
    in_channels: int = 3
    dama_dim: int = 128          # feature dim ("--dim", train.py:39-40)
    num_heads: int = 4           # DAMA cross-attention heads (dama.py:86)
    levels: int = 3              # wavelet pyramid levels (mwt.py:13)
    frame_chunk: int = 16        # per-frame micro-batch (dama.py:86 batch_size)
    # TPU knobs
    compute_dtype: str = "bfloat16"   # matmul/conv compute dtype
    param_dtype: str = "float32"
    remat_frames: bool = True         # jax.checkpoint per frame chunk
    use_pallas_dwt: bool = False      # Pallas Haar kernel vs fused XLA path
    use_pallas_dama: bool = False     # fused Pallas DAMA attention block
    use_fused_mwt_tail: bool = False  # Winograd MWT tail (inference only;
                                      # exact in fp32 — ops/mwt_tail.py)
    fused_eval_pyramid: Any = "level"  # eval-mode MWT pyramid fast path
                                      # (models/mwt.py): "level" = per-level
                                      # block-diagonal hf_sep conv + folded
                                      # eval-BN (measured +2-4% in-model,
                                      # BASELINE.md round-2, default);
                                      # True = levels also batched on the
                                      # batch axis (measured NEGATIVE,
                                      # -1.2ms/call); False = reference-
                                      # structured per-level convs.
    fused_train_pyramid: bool = False  # train-mode analogue of the "level"
                                      # pyramid: ONE block-diagonal hf_sep
                                      # conv per level in fwd+bwd, per-slice
                                      # BN (exact — BN is per-channel). Off
                                      # until measured (models/mwt.py).
    use_pallas_dwse: bool = False     # fused depthwise+BN+SiLU+SE-mean
                                      # kernel (inference only — ops/dw_se.py)
    use_s2d_stem: bool = False        # space-to-depth stem conv: exact
                                      # rewrite of the 3-channel stride-2
                                      # stems (models/efficientnet.py).
                                      # Measured -4% in-model on v5e
                                      # (BASELINE.md) — off by default.
    pos_mode: str = "reference"       # "reference" = batch-indexed pos rows,
                                      # hard cap flattened<=emb_dim (the
                                      # reference quirk); "tile" = row i %
                                      # emb_dim — identical below the cap,
                                      # lifts it (serving flexibility; bigger
                                      # chunks measured -6%, BASELINE.md)
    # Optional (b0_spec, v2s_spec) tuple of
    # models.efficientnet.BackboneSpec overriding the backbone block stacks.
    # None = the full B0/V2-S stacks. Used by :meth:`micro` so that tiny
    # harness configs (driver multichip dryrun, wall-time-bounded tests)
    # compile in seconds on XLA:CPU instead of ~18 minutes.
    backbone_spec: Any = None
    # Testability hook: a callable ``(dtype=..., name=...) -> nn.Module``
    # replacing the EfficientNet backbones everywhere. Used by the
    # reference-parity tests to compare full-detector logits against the
    # reference's own code with identical stub backbones on both sides
    # (the real backbones need packages absent from the build env,
    # PARITY.md "Known gaps"). Must stay None in production configs.
    backbone_factory: Any = None

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)

    @classmethod
    def tiny(cls) -> "ModelConfig":
        """Small-but-real config: every module and branch, tiny shapes.

        patch_size 2 folds the 2x2 backbone map at 64px into ONE patch,
        preserving the reference's 1-token invariant (sfe.py:121) that
        DAMA's cross-attention relies on. Used by tests and the driver's
        multichip dryrun.
        """
        arch = ArchConfig(
            image_size=64, patch_size=2, dim=64, depth=1, dim_head=16,
            heads=2, mlp_dim=64, emb_dim=64, dropout=0.1, emb_dropout=0.1,
        )
        return cls(arch=arch, dama_dim=32, num_heads=2, levels=2,
                   frame_chunk=2, compute_dtype="float32")

    @classmethod
    def micro(cls) -> "ModelConfig":
        """Micro-but-real config for compile-time-bounded harnesses.

        Same component coverage as :meth:`tiny` (stem, MBConv+SE,
        FusedMBConv, droppath residuals, ViT, DAMA cross-attention, MWT
        pyramid, all three ablation heads) but the backbones are truncated
        to 3 real blocks each (``B0_MICRO``/``V2S_MICRO``) so the FULL
        sharded train step compiles on XLA:CPU in seconds — the driver's
        ``dryrun_multichip`` timed out two rounds running on :meth:`tiny`
        (full 16/40-block stacks x 3 backbone instances, ~18 min of
        XLA:CPU compile on this 1-core host).

        32px input: stem + two stride-2 stages land on a 4x4 feature map;
        patch_size 4 keeps the reference's 1-patch invariant (sfe.py:121).
        """
        from ewvit_tpu.models.efficientnet import B0_MICRO, V2S_MICRO

        arch = ArchConfig(
            image_size=32, patch_size=4, dim=32, depth=1, dim_head=16,
            heads=2, mlp_dim=32, emb_dim=64, dropout=0.1, emb_dropout=0.1,
        )
        return cls(arch=arch, dama_dim=16, num_heads=2, levels=2,
                   frame_chunk=2, compute_dtype="float32",
                   backbone_spec=(B0_MICRO, V2S_MICRO))


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (defaults = reference train.py:27-53, 270-274)."""

    batch_size: int = 8
    epochs: int = 30
    lr: float = 1e-4
    weight_decay: float = 1e-4
    lr_min: float = 1e-7          # cosine eta_min (train.py:274)
    frame_count: int = 300
    accum_steps: int = 2
    seed: int = 42
    # orthogonality-loss ramp (train.py:76-86)
    orth_start_frac: float = 0.2
    orth_full_frac: float = 0.5   # ramp length as a fraction of max_epochs
    # curriculum (data_loader.py:240-262)
    curriculum_early_frac: float = 0.3
    curriculum_late_frac: float = 0.7
    # backbone freezing: first N parameter tensors in torch named_parameters
    # order are frozen (sfe.py:115-119)
    frozen_backbone_params: int = 6
