"""Training stack: losses, optimizer, jitted steps, checkpointing."""

from ewvit_tpu.train.losses import (  # noqa: F401
    binary_focal_loss,
    combined_loss,
    orthogonal_loss,
    weighted_bce_with_logits,
)
