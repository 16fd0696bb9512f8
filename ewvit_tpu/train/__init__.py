"""Training stack: losses, optimizer, jitted steps, checkpointing, Trainer."""

from ewvit_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from ewvit_tpu.train.loop import Trainer  # noqa: F401
from ewvit_tpu.train.losses import (  # noqa: F401
    binary_focal_loss,
    combined_loss,
    orthogonal_loss,
    weighted_bce_with_logits,
)
from ewvit_tpu.train.optimizer import make_optimizer  # noqa: F401
from ewvit_tpu.train.steps import (  # noqa: F401
    TrainState,
    create_train_state,
    eval_step,
    train_step,
)
