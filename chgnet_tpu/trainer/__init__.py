"""Training: combined losses, optimizers/schedules, the Trainer loop."""

from chgnet_tpu.trainer.losses import CombinedLoss

__all__ = ["CombinedLoss"]
