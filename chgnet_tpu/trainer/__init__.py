"""Training: combined losses, optimizers/schedules, the Trainer loop."""

from chgnet_tpu.trainer.losses import CombinedLoss
from chgnet_tpu.trainer.trainer import Trainer

__all__ = ["CombinedLoss", "Trainer"]
