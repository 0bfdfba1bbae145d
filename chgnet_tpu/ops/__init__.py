"""Custom TPU ops (Pallas kernels) for the message-passing hot loop."""

from chgnet_tpu.ops.gated_message import fused_gated_message

__all__ = ["fused_gated_message"]
