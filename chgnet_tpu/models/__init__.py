"""Model family: CHGNet, basis expansions, layers, composition models."""

from chgnet_tpu.models.chgnet import CHGNet, CHGNetConfig, compute_batch, init_params
from chgnet_tpu.models.composition import AtomRef

__all__ = ["CHGNet", "CHGNetConfig", "AtomRef", "compute_batch", "init_params"]
