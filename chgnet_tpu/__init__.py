"""chgnet-tpu: a TPU-native crystal-graph message-passing framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of CHGNet
(reference: CederGroupHub/chgnet): charge-informed universal interatomic
potentials predicting energy / forces / stress / magnetic moments from
periodic crystal structures, plus structure relaxation, molecular dynamics,
equation-of-state fitting, datasets and a fine-tuning trainer.

Unlike the reference (single-device PyTorch with per-structure ragged
tensors), this framework uses static-shape padded graph batches, pure
functional models differentiated with ``jax.grad``, jit-compiled on-device
simulation loops and ``jax.sharding`` meshes for multi-chip scaling.

Task-string aliases mirror the reference public API
(``/root/reference/chgnet/__init__.py:14-17``).
"""

from __future__ import annotations

import os
from typing import Literal

TrainTask = Literal["ef", "efs", "efsm"]
PredTask = Literal["e", "ef", "em", "efs", "efsm"]

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

__version__ = "0.1.0"

# Large-array host preprocessing is page-fault-bound without this (see
# chgnet_tpu/utils/hostmem.py); opt out with CHGNET_TPU_NO_MALLOC_TUNE=1.
from chgnet_tpu.utils.hostmem import tune_host_allocator as _tune  # noqa: E402

_tune()
del _tune
