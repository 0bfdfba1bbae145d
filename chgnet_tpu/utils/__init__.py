"""Utility exports."""

from chgnet_tpu.utils.common import (
    AverageMeter,
    count_params,
    determine_device,
    flatten_params,
    load_params,
    mae,
    mkdir,
    read_json,
    save_params,
    unflatten_params,
    write_json,
)

__all__ = [
    "AverageMeter",
    "count_params",
    "determine_device",
    "flatten_params",
    "load_params",
    "mae",
    "mkdir",
    "read_json",
    "save_params",
    "unflatten_params",
    "write_json",
]
