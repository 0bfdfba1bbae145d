"""Utility exports."""

from chgnet_tpu.utils.vasp import parse_vasp_dir, solve_charge_by_mag

from chgnet_tpu.utils.profiling import timeit, trace

from chgnet_tpu.utils.common import (
    AverageMeter,
    count_params,
    cuda_devices_sorted_by_free_mem,
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
    "cuda_devices_sorted_by_free_mem",
    "determine_device",
    "flatten_params",
    "load_params",
    "mae",
    "mkdir",
    "parse_vasp_dir",
    "read_json",
    "solve_charge_by_mag",
    "timeit",
    "trace",
    "save_params",
    "unflatten_params",
    "write_json",
]
