"""Common utilities: device selection, meters, metrics, json, param trees.

Counterpart of ``/root/reference/chgnet/utils/common_utils.py`` adapted to
JAX (device selection targets TPU platforms, not CUDA/pynvml).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def cuda_devices_sorted_by_free_mem() -> list[int]:
    """API-parity stub of ``common_utils.py:38-58``: the reference ranks
    CUDA devices by free memory via pynvml. On the TPU stack device
    selection is jax's job; returns device ids in enumeration order."""
    return [d.id for d in jax.devices()]


def determine_device(use_device: str | None = None) -> str:
    """Pick the JAX platform to run on.

    Order: explicit arg > ``CHGNET_DEVICE`` env var > first available
    platform (tpu > gpu > cpu as enumerated by jax).
    """
    use_device = use_device or os.getenv("CHGNET_DEVICE")
    if use_device:
        return use_device
    return jax.devices()[0].platform


class AverageMeter:
    """Running average tracker (mirrors reference ``common_utils.py:61-83``)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = self.avg = self.sum = self.count = 0.0

    def update(self, val: float, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n
        if self.count != 0:
            self.avg = self.sum / self.count


def mae(prediction, target) -> float:
    """Mean absolute error over array-likes."""
    prediction = np.asarray(prediction, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    return float(np.mean(np.abs(target - prediction)))


def _json_handler(obj):
    if isinstance(obj, np.integer):
        return int(obj)
    if isinstance(obj, np.floating):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


def read_json(filepath: str) -> dict:
    with open(filepath) as file:
        return json.load(file)


def write_json(dct, filepath: str) -> None:
    with open(filepath, mode="w") as file:
        json.dump(dct, file, default=_json_handler)


def mkdir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


# ----------------------------------------------------------- param pytrees
def flatten_params(params, prefix: str = "") -> dict[str, np.ndarray]:
    """Flatten a nested dict/list param tree to {'a/b/0/w': array}."""
    flat: dict[str, np.ndarray] = {}
    if isinstance(params, dict):
        items = params.items()
    elif isinstance(params, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(params))
    else:
        flat[prefix.rstrip("/")] = np.asarray(params)
        return flat
    for key, val in items:
        flat.update(flatten_params(val, f"{prefix}{key}/"))
    return flat


def unflatten_params(flat: dict[str, np.ndarray]):
    """Inverse of :func:`flatten_params`; integer path segments become lists."""
    tree: dict = {}
    for path, val in flat.items():
        keys = path.split("/")
        node = tree
        for key in keys[:-1]:
            node = node.setdefault(key, {})
        node[keys[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def count_params(params) -> int:
    """Total number of scalars in a param tree."""
    return sum(int(np.size(leaf)) for leaf in jax.tree_util.tree_leaves(params))


def save_params(params, config: dict, path: str) -> None:
    """Serialize params + config to a single .npz."""
    flat = {f"param:{k}": np.asarray(v) for k, v in flatten_params(params).items()}
    flat["config:json"] = np.array(json.dumps(config, default=_json_handler))
    np.savez(path, **flat)


def load_params(path: str):
    """Load (params, config) saved by :func:`save_params`."""
    data = np.load(path, allow_pickle=False)
    flat = {
        k[len("param:"):]: data[k] for k in data.files if k.startswith("param:")
    }
    config = json.loads(str(data["config:json"]))
    return unflatten_params(flat), config
