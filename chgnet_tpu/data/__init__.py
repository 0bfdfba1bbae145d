"""Datasets and padded-batch loaders."""

from chgnet_tpu.data.dataset import (
    CIFData,
    GraphData,
    GraphLoader,
    StructureData,
    StructureJsonData,
    collate_graphs,
    collate_padded,
    get_loader,
    get_train_val_test_loader,
)

__all__ = [
    "CIFData",
    "GraphData",
    "GraphLoader",
    "StructureData",
    "StructureJsonData",
    "collate_graphs",
    "collate_padded",
    "get_loader",
    "get_train_val_test_loader",
]
