"""Pre-convert a dataset of structures to saved graphs.

Counterpart of the reference ``examples/make_graphs.py``: converts every
structure of a StructureData once, saves ``.npz`` graphs + a labels json,
so training runs (GraphData) skip host-side graph construction entirely.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from chgnet_tpu.core.structure import Structure
from chgnet_tpu.data import GraphData, StructureData
from chgnet_tpu.data.dataset import make_graphs

here = os.path.dirname(os.path.abspath(__file__))
graph_dir = sys.argv[1] if len(sys.argv) > 1 else "./graphs"

# demo dataset: perturbed LiMnO2 frames with synthetic labels
base = Structure.from_file(f"{here}/mp-18767-LiMnO2.cif")
structures = [base.perturb(0.05, seed=i) for i in range(10)]
dataset = StructureData(
    structures=structures,
    energies=[-7.4 + 0.01 * i for i in range(10)],
    forces=[np.zeros((len(base), 3)) for _ in range(10)],
    structure_ids=[f"mp-18767-{i}" for i in range(10)],
    shuffle=False,
)

make_graphs(dataset, graph_dir)
graph_data = GraphData(graph_dir, shuffle=False)
print(f"saved {len(graph_data)} graphs to {graph_dir}")
train_loader, val_loader, test_loader = graph_data.get_train_val_test_loader(
    train_ratio=0.8, val_ratio=0.1, batch_size=4
)
print(f"loaders: {len(train_loader)}/{len(val_loader)}/{len(test_loader)} batches")
