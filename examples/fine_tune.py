"""Fine-tune a CHGNet-TPU model on labeled structures.

Counterpart of the reference fine-tuning notebook: build a dataset, make
loaders, train with the combined e/f(/s/m) loss, checkpoints + resume.
"""

from __future__ import annotations

import os

import numpy as np

from chgnet_tpu.core.structure import Structure
from chgnet_tpu.data import StructureData, get_train_val_test_loader
from chgnet_tpu.models.chgnet import CHGNet
from chgnet_tpu.trainer import Trainer

here = os.path.dirname(os.path.abspath(__file__))
base = Structure.from_file(f"{here}/mp-18767-LiMnO2.cif")

# demo labels from a "teacher" model; in practice use DFT data, e.g.
# StructureData.from_vasp(run_dir) or StructureJsonData("MPtrj.json")
teacher = CHGNet(seed=7)
structures = [base.perturb(0.08, seed=i) for i in range(32)]
preds = teacher.predict_structure(structures, task="ef")
dataset = StructureData(
    structures=structures,
    energies=[float(p["e"]) for p in preds],
    forces=[np.asarray(p["f"]) for p in preds],
)
train_loader, val_loader, test_loader = get_train_val_test_loader(
    dataset, batch_size=8, train_ratio=0.8, val_ratio=0.1
)

model = CHGNet(seed=0)
trainer = Trainer(
    model=model,
    targets="ef",
    optimizer="Adam",
    scheduler="CosLR",
    criterion="Huber",
    delta=0.1,
    learning_rate=1e-3,
    epochs=5,
    print_freq=10,
)
trainer.train(train_loader, val_loader, test_loader, save_dir="./finetune_run")
print("energy MAE history:", trainer.training_history["e"]["train"])
