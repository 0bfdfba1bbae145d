"""Load the reference torch CHGNet modules WITHOUT ase/pymatgen/pynvml.

The reference package's ``chgnet/__init__.py`` and ``chgnet/utils`` drag in
ase, pymatgen and pynvml, none of which exist in this environment. The model
code itself (``/root/reference/chgnet/model/{functions,basis,layers,encoders,
composition_model,model}.py``) only needs torch + numpy at runtime; pymatgen
appears in signatures and isinstance checks we never hit. This helper
installs stub packages into ``sys.modules`` and loads the real reference
modules from file, giving the torch-parity tests a live reference
implementation to compare against.

PUBLIC UNTRUSTED CONTENT caveat: we import the reference code to *execute*
it as a numerical oracle, nothing more.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REF = "/root/reference/chgnet"

_cache: dict[str, types.ModuleType] = {}


def _load(name: str, path: str) -> types.ModuleType:
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference() -> types.ModuleType:
    """Return the reference ``chgnet.model.model`` module (cached)."""
    if not os.path.isdir(REF):  # CI / user machines: no reference mount
        import pytest

        pytest.skip("reference torch implementation not available")
    if "model" in _cache:
        return _cache["model"]

    import numpy as np  # noqa: F401  (ensure numpy importable first)
    import torch  # noqa: F401

    # ---- stub pymatgen (only referenced for type hints / methods we skip)
    if "pymatgen" not in sys.modules:
        pmg = types.ModuleType("pymatgen")
        core = types.ModuleType("pymatgen.core")

        class _StubStructure:  # placeholder; parity tests never pass one
            pass

        core.Structure = _StubStructure
        pmg.core = core
        sys.modules["pymatgen"] = pmg
        sys.modules["pymatgen.core"] = core

    # ---- stub the chgnet package root (real one imports ase via graph)
    pkg = types.ModuleType("chgnet")
    pkg.__path__ = [REF]
    try:
        from typing import Literal

        pkg.TrainTask = Literal["ef", "efs", "efsm"]
        pkg.PredTask = Literal["e", "ef", "em", "efs", "efsm"]
    except Exception:  # pragma: no cover
        pkg.TrainTask = str
        pkg.PredTask = str
    pkg.ROOT = REF
    sys.modules["chgnet"] = pkg

    # ---- stub chgnet.utils (real one imports pynvml + pymatgen)
    utils = types.ModuleType("chgnet.utils")

    def determine_device(use_device=None, check_cuda_mem=False):
        return "cpu"

    def write_json(dct, fname):  # used by Graph.as_dict error dumps only
        import json

        with open(fname, "w") as f:
            json.dump(dct, f)

    utils.determine_device = determine_device
    utils.write_json = write_json
    sys.modules["chgnet.utils"] = utils

    # ---- load the real graph containers (torch-only imports)
    gpkg = types.ModuleType("chgnet.graph")
    gpkg.__path__ = [REF + "/graph"]
    sys.modules["chgnet.graph"] = gpkg
    crystalgraph = _load(
        "chgnet.graph.crystalgraph", REF + "/graph/crystalgraph.py"
    )
    graphmod = _load("chgnet.graph.graph", REF + "/graph/graph.py")
    converter = _load("chgnet.graph.converter", REF + "/graph/converter.py")
    gpkg.CrystalGraph = crystalgraph.CrystalGraph
    gpkg.CrystalGraphConverter = converter.CrystalGraphConverter

    # ---- load the real model modules
    mpkg = types.ModuleType("chgnet.model")
    mpkg.__path__ = [REF + "/model"]
    sys.modules["chgnet.model"] = mpkg
    for name in ("functions", "basis", "layers", "encoders",
                 "composition_model"):
        _cache[name] = _load(f"chgnet.model.{name}", REF + f"/model/{name}.py")
    _cache["model"] = _load("chgnet.model.model", REF + "/model/model.py")
    _cache["crystalgraph"] = crystalgraph
    _cache["graph"] = graphmod
    return _cache["model"]


def ref_module(name: str) -> types.ModuleType:
    """Return a loaded reference submodule by short name."""
    load_reference()
    return _cache[name]


def make_ref_crystal_graph(graph, dtype=None):
    """Build a reference ``CrystalGraph`` (torch) from one of ours (numpy).

    Layouts are identical by design (``chgnet_tpu/graph/crystalgraph.py``
    mirrors ``/root/reference/chgnet/graph/crystalgraph.py:15-100``), so this
    is a straight tensor conversion.
    """
    import torch

    load_reference()
    CrystalGraph = _cache["crystalgraph"].CrystalGraph
    dtype = dtype or torch.float32
    return CrystalGraph(
        atomic_number=torch.tensor(graph.atomic_number, dtype=torch.int64),
        atom_frac_coord=torch.tensor(
            np_f64(graph.atom_frac_coord), dtype=dtype, requires_grad=True
        ),
        atom_graph=torch.tensor(graph.atom_graph, dtype=torch.int64),
        neighbor_image=torch.tensor(np_f64(graph.neighbor_image), dtype=dtype),
        directed2undirected=torch.tensor(
            graph.directed2undirected, dtype=torch.int64
        ),
        undirected2directed=torch.tensor(
            graph.undirected2directed, dtype=torch.int64
        ),
        bond_graph=torch.tensor(graph.bond_graph, dtype=torch.int64),
        lattice=torch.tensor(
            np_f64(graph.lattice), dtype=dtype, requires_grad=True
        ),
        graph_id=graph.graph_id,
        mp_id=graph.mp_id,
        composition=graph.composition,
        atom_graph_cutoff=graph.atom_graph_cutoff,
        bond_graph_cutoff=graph.bond_graph_cutoff,
    )


def np_f64(arr):
    import numpy as np

    return np.asarray(arr, dtype=np.float64)


def state_dict_to_numpy(module) -> dict:
    """torch module state_dict -> {name: float32 numpy} for our converter."""
    import numpy as np

    return {
        k: np.asarray(v.detach().cpu().numpy())
        for k, v in module.state_dict().items()
    }
