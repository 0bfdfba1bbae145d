"""Structural tests for the torch -> JAX checkpoint converter.

Pretrained blobs are absent from this environment, so we build a synthetic
state_dict with the reference's exact key naming/shapes (v0.3.0
architecture) and verify every entry lands on the right param-tree leaf
with the right orientation, and that the converted model runs.
"""

from __future__ import annotations

import numpy as np
import pytest

from chgnet_tpu.models.checkpoint import (
    _torch_mlp_linear_indices,
    convert_state_dict,
)

ARGS = dict(
    atom_fea_dim=64,
    bond_fea_dim=64,
    angle_fea_dim=64,
    num_radial=31,
    num_angular=31,
    n_conv=4,
    atom_conv_hidden_dim=64,
    bond_conv_hidden_dim=64,
    angle_layer_hidden_dim=0,
    mlp_hidden_dims=(64, 64, 64),
    gMLP_norm="layer",
    readout_norm="layer",
    mlp_out_bias=False,
    update_bond=True,
    update_angle=True,
)


def _synthetic_state_dict(rng: np.random.Generator) -> dict[str, np.ndarray]:
    sd: dict[str, np.ndarray] = {}

    def add(key: str, *shape: int) -> None:
        sd[key] = rng.normal(size=shape).astype(np.float32)

    add("composition_model.fc.weight", 1, 94)
    add("atom_embedding.embedding.weight", 94, 64)
    add("bond_basis_expansion.rbf_expansion_ag.frequencies", 31)
    add("bond_basis_expansion.rbf_expansion_bg.frequencies", 31)
    add("angle_basis_expansion.fourier_expansion.frequencies", 15)
    add("bond_embedding.weight", 64, 31)
    add("bond_weights_ag.weight", 64, 31)
    add("bond_weights_bg.weight", 64, 31)
    add("angle_embedding.weight", 64, 31)

    def add_mlp(prefix: str, dims: list[int], indices: list[int]) -> None:
        for (d_in, d_out), idx in zip(zip(dims[:-1], dims[1:]), indices):
            add(f"{prefix}.layers.{idx}.weight", d_out, d_in)
            add(f"{prefix}.layers.{idx}.bias", d_out)

    for i in range(4):
        base = f"atom_conv_layers.{i}"
        for part in ("mlp_core", "mlp_gate"):
            add_mlp(f"{base}.twoBody_atom.{part}", [192, 64, 64], [0, 3])
        add(f"{base}.twoBody_atom.bn1.weight", 64)
        add(f"{base}.twoBody_atom.bn1.bias", 64)
        add(f"{base}.twoBody_atom.bn2.weight", 64)
        add(f"{base}.twoBody_atom.bn2.bias", 64)
        add(f"{base}.mlp_out.layers.1.weight", 64, 64)  # no bias (v0.3.0)
    for i in range(3):
        base = f"bond_conv_layers.{i}"
        for part in ("mlp_core", "mlp_gate"):
            add_mlp(f"{base}.twoBody_bond.{part}", [256, 64, 64], [0, 3])
        add(f"{base}.twoBody_bond.bn1.weight", 64)
        add(f"{base}.twoBody_bond.bn1.bias", 64)
        add(f"{base}.twoBody_bond.bn2.weight", 64)
        add(f"{base}.twoBody_bond.bn2.bias", 64)
        add(f"{base}.mlp_out.layers.1.weight", 64, 64)
    for i in range(3):
        base = f"angle_layers.{i}"
        for part in ("mlp_core", "mlp_gate"):
            add_mlp(f"{base}.twoBody_bond.{part}", [256, 64], [1])
        add(f"{base}.twoBody_bond.bn1.weight", 64)
        add(f"{base}.twoBody_bond.bn1.bias", 64)
        add(f"{base}.twoBody_bond.bn2.weight", 64)
        add(f"{base}.twoBody_bond.bn2.bias", 64)
    add("site_wise.weight", 1, 64)
    add("site_wise.bias", 1)
    add("readout_norm.weight", 64)
    add("readout_norm.bias", 64)
    add_mlp("mlp", [64, 64, 64, 64, 1], [0, 2, 4, 7])
    return sd


def test_mlp_linear_indices() -> None:
    assert _torch_mlp_linear_indices(None) == [1]
    assert _torch_mlp_linear_indices(0) == [1]
    assert _torch_mlp_linear_indices(64) == [0, 3]
    assert _torch_mlp_linear_indices((64, 64)) == [0, 2, 5]
    assert _torch_mlp_linear_indices((64, 64, 64)) == [0, 2, 4, 7]


def test_convert_state_dict_structure() -> None:
    rng = np.random.default_rng(0)
    sd = _synthetic_state_dict(rng)
    params = convert_state_dict(sd, ARGS)

    # orientation: stored transposed to x @ W convention
    assert params["bond_embedding"]["w"] == pytest.approx(
        sd["bond_embedding.weight"].T
    )
    assert params["composition"]["weight"] == pytest.approx(
        sd["composition_model.fc.weight"].reshape(-1)
    )
    assert params["atom_convs"][2]["gated_mlp"]["core"]["layers"][1][
        "w"
    ] == pytest.approx(
        sd["atom_conv_layers.2.twoBody_atom.mlp_core.layers.3.weight"].T
    )
    assert params["atom_convs"][1]["gated_mlp"]["norm_gate"][
        "scale"
    ] == pytest.approx(sd["atom_conv_layers.1.twoBody_atom.bn2.weight"])
    assert params["angle_updates"][0]["gated_mlp"]["core"]["layers"][0][
        "w"
    ] == pytest.approx(sd["angle_layers.0.twoBody_bond.mlp_core.layers.1.weight"].T)
    assert params["mlp"]["layers"][3]["w"] == pytest.approx(
        sd["mlp.layers.7.weight"].T
    )
    assert params["readout_norm"]["scale"] == pytest.approx(
        sd["readout_norm.weight"]
    )
    # mlp_out carries no bias in v0.3.0
    assert "b" not in params["atom_convs"][0]["mlp_out"]["layers"][0]


def test_converted_params_count_and_run(li_mn_o2) -> None:
    """Converted params power the default architecture: exact param count
    412,525 and a finite forward pass."""
    from chgnet_tpu.models import CHGNet
    from chgnet_tpu.utils import count_params

    rng = np.random.default_rng(1)
    params = convert_state_dict(_synthetic_state_dict(rng), ARGS)
    assert count_params(params) == 412_525

    model = CHGNet(
        params=params, graph_converter_algorithm="numpy", **ARGS
    )
    out = model.predict_structure(li_mn_o2, task="e")
    assert np.isfinite(out["e"])


def test_load_discovers_torch_checkpoint(tmp_path, monkeypatch) -> None:
    """CHGNet.load finds a reference-style .pth.tar via CHGNET_TPU_WEIGHTS
    and converts it on the fly (and raises clearly when nothing exists)."""
    import torch

    from chgnet_tpu.models import CHGNet

    monkeypatch.delenv("CHGNET_TPU_WEIGHTS", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path / "nohome"))
    with pytest.raises(FileNotFoundError, match="CHGNET_TPU_WEIGHTS"):
        CHGNet.load(verbose=False)

    rng = np.random.default_rng(7)
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in _synthetic_state_dict(rng).items()
    }
    torch.save(
        {"model": {"model_args": dict(ARGS), "state_dict": sd}},
        tmp_path / "chgnet_0.3.0_test.pth.tar",
    )
    monkeypatch.setenv("CHGNET_TPU_WEIGHTS", str(tmp_path))
    model = CHGNet.load(verbose=False)
    from chgnet_tpu.utils import count_params

    assert count_params(model.params) == 412_525
