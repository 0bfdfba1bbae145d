"""CHGNet-TPU: the charge-informed crystal GNN as a pure JAX function.

Functional re-design of the reference model
(``/root/reference/chgnet/model/model.py:35-746``):

* the whole forward pass is one jitted pure function of (params, batch)
  over static padded shapes (see ``chgnet_tpu.graph.batching``),
* forces and stress come from ONE ``jax.value_and_grad`` over cartesian
  coordinates and a per-graph symmetric strain variable — the reference
  needs two ``torch.autograd.grad`` calls with retained graphs
  (``model.py:517-535``). Energy is evaluated at positions
  ``cart @ (I + strain)`` and lattice ``L @ (I + strain)`` so
  d/d(cart) at strain=0 gives exactly -forces and d/d(strain) gives the
  virial for stress (x 160.21766208 / V -> GPa),
* magmoms are |site_wise(atom features)| read out before the last conv
  block, like ``model.py:477-487``.

Hyperparameter names, defaults and architecture (4 AtomConv / 3 BondConv /
3 AngleUpdate at 64-dim features, 31 radial / 31 angular bases) match the
reference so torch checkpoints convert 1:1 (412,525 params for v0.3.0).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
import warnings
from collections.abc import Sequence
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from chgnet_tpu import PredTask
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.graph.batching import GraphBatch, batch_graphs
from chgnet_tpu.graph.converter import CrystalGraphConverter
from chgnet_tpu.graph.crystalgraph import CrystalGraph
from chgnet_tpu.models import basis
from chgnet_tpu.models.composition import AtomRef
from chgnet_tpu.models.functions import (
    Params,
    layer_norm_apply,
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
    norm_init,
    segment_sum,
)
from chgnet_tpu.models.layers import (
    angle_update_apply_directed,
    angle_update_init,
    atom_conv_apply,
    atom_conv_dense_apply,
    atom_conv_init,
    attention_readout_apply,
    attention_readout_init,
    bond_conv_apply_directed,
    bond_conv_init,
    graph_pool,
)
from chgnet_tpu.ops.scatter import plan_gather
from chgnet_tpu.utils.common import count_params, load_params, save_params

module_dir = os.path.dirname(os.path.abspath(__file__))

EV_A3_TO_GPA = 160.21766208  # eV/A^3 -> GPa (model.py:532)


@dataclasses.dataclass(frozen=True)
class CHGNetConfig:
    """Hashable model hyperparameters (static under jit).

    Field names/defaults mirror the reference constructor
    (``model.py:40-71``) for checkpoint and API compatibility.
    """

    atom_fea_dim: int = 64
    bond_fea_dim: int = 64
    angle_fea_dim: int = 64
    composition_model: str = "MPtrj"
    num_radial: int = 31
    num_angular: int = 31
    n_conv: int = 4
    atom_conv_hidden_dim: int | tuple[int, ...] = 64
    update_bond: bool = True
    bond_conv_hidden_dim: int | tuple[int, ...] = 64
    update_angle: bool = True
    angle_layer_hidden_dim: int | tuple[int, ...] = 0
    conv_dropout: float = 0.0
    read_out: str = "ave"
    mlp_hidden_dims: int | tuple[int, ...] = (64, 64, 64)
    mlp_dropout: float = 0.0
    mlp_first: bool = True
    is_intensive: bool = True
    non_linearity: Literal["silu", "relu", "tanh", "gelu"] = "silu"
    atom_graph_cutoff: float = 6.0
    bond_graph_cutoff: float = 3.0
    graph_converter_algorithm: str = "fast"
    cutoff_coeff: float = 8.0
    learnable_rbf: bool = True
    gMLP_norm: str | None = "layer"
    readout_norm: str | None = "layer"
    conv_norm: str | None = None
    mlp_out_bias: bool = False
    final_mlp: str = "MLP"
    num_heads: int = 3
    version: str | None = None
    atom_ref_is_intensive: bool = True
    matmul_precision: str = "highest"
    compute_dtype: str = "float32"  # "bfloat16": conv stack in bf16 (see
    # _energy_core) — ~2x less HBM traffic on bandwidth-bound TPUs at the
    # cost of ~1e-2-relative feature precision; geometry/readout stay f32
    fused_kernels: bool = True  # Pallas fused gated-message tail kernels
    # (on TPU only; off-TPU the math falls back to the identical XLA
    # composition). Default ON since round 3: with the streaming plans in
    # place the fused tail removes the unfused tail's backward layout
    # copies (bench 487 -> 467 ms; round-2's "degrades" result predated
    # the multi-gather/hoist changes). Dropout paths fall back per layer.
    sorted_grads: bool = True  # backward scatters as sorted segment sums
    # via host-precomputed permutation plans (ops/scatter.py); False falls
    # back to XLA's default random scatter-add transpose
    remat: bool | str = False  # rematerialize conv layers (large-system
    # memory): True/"all" checkpoints every layer; "angle" checkpoints
    # only BondConv + AngleUpdate — the two layers whose [A, *]
    # angle-stream temps dominate the backward's peak (the atom stream
    # is ~A/2 smaller), at roughly half the recompute of "all"
    dense_atom_conv: bool = False  # [N, K] dense edge layout for AtomConv
    # (requires batches built with dense_k; K-reduce replaces the scatter)
    directed_bonds: bool = True  # bond features/weights live on the
    # DIRECTED edge stream ([E, *], twin-duplicated) instead of the
    # undirected table: every per-layer d2u expansion (a dispersed
    # whole-table row-gather forward + a permutation gather + segment sum
    # backward — XLA's slowest TPU path) vanishes, and BondConv's
    # [E] -> [U] reduction becomes one involution gather (partial +
    # partial[twin]). Numerics match the undirected path to ~1 ulp (the
    # reverse edge evaluates its own bond length; float non-associativity
    # makes twin distances equal only to rounding). Ignored under
    # dense_atom_conv (the dense slots index the undirected table).
    max_num_elements: int = 94

    def __post_init__(self) -> None:
        if self.num_angular % 2 != 1:
            raise ValueError(f"num_angular={self.num_angular} must be odd")
        if self.conv_dropout and self.dense_atom_conv:
            raise NotImplementedError(
                "conv_dropout with dense_atom_conv is not supported"
            )
        for name in ("atom_conv_hidden_dim", "bond_conv_hidden_dim",
                     "angle_layer_hidden_dim", "mlp_hidden_dims"):
            val = getattr(self, name)
            if isinstance(val, list):
                object.__setattr__(self, name, tuple(val))

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


def init_params(config: CHGNetConfig, seed: int = 0) -> Params:
    """Initialize the full parameter pytree (torch-default distributions)."""
    rng = np.random.default_rng(seed)
    cfg = config
    params: Params = {
        "atom_embedding": {
            "weight": rng.normal(
                size=(cfg.max_num_elements, cfg.atom_fea_dim)
            ).astype(np.float32)
        },
        "bond_basis": {
            "freq_ag": basis.bessel_frequencies(cfg.num_radial),
            "freq_bg": basis.bessel_frequencies(cfg.num_radial),
        },
        "angle_basis": {
            "freq": basis.fourier_frequencies((cfg.num_angular - 1) // 2)
        },
        "bond_embedding": linear_init(
            rng, cfg.num_radial, cfg.bond_fea_dim, bias=False
        ),
        "bond_weights_ag": linear_init(
            rng, cfg.num_radial, cfg.atom_fea_dim, bias=False
        ),
        "bond_weights_bg": linear_init(
            rng, cfg.num_radial, cfg.bond_fea_dim, bias=False
        ),
        "angle_embedding": linear_init(
            rng, cfg.num_angular, cfg.angle_fea_dim, bias=False
        ),
        "atom_convs": [
            atom_conv_init(
                rng,
                atom_fea_dim=cfg.atom_fea_dim,
                bond_fea_dim=cfg.bond_fea_dim,
                hidden_dim=cfg.atom_conv_hidden_dim,
                norm=cfg.conv_norm,
                gmlp_norm=cfg.gMLP_norm,
                mlp_out_bias=cfg.mlp_out_bias,
            )
            for _ in range(cfg.n_conv)
        ],
        "site_wise": linear_init(rng, cfg.atom_fea_dim, 1),
    }
    if cfg.update_bond:
        params["bond_convs"] = [
            bond_conv_init(
                rng,
                atom_fea_dim=cfg.atom_fea_dim,
                bond_fea_dim=cfg.bond_fea_dim,
                angle_fea_dim=cfg.angle_fea_dim,
                hidden_dim=cfg.bond_conv_hidden_dim,
                norm=cfg.conv_norm,
                gmlp_norm=cfg.gMLP_norm,
                mlp_out_bias=cfg.mlp_out_bias,
            )
            for _ in range(cfg.n_conv - 1)
        ]
    if cfg.update_angle:
        params["angle_updates"] = [
            angle_update_init(
                rng,
                atom_fea_dim=cfg.atom_fea_dim,
                bond_fea_dim=cfg.bond_fea_dim,
                angle_fea_dim=cfg.angle_fea_dim,
                hidden_dim=cfg.angle_layer_hidden_dim,
                norm=cfg.conv_norm,
                gmlp_norm=cfg.gMLP_norm,
            )
            for _ in range(cfg.n_conv - 1)
        ]
    ln = norm_init(cfg.readout_norm, cfg.atom_fea_dim)
    if ln is not None:
        params["readout_norm"] = ln

    if cfg.mlp_first:
        readout_in = cfg.atom_fea_dim
    elif cfg.read_out in {"attn", "weighted"}:
        params["attn_readout"] = attention_readout_init(
            rng, cfg.atom_fea_dim, num_heads=cfg.num_heads
        )
        readout_in = cfg.atom_fea_dim * cfg.num_heads
    else:
        readout_in = cfg.atom_fea_dim
    params["mlp"] = mlp_init(
        rng, readout_in, output_dim=1, hidden_dim=cfg.mlp_hidden_dims
    )

    if cfg.composition_model:
        atom_ref = AtomRef(is_intensive=cfg.is_intensive)
        atom_ref.initialize_from(cfg.composition_model)
        params["composition"] = {"weight": atom_ref.weight.copy()}
    return params


# ===================================================================== core
def _energy_core(
    params: Params,
    cfg: CHGNetConfig,
    batch: GraphBatch,
    cart: jnp.ndarray,  # [N, 3] unstrained cartesian coords
    strains: jnp.ndarray,  # [B, 3, 3]
    dropout_rng: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict]:
    """Extensive GNN energy per graph [B] plus auxiliary features.

    Differentiable in (cart, strains); all padded lanes contribute exactly
    zero and stay NaN-free (see batching module docstring). ``dropout_rng``
    enables train-mode dropout at the configured conv/mlp rates
    (reference ``model.py:59-64``); ``None`` = eval mode.
    """
    n_graphs = batch.lattices.shape[0]
    n_atoms_padded = batch.atomic_numbers.shape[0]
    eye = jnp.eye(3, dtype=cart.dtype)
    deform = eye[None] + strains  # [B, 3, 3]
    lat = jnp.einsum("bij,bjk->bik", batch.lattices, deform)
    pos = jnp.einsum("ni,nij->nj", cart, deform[batch.atom_owner])

    # backward gather plans: grad-of-gather becomes a sorted segment sum
    # instead of a random scatter-add (ops/scatter.py). The center-atom and
    # bond_i streams are sorted by construction and reuse the existing
    # scatter index arrays as their (identity-permutation) plans.
    if cfg.sorted_grads and batch.plan_nbr.dst.shape[0] > 0:
        from chgnet_tpu.ops.scatter import GatherPlan

        _empty = np.zeros(0, np.int32)
        p_center = (
            batch.plan_center
            if batch.plan_center.dst.shape[0] > 0
            else GatherPlan(_empty, batch.edge_scatter)
        )
        p_ang_vi = (
            batch.plan_ang_vi
            if batch.plan_ang_vi.dst.shape[0] > 0
            else GatherPlan(_empty, batch.angle_scatter_dir)
        )
        atom_plans = (p_center, batch.plan_d2u, batch.plan_nbr)
        # directed angle path: (dir_i, dir_j, center, d2u, u2d, u2d2)
        bond_plans = (
            p_ang_vi, batch.plan_ang_vj, batch.plan_ang_c, batch.plan_d2u,
            batch.plan_u2d, batch.plan_u2d2,
        )
        p_nbr, p_u2d = batch.plan_nbr, batch.plan_u2d
        p_ang_vj = batch.plan_ang_vj
    else:
        atom_plans = bond_plans = None
        p_center = p_nbr = p_u2d = p_ang_vi = p_ang_vj = None

    # bond vectors: center - (neighbor + image @ lattice)   (encoders.py:98-102)
    # The per-edge lattice rows go through a one-hot matmul instead of
    # lat[edge_owner]: the gather's transpose is a [E,3,3] -> [B,3,3]
    # scatter that runs at ~3/128 lane utilization on TPU (measured 34 ms
    # per E+F iteration at 650k edges), while the matmul transpose is a
    # [B,9] x [9,E]-shaped MXU contraction (sub-ms).
    owner_onehot = (
        batch.edge_owner[:, None] == jnp.arange(n_graphs)[None, :]
    ).astype(cart.dtype)
    # positions ride a 32-lane stream: a [*,3] f32 array occupies a full
    # 128-lane tile anyway, so padding to 32 costs no extra HBM bytes but
    # makes every geometry backward segment-sum eligible for the
    # streaming kernel (ops/stream_ops.py accepts d in {32, 64, 128})
    pos32 = jnp.pad(pos, ((0, 0), (0, 29)))
    # halo-tiled neighbor stream (GraphBatch.exp_map/nbr_x): one small
    # [N_x] expansion gather makes the per-edge neighbor gather
    # window-local at any structure size (graph/batching.py)
    tiled = (
        atom_plans is not None
        and batch.nbr_x.shape[0] > 0
        and batch.plan_nbr_x.dst.shape[0] > 0
        and not os.environ.get("CHGNET_TPU_NO_TILE")
    )
    directed = cfg.directed_bonds and not cfg.dense_atom_conv
    conv_dtype = (
        jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    )
    # optional reduced-precision conv stack: on a bandwidth-bound TPU the
    # edge/angle feature streams dominate runtime, so carrying them in
    # bfloat16 nearly halves HBM traffic. Geometry (bond vectors, bases)
    # and the energy readout stay float32.
    if conv_dtype != jnp.float32:
        conv_keys = [
            "atom_embedding", "bond_embedding", "bond_weights_ag",
            "bond_weights_bg", "angle_embedding", "atom_convs",
        ] + [k for k in ("bond_convs", "angle_updates") if k in params]
        params = dict(params) | jax.tree.map(
            lambda x: x.astype(conv_dtype),
            {k: params[k] for k in conv_keys},
        )

    remat_mode = (
        cfg.remat if isinstance(cfg.remat, str) else
        ("all" if cfg.remat else "")
    )
    if remat_mode not in ("", "all", "angle"):
        raise ValueError(f"remat={cfg.remat!r}: use False, True/'all', or 'angle'")

    enc_keys = [
        "bond_basis", "angle_basis", "bond_embedding",
        "bond_weights_ag", "bond_weights_bg", "angle_embedding",
    ]

    def _encode(pos32, lat, enc_params):
        """Geometry + bases + bond/angle embeddings + loop-invariant
        weight hoists, as one function of (positions, per-edge lattices).
        Under remat it is CHECKPOINTED: the [E, 31]/[A, 31] basis
        expansions, the geometry streams, and the pre-product w_i/w_j
        gathers — several GB of lane-padded residuals at the multi-
        million-angle scale — are recomputed in the backward from the
        tiny [N, 32] position stream instead of saved (the per-layer
        checkpoint residual wall, docs/performance.md)."""
        lat_edges = (owner_onehot @ lat.reshape(n_graphs, 9)).reshape(
            -1, 3, 3
        )
        center_pos = plan_gather(
            pos32, batch.atom_graph[:, 0], p_center
        )[:, :3]
        if tiled:
            pos_x = plan_gather(pos32, batch.exp_map, batch.plan_exp)
            nbr_gather = plan_gather(pos_x, batch.nbr_x, batch.plan_nbr_x)
        else:
            nbr_gather = plan_gather(pos32, batch.atom_graph[:, 1], p_nbr)
        nbr_pos = nbr_gather[:, :3] + (
            jnp.einsum("ei,eij->ej", batch.images, lat_edges)
        )
        vec = center_pos - nbr_pos
        dist = jnp.linalg.norm(vec, axis=1)  # padded: |a| > 0, finite grads
        unit = vec / dist[:, None]

        # geometry stream for the angle/bond paths: unit vector + distance
        # in one 32-lane row, so one gather per index stream serves both
        # and the transposes run through the streaming kernel
        geom = jnp.pad(
            jnp.concatenate([unit, dist[:, None]], axis=1),
            ((0, 0), (0, 28)),
        )

        # bond bases (both expansions on atom-graph bond lengths).
        # Directed mode keys them on the DIRECTED distance stream — each
        # reverse edge evaluates its own (twin-equal to rounding) length,
        # so the dispersed u2d gather and every later d2u expansion
        # disappear; undirected mode matches the reference layout
        # ([U] tables, model.py:443-466).
        bond_dist = (
            dist
            if directed
            else plan_gather(geom, batch.undirected2directed, p_u2d)[:, 3]
        )
        rbf_ag = basis.radial_bessel(
            bond_dist,
            enc_params["bond_basis"]["freq_ag"],
            cfg.atom_graph_cutoff,
            cfg.cutoff_coeff,
        )
        rbf_bg = basis.radial_bessel(
            bond_dist,
            enc_params["bond_basis"]["freq_bg"],
            cfg.bond_graph_cutoff,
            cfg.cutoff_coeff,
        )

        # angle basis from directed unit bond vectors (encoders.py:133-146),
        # gathered from the 32-lane geometry stream. (Per-component 1-D
        # gathers were tried here and are a trap: XLA's T(1024) 1-D
        # gather/scatter path runs at ~17 ns/row — six of them cost
        # ~180 ms per iteration at 800k angle rows, a third of the whole
        # E+F+S+M pass. The 32-lane rows gather at the same row rate as
        # [A,3] and their backward is a kernel-eligible segment sum.)
        gi = plan_gather(geom, batch.bond_graph[:, 2], p_ang_vi)
        gj = plan_gather(geom, batch.bond_graph[:, 4], p_ang_vj)
        cos_ij = jnp.sum(gi[:, :3] * gj[:, :3], axis=1) * (1 - 1e-6)
        angles = jnp.arccos(cos_ij)
        angle_bases = basis.fourier(angles, enc_params["angle_basis"]["freq"])

        if conv_dtype != jnp.float32:
            rbf_ag = rbf_ag.astype(conv_dtype)
            rbf_bg = rbf_bg.astype(conv_dtype)
            angle_bases = angle_bases.astype(conv_dtype)

        # embeddings (model.py:431-439)
        bond_feas = linear_apply(enc_params["bond_embedding"], rbf_ag)
        bond_weights_ag = linear_apply(enc_params["bond_weights_ag"], rbf_ag)
        bond_weights_bg = linear_apply(enc_params["bond_weights_bg"], rbf_bg)
        angle_feas = linear_apply(enc_params["angle_embedding"], angle_bases)

        # Hoist the LOOP-INVARIANT edge/angle weight streams out of the
        # conv stack: bond_weights_{ag,bg} never change across layers, so
        # their d2u expansion (AtomConv, reference layers.py:119) and the
        # per-angle w_i*w_j product (BondConv, layers.py:248-252) are
        # gathered ONCE here instead of per layer — deduping both the
        # forward gathers and their backward scatter-transposes (Pallas
        # custom calls, which XLA's CSE does not merge).
        if cfg.dense_atom_conv:
            weights_e_h = None
        elif directed:
            weights_e_h = bond_weights_ag  # already on the directed stream
        else:
            weights_e_h = plan_gather(
                bond_weights_ag, batch.directed2undirected,
                atom_plans[1] if atom_plans is not None else None,
            )
        weights_a_h = None
        if cfg.update_bond:
            p_i_h, p_j_h, _, p_d2u_h = (
                bond_plans[:4] if bond_plans is not None else (None,) * 4
            )
            w_dir_h = (
                bond_weights_bg
                if directed
                else plan_gather(
                    bond_weights_bg, batch.directed2undirected, p_d2u_h
                )
            )
            weights_a_h = plan_gather(
                w_dir_h, batch.bond_graph[:, 2], p_i_h
            ) * plan_gather(w_dir_h, batch.bond_graph[:, 4], p_j_h)
        return (
            bond_feas, bond_weights_ag, bond_weights_bg, angle_feas,
            weights_e_h, weights_a_h,
        )

    if remat_mode:
        _encode = jax.checkpoint(_encode)
    (
        bond_feas, bond_weights_ag, bond_weights_bg, angle_feas,
        weights_e_h, weights_a_h,
    ) = _encode(pos32, lat, {k: params[k] for k in enc_keys})

    # atom embedding (Z=1 -> row 0); [N]-keyed, stays outside the
    # checkpointed encoder
    z_index = jnp.clip(batch.atomic_numbers - 1, 0, cfg.max_num_elements - 1)
    atom_feas = params["atom_embedding"]["weight"][z_index]

    act = cfg.non_linearity
    edge_mask = batch.edge_mask.astype(conv_dtype)
    angle_mask = batch.angle_mask.astype(conv_dtype)

    use_dense = cfg.dense_atom_conv
    if use_dense and batch.dense_mask.shape[1] == 0:
        raise ValueError(
            "dense_atom_conv=True requires batches built with "
            "batch_graphs(..., dense_k=True)"
        )
    dense_mask_c = (
        batch.dense_mask.astype(conv_dtype) if use_dense else None
    )

    conv_rate = float(cfg.conv_dropout)
    if dropout_rng is not None:
        block_rngs = list(jax.random.split(dropout_rng, 3 * cfg.n_conv + 1))
        mlp_rng = block_rngs.pop()
    else:
        block_rngs = [None] * (3 * cfg.n_conv)
        mlp_rng = None

    def atom_step(atom_p, atom_feas, bond_feas, bond_weights_ag, rng):
        if use_dense:
            return atom_conv_dense_apply(
                atom_p,
                atom_feas,
                bond_feas,
                bond_weights_ag,
                batch.dense_nbr,
                batch.dense_bond,
                dense_mask_c,
                activation=act,
            )
        nbr_part = None
        if tiled:
            atom_x = plan_gather(atom_feas, batch.exp_map, batch.plan_exp)
            nbr_part = (atom_x, batch.nbr_x, batch.plan_nbr_x)
        return atom_conv_apply(
            atom_p,
            atom_feas,
            bond_feas,
            bond_weights_ag,
            batch.atom_graph,
            batch.edge_scatter,
            batch.directed2undirected,
            edge_mask,
            activation=act,
            fused=cfg.fused_kernels,
            plans=atom_plans,
            dropout=conv_rate,
            rng=rng,
            weights_e=weights_e_h,
            directed_table=directed,
            nbr_part=nbr_part,
        )

    def bond_step(bond_p, atom_feas, bond_feas, bond_weights_bg,
                  angle_feas, rng, atom_e=None):
        return bond_conv_apply_directed(
            bond_p,
            atom_feas,
            bond_feas,
            bond_weights_bg,
            angle_feas,
            batch.bond_graph,
            batch.angle_scatter_dir,
            batch.directed2undirected,
            batch.undirected2directed,
            batch.und_second,
            angle_mask,
            activation=act,
            fused=cfg.fused_kernels,
            plans=bond_plans,
            dropout=conv_rate,
            rng=rng,
            weights_a=weights_a_h,
            twin=batch.twin,
            directed_table=directed,
            atom_e=atom_e,
        )

    def angle_step(angle_p, atom_feas, bond_feas, angle_feas, rng,
                   atom_e=None):
        return angle_update_apply_directed(
            angle_p,
            atom_feas,
            bond_feas,
            angle_feas,
            batch.bond_graph,
            batch.directed2undirected,
            activation=act,
            fused=cfg.fused_kernels,
            plans=bond_plans,
            dropout=conv_rate,
            rng=rng,
            directed_table=directed,
            atom_e=atom_e,
        )

    if remat_mode:
        # trade recompute for memory: per-LAYER rematerialization. A
        # whole-block checkpoint peaks at AtomConv + BondConv +
        # AngleUpdate angle-stream temps simultaneously during the block
        # backward (>16 GB at 10k atoms / 3.9M angle rows); checkpointing
        # each layer caps the peak at one layer's [E,*]/[A,*] pipeline.
        # "angle" checkpoints only the angle-stream layers.
        if remat_mode == "all":
            atom_step = jax.checkpoint(atom_step)
        bond_step = jax.checkpoint(bond_step)
        angle_step = jax.checkpoint(angle_step)

    # fold the atom part of the angle-side layers into their dir_i gather
    # (see bond_conv_apply_directed): the [E, d_atom] center expansion is
    # computed once per conv block and shared by BondConv + AngleUpdate
    fold_atoms = (
        atom_plans is not None
        and not cfg.dense_atom_conv
        and (cfg.update_bond or cfg.update_angle)
        and not os.environ.get("CHGNET_TPU_NO_ATOM_FOLD")
    )

    def conv_block(idx, layer_params, atom_feas, bond_feas, angle_feas,
                   bond_weights_ag, bond_weights_bg):
        atom_p, bond_p, angle_p = layer_params
        atom_feas = atom_step(
            atom_p, atom_feas, bond_feas, bond_weights_ag,
            block_rngs[3 * idx],
        )
        atom_e = (
            plan_gather(atom_feas, batch.atom_graph[:, 0], p_center)
            if fold_atoms and (bond_p is not None or angle_p is not None)
            else None
        )
        if bond_p is not None:
            bond_feas = bond_step(
                bond_p, atom_feas, bond_feas, bond_weights_bg, angle_feas,
                block_rngs[3 * idx + 1], atom_e,
            )
        if angle_p is not None:
            angle_feas = angle_step(
                angle_p, atom_feas, bond_feas, angle_feas,
                block_rngs[3 * idx + 2], atom_e,
            )
        return atom_feas, bond_feas, angle_feas

    atom_feas_mid = atom_feas  # overwritten at block n_conv - 2
    for idx in range(cfg.n_conv - 1):
        layer_params = (
            params["atom_convs"][idx],
            params["bond_convs"][idx] if cfg.update_bond else None,
            params["angle_updates"][idx] if cfg.update_angle else None,
        )
        atom_feas, bond_feas, angle_feas = conv_block(
            idx, layer_params, atom_feas, bond_feas, angle_feas,
            bond_weights_ag, bond_weights_bg,
        )
        if idx == cfg.n_conv - 2:
            atom_feas_mid = atom_feas

    if use_dense:
        atom_feas = atom_conv_dense_apply(
            params["atom_convs"][cfg.n_conv - 1],
            atom_feas,
            bond_feas,
            bond_weights_ag,
            batch.dense_nbr,
            batch.dense_bond,
            dense_mask_c,
            activation=act,
        )
    else:
        atom_feas = atom_conv_apply(
            params["atom_convs"][cfg.n_conv - 1],
            atom_feas,
            bond_feas,
            bond_weights_ag,
            batch.atom_graph,
            batch.edge_scatter,
            batch.directed2undirected,
            edge_mask,
            activation=act,
            fused=cfg.fused_kernels,
            plans=atom_plans,
            dropout=conv_rate,
            rng=block_rngs[3 * (cfg.n_conv - 1)],
            weights_e=weights_e_h,
            directed_table=directed,
        )
    atom_feas = atom_feas.astype(jnp.float32)  # readout stays float32
    if "readout_norm" in params:
        atom_feas = layer_norm_apply(params["readout_norm"], atom_feas)

    # pooling + readout (model.py:501-514)
    atom_scatter = jnp.where(
        batch.atom_mask > 0, batch.atom_owner, n_graphs
    ).astype(jnp.int32)
    atoms_per_graph = segment_sum(
        batch.atom_mask[:, None], atom_scatter, n_graphs, indices_are_sorted=True
    ).reshape(-1)

    aux: dict = {
        "atom_feas_mid": atom_feas_mid,
        "atom_feas": atom_feas,
        "atoms_per_graph": atoms_per_graph,
    }
    if cfg.mlp_first:
        site_energies = mlp_apply(
            params["mlp"], atom_feas, activation=act,
            dropout=float(cfg.mlp_dropout), rng=mlp_rng,
        )
        site_energies = site_energies * batch.atom_mask[:, None]
        energy_ext = segment_sum(
            site_energies, atom_scatter, n_graphs, indices_are_sorted=True
        ).reshape(-1)
        aux["site_energies"] = site_energies.reshape(-1)
        aux["crystal_fea"] = graph_pool(
            atom_feas * batch.atom_mask[:, None], atom_scatter, n_graphs
        )
    else:
        if cfg.read_out in {"attn", "weighted"}:
            crystal_feas = attention_readout_apply(
                params["attn_readout"],
                atom_feas,
                atom_scatter,
                batch.atom_mask,
                n_graphs,
                average=True,
                activation=act,
            )
        else:
            crystal_feas = graph_pool(
                atom_feas * batch.atom_mask[:, None],
                atom_scatter,
                n_graphs,
                average=True,
            )
        energy_ext = (
            mlp_apply(
                params["mlp"], crystal_feas, activation=act,
                dropout=float(cfg.mlp_dropout), rng=mlp_rng,
            ).reshape(-1)
            * atoms_per_graph
        )
        aux["crystal_fea"] = crystal_feas

    return energy_ext, aux


@functools.partial(
    jax.jit,
    static_argnames=(
        "config",
        "compute_force",
        "compute_stress",
        "compute_magmom",
    ),
)
def compute_batch(
    params: Params,
    batch: GraphBatch,
    *,
    config: CHGNetConfig,
    compute_force: bool = False,
    compute_stress: bool = False,
    compute_magmom: bool = False,
    dropout_rng: jnp.ndarray | None = None,
) -> dict[str, jnp.ndarray]:
    """Jitted batched prediction over padded arrays.

    Returns padded device arrays: e [B] (eV/atom if intensive), f [N, 3],
    s [B, 3, 3] (GPa), m [N], site_energies [N], crystal_fea [B, d],
    atoms_per_graph [B]. ``dropout_rng`` activates train-mode dropout at
    the configured ``conv_dropout`` / ``mlp_dropout`` rates.
    """
    cfg = config
    with jax.default_matmul_precision(cfg.matmul_precision):
        n_graphs = batch.lattices.shape[0]
        frac = batch.frac_coords.astype(jnp.float32)
        cart0 = jnp.einsum("ni,nij->nj", frac, batch.lattices[batch.atom_owner])
        strains0 = jnp.zeros((n_graphs, 3, 3), dtype=cart0.dtype)

        def energy_of(cart, strains):
            energy_ext, aux = _energy_core(
                params, cfg, batch, cart, strains, dropout_rng
            )
            return energy_ext.sum(), (energy_ext, aux)

        prediction: dict[str, jnp.ndarray] = {}
        if compute_force or compute_stress:
            argnums = (0, 1) if compute_stress else (0,)
            (_, (energy_ext, aux)), grads = jax.value_and_grad(
                energy_of, argnums=argnums, has_aux=True
            )(cart0, strains0)
            if compute_force:
                prediction["f"] = -grads[0]
            if compute_stress:
                volumes = jnp.abs(jnp.linalg.det(batch.lattices))
                prediction["s"] = (
                    grads[-1] * EV_A3_TO_GPA / volumes[:, None, None]
                )
        else:
            energy_ext, aux = _energy_core(
                params, cfg, batch, cart0, strains0, dropout_rng
            )

        atoms_per_graph = aux["atoms_per_graph"]
        safe_counts = jnp.maximum(atoms_per_graph, 1.0)
        energy = energy_ext / safe_counts if cfg.is_intensive else energy_ext

        # frozen AtomRef composition energy (model.py:356-358, 378)
        if "composition" in params:
            site_ref = params["composition"]["weight"][
                jnp.clip(batch.atomic_numbers - 1, 0, cfg.max_num_elements - 1)
            ] * batch.atom_mask
            atom_scatter = jnp.where(
                batch.atom_mask > 0, batch.atom_owner, n_graphs
            ).astype(jnp.int32)
            comp_ext = segment_sum(
                site_ref[:, None], atom_scatter, n_graphs, indices_are_sorted=True
            ).reshape(-1)
            comp_e = (
                comp_ext / safe_counts if cfg.atom_ref_is_intensive else comp_ext
            )
            energy = energy + comp_e
            prediction["site_energies"] = aux.get(
                "site_energies", jnp.zeros_like(site_ref)
            ) + site_ref
        elif "site_energies" in aux:
            prediction["site_energies"] = aux["site_energies"]

        prediction["e"] = energy
        prediction["atoms_per_graph"] = atoms_per_graph
        prediction["crystal_fea"] = aux["crystal_fea"]
        prediction["atom_fea"] = aux["atom_feas_mid"]
        if compute_magmom:
            magmom = jnp.abs(
                linear_apply(params["site_wise"], aux["atom_feas_mid"])
            ).reshape(-1)
            prediction["m"] = magmom * batch.atom_mask
        return prediction


# ==================================================================== model
class CHGNet:
    """Host-facing model wrapper: config + param pytree + converter.

    Mirrors the reference public API (``forward`` / ``predict_structure`` /
    ``predict_graph`` / ``as_dict`` / ``from_dict`` / ``from_file`` /
    ``load``) with jit-cached padded batching underneath.
    """

    def __init__(
        self,
        *,
        params: Params | None = None,
        seed: int = 0,
        verbose: bool = False,
        **kwargs,
    ) -> None:
        converter_verbose = kwargs.pop("converter_verbose", False)
        field_names = {f.name for f in dataclasses.fields(CHGNetConfig)}
        unknown = set(kwargs) - field_names
        if unknown:
            warnings.warn(f"ignoring unknown model args {sorted(unknown)}")
        cfg_kwargs = {k: v for k, v in kwargs.items() if k in field_names}
        if "atom_ref_is_intensive" not in cfg_kwargs:
            # The reference AtomRef's intensiveness is set by the DATASET the
            # weights come from, not by the model flag: initialize_from_MPtrj
            # and _mp_r2scan force True, _MPF forces False
            # (/root/reference/chgnet/model/composition_model.py:320,425,532).
            comp = cfg_kwargs.get("composition_model", "MPtrj")
            cfg_kwargs["atom_ref_is_intensive"] = comp != "MPF"
        self.config = CHGNetConfig(**cfg_kwargs)
        self.params = (
            params if params is not None else init_params(self.config, seed)
        )
        self.graph_converter = CrystalGraphConverter(
            atom_graph_cutoff=self.config.atom_graph_cutoff,
            bond_graph_cutoff=self.config.bond_graph_cutoff,
            algorithm=self.config.graph_converter_algorithm,
            verbose=converter_verbose,
        )
        if verbose:
            print(
                f"CHGNet-TPU initialized with {self.n_params:,} parameters"
            )

    # ------------------------------------------------------------ properties
    @property
    def version(self) -> str | None:
        return self.config.version

    @property
    def n_params(self) -> int:
        return count_params(self.params)

    @property
    def is_intensive(self) -> bool:
        return self.config.is_intensive

    # -------------------------------------------------------------- forward
    def forward(
        self,
        graphs: Sequence[CrystalGraph],
        *,
        task: PredTask = "e",
        bucket: bool = True,
    ) -> dict[str, np.ndarray | list[np.ndarray]]:
        """Batched prediction keeping reference semantics: returns a dict
        with 'e' [B] plus per-graph lists for f/s/m when requested."""
        batch = batch_graphs(
            graphs, bucket=bucket, dense_k=self.config.dense_atom_conv
        )
        out = compute_batch(
            self.params,
            batch,
            config=self.config,
            compute_force="f" in task,
            compute_stress="s" in task,
            compute_magmom="m" in task,
        )
        return self._unpad(out, graphs, task)

    def __call__(self, graphs: Sequence[CrystalGraph], **kwargs):
        return self.forward(graphs, **kwargs)

    @staticmethod
    def _unpad(
        out: dict[str, jnp.ndarray],
        graphs: Sequence[CrystalGraph],
        task: str,
    ) -> dict:
        n_graphs = len(graphs)
        sizes = [g.n_atoms for g in graphs]
        offsets = np.concatenate([[0], np.cumsum(sizes)])
        result: dict = {
            "e": np.asarray(out["e"])[:n_graphs],
            "atoms_per_graph": np.asarray(out["atoms_per_graph"])[:n_graphs],
        }
        if "f" in task:
            forces = np.asarray(out["f"])
            result["f"] = [
                forces[offsets[i]: offsets[i + 1]] for i in range(n_graphs)
            ]
        if "s" in task:
            result["s"] = [np.asarray(out["s"])[i] for i in range(n_graphs)]
        if "m" in task:
            mag = np.asarray(out["m"])
            result["m"] = [
                mag[offsets[i]: offsets[i + 1]] for i in range(n_graphs)
            ]
        for key, per_atom in (("site_energies", True), ("atom_fea", True)):
            if key in out:
                arr = np.asarray(out[key])
                result[key] = [
                    arr[offsets[i]: offsets[i + 1]] for i in range(n_graphs)
                ]
        if "crystal_fea" in out:
            result["crystal_fea"] = [
                np.asarray(out["crystal_fea"])[i] for i in range(n_graphs)
            ]
        return result

    # ------------------------------------------------------------ prediction
    def predict_structure(
        self,
        structure: Structure | Sequence[Structure],
        *,
        task: PredTask = "efsm",
        batch_size: int = 16,
        return_site_energies: bool = False,
        return_atom_feas: bool = False,
        return_crystal_feas: bool = False,
    ):
        """Predict E (eV/atom), F (eV/A), S (GPa), M (mu_B) from structures."""
        structures = (
            [structure] if isinstance(structure, Structure) else list(structure)
        )
        graphs = [self.graph_converter(s) for s in structures]
        return self.predict_graph(
            graphs,
            task=task,
            batch_size=batch_size,
            return_site_energies=return_site_energies,
            return_atom_feas=return_atom_feas,
            return_crystal_feas=return_crystal_feas,
        )

    def predict_graph(
        self,
        graph: CrystalGraph | Sequence[CrystalGraph],
        *,
        task: PredTask = "efsm",
        batch_size: int = 16,
        return_site_energies: bool = False,
        return_atom_feas: bool = False,
        return_crystal_feas: bool = False,
    ):
        """Predict from graphs; returns one dict per graph (or a single
        dict for a single input), numpy-valued, matching reference keys."""
        graphs = [graph] if isinstance(graph, CrystalGraph) else list(graph)
        predictions: list[dict] = [{} for _ in graphs]
        n_steps = math.ceil(len(graphs) / batch_size)
        for step in range(n_steps):
            chunk = graphs[batch_size * step: batch_size * (step + 1)]
            out = self.forward(chunk, task=task)
            for idx in range(len(chunk)):
                pred = predictions[step * batch_size + idx]
                pred["e"] = float(out["e"][idx])
                if "f" in task:
                    pred["f"] = out["f"][idx]
                if "s" in task:
                    pred["s"] = out["s"][idx]
                if "m" in task:
                    pred["m"] = out["m"][idx]
                if return_site_energies:
                    pred["site_energies"] = out["site_energies"][idx]
                if return_atom_feas:
                    pred["atom_fea"] = out["atom_fea"][idx]
                if return_crystal_feas:
                    pred["crystal_fea"] = out["crystal_fea"][idx]
        return predictions[0] if len(graphs) == 1 else predictions

    # ---------------------------------------------------------- persistence
    def as_dict(self) -> dict:
        return {"params": self.params, "model_args": self.config.as_dict()}

    def save(self, path: str) -> None:
        """Save params + config to one .npz checkpoint."""
        save_params(self.params, self.config.as_dict(), path)

    @classmethod
    def from_dict(cls, dct: dict, **kwargs) -> CHGNet:
        return cls(params=dct["params"], **{**dct["model_args"], **kwargs})

    @classmethod
    def from_file(cls, path: str, **kwargs) -> CHGNet:
        """Load from a native .npz checkpoint, or convert a torch
        ``.pth.tar`` reference checkpoint on the fly."""
        if path.endswith((".pth.tar", ".pt", ".tar")):
            from chgnet_tpu.models.checkpoint import load_torch_checkpoint

            params, model_args = load_torch_checkpoint(path)
        else:
            params, model_args = load_params(path)
        model_args.update(kwargs)
        return cls(params=params, **model_args)

    @classmethod
    def load(
        cls,
        *,
        model_name: str = "0.3.0",
        use_device: str | None = None,
        verbose: bool = True,
    ) -> CHGNet:
        """Load a pretrained checkpoint by name.

        Looks for ``chgnet_tpu/pretrained/<name>.npz`` (converted weights)
        and falls back to converting the reference ``.pth.tar`` if present.
        """
        known = {"0.3.0", "0.2.0", "r2scan"}
        if model_name not in known:
            raise ValueError(f"Unknown {model_name=}, choose from {known}")
        # search order: packaged npz, $CHGNET_TPU_WEIGHTS, user cache —
        # each as native .npz or a reference torch .pth.tar (converted on
        # the fly by from_file; the converter is parity-proven in
        # tests/test_torch_parity.py / tests/test_checkpoint.py)
        import glob

        roots = [os.path.join(module_dir, "..", "pretrained")]
        if os.environ.get("CHGNET_TPU_WEIGHTS"):
            roots.append(os.environ["CHGNET_TPU_WEIGHTS"])
        roots.append(
            os.path.join(os.path.expanduser("~"), ".cache", "chgnet_tpu")
        )
        found = None
        for root in roots:
            for pattern in (
                f"{model_name}.npz",
                f"{model_name}/*.pth.tar",
                f"*{model_name}*.pth.tar",
            ):
                hits = sorted(glob.glob(os.path.join(root, pattern)))
                if hits:
                    found = hits[0]
                    break
            if found:
                break
        if found is None:
            raise FileNotFoundError(
                f"No pretrained weights for {model_name!r} under "
                f"{[os.path.abspath(r) for r in roots]}. Pretrained "
                "checkpoint blobs are not shipped in this environment; "
                "place the published reference .pth.tar (or a converted "
                ".npz) in one of these directories, or point "
                "CHGNET_TPU_WEIGHTS at it. See "
                "chgnet_tpu.models.checkpoint.convert_torch_checkpoint()."
            )
        model = cls.from_file(found, version=model_name)
        if verbose:
            print(f"CHGNet-TPU {model_name} loaded ({model.n_params:,} params)")
        return model

    def todict(self) -> dict:
        return {"model_name": type(self).__name__, "model_args": self.config.as_dict()}
