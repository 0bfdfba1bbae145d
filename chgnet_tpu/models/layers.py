"""Message-passing layers: AtomConv / BondConv / AngleUpdate / pooling.

Semantics match the reference (``/root/reference/chgnet/model/layers.py``)
but operate on the padded static-shape ``GraphBatch`` arrays:

* gathers use in-range padded indices; messages of padded lanes are masked,
* scatters use one-past-the-end indices for padding (dropped by XLA) and
  are sorted by construction (``indices_are_sorted=True``).

Layers are (init, apply) pure-function pairs over param pytrees.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from chgnet_tpu.models.functions import (
    Params,
    find_activation as find_activation_cached,
    first_layer_acc,
    first_layer_acc_joint,
    gated_mlp_apply,
    gated_mlp_fusable,
    gated_mlp_fused_pack,
    gated_mlp_update_fusable,
    gated_mlp_gather_apply,
    gated_mlp_init,
    layer_norm_apply,
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
    norm_init,
    project_parts_fold,
    gated_mlp_tail,
    segment_mean,
    segment_sum,
)
from chgnet_tpu.ops.scatter import (
    plan_gather,
    plan_segment_sum,
    plan_segment_sum_perm,
    twin_reduce,
)


def _layer_acc(gmlp: Params, parts, fold=None):
    return first_layer_acc(
        gmlp["core"]["layers"], gmlp["gate"]["layers"], parts, fold
    )


def _msg_reduce_ok(L: int, gmlp: Params, plan, n_out: int) -> bool:
    """Eligibility for the fused message-reduce sweep (tail + sorted
    segment sum in one kernel) — mono-kernel mode keeps the old split."""
    import os

    if os.environ.get("CHGNET_TPU_FUSED_PASS"):
        return False
    from chgnet_tpu.ops import stream_ops
    from chgnet_tpu.ops.gated_message import msg_reduce_ok

    two_dim = 2 * gmlp["core"]["layers"][-1]["w"].shape[1]
    fake = type("S", (), {"ndim": 2, "shape": (L, two_dim)})()
    return L % stream_ops.C == 0 and msg_reduce_ok(fake, plan, n_out)


def _fused_layer(
    gmlp: Params,
    parts,
    fold=None,
    *,
    weights=None,
    mask=None,
    resnet=None,
):
    """Fused-tail conv-layer pass: the opt-in mono-kernel when requested
    (``CHGNET_TPU_FUSED_PASS``), else the first-layer accumulator (the
    union-window gather-project kernel when eligible, ``ops/gproj.py``)
    followed by the fused gated tail kernels (``ops/gated_message.py``).
    ``weights`` selects the message shape (AtomConv/BondConv);
    ``resnet`` without weights selects the update shape (AngleUpdate)."""
    import os

    if os.environ.get("CHGNET_TPU_FUSED_PASS"):
        from chgnet_tpu.ops.fused_pass import fused_layer_pass

        projected, b1 = project_parts_fold(
            gmlp["core"]["layers"], gmlp["gate"]["layers"], parts, fold
        )
        return fused_layer_pass(
            projected,
            b1,
            gated_mlp_fused_pack(gmlp),
            weights=weights,
            mask=mask,
            resnet=resnet,
        )
    from chgnet_tpu.ops.gated_message import (
        fused_gated_message,
        fused_gated_update,
    )

    acc = _layer_acc(gmlp, parts, fold)
    p2 = gated_mlp_fused_pack(gmlp)
    if weights is not None:
        out = fused_gated_message(
            acc,
            weights,
            mask
            if mask is not None
            else jnp.ones(acc.shape[0], acc.dtype),
            p2,
        )
        return out if resnet is None else out + resnet
    if mask is not None:
        raise NotImplementedError("mask without weights is unsupported")
    resnet_in = (
        resnet
        if resnet is not None
        else jnp.zeros(
            (acc.shape[0], p2["nc_scale"].shape[-1]), acc.dtype
        )
    )
    return fused_gated_update(acc, resnet_in, p2)


# ------------------------------------------------------------------ AtomConv
def atom_conv_init(
    rng: np.random.Generator,
    *,
    atom_fea_dim: int,
    bond_fea_dim: int,
    hidden_dim: int | Sequence[int] = 64,
    norm: str | None = None,
    gmlp_norm: str | None = "layer",
    use_mlp_out: bool = True,
    mlp_out_bias: bool = False,
    resnet: bool = True,
) -> Params:
    params: Params = {
        "gated_mlp": gated_mlp_init(
            rng,
            2 * atom_fea_dim + bond_fea_dim,
            atom_fea_dim,
            hidden_dim=hidden_dim,
            norm=gmlp_norm,
        )
    }
    if use_mlp_out:
        params["mlp_out"] = mlp_init(
            rng, atom_fea_dim, output_dim=atom_fea_dim, hidden_dim=0, bias=mlp_out_bias
        )
    ln = norm_init(norm, atom_fea_dim)
    if ln is not None:
        params["norm"] = ln
    return params


def atom_conv_apply(
    params: Params,
    atom_feas: jnp.ndarray,  # [N, d_atom]
    bond_feas: jnp.ndarray,  # [U, d_bond]
    bond_weights: jnp.ndarray,  # [U, d_atom]
    atom_graph: jnp.ndarray,  # [E, 2]
    edge_scatter: jnp.ndarray,  # [E] (padding -> N, dropped)
    directed2undirected: jnp.ndarray,  # [E]
    edge_mask: jnp.ndarray,  # [E]
    *,
    activation: str = "silu",
    resnet: bool = True,
    fused: bool = False,
    plans: tuple | None = None,  # (center, d2u, nbr) GatherPlans
    dropout: float = 0.0,
    rng: jnp.ndarray | None = None,
    weights_e: jnp.ndarray | None = None,  # [E, d] hoisted bond weights
    directed_table: bool = False,
    nbr_part: tuple | None = None,  # halo-tiled (atom_x, nbr_x, plan)
) -> jnp.ndarray:
    """Gated-MLP messages over directed edges -> bond-weight scaling ->
    sorted segment-sum into center atoms (``layers.py:81-137``). The
    [E, 3d] concat of the reference is replaced by split first-layer
    projections on the atom/bond tables (see ``gated_mlp_gather_apply``);
    with ``fused`` the message tail runs as one Pallas kernel; ``plans``
    turn the backward scatters into sorted segment sums (ops/scatter.py).
    ``weights_e`` is the d2u-expanded bond-weight table — loop-invariant
    across conv layers, so callers hoist it out of the stack to dedup its
    gather (and the backward scatter-transpose) instead of paying it per
    layer. With ``directed_table`` the bond features/weights live on the
    DIRECTED edge stream ([E, *], twin-duplicated — see
    ``CHGNetConfig.directed_bonds``): the bond part joins the first-layer
    sum as an ALIGNED stream and the dispersed d2u expansion (forward
    gather + backward permutation + segment sum, per layer) vanishes.
    """
    p_center, p_d2u, p_nbr = plans if plans is not None else (None,) * 3
    bond_part = (
        (bond_feas, None, None)
        if directed_table
        else (bond_feas, directed2undirected, p_d2u)
    )
    parts = [
        (atom_feas, atom_graph[:, 0], p_center),
        bond_part,
        # halo-tiled batches (GraphBatch.nbr_x) gather neighbors from the
        # per-tile expanded table so the stream stays window-local at any
        # structure size; the caller supplies the expanded table
        nbr_part
        if nbr_part is not None
        else (atom_feas, atom_graph[:, 1], p_nbr),
    ]
    if weights_e is None:
        weights_e = (
            bond_weights
            if directed_table
            else plan_gather(bond_weights, directed2undirected, p_d2u)
        )
    gmlp = params["gated_mlp"]
    if rng is not None and dropout > 0.0:
        fused = False  # the Pallas tail has no dropout support
    if fused and gated_mlp_fusable(gmlp, activation) and _msg_reduce_ok(
        edge_scatter.shape[0], gmlp, p_center, atom_feas.shape[0]
    ):
        from chgnet_tpu.ops.gated_message import fused_gated_message_reduce

        acc = _layer_acc(gmlp, parts)
        new_atom_feas = fused_gated_message_reduce(
            acc, weights_e, edge_mask, gated_mlp_fused_pack(gmlp),
            p_center, atom_feas.shape[0],
        )
    else:
        if fused and gated_mlp_fusable(gmlp, activation):
            messages = _fused_layer(
                gmlp, parts, weights=weights_e, mask=edge_mask
            )
        else:
            messages = gated_mlp_gather_apply(
                gmlp, parts, activation=activation, dropout=dropout,
                rng=rng,
            )
            messages = messages * weights_e
            messages = messages * edge_mask[:, None]
        new_atom_feas = plan_segment_sum(
            messages, edge_scatter, atom_feas.shape[0], p_center
        )
    if "mlp_out" in params:
        new_atom_feas = mlp_apply(params["mlp_out"], new_atom_feas)
    if resnet:
        new_atom_feas = new_atom_feas + atom_feas
    if "norm" in params:
        new_atom_feas = layer_norm_apply(params["norm"], new_atom_feas)
    return new_atom_feas



def atom_conv_dense_apply(
    params: Params,
    atom_feas: jnp.ndarray,  # [N, d_atom]
    bond_feas: jnp.ndarray,  # [U, d_bond]
    bond_weights: jnp.ndarray,  # [U, d_atom]
    dense_nbr: jnp.ndarray,  # [N, K]
    dense_bond: jnp.ndarray,  # [N, K]
    dense_mask: jnp.ndarray,  # [N, K]
    *,
    activation: str = "silu",
    resnet: bool = True,
) -> jnp.ndarray:
    """AtomConv over the dense per-atom edge layout.

    Regularizing edges to [N, K] slots turns the sorted segment-sum into
    a plain reduction over K and the center-feature gather into a
    broadcast — the two ops a TPU handles worst become free. Numerics
    match :func:`atom_conv_apply` exactly (same lane-packed gated MLP).
    """
    gmlp = params["gated_mlp"]
    layers_c = gmlp["core"]["layers"]
    layers_g = gmlp["gate"]["layers"]
    dim = layers_c[-1]["w"].shape[1]
    d_atom = atom_feas.shape[1]
    d_bond = bond_feas.shape[1]

    first_w = jnp.concatenate([layers_c[0]["w"], layers_g[0]["w"]], axis=1)
    w_center = first_w[:d_atom]
    w_bond = first_w[d_atom: d_atom + d_bond]
    w_nbr = first_w[d_atom + d_bond:]
    p_center = jnp.dot(atom_feas, w_center)  # [N, 2D]
    p_nbr = jnp.dot(atom_feas, w_nbr)  # [N, 2D]
    p_bond = jnp.dot(bond_feas, w_bond)  # [U, 2D]
    acc = p_center[:, None, :] + p_nbr[dense_nbr] + p_bond[dense_bond]
    if "b" in layers_c[0]:
        acc = acc + jnp.concatenate([layers_c[0]["b"], layers_g[0]["b"]])

    act = find_activation_cached(activation)
    x = act(acc)
    for lc, lg in zip(layers_c[1:], layers_g[1:]):
        w = jax.scipy.linalg.block_diag(lc["w"], lg["w"])
        x = jnp.dot(x, w)
        if "b" in lc:
            x = x + jnp.concatenate([lc["b"], lg["b"]])
        if (lc is not layers_c[-1]) and (lg is not layers_g[-1]):
            x = act(x)
    if "norm_core" in gmlp:
        h = x.reshape(*x.shape[:-1], 2, dim)
        mean = h.mean(axis=-1, keepdims=True)
        var = ((h - mean) ** 2).mean(axis=-1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        scale = jnp.stack(
            [gmlp["norm_core"]["scale"], gmlp["norm_gate"]["scale"]]
        )
        bias = jnp.stack(
            [gmlp["norm_core"]["bias"], gmlp["norm_gate"]["bias"]]
        )
        x = (h * scale + bias).reshape(*x.shape[:-1], 2 * dim)
    messages = act(x[..., :dim]) * jax.nn.sigmoid(x[..., dim:])
    messages = messages * bond_weights[dense_bond] * dense_mask[..., None]

    new_atom_feas = messages.sum(axis=1)  # the "scatter" is a K-reduce
    if "mlp_out" in params:
        new_atom_feas = mlp_apply(params["mlp_out"], new_atom_feas)
    if resnet:
        new_atom_feas = new_atom_feas + atom_feas
    if "norm" in params:
        new_atom_feas = layer_norm_apply(params["norm"], new_atom_feas)
    return new_atom_feas

# ------------------------------------------------------------------ BondConv
def bond_conv_init(
    rng: np.random.Generator,
    *,
    atom_fea_dim: int,
    bond_fea_dim: int,
    angle_fea_dim: int,
    hidden_dim: int | Sequence[int] = 64,
    norm: str | None = None,
    gmlp_norm: str | None = "layer",
    use_mlp_out: bool = True,
    mlp_out_bias: bool = False,
    resnet: bool = True,
) -> Params:
    params: Params = {
        "gated_mlp": gated_mlp_init(
            rng,
            atom_fea_dim + 2 * bond_fea_dim + angle_fea_dim,
            bond_fea_dim,
            hidden_dim=hidden_dim,
            norm=gmlp_norm,
        )
    }
    if use_mlp_out:
        params["mlp_out"] = mlp_init(
            rng, bond_fea_dim, output_dim=bond_fea_dim, hidden_dim=0, bias=mlp_out_bias
        )
    ln = norm_init(norm, bond_fea_dim)
    if ln is not None:
        params["norm"] = ln
    return params


def bond_conv_apply(
    params: Params,
    atom_feas: jnp.ndarray,  # [N, d_atom]
    bond_feas: jnp.ndarray,  # [U, d_bond]
    bond_weights: jnp.ndarray,  # [U, d_bond]
    angle_feas: jnp.ndarray,  # [A, d_angle]
    bond_graph: jnp.ndarray,  # [A, 5]
    angle_scatter: jnp.ndarray,  # [A] (padding -> U, dropped)
    angle_mask: jnp.ndarray,  # [A]
    *,
    activation: str = "silu",
    resnet: bool = True,
    fused: bool = False,
    plans: tuple | None = None,  # (bond_i, bond_j, center) GatherPlans
    dropout: float = 0.0,
    rng: jnp.ndarray | None = None,
    weights_a: jnp.ndarray | None = None,  # [A, d] hoisted weight product
) -> jnp.ndarray:
    """Line-graph update of undirected-bond features (``layers.py:208-265``).

    ``weights_a`` (w_i * w_j per angle row) is loop-invariant across conv
    layers; callers hoist it to dedup its two gathers per layer.
    """
    p_bi, p_bj, p_c = plans if plans is not None else (None,) * 3
    parts = [
        (bond_feas, bond_graph[:, 1], p_bi),
        (bond_feas, bond_graph[:, 3], p_bj),
        (angle_feas, None),
        (atom_feas, bond_graph[:, 0], p_c),
    ]
    if weights_a is None:
        weights_a = plan_gather(bond_weights, bond_graph[:, 1], p_bi) * \
            plan_gather(bond_weights, bond_graph[:, 3], p_bj)
    gmlp = params["gated_mlp"]
    if rng is not None and dropout > 0.0:
        fused = False  # the Pallas tail has no dropout support
    if fused and gated_mlp_fusable(gmlp, activation):
        update = _fused_layer(
            gmlp, parts, weights=weights_a, mask=angle_mask
        )
    else:
        update = gated_mlp_gather_apply(
            gmlp, parts, activation=activation, dropout=dropout, rng=rng
        )
        update = update * weights_a * angle_mask[:, None]
    # angle rows are DIR_I-sorted since the directed-stream layout landed
    # (graph/batching.py), so the undirected bond-i ids here are UNSORTED:
    # route through the permutation plan (p_bi) when given, else a plain
    # unhinted segment_sum — claiming sortedness would silently mis-sum
    # on TPU (XLA exploits the hint)
    new_bond_feas = plan_segment_sum_perm(
        update, angle_scatter, bond_feas.shape[0], p_bi
    )
    if "mlp_out" in params:
        new_bond_feas = mlp_apply(params["mlp_out"], new_bond_feas)
    if resnet:
        new_bond_feas = new_bond_feas + bond_feas
    if "norm" in params:
        new_bond_feas = layer_norm_apply(params["norm"], new_bond_feas)
    return new_bond_feas


def bond_conv_apply_directed(
    params: Params,
    atom_feas: jnp.ndarray,  # [N, d_atom]
    bond_feas: jnp.ndarray,  # [U, d_bond]
    bond_weights: jnp.ndarray,  # [U, d_bond]
    angle_feas: jnp.ndarray,  # [A, d_angle]
    bond_graph: jnp.ndarray,  # [A, 5] rows SORTED by directed bond i
    angle_scatter_dir: jnp.ndarray,  # [A] dir_i (padding -> E, dropped)
    d2u: jnp.ndarray,  # [E] undirected id per directed edge
    u2d: jnp.ndarray,  # [U] first directed edge per bond
    und_second: jnp.ndarray,  # [U] second directed edge per bond
    angle_mask: jnp.ndarray,  # [A]
    *,
    activation: str = "silu",
    resnet: bool = True,
    fused: bool = False,
    plans: tuple | None = None,  # (dir_i, dir_j, center, d2u, u2d, u2d2)
    dropout: float = 0.0,
    rng: jnp.ndarray | None = None,
    weights_a: jnp.ndarray | None = None,  # [A, d] hoisted weight product
    twin: jnp.ndarray | None = None,  # [E] reverse-edge involution
    directed_table: bool = False,
    atom_e: jnp.ndarray | None = None,  # [E, d_atom] atoms on the edge stream
) -> jnp.ndarray:
    """BondConv over the DIRECTED angle-stream layout.

    Same math as :func:`bond_conv_apply` (``layers.py:208-265`` in the
    reference), restructured for the TPU memory system: angle rows arrive
    sorted by their directed bond-i edge, whose center equals the row's
    center — so after expanding the (projected) undirected bond tables to
    the directed edge stream via ``d2u`` (one [E, *] gather per table),
    every per-angle gather is SORTED (dir_i) or window-local (dir_j,
    center) and rides the streaming Pallas kernels. The message sum then
    lands in the sorted directed stream and reduces to undirected bonds
    through the d2u plan. Undirected-keyed rows (the und-sorted layout)
    reference first-appearance bond ids, which profile as whole-table
    random gathers — the round-2 bottleneck this layout removes.

    With ``directed_table`` (CHGNetConfig.directed_bonds) the bond
    features/weights already LIVE on the directed stream: the d2u
    expansion disappears entirely, and the [A] -> [E] partial sums reduce
    per bond as ``partial + partial[twin]`` — one involution gather whose
    backward is the same gather — instead of the u2d/und_second pair.
    The update then applies on the [E] stream (each bond's two rows stay
    bitwise equal because float addition commutes).

    ``atom_e`` (``atom_feas`` expanded to the edge stream by edge center,
    computed once per conv block by the caller) FOLDS the atom part into
    the dir_i gather: an angle row's center atom IS its dir_i edge's
    center, so ``atom_e[dir_i[a]] == atom_feas[center[a]]`` exactly —
    the projected atom table rides the dir_i window gather and the
    per-angle center gather (forward) plus its [A, 2D] segment-sum
    transpose (backward) disappear; the atom cotangent instead cascades
    through the cheap sorted [E] -> [N] center reduction of ``atom_e``'s
    own backward.
    """
    if directed_table and twin is None:
        raise ValueError(
            "directed_table=True needs the reverse-edge `twin` involution "
            "stream (GraphBatch.twin) to reduce the per-edge partial sums"
        )
    p_i, p_j, p_c, p_d2u, p_u2d, p_u2d2 = (
        plans if plans is not None else (None,) * 6
    )
    dir_i = bond_graph[:, 2]
    dir_j = bond_graph[:, 4]
    if directed_table:
        bond_dir = bond_feas  # native [E, d]
    else:
        # ONE [E, d] d2u expansion per undirected table; the per-part
        # first Linear then runs on the directed table (2x the matmul
        # rows — sub-ms on the MXU) so the big per-angle gathers read the
        # NARROW [E, d] stream instead of two projected [E, 2D] ones
        bond_dir = plan_gather(bond_feas, d2u, p_d2u)
    atom_part = (
        (atom_feas, bond_graph[:, 0], p_c)
        if atom_e is None
        else (atom_e, dir_i, p_i)
    )
    fold = None if atom_e is None else {3: 0}
    parts = [
        (bond_dir, dir_i, p_i),
        (bond_dir, dir_j, p_j),
        (angle_feas, None),
        atom_part,
    ]
    if weights_a is None:
        # w_i * w_j per angle row; loop-invariant (bond_weights never
        # changes across conv layers), so callers hoist it — recomputed
        # here only for standalone use
        w_dir = (
            bond_weights
            if directed_table
            else plan_gather(bond_weights, d2u, p_d2u)
        )  # [E, d] shared
        weights_a = plan_gather(w_dir, dir_i, p_i) * plan_gather(
            w_dir, dir_j, p_j
        )
    gmlp = params["gated_mlp"]
    if rng is not None and dropout > 0.0:
        fused = False  # the Pallas tail has no dropout support
    if fused and gated_mlp_fusable(gmlp, activation) and _msg_reduce_ok(
        angle_scatter_dir.shape[0], gmlp, p_i, d2u.shape[0]
    ):
        # fused tail + [A] -> [E] partial reduction in ONE sweep: the
        # [A, D] update stream never exists in HBM
        from chgnet_tpu.ops.gated_message import fused_gated_message_reduce

        acc = _layer_acc(gmlp, parts, fold)
        partial = fused_gated_message_reduce(
            acc, weights_a, angle_mask, gated_mlp_fused_pack(gmlp),
            p_i, d2u.shape[0],
        )
    else:
        if fused and gated_mlp_fusable(gmlp, activation):
            update = _fused_layer(
                gmlp, parts, fold, weights=weights_a, mask=angle_mask
            )
        else:
            acc = _layer_acc(gmlp, parts, fold)
            update = gated_mlp_tail(
                gmlp, acc, activation=activation, dropout=dropout, rng=rng
            )
            update = update * weights_a * angle_mask[:, None]
        # [A] -> [E] partial sums on the sorted directed stream
        partial = plan_segment_sum(
            update, angle_scatter_dir, d2u.shape[0], p_i
        )
    if directed_table:
        # each bond's total on BOTH its directed rows: self + twin partial
        # (twin-symmetric bitwise — float addition commutes)
        from chgnet_tpu.ops.scatter import involution_gather

        new_bond_feas = partial + involution_gather(partial, twin)
    else:
        # [E] -> [U] as each bond's two directed partials: gather(first) +
        # gather(second) — [U]-row gathers instead of a permutation
        # segment-sum over [E] rows (fused into one kernel pass when both
        # windows qualify); the backward is ONE d2u row gather
        # (ops.scatter.twin_reduce)
        new_bond_feas = twin_reduce(
            partial, u2d, und_second, d2u, p_u2d, p_u2d2, p_d2u
        )
    if "mlp_out" in params:
        new_bond_feas = mlp_apply(params["mlp_out"], new_bond_feas)
    if resnet:
        new_bond_feas = new_bond_feas + bond_feas
    if "norm" in params:
        new_bond_feas = layer_norm_apply(params["norm"], new_bond_feas)
    return new_bond_feas


def angle_update_apply_directed(
    params: Params,
    atom_feas: jnp.ndarray,
    bond_feas: jnp.ndarray,
    angle_feas: jnp.ndarray,
    bond_graph: jnp.ndarray,  # [A, 5] rows SORTED by directed bond i
    d2u: jnp.ndarray,  # [E]
    *,
    activation: str = "silu",
    resnet: bool = True,
    fused: bool = False,
    plans: tuple | None = None,  # (dir_i, dir_j, center, d2u, u2d, u2d2)
    dropout: float = 0.0,
    rng: jnp.ndarray | None = None,
    directed_table: bool = False,
    atom_e: jnp.ndarray | None = None,  # [E, d_atom] atoms on the edge stream
) -> jnp.ndarray:
    """AngleUpdate over the directed layout (see
    :func:`bond_conv_apply_directed`); elementwise per angle row, so only
    the gather side changes. ``fused`` routes the gated-MLP tail + resnet
    add through the weights-free Pallas kernel. ``directed_table`` marks
    bond features as natively directed (no d2u expansion needed).
    ``atom_e`` folds the atom part into the dir_i gather (see
    :func:`bond_conv_apply_directed`)."""
    p_i, p_j, p_c, p_d2u = (
        plans[:4] if plans is not None else (None,) * 4
    )
    bond_dir = (
        bond_feas
        if directed_table
        else plan_gather(bond_feas, d2u, p_d2u)  # [E, d] once
    )
    atom_part = (
        (atom_feas, bond_graph[:, 0], p_c)
        if atom_e is None
        else (atom_e, bond_graph[:, 2], p_i)
    )
    fold = None if atom_e is None else {3: 0}
    parts = [
        (bond_dir, bond_graph[:, 2], p_i),
        (bond_dir, bond_graph[:, 4], p_j),
        (angle_feas, None),
        atom_part,
    ]
    gmlp = params["gated_mlp"]
    if rng is not None and dropout > 0.0:
        fused = False  # the Pallas tail has no dropout support
    if (
        fused
        and resnet
        and "norm" not in params
        and gated_mlp_update_fusable(gmlp, activation)
    ):
        return _fused_layer(gmlp, parts, fold, resnet=angle_feas)
    acc = _layer_acc(gmlp, parts, fold)
    new_angle_feas = gated_mlp_tail(
        gmlp, acc, activation=activation, dropout=dropout, rng=rng
    )
    if resnet:
        new_angle_feas = new_angle_feas + angle_feas
    if "norm" in params:
        new_angle_feas = layer_norm_apply(params["norm"], new_angle_feas)
    return new_angle_feas


# --------------------------------------------------------------- AngleUpdate
def angle_update_init(
    rng: np.random.Generator,
    *,
    atom_fea_dim: int,
    bond_fea_dim: int,
    angle_fea_dim: int,
    hidden_dim: int | Sequence[int] = 0,
    norm: str | None = None,
    gmlp_norm: str | None = "layer",
    resnet: bool = True,
) -> Params:
    params: Params = {
        "gated_mlp": gated_mlp_init(
            rng,
            atom_fea_dim + 2 * bond_fea_dim + angle_fea_dim,
            angle_fea_dim,
            hidden_dim=hidden_dim,
            norm=gmlp_norm,
        )
    }
    ln = norm_init(norm, angle_fea_dim)
    if ln is not None:
        params["norm"] = ln
    return params


def angle_update_apply(
    params: Params,
    atom_feas: jnp.ndarray,
    bond_feas: jnp.ndarray,
    angle_feas: jnp.ndarray,
    bond_graph: jnp.ndarray,
    *,
    activation: str = "silu",
    resnet: bool = True,
    fused: bool = False,
    plans: tuple | None = None,  # (bond_i, bond_j, center) GatherPlans
    dropout: float = 0.0,
    rng: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-angle feature update, no aggregation (``layers.py:321-363``)."""
    p_bi, p_bj, p_c = plans if plans is not None else (None,) * 3
    parts = [
        (bond_feas, bond_graph[:, 1], p_bi),
        (bond_feas, bond_graph[:, 3], p_bj),
        (angle_feas, None),
        (atom_feas, bond_graph[:, 0], p_c),
    ]
    gmlp = params["gated_mlp"]
    if rng is not None and dropout > 0.0:
        fused = False  # the Pallas tail has no dropout support
    if (
        fused
        and resnet
        and "norm" not in params
        and gated_mlp_update_fusable(gmlp, activation)
    ):
        return _fused_layer(gmlp, parts, resnet=angle_feas)
    new_angle_feas = gated_mlp_gather_apply(
        gmlp, parts, activation=activation, dropout=dropout, rng=rng
    )
    if resnet:
        new_angle_feas = new_angle_feas + angle_feas
    if "norm" in params:
        new_angle_feas = layer_norm_apply(params["norm"], new_angle_feas)
    return new_angle_feas


# ------------------------------------------------------------------- pooling
def graph_pool(
    atom_feas: jnp.ndarray,  # [N, d]
    atom_scatter: jnp.ndarray,  # [N] graph id, padding -> B (dropped)
    n_graphs: int,
    *,
    average: bool = False,
) -> jnp.ndarray:
    """Sum/mean pooling over each graph's atoms (``layers.py:366-389``)."""
    if average:
        return segment_mean(
            atom_feas, atom_scatter, n_graphs, indices_are_sorted=True
        )
    return segment_sum(atom_feas, atom_scatter, n_graphs, indices_are_sorted=True)


def attention_readout_init(
    rng: np.random.Generator,
    atom_fea_dim: int,
    *,
    num_heads: int = 3,
    hidden_dim: int = 32,
) -> Params:
    """Multi-head attention pooling (``layers.py:392-453``), vectorized with
    a per-graph segment softmax instead of the reference's python loop."""
    return {
        "key": mlp_init(
            rng, atom_fea_dim, output_dim=num_heads, hidden_dim=hidden_dim
        )
    }


def attention_readout_apply(
    params: Params,
    atom_feas: jnp.ndarray,  # [N, d]
    atom_scatter: jnp.ndarray,  # [N]
    atom_mask: jnp.ndarray,  # [N]
    n_graphs: int,
    *,
    average: bool = False,
    activation: str = "silu",
) -> jnp.ndarray:
    logits = mlp_apply(params["key"], atom_feas, activation=activation)  # [N, H]
    # segment softmax: subtract per-graph max, exponentiate, normalize
    neg_inf = jnp.asarray(-1e30, logits.dtype)
    masked_logits = jnp.where(atom_mask[:, None] > 0, logits, neg_inf)
    seg_max = jax.ops.segment_max(
        masked_logits, atom_scatter, num_segments=n_graphs, indices_are_sorted=True
    )
    shifted = masked_logits - seg_max[atom_scatter]
    expv = jnp.exp(shifted) * atom_mask[:, None]
    denom = segment_sum(expv, atom_scatter, n_graphs, indices_are_sorted=True)
    weight = expv / jnp.maximum(denom[atom_scatter], 1e-30)  # [N, H]
    # weighted sums per head -> [B, H * d]
    weighted = atom_feas[:, None, :] * weight[:, :, None]  # [N, H, d]
    pooled = segment_sum(
        weighted.reshape(atom_feas.shape[0], -1),
        atom_scatter,
        n_graphs,
        indices_are_sorted=True,
    )  # [B, H * d]
    if average:
        counts = segment_sum(
            atom_mask[:, None], atom_scatter, n_graphs, indices_are_sorted=True
        )
        pooled = pooled / jnp.maximum(counts, 1.0)
    return pooled
