"""Pure-function neural-net primitives over param pytrees.

The reference composes torch ``nn.Module`` objects
(``/root/reference/chgnet/model/functions.py``); here every block is an
``init`` (returns a param pytree) + ``apply`` (pure function) pair, so the
whole model is a jit/grad/vmap/pjit-transformable function of its params.
Architectural semantics (layer layouts, gating, norm placement) match the
reference so torch checkpoints can be converted 1:1.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = dict


# ----------------------------------------------------------------- segment
def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    *,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Masked scatter-sum primitive (the reference's ``aggregate`` with
    average=False, ``functions.py:10-40``). Out-of-range ids are dropped —
    padding rows use id == num_segments and vanish with no mask multiply.
    """
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    *,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Segment mean with zero-safe denominators (absent owners -> 0 row)."""
    total = segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    count = segment_sum(
        jnp.ones((data.shape[0], 1), data.dtype),
        segment_ids,
        num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return total / jnp.maximum(count, 1.0)


# -------------------------------------------------------------- activations
def scaled_silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x) * (1.0 / 0.6)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "scaledsilu": scaled_silu,
    "gelu": jax.nn.gelu,
    "softplus": jax.nn.softplus,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


def find_activation(name: str):
    try:
        return ACTIVATIONS[name.lower()]
    except KeyError as exc:
        raise NotImplementedError(f"activation {name!r}") from exc


# ------------------------------------------------------------------ linear
def linear_init(
    rng: np.random.Generator, in_dim: int, out_dim: int, *, bias: bool = True
) -> Params:
    """Torch-default Linear init: U(-1/sqrt(in), 1/sqrt(in)) for w and b.
    Weights stored [in, out] (x @ w convention)."""
    bound = 1.0 / np.sqrt(in_dim)
    params = {"w": rng.uniform(-bound, bound, (in_dim, out_dim)).astype(np.float32)}
    if bias:
        params["b"] = rng.uniform(-bound, bound, (out_dim,)).astype(np.float32)
    return params


def linear_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    out = jnp.dot(x, params["w"])
    if "b" in params:
        out = out + params["b"]
    return out


# --------------------------------------------------------------- layer norm
def layer_norm_init(dim: int) -> Params:
    return {
        "scale": np.ones(dim, dtype=np.float32),
        "bias": np.zeros(dim, dtype=np.float32),
    }


def layer_norm_apply(params: Params, x: jnp.ndarray, *, eps: float = 1e-5):
    if "mean" in params:  # batch norm (see batch_norm_init)
        return batch_norm_apply(params, x, eps=eps)
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    return out * params["scale"] + params["bias"]


def batch_norm_init(dim: int) -> Params:
    """BatchNorm1d parameters (reference ``find_normalization('batch')``,
    ``functions.py:200-223``). Inference semantics: normalize with the
    stored running statistics (identity at init). Running-stat UPDATES are
    a training-state concern; fold converted torch stats in via the
    checkpoint converter."""
    return {
        "scale": np.ones(dim, dtype=np.float32),
        "bias": np.zeros(dim, dtype=np.float32),
        "mean": np.zeros(dim, dtype=np.float32),
        "var": np.ones(dim, dtype=np.float32),
    }


def batch_norm_apply(params: Params, x: jnp.ndarray, *, eps: float = 1e-5):
    out = (x - params["mean"]) * jax.lax.rsqrt(params["var"] + eps)
    return out * params["scale"] + params["bias"]


def norm_init(name: str | None, dim: int) -> Params | None:
    if name is None:
        return None
    if name.lower() == "layer":
        return layer_norm_init(dim)
    if name.lower() == "batch":
        return batch_norm_init(dim)
    raise NotImplementedError(f"normalization {name!r}")


def dropout_apply(
    x: jnp.ndarray, rate: float, rng: jax.Array | None
) -> jnp.ndarray:
    """Inverted dropout (train mode only: ``rng`` given and rate > 0)."""
    if rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# -------------------------------------------------------------------- MLP
def mlp_init(
    rng: np.random.Generator,
    input_dim: int,
    *,
    output_dim: int = 1,
    hidden_dim: int | Sequence[int] | None = (64, 64),
    bias: bool = True,
) -> Params:
    """MLP matching the reference layer layout (``functions.py:43-107``):
    hidden None/0 -> single Linear; int -> one hidden layer; sequence ->
    stacked hidden layers. Activation applied between all Linears.
    """
    if hidden_dim is None or hidden_dim == 0:
        dims = [input_dim, output_dim]
    elif isinstance(hidden_dim, int):
        dims = [input_dim, hidden_dim, output_dim]
    else:
        dims = [input_dim, *hidden_dim, output_dim]
    return {
        "layers": [
            linear_init(rng, dims[i], dims[i + 1], bias=bias)
            for i in range(len(dims) - 1)
        ]
    }


def mlp_apply(
    params: Params,
    x: jnp.ndarray,
    *,
    activation: str = "silu",
    dropout: float = 0.0,
    rng: jax.Array | None = None,
):
    """Reference MLP layout: Dropout sits before the LAST Linear
    (``functions.py:72-96``); active only when ``rng`` is provided."""
    act = find_activation(activation)
    layers = params["layers"]
    for layer in layers[:-1]:
        x = act(linear_apply(layer, x))
    x = dropout_apply(x, dropout, rng)
    return linear_apply(layers[-1], x)


# ---------------------------------------------------------------- GatedMLP
def gated_mlp_init(
    rng: np.random.Generator,
    input_dim: int,
    output_dim: int,
    *,
    hidden_dim: int | Sequence[int] | None = None,
    norm: str | None = "layer",
    bias: bool = True,
) -> Params:
    params = {
        "core": mlp_init(
            rng, input_dim, output_dim=output_dim, hidden_dim=hidden_dim, bias=bias
        ),
        "gate": mlp_init(
            rng, input_dim, output_dim=output_dim, hidden_dim=hidden_dim, bias=bias
        ),
    }
    ln_core = norm_init(norm, output_dim)
    if ln_core is not None:
        params["norm_core"] = ln_core
        params["norm_gate"] = norm_init(norm, output_dim)
    return params


def gated_mlp_apply(
    params: Params,
    x: jnp.ndarray,
    *,
    activation: str = "silu",
    dropout: float = 0.0,
    rng: jax.Array | None = None,
):
    """core * gate with optional norms before the nonlinearities
    (``functions.py:168-183``)."""
    act = find_activation(activation)
    rng_c = rng_g = None
    if rng is not None and dropout > 0.0:
        rng_c, rng_g = jax.random.split(rng)
    core = mlp_apply(
        params["core"], x, activation=activation, dropout=dropout, rng=rng_c
    )
    gate = mlp_apply(
        params["gate"], x, activation=activation, dropout=dropout, rng=rng_g
    )
    if "norm_core" in params:
        core = layer_norm_apply(params["norm_core"], core)
        gate = layer_norm_apply(params["norm_gate"], gate)
    return act(core) * jax.nn.sigmoid(gate)


def _split_part(part):
    """parts entries are (table, idx) or (table, idx, GatherPlan);
    ``idx=None`` means the table already lives on the stream axis."""
    if len(part) == 3:
        return part
    table, idx = part
    return table, idx, None


def project_parts(
    layers_c: Sequence[Params],
    layers_g: Sequence[Params],
    parts: Sequence[tuple],
) -> tuple[list[tuple], jnp.ndarray]:
    """Per-part first-Linear projections (core | gate lane-packed) plus
    the joint first-layer bias: the pre-gather half of
    :func:`first_layer_acc_joint`, exposed so the mono-kernel conv pass
    (``ops/fused_pass.py``) can consume the projected tables directly."""
    first_w = jnp.concatenate([layers_c[0]["w"], layers_g[0]["w"]], axis=1)
    offset = 0
    projected = []
    for part in parts:
        table, idx, plan = _split_part(part)
        d_k = table.shape[1]
        projected.append(
            (jnp.dot(table, first_w[offset: offset + d_k]), idx, plan)
        )
        offset += d_k
    if "b" in layers_c[0]:
        b1 = jnp.concatenate([layers_c[0]["b"], layers_g[0]["b"]])
    else:
        b1 = jnp.zeros(first_w.shape[1], first_w.dtype)
    return projected, b1


def project_parts_fold(
    layers_c: Sequence[Params],
    layers_g: Sequence[Params],
    parts: Sequence[tuple],
    fold: dict[int, int] | None = None,
) -> tuple[list[tuple], jnp.ndarray]:
    """:func:`project_parts` with part FOLDING: ``fold`` maps a part's
    position to an EARLIER part position whose index stream it shares
    (same keys, same plan); the folded part's projected table is summed
    into the target's table before gathering, so ONE window gather (and
    one backward segment sum) serves both. Exact because row gathers
    distribute over the table add: ``(a + b)[i] == a[i] + b[i]`` row-wise.

    The motivating fold: in the directed angle-stream layout the center
    atom of an angle row equals the center of its dir_i edge, so the
    atom part — expanded once per conv block to the edge stream
    (``atom_e``) — rides the dir_i gather instead of its own per-angle
    center gather, deleting one [A, 2D] gather pass forward and one
    [A, 2D] segment sum backward per angle-side layer."""
    projected, b1 = project_parts(layers_c, layers_g, parts)
    if not fold:
        return projected, b1
    merged: dict[int, jnp.ndarray] = {}
    for src, dst in fold.items():
        if not (0 <= dst < len(projected)) or dst in fold:
            raise ValueError(f"fold target {dst} invalid")
        tab_s = projected[src][0]
        tab_d = projected[dst][0]
        if tab_s.shape != tab_d.shape:
            raise ValueError(
                f"folded part {src} shape {tab_s.shape} != target "
                f"{dst} shape {tab_d.shape} (index streams must match)"
            )
        merged[dst] = merged.get(dst, tab_d) + tab_s
    out = [
        (merged.get(k, tab), idx, plan)
        for k, (tab, idx, plan) in enumerate(projected)
        if k not in fold
    ]
    return out, b1


def fold_bias_into_stream(parts: Sequence[tuple], b1):
    """Add the joint first-layer bias into the first ALIGNED part's table
    (``idx is None``) — it fuses into that table's projection-matmul
    epilogue for free. Returns ``(parts, remaining_bias | None)``.

    Why: ``gather_sum(...) + b1`` sits BETWEEN two pallas custom calls
    (the multi-gather and the fused tail), so XLA cannot fuse the add
    into either neighbor — it materializes a full read+write of the
    [L, 2D] accumulator stream per conv layer."""
    for k, (tab, idx, plan) in enumerate(parts):
        if idx is None:
            out = list(parts)
            out[k] = (tab + b1, idx, plan)
            return out, None
    return list(parts), b1


def first_layer_acc_joint(
    layers_c: Sequence[Params],
    layers_g: Sequence[Params],
    parts: Sequence[tuple],
) -> jnp.ndarray:
    """Joint [E, 2D] first-Linear output (core | gate lane-packed) over an
    implicit concat of gathered blocks: each block projected on its table
    BEFORE gathering (see ``gated_mlp_gather_apply``). On TPU the
    per-part window gathers fuse into ONE streaming kernel pass
    (``ops.scatter.gather_sum``) — the unfused form materializes each
    projected [E, 2D] stream in HBM before the adds."""
    return first_layer_acc(layers_c, layers_g, parts)


def first_layer_acc(
    layers_c: Sequence[Params],
    layers_g: Sequence[Params],
    parts: Sequence[tuple],
    fold: dict[int, int] | None = None,
) -> jnp.ndarray:
    """The first-layer accumulator, fastest correct path at trace time:

    * union-window gather-project kernel (``ops/gproj.py``) when every
      windowed part shares one narrow table group with v1 gather windows
      — the raw dt-wide table streams ONCE per block window and the
      per-part first-Linear weights apply in-kernel,
    * otherwise the round-3/4 composition: project-before-gather with
      part folding, bias folded into the first aligned table, fused
      multi-gather (``ops.scatter.gather_sum``).

    ``fold`` (see :func:`project_parts_fold`) only affects the fallback —
    the kernel shares one-hots between same-index parts natively."""
    from chgnet_tpu.ops.gproj import gather_project_sum, gproj_eligible

    norm = [_split_part(p) for p in parts]
    L = next(
        (i.shape[0] for _, i, _ in norm if i is not None),
        norm[0][0].shape[0],
    )
    if gproj_eligible(norm, L):
        first_w = jnp.concatenate(
            [layers_c[0]["w"], layers_g[0]["w"]], axis=1
        )
        ws, aligned_w = [], []
        offset = 0
        for table, idx, _ in norm:
            sl = first_w[offset: offset + table.shape[1]]
            (aligned_w if idx is None else ws).append(sl)
            offset += table.shape[1]
        b1 = (
            jnp.concatenate([layers_c[0]["b"], layers_g[0]["b"]])
            if "b" in layers_c[0]
            else None
        )
        return gather_project_sum(norm, ws, b1, aligned_w)
    projected, b1 = project_parts_fold(layers_c, layers_g, parts, fold)
    projected, b1 = fold_bias_into_stream(projected, b1)
    from chgnet_tpu.ops.scatter import gather_sum

    acc = gather_sum(projected)
    return acc if b1 is None else acc + b1


def gated_mlp_fusable(params: Params, activation: str = "silu") -> bool:
    """True when both branches are exactly 2 Linears with LAYER norms and
    silu activation — the shape the fused Pallas message kernel supports
    (the default CHGNet architecture). Batch norm (running mean/var in
    the norm params) must NOT fuse: the kernel hard-codes layer-norm
    math."""
    return (
        activation == "silu"
        and "norm_core" in params
        and "mean" not in params["norm_core"]
        and len(params["core"]["layers"]) == 2
        and len(params["gate"]["layers"]) == 2
    )


def gated_mlp_fused_pack(params: Params) -> Params:
    """Second-layer + norm params in the fused kernel's lane-packed
    layout: block-diagonal joint W2 and concatenated biases. For
    single-Linear branches (AngleUpdate's default shape) there is no
    second layer: ``w2``/``b2`` are omitted and the kernel treats the
    first-layer sum as ``y`` directly (matching
    ``gated_mlp_gather_apply``'s n_layers==1 path)."""
    out = {
        "nc_scale": params["norm_core"]["scale"],
        "nc_bias": params["norm_core"]["bias"],
        "ng_scale": params["norm_gate"]["scale"],
        "ng_bias": params["norm_gate"]["bias"],
    }
    if len(params["core"]["layers"]) == 1:
        return out
    core2 = params["core"]["layers"][1]
    gate2 = params["gate"]["layers"][1]
    dim = core2["w"].shape[1]
    zeros = jnp.zeros(dim, jnp.asarray(core2["w"]).dtype)
    out["w2"] = jax.scipy.linalg.block_diag(core2["w"], gate2["w"])
    out["b2"] = jnp.concatenate(
        [core2.get("b", zeros), gate2.get("b", zeros)]
    )
    return out


def gated_mlp_update_fusable(params: Params, activation: str = "silu") -> bool:
    """Fusability for the weights-free UPDATE tail: like
    :func:`gated_mlp_fusable` but single-Linear branches also qualify
    (no dropout concern — callers gate dropout separately)."""
    return (
        activation == "silu"
        and "norm_core" in params
        and "mean" not in params["norm_core"]
        and len(params["core"]["layers"]) in (1, 2)
        and len(params["gate"]["layers"]) == len(params["core"]["layers"])
    )


def gated_mlp_gather_apply(
    params: Params,
    parts: Sequence[tuple],
    *,
    activation: str = "silu",
    dropout: float = 0.0,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """GatedMLP over an implicit concatenation of gathered feature blocks.

    ``parts`` is a sequence of ``(table [M_k, d_k], index [E] | None)``;
    the result equals ``gated_mlp_apply(params, concat([t[i] for t, i in
    parts], axis=1))`` — with two TPU-native rewrites of the reference's
    gather-concat-matmul (``/root/reference/chgnet/model/layers.py:112-125``):

    * each block is pushed through the first core/gate Linear BEFORE
      gathering, so the [E, sum d_k] concat never materializes and
      first-layer matmul rows drop from E (edges/angles) to M_k
      (atoms/bonds),
    * the core and gate branches are packed side by side into single
      [E, 2D] streams. TPU tiles are (8, 128) lanes: a 64-wide f32 tensor
      pads 2x in memory, so every intermediate on the edge axis would
      waste half its HBM bytes — lane-packing the branches makes them
      full-width. The second layer becomes one block-diagonal
      [2D, 2D] matmul (same MXU passes as one 64-wide matmul) and the
      norms act per half.
    """
    # joint first layer: [d_in, 2D] = [W1_core | W1_gate]
    acc = first_layer_acc_joint(
        params["core"]["layers"], params["gate"]["layers"], parts
    )
    return gated_mlp_tail(
        params, acc, activation=activation, dropout=dropout, rng=rng
    )


def gated_mlp_tail(
    params: Params,
    acc: jnp.ndarray,
    *,
    activation: str = "silu",
    dropout: float = 0.0,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """The post-first-layer half of :func:`gated_mlp_gather_apply`: the
    remaining block-diagonal joint Linears, per-half norms, and the
    act(core) * sigmoid(gate) gating, applied to the joint [E, 2D]
    first-layer output ``acc`` (bias already added). Exposed so callers
    that build ``acc`` themselves (folded-part layers, fused kernels'
    reference path) share one implementation."""
    act = find_activation(activation)
    layers_c = params["core"]["layers"]
    layers_g = params["gate"]["layers"]
    dim = layers_c[-1]["w"].shape[1]

    n_layers = len(layers_c)
    if n_layers != len(layers_g):
        raise ValueError("core/gate layer counts differ")
    if n_layers == 1:
        # single-Linear MLP: the reference drops the INPUT (layout
        # [Dropout, Linear]); the split-projection form never materializes
        # that input, so drop the linear output instead (same expectation,
        # different noise correlation across output features)
        both = dropout_apply(acc, dropout, rng)
    else:
        x = act(acc)
        for lc, lg in zip(layers_c[1:], layers_g[1:]):
            if lc is layers_c[-1]:
                # reference layout: Dropout before the last Linear; the
                # packed halves get elementwise-independent masks
                x = dropout_apply(x, dropout, rng)
            # block-diagonal joint layer: halves stay independent
            w = jax.scipy.linalg.block_diag(lc["w"], lg["w"])
            x = jnp.dot(x, w)
            if "b" in lc:
                x = x + jnp.concatenate([lc["b"], lg["b"]])
            if (lc is not layers_c[-1]) and (lg is not layers_g[-1]):
                x = act(x)
        both = x

    if "norm_core" in params:
        nc, ng = params["norm_core"], params["norm_gate"]
        if "mean" in nc:
            # batch norm: per-feature running stats, packed per half
            mean = jnp.concatenate([nc["mean"], ng["mean"]])
            var = jnp.concatenate([nc["var"], ng["var"]])
            scale = jnp.concatenate([nc["scale"], ng["scale"]])
            bias = jnp.concatenate([nc["bias"], ng["bias"]])
            both = (both - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        else:
            # per-half layer norm without splitting the stream
            h = both.reshape(-1, 2, dim)
            mean = h.mean(axis=-1, keepdims=True)
            var = ((h - mean) ** 2).mean(axis=-1, keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
            scale = jnp.stack([nc["scale"], ng["scale"]])
            bias = jnp.stack([nc["bias"], ng["bias"]])
            both = (h * scale + bias).reshape(-1, 2 * dim)
    return act(both[:, :dim]) * jax.nn.sigmoid(both[:, dim:])
