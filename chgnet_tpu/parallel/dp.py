"""Data-parallel training: shard_map over a device mesh, psum gradients.

Each device holds one padded ``GraphBatch`` (all with identical
capacities); batches are stacked on a leading device axis, sharded over the
mesh's data axis, and gradients/metrics are ``pmean``-ed over ICI. Params
and optimizer state stay replicated. This is the TPU-native replacement for
the capability the reference lacks entirely (single-device torch trainer,
``/root/reference/chgnet/trainer/trainer.py:296``).
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from chgnet_tpu.graph.batching import GraphBatch
from chgnet_tpu.models.chgnet import CHGNetConfig
from chgnet_tpu.trainer.losses import CombinedLoss, loss_and_metrics

__all__ = [
    "loss_and_metrics",  # re-export; implementation lives in trainer.losses
    "make_dp_train_step",
    "make_single_device_train_step",
    "stack_batches",
    "stack_targets",
]


def _harmonize_plans(batches: Sequence[GraphBatch]) -> list[GraphBatch]:
    """Give every batch's GatherPlans identical leaf shapes.

    ``make_plan`` attaches the streaming-kernel fields (``raw``,
    ``g_lo``/``g_cnt``) behind DATA-dependent cost gates, so two batches
    with identical capacities can legally disagree. Stacking requires one
    static structure; where batches disagree on a plan, degrade that plan
    to its pure-permutation form (empty streaming fields) for all of them
    — correct everywhere, just skips the streaming kernels for that
    stream. (Dropping ``raw`` alone would be WRONG: local-mode
    ``blk_lo``/``blk_cnt`` cover the raw stream, not ``dst``.)
    """
    from chgnet_tpu.ops.scatter import GatherPlan, harmonize_plans

    plan_fields = [
        name
        for name in GraphBatch._fields
        if isinstance(getattr(batches[0], name, None), GatherPlan)
    ]
    out = list(batches)
    for name in plan_fields:
        plans = harmonize_plans([getattr(b, name) for b in out])
        out = [b._replace(**{name: p}) for b, p in zip(out, plans)]
    return out


def stack_batches(batches: Sequence[GraphBatch]) -> GraphBatch:
    """Stack same-capacity GraphBatches on a new leading device axis."""
    import jax

    batches = _harmonize_plans(batches)
    first = batches[0]
    first_leaves = jax.tree.leaves(first)
    for b in batches[1:]:
        if any(
            np.shape(x) != np.shape(y)
            for x, y in zip(first_leaves, jax.tree.leaves(b))
        ):
            raise ValueError("all stacked batches must share capacities")
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def stack_targets(targets: Sequence[dict]) -> dict:
    return {
        key: np.stack([t[key] for t in targets]) for key in targets[0]
    }


def make_dp_train_step(
    *,
    config: CHGNetConfig,
    loss_fn: CombinedLoss,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    axis_name: str = "data",
):
    """Build a jitted data-parallel train step.

    Step signature: (params, opt_state, stacked_batch, stacked_targets,
    step) -> (params, opt_state, metrics). Stacked inputs carry a leading
    device axis sharded over ``axis_name``; params/opt_state/step are
    replicated. ``step`` drives the dropout rng (matching the
    single-device trainer step); each shard folds in its axis index so
    dropout masks are independent across devices.
    """
    use_dropout = (
        float(config.conv_dropout) > 0 or float(config.mlp_dropout) > 0
    )

    def local_step(params, opt_state, batch_stack, target_stack, step):
        # each shard sees leading axis 1 -> drop it
        batch = jax.tree_util.tree_map(lambda x: x[0], batch_stack)
        targets = jax.tree_util.tree_map(lambda x: x[0], target_stack)
        rng = None
        if use_dropout:
            rng = jax.random.fold_in(jax.random.key(0), step)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        grads, metrics = jax.grad(
            lambda p: loss_and_metrics(
                p, batch, targets, config=config, loss_fn=loss_fn,
                dropout_rng=rng,
            ),
            has_aux=True,
        )(params)
        grads = jax.lax.pmean(grads, axis_name)
        metrics = jax.lax.pmean(
            {k: jnp.asarray(v, jnp.float32) for k, v in metrics.items()},
            axis_name,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_single_device_train_step(
    *,
    config: CHGNetConfig,
    loss_fn: CombinedLoss,
    optimizer: optax.GradientTransformation,
):
    """Jitted single-device train step with the same signature minus the
    device axis: (params, opt_state, batch, targets) -> (params, opt_state,
    metrics)."""

    @jax.jit
    def step(params, opt_state, batch, targets):
        grads, metrics = jax.grad(
            lambda p: loss_and_metrics(
                p, batch, targets, config=config, loss_fn=loss_fn
            ),
            has_aux=True,
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step
