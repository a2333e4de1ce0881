"""Jitted train/eval steps over a device mesh.

Replaces the reference's hot loop body (train_utils.py:277-363: forward ->
amp backward w/ DDP allreduce -> lr set -> clip -> step) with a single
compiled function per (task, batch-shape) pair:

  * the step jits over the **global** batch; inputs carry a
    NamedSharding over the mesh's `data` axis, so XLA shards the
    per-sample encoder work and inserts ICI collectives for the NxN
    contrastive matrix and the gradient reduction,
  * grad clipping + multi-group adamw are inside the same compiled step,
  * loss-dict values are summed for the backward pass exactly like the
    reference (train_utils.py:309-314) and returned for metering.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from valor_tpu.core.tasks import TaskSpec
from valor_tpu.ops.layers import train_mode
from valor_tpu.parallel.mesh import DATA_AXIS, batch_sharding, replicated


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


def _cast_grads(grads, grad_dtype: Optional[str]):
    """Optional bf16 grad regime (TrainConfig.grad_dtype): halves grad HBM
    traffic through clip+adam on the bandwidth-bound step."""
    if not grad_dtype or grad_dtype == "float32":
        return grads
    dt = jnp.dtype(grad_dtype)
    return jax.tree_util.tree_map(lambda g: g.astype(dt), grads)


def _apply_losses(model, params, batch, task, rngs, moe_aux_weight: float):
    """model.apply -> losses dict; collects the sown MoE load-balancing
    aux (ops/moe.py) into the dict when the MoE fusion FFN is enabled."""
    if moe_aux_weight:
        losses, mut = model.apply(
            {"params": params}, batch, task, True, True,
            rngs=rngs, mutable=["moe"],
        )
        aux_leaves = jax.tree_util.tree_leaves(mut.get("moe", {}))
        if aux_leaves:
            # mean over MoE layers, not sum: keeps the effective
            # load-balance strength equal to fusion_moe_aux_weight per
            # layer regardless of fusion_moe_every / num_layers
            aux = sum(jnp.asarray(a, jnp.float32) for a in aux_leaves) / len(
                aux_leaves
            )
            losses = dict(losses, moe_aux=moe_aux_weight * aux)
        return losses
    return model.apply(
        {"params": params}, batch, task, True, True, rngs=rngs
    )


def _step_body(
    model, tx, state: TrainState, batch, rng, task: TaskSpec,
    grad_dtype: Optional[str], moe_aux_weight: float, with_grad_norm: bool,
):
    """The one train step: loss-dict forward, grad, optimizer update.
    Shared by make_train_step (one jit per call) and make_train_loop
    (scanned K times inside one jit) so the two paths cannot drift."""
    rng = jax.random.fold_in(rng, state.step)
    mask_rng, drop_rng = jax.random.split(rng)

    def loss_fn(params):
        with train_mode():
            losses = _apply_losses(
                model, params, batch, task,
                {"mask": mask_rng, "dropout": drop_rng}, moe_aux_weight,
            )
        total = sum(jnp.asarray(v, jnp.float32) for v in losses.values())
        return total, losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    grads = _cast_grads(grads, grad_dtype)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = dict(losses)
    metrics["total_loss"] = total
    if with_grad_norm:
        from valor_tpu.train.optimizer import global_norm_flat

        metrics["grad_norm"] = global_norm_flat(grads)
    return (
        TrainState(step=state.step + 1, params=params, opt_state=opt_state),
        metrics,
    )


def make_train_step(
    model, tx, donate: bool = True, with_grad_norm: bool = True,
    grad_dtype: Optional[str] = None, moe_aux_weight: float = 0.0,
):
    """Returns train_step(state, batch, rng, task) -> (state, metrics).

    `task` is static (hashable TaskSpec); one executable per task+shape.
    `with_grad_norm=False` skips the metric's extra flat-concat of all
    grads (a transient full-param-size buffer) — useful at memory limits.
    """

    @functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch, rng, task: TaskSpec):
        return _step_body(
            model, tx, state, batch, rng, task,
            grad_dtype, moe_aux_weight, with_grad_norm,
        )

    return train_step


def make_train_loop(
    model, tx, n_inner: int, donate: bool = True,
    grad_dtype: Optional[str] = None, moe_aux_weight: float = 0.0,
):
    """K train steps per jit call via lax.scan over a stacked batch.

    The optimizer state and params stay device-resident INSIDE one XLA
    program for all K steps — amortising the per-call buffer-handle
    marshaling (which dominates on tunneled/remote PJRT runtimes and is
    nonzero even locally) and letting XLA overlap step boundaries.
    Batches arrive stacked on a new leading axis: [K, B, ...].
    (grad_norm metric intentionally off inside the scan: its flat concat
    would add a transient full-param-size buffer at the fused loop's
    memory high-water mark — PERF_NOTES.md round-1.)
    """

    @functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0,) if donate else ())
    def train_loop(state: TrainState, stacked_batch, rng, task: TaskSpec):
        def body(state, batch):
            return _step_body(
                model, tx, state, batch, rng, task,
                grad_dtype, moe_aux_weight, False,
            )

        state, metrics = jax.lax.scan(body, state, stacked_batch, length=n_inner)
        return state, jax.tree_util.tree_map(jnp.mean, metrics)

    return train_loop


def make_eval_step(model):
    """Feature-extraction / loss-free forward, jitted per task."""

    @functools.partial(jax.jit, static_argnums=(2,))
    def eval_step(params, batch, task: TaskSpec):
        # fixed mask rng: pretrain proxy eval masks tokens deterministically
        return model.apply(
            {"params": params}, batch, task, False, False,
            rngs={"mask": jax.random.PRNGKey(0)},
        )

    return eval_step


def shard_train_inputs(mesh, state: TrainState, batch):
    """Place state replicated and batch sharded over the data axis."""
    rep = replicated(mesh)
    state = jax.device_put(state, rep)
    from valor_tpu.parallel.mesh import shard_batch

    return state, shard_batch(mesh, batch)
