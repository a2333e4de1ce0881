"""Mixture-of-Experts FFN with expert parallelism (EP).

The reference framework has no MoE (its FFNs are dense,
model/modeling.py BertIntermediate/BertOutput); this is a TPU-native
extension for scaling the fusion stack's FFN capacity without scaling
per-token FLOPs.

Design is GShard/Switch-style with STATIC shapes throughout — the only
MoE formulation that maps onto XLA well:

  * routing is a dense fp32 ``[G, S, E]`` softmax; top-k selection by
    iterative masking (no sorts, no dynamic shapes);
  * each expert has a fixed capacity ``C``; a token's slot is its
    cumulative position among the tokens routed to that expert, and
    tokens beyond ``C`` are DROPPED (their combine weight is zero, so
    the residual connection passes them through unchanged — standard
    Switch semantics);
  * dispatch/combine are one-hot einsums: ``[G,S,E,C]`` against
    ``[G,S,M]`` giving per-expert batches ``[E, G, C, M]`` — all MXU
    work, no gathers;
  * expert parallelism = ONE sharding constraint: the expert-major
    tensors (``[E, ...]`` stacked FFN weights and per-expert batches)
    are constrained to shard dim 0 over the ``model`` mesh axis, and
    GSPMD inserts the all_to_all pair around the expert compute.  No
    hand-written routing collectives (the NCCL alltoall a torch MoE
    would need).

Load balancing: the Switch aux loss ``E * mean_e(f_e * P_e)`` is
returned alongside the output; callers add ``moe_aux_weight *`` it to
the task loss.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from valor_tpu.ops.layers import ACT2FN, Dtype
from valor_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# [mesh | None, trace-time application counter] — same pattern as
# parallel/activations.py: EP engages via one global switch and is a
# no-op everywhere else (single chip, eval, decode trace unchanged).
_STATE: list = [None, 0]


def set_expert_sharding(mesh: Optional[Mesh]) -> None:
    """Install (or clear, with None) the mesh used for EP constraints.

    Experts shard over the ``model`` axis (the standard choice: EP and
    TP occupy the same mesh dimension, one or the other per layer)."""
    _STATE[0] = mesh
    _STATE[1] = 0


def expert_sharding_applied() -> int:
    return _STATE[1]


def _expert_sharded(x: jax.Array) -> jax.Array:
    """Constrain an expert-major [E, ...] tensor to P(model, ...)."""
    mesh = _STATE[0]
    if mesh is None:
        return x
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    if n_model <= 1 or x.shape[0] % n_model:
        return x
    _STATE[1] += 1
    spec = P(MODEL_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def _token_sharded(x: jax.Array) -> jax.Array:
    """Constrain a token-major [G, S, ...] tensor to P(data, ...)."""
    mesh = _STATE[0]
    if mesh is None:
        return x
    n_data = mesh.shape.get(DATA_AXIS, 1)
    if n_data <= 1 or x.shape[0] % n_data:
        return x
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def _top_k_mask(gates: jnp.ndarray, k: int) -> jnp.ndarray:
    """[G,S,E] -> [K,G,S,E] one-hot masks of the k largest gates,
    by iterative masking (static shapes, no sort)."""
    masks = []
    remaining = gates
    for _ in range(k):
        idx = jnp.argmax(remaining, axis=-1)
        one = jax.nn.one_hot(idx, gates.shape[-1], dtype=gates.dtype)
        masks.append(one)
        remaining = remaining * (1.0 - one) - one  # never re-picked
    return jnp.stack(masks)


class MoEMlpBlock(nn.Module):
    """Drop-in MoE replacement for ops.layers.MlpBlock.

    Returns ``(y, aux_loss)``; ``y`` has the input's shape.  Input must
    be ``[G, S, M]`` (groups x tokens x width).
    """

    num_experts: int
    intermediate: int
    top_k: int = 2
    capacity_factor: float = 1.25
    activation: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if x.ndim != 3:
            raise ValueError(f"MoE input must be [G, S, M], got {x.shape}")
        g, s, m = x.shape
        e, k = self.num_experts, self.top_k
        if not 1 <= k <= e:
            raise ValueError(f"top_k={k} out of range for {e} experts")
        cap = max(1, math.ceil(k * s * self.capacity_factor / e))

        # --- routing (fp32: tiny tensor, and argmax ties/overflow order
        # must not depend on the compute dtype)
        router = self.param(
            "router", nn.initializers.normal(stddev=0.02), (m, e), jnp.float32
        )
        logits = jnp.einsum("gsm,me->gse", x.astype(jnp.float32), router)
        gates = jax.nn.softmax(logits, axis=-1)  # [G,S,E]

        sel = _top_k_mask(gates, k)  # [K,G,S,E]
        # slot position per (choice, token): cumulative count of earlier
        # claims on the same expert — earlier choices (k) and earlier
        # tokens (s) claim first (GShard ordering)
        flat = sel.transpose(1, 0, 2, 3).reshape(g, k * s, e)  # [G, K*S, E]
        pos_flat = jnp.cumsum(flat, axis=1) - flat  # claims before this one
        pos = pos_flat.reshape(g, k, s, e).transpose(1, 0, 2, 3)
        keep = sel * (pos < cap)  # [K,G,S,E]
        slot = jnp.einsum("kgse,kgse->kgs", pos, keep)  # slot id (0 if dropped)

        # dispatch [G,S,E,C]: sum over choices (a token uses <= 1 slot per
        # expert — argmax never re-picks an expert)
        slot_one = jax.nn.one_hot(
            slot.astype(jnp.int32), cap, dtype=x.dtype
        )  # [K,G,S,C]
        dispatch = jnp.einsum(
            "kgse,kgsc->gsec", keep.astype(x.dtype), slot_one
        )
        # combine: dispatch weighted by the top-k-normalised gates.
        # GShard/Switch semantics: normalise by the PRE-drop top-k gate
        # sum, so a capacity-dropped choice simply contributes zero and
        # its mass passes through the residual — renormalising over only
        # the surviving choices would inflate the kept expert's weight to
        # 1.0 under congestion and change training dynamics.
        picked = jnp.einsum("kgse,gse->kgs", sel, gates)  # gate of choice k
        kept_gate = picked * jnp.einsum("kgse->kgs", keep)  # zero if dropped
        denom = jnp.maximum(jnp.sum(picked, axis=0), 1e-9)  # [G,S] pre-drop
        weight = kept_gate / denom
        combine = jnp.einsum(
            "kgse,kgsc,kgs->gsec", keep, slot_one.astype(keep.dtype), weight
        ).astype(x.dtype)

        # --- expert compute: stacked FFN weights, expert-major batches
        w1 = self.param(
            "w1", nn.initializers.normal(stddev=0.02),
            (e, m, self.intermediate), jnp.float32,
        )
        b1 = self.param("b1", nn.initializers.zeros, (e, self.intermediate), jnp.float32)
        w2 = self.param(
            "w2", nn.initializers.normal(stddev=0.02),
            (e, self.intermediate, m), jnp.float32,
        )
        b2 = self.param("b2", nn.initializers.zeros, (e, m), jnp.float32)

        xin = _token_sharded(x)
        expert_in = jnp.einsum("gsec,gsm->egcm", dispatch, xin)
        expert_in = _expert_sharded(expert_in)  # all_to_all happens here
        h = jnp.einsum(
            "egcm,emh->egch", expert_in, _expert_sharded(w1.astype(self.dtype))
        ) + b1.astype(self.dtype)[:, None, None, :]
        h = ACT2FN[self.activation](h)
        out = jnp.einsum(
            "egch,ehm->egcm", h, _expert_sharded(w2.astype(self.dtype))
        ) + b2.astype(self.dtype)[:, None, None, :]
        out = _expert_sharded(out)
        y = jnp.einsum("gsec,egcm->gsm", combine, out)  # all_to_all back
        y = _token_sharded(y)

        # --- Switch load-balancing aux loss: E * sum_e f_e * P_e, where
        # f_e = fraction of tokens whose FIRST choice is expert e and
        # P_e = mean router probability of e.  Minimised (=1) at uniform.
        f = jnp.mean(sel[0], axis=(0, 1))  # [E]
        p = jnp.mean(gates, axis=(0, 1))  # [E]
        aux = e * jnp.sum(f * p)
        return y, aux
