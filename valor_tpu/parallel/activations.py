"""Optional sequence-parallel (SP) activation sharding.

The reference has no sequence/context parallelism (SURVEY.md §2.3, §5 —
the fusion sequence stays <= ~1.7k tokens, so pure DP suffices).  On TPU
the idiomatic form costs one sharding annotation instead of hand-written
gather/scatter collectives: constrain the fusion residual stream
[B, S, D] to PartitionSpec(data, model, None) between layers and let
GSPMD insert the all-gathers around attention/matmuls while LayerNorm /
residual adds / dropout / embedding lookups stay sequence-sharded
(Megatron-LM SP semantics, realised by the compiler).  This cuts the
per-device activation residency of the fusion stack by the model-axis
degree — the lever for long-context variants the reference cannot
express at all.

Enabled per-run via ``ModelConfig.sequence_parallel`` (wired in
cli/build.py next to the remat/score-dtype policies); the constraint is
a no-op when disabled, when a dimension does not divide its mesh axis
(decode beams, odd prompt lengths, ...), or under shapes too small to
matter, so every other code path — single-chip, eval, decode — traces
unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from valor_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# [mesh | None, trace-time application counter]
_STATE: list = [None, 0]


def set_sequence_sharding(mesh: Optional[Mesh]) -> None:
    """Install (or clear, with None) the mesh used for SP constraints."""
    _STATE[0] = mesh
    _STATE[1] = 0


def sequence_sharding_applied() -> int:
    """How many constraint sites engaged since set_sequence_sharding
    (incremented at trace time; used by tests and the multichip dryrun)."""
    return _STATE[1]


def sequence_sharded(x: jax.Array) -> jax.Array:
    """Constrain a [B, S, D] activation to P(data, model, None) when SP is
    enabled and both sharded dims divide their mesh axes; identity
    otherwise."""
    mesh = _STATE[0]
    if mesh is None or getattr(x, "ndim", 0) != 3:
        return x
    n_data = mesh.shape.get(DATA_AXIS, 1)
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    if n_model <= 1:
        return x
    if x.shape[0] % n_data or x.shape[1] % n_model:
        return x
    _STATE[1] += 1
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))
    )
