"""Device mesh construction and sharding helpers.

The reference's only parallelism is 8-GPU NCCL data parallelism
(reference: train_utils.py:46,232; scripts/pretrain.sh:3).  On TPU we
replace the whole launcher/DDP/allreduce stack with a named
``jax.sharding.Mesh`` and sharding annotations; XLA inserts the ICI
collectives.  Axes:

  * ``data``  — batch sharding (DP); gradient averaging is a psum inserted
                by XLA under jit.  Subsumes DDP + apex DDP + manual
                all_reduce (reference: train_utils.py:322-329).
  * ``model`` — optional tensor-parallel axis (the reference has none;
                kept so larger encoder variants can shard matmuls).

Multi-host extends the same mesh across DCN via jax.distributed.initialize;
nothing in the model code changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        devices = devices[: n_data * n_model]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with batch-dim sharding over `data`."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % mesh.shape[DATA_AXIS] == 0:
            return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, batch)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {n}")
    return global_batch // n
