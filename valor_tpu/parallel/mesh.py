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
PIPE_AXIS = "pipe"

_warned_replicated: set = set()  # one warning per batch key (shard_batch)


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    n_pipe: int = 1,
) -> Mesh:
    """Build a (data, model[, pipe]) mesh over the available devices.

    With ``n_pipe > 1`` the mesh gains a third, innermost ``pipe`` axis
    (innermost so GPipe stage hops are nearest-neighbour ICI transfers,
    parallel/pipeline.py); all (data, model) shardings work unchanged on
    the 3-axis mesh — unmentioned axes replicate.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_pipe)
    if n_data * n_model * n_pipe != len(devices):
        devices = devices[: n_data * n_model * n_pipe]
    if n_pipe > 1:
        arr = np.array(devices).reshape(n_data, n_model, n_pipe)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS, PIPE_AXIS))
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis — and over `pipe`
    too when the mesh has one.

    Outside the pipelined fusion block the pipe devices would otherwise
    recompute the towers and heads redundantly (the GPipe shard_map is the
    only consumer of the pipe axis): folding `pipe` into the batch sharding
    makes it extra data parallelism for all batch-parallel compute, and
    GSPMD inserts the pipe-axis all_gather at the shard_map boundary where
    the schedule genuinely needs every microbatch resident."""
    axes = (DATA_AXIS, PIPE_AXIS) if mesh.shape.get(PIPE_AXIS, 1) > 1 else DATA_AXIS
    return NamedSharding(mesh, P(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with batch-dim sharding over `data`.

    * single-host: async ``device_put`` (overlaps the running step),
    * multi-host: each process holds only ITS rows (the loaders shard by
      process, data/loader.py ShardedBatchSampler), so the global array is
      assembled with ``jax.make_array_from_process_local_data`` — a plain
      device_put of host-local rows cannot form a global array across DCN.
    * non-array leaves (ids, raw answer strings, ...) pass through on host.
    """
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    multihost = jax.process_count() > 1
    n_shards = mesh.shape[DATA_AXIS] * (
        mesh.shape.get(PIPE_AXIS, 1) if sh.spec != P(DATA_AXIS) else 1
    )

    def put(key, x):
        if not hasattr(x, "ndim"):
            return x
        if x.ndim == 0:
            return jax.device_put(x, rep)
        if multihost:
            x = np.asarray(x)
            if key == "tile_index":
                # local question indices -> global rows: each process's
                # media rows land at offset p * Q_local in the global array
                x = x + jax.process_index() * _local_rows(batch)
            return jax.make_array_from_process_local_data(sh, x)
        if x.shape[0] % n_shards == 0:
            return jax.device_put(x, sh)
        if x.shape[0] % mesh.shape[DATA_AXIS] == 0:
            # divisible by data but not data*pipe: keep plain DP sharding
            return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
        if key not in _warned_replicated and x.ndim > 1:
            _warned_replicated.add(key)
            from valor_tpu.core.logging import LOGGER

            LOGGER.warning(
                f"batch key {key!r} (dim0={x.shape[0]}) is not divisible by "
                f"the data axis ({mesh.shape[DATA_AXIS]}); replicating — "
                "data parallelism is OFF for this array"
            )
        return jax.device_put(x, rep)

    if isinstance(batch, dict):
        return {k: put(k, v) for k, v in batch.items()}
    return jax.tree_util.tree_map(lambda x: put("", x), batch)


def _local_rows(batch) -> int:
    """Per-process media row count for tile_index offsetting."""
    for key in ("video_pixels", "audio_spectrograms", "audio_waveforms"):
        if batch.get(key) is not None:
            return batch[key].shape[0]
    return 0


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {n}")
    return global_batch // n
