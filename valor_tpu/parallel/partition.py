"""Parameter partitioning rules (tensor parallelism over the `model` axis).

The reference has no TP (SURVEY.md §2.3 — DP only); these rules are the
optional TPU-native extension: Megatron-style column/row sharding of the
transformer matmuls expressed purely as PartitionSpecs — GSPMD inserts the
collectives.  With mesh model=1 every spec degenerates to replication, so
the same code path serves pure DP.

Rules (kernel layout is [in, out]):
  * attention query/key/value kernels+biases: shard the OUT (head) dim,
  * attention out-projection kernel: shard the IN dim (row parallel),
  * MLP fc1: OUT sharded (column), fc2: IN sharded (row),
  * qkv fused kernels (videoswin): OUT sharded,
  * embeddings / LayerNorm / small heads: replicated.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from valor_tpu.parallel.mesh import MODEL_AXIS


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_spec(path_str: str, ndim: int) -> P:
    p = path_str
    last = p.rsplit("/", 1)[-1]
    is_kernel = last == "kernel"
    is_bias = last == "bias"
    if "/attn/" in p or p.endswith("attn/qkv/kernel") or "/qkv/" in p:
        if any(f"/{n}/" in p for n in ("query", "key", "value")) or "/qkv/" in p:
            if is_kernel and ndim == 2:
                return P(None, MODEL_AXIS)  # column parallel
            if is_bias and ndim == 1:
                return P(MODEL_AXIS)
        if "/out/" in p or "/proj/" in p:
            if is_kernel and ndim == 2:
                return P(MODEL_AXIS, None)  # row parallel
            return P()
    if "/mlp/" in p:
        if "fc1" in p:
            if is_kernel and ndim == 2:
                return P(None, MODEL_AXIS)
            if is_bias and ndim == 1:
                return P(MODEL_AXIS)
        if "fc2" in p and is_kernel and ndim == 2:
            return P(MODEL_AXIS, None)
    return P()  # replicated


def _divisible(shape, spec: P, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        if shape is None or dim % mesh.shape[axis] != 0:
            return False
    return True


def shard_opt_state(opt_state: Any, params: Any, mesh: Mesh) -> Any:
    """ZeRO-1-style placement: shard adam moment leaves over the `data`
    axis (dim 0 when divisible), keep scalars/counters replicated.

    The reference replicates optimizer state on every GPU (apex O2 master
    params); sharding the moments over data cuts optimizer memory by the
    DP degree — GSPMD inserts the reduce-scatter/all-gather around the
    update.  Leaves that match a param leaf keep dim-0 sharding only when
    the param itself is replicated on dim 0 (TP-sharded params keep their
    own layout via zeros_like inheritance)."""
    from valor_tpu.parallel.mesh import DATA_AXIS

    del params
    n_data = mesh.shape[DATA_AXIS]

    def place(x):
        if not hasattr(x, "ndim"):
            return x
        # leave TP-sharded moments (inherited via zeros_like) untouched
        sh = getattr(x, "sharding", None)
        replicated_now = sh is None or getattr(sh, "is_fully_replicated", True)
        if (
            replicated_now
            and x.ndim >= 1
            and x.shape[0] % n_data == 0
            and x.size >= 1 << 14  # tiny leaves: replication is cheaper
        ):
            spec = P(*([DATA_AXIS] + [None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return x

    return jax.tree_util.tree_map(place, opt_state)


def shard_params(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """device_put the param tree with TP specs (falling back to replication
    for shapes not divisible by the model axis).

    With ``fsdp=True`` (ZeRO-3-style fully-sharded parameters, a
    TPU-native extension — the reference replicates all params per GPU),
    every large leaf additionally shards one dimension over ``data``:
    GSPMD all_gathers a layer's params at its use site and reduce-scatters
    its grads, and the adam moments inherit the layout via zeros_like —
    param+grad+optimizer memory all drop by the DP degree.  Composes with
    TP: the data axis lands on the first dim the TP spec leaves free.
    Small leaves (< 16 KiB elements) stay replicated — the gather latency
    costs more than the memory saves."""
    from valor_tpu.parallel.mesh import DATA_AXIS

    n_data = mesh.shape.get(DATA_AXIS, 1)

    def place(path, x):
        spec = param_spec(_path_str(path), np.ndim(x))
        if spec != P() and not _divisible(x.shape, spec, mesh):
            spec = P()
        if fsdp and n_data > 1 and np.ndim(x) >= 1 and x.size >= 1 << 14:
            axes = list(spec) + [None] * (np.ndim(x) - len(spec))
            for i, (dim, ax) in enumerate(zip(x.shape, axes)):
                if ax is None and dim % n_data == 0:
                    axes[i] = DATA_AXIS
                    spec = P(*axes)
                    break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
