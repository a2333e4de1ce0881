"""Host-object and multi-host collectives.

Replaces the reference's pickle-over-NCCL object collectives
(utils/distributed.py:99-157: all_gather_list / any_broadcast) with
JAX-native equivalents:

  * inside jit, data collectives are sharding-driven (no code here),
  * eval-prediction gathers use multihost_utils.process_allgather,
  * arbitrary python objects ride a JSON -> uint8 tensor all-gather,
  * the per-step task-choice broadcast is replaced by a shared-seed draw
    (data/loader.py MetaLoader) and needs no communication at all.

Single-process runs short-circuit every function (tests run this path).
"""

from __future__ import annotations

import json
from typing import Any, List, Sequence

import jax
import numpy as np


def process_count() -> int:
    return jax.process_count()


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather one python object per host -> list ordered by process index."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(json.dumps(obj).encode(), np.uint8)
    n = np.asarray([payload.size], np.int32)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    maxlen = int(sizes.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[: payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    out = []
    for i in range(jax.process_count()):
        raw = bytes(gathered[i, : sizes[i]].tolist())
        out.append(json.loads(raw.decode()))
    return out


def all_gather_lists(items: Sequence[Any]) -> List[Any]:
    """Concatenate per-host lists across hosts (eval predictions,
    reference: test.py:101,203,275)."""
    chunks = all_gather_objects(list(items))
    return [x for chunk in chunks for x in chunk]


def gather_arrays(x: np.ndarray) -> np.ndarray:
    """Stack a same-shape per-host array across hosts along axis 0."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def all_gather_ragged(x: np.ndarray) -> np.ndarray:
    """Concatenate per-host arrays with DIFFERENT leading dims along axis 0
    (ordered by process index).

    The eval shards are ragged — ShardedBatchSampler covers every item, so
    hosts may differ by one (data/loader.py) — which is exactly the case
    the reference's padded ddp_allgather handles (utils/
    distributed.py:77-97).  Pads to the max rows, gathers, trims.
    """
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    n = np.asarray([x.shape[0]], np.int32)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    maxlen = int(sizes.max())
    padded = np.zeros((maxlen,) + x.shape[1:], x.dtype)
    padded[: x.shape[0]] = x
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return np.concatenate(
        [gathered[i, : sizes[i]] for i in range(jax.process_count())], axis=0
    )
