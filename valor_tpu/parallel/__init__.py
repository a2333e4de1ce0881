"""Parallelism: mesh/sharding (DP, TP, ZeRO-1), sequence parallelism,
GPipe pipeline parallelism, and multi-host object collectives."""

from valor_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from valor_tpu.parallel.pipeline import (  # noqa: F401
    PIPE_AXIS,
    make_pipe_mesh,
    pipeline_apply,
    pipeline_layers,
    stack_params,
)
