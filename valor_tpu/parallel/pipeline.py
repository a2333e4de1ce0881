"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference framework has no pipeline parallelism — its only scaling
strategy is 8-GPU DDP (reference: train_utils.py:46,232).  On TPU,
pipelining is the idiomatic way to scale a deep homogeneous stack past
one chip's HBM, and it composes with the data/tensor axes this package
already provides (parallel/mesh.py, parallel/partition.py):

  * the layer-stacked parameters shard over a ``pipe`` mesh axis
    (leading ``[n_stages, layers_per_stage, ...]`` dim), so each device
    holds only its stage's weights;
  * activations move between *neighbouring* devices with
    ``lax.ppermute`` — a nearest-neighbour ICI transfer, the cheapest
    collective on a TPU torus;
  * the whole schedule is ONE ``lax.scan`` inside ``shard_map``: XLA
    sees a single static program (no per-tick dispatch, no dynamic
    shapes) and overlaps each tick's ppermute with the next tick's
    stage compute.

Schedule: single-direction GPipe.  ``M`` microbatches flow through
``S`` stages in ``M + S - 1`` ticks; every tick each stage applies its
layer block to its resident activation and results rotate one hop.
Bubble fraction is ``(S - 1) / (M + S - 1)`` — pick ``M >= 4 * S`` for
>75% pipeline utilisation.  The backward pass needs no hand-written
schedule: ``jax.grad`` of this program transposes the ``ppermute`` into
the reverse rotation and the ``scan`` into the reverse-time scan,
yielding the standard reverse-flow pipeline automatically.

Composition: inputs/outputs may shard their batch dim over the ``data``
axis of the same mesh (DP x PP).  Parameters are replicated over
``data``; AD inserts the gradient ``psum`` over ``data`` exactly as in
the pure-DP path.  Tensor-parallel sharding of the *within-stage*
matmuls composes too (the stage_fn runs under the same mesh), but the
stacked-params helpers here deliberately keep that orthogonal.

Memory note: microbatch inputs and collected outputs are replicated
across the pipe axis (each stage carries the full ``[M, mb, ...]``
buffer so the scan stays static).  That costs ``2 * M * mb`` activation
buffers per device — negligible next to the per-stage weights this
scheme exists to shard.  If it ever matters, shard the microbatch dim
over ``data`` (supported below) before reaching for anything fancier.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8: jax.shard_map, replication checking renamed check_vma
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep, axis_names=None):
        kw = {}
        if axis_names is not None:
            # partial-manual: axes NOT listed stay auto — GSPMD still
            # partitions the body's matmuls over them (this is how TP
            # composes inside the pipeline, see pipeline_apply)
            kw["axis_names"] = frozenset(axis_names)
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep, **kw,
        )
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_legacy  # type: ignore

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep, axis_names=None):
        kw = {}
        if axis_names is not None:
            auto = frozenset(mesh.axis_names) - frozenset(axis_names)
            if auto:
                kw["auto"] = auto
        return _shard_map_legacy(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=check_rep, **kw,
        )

DATA_AXIS = "data"
PIPE_AXIS = "pipe"

# [mesh | None, num_microbatches, trace-time application counter] — the
# production install switch (same pattern as parallel/activations.py /
# ops/moe.py): cli/build.py installs the mesh when
# ModelConfig.fusion_pipeline_stages > 0 and the fusion encoder routes its
# layer stack through pipeline_layers; everywhere else (single chip, eval,
# decode) the model traces unchanged.
_STATE: list = [None, 0, 0]


def set_pipeline(mesh: Optional[Mesh], num_microbatches: int = 0) -> None:
    """Install (or clear, with None) the mesh used for pipeline routing.

    ``num_microbatches`` = 0 means auto: the encoder picks the largest
    M <= 2 * n_stages that divides its batch (bubble <= (S-1)/(3S-1))."""
    if mesh is not None and PIPE_AXIS not in mesh.shape:
        raise ValueError(f"pipeline mesh needs a {PIPE_AXIS!r} axis, has {mesh.axis_names}")
    _STATE[0] = mesh
    _STATE[1] = num_microbatches
    _STATE[2] = 0


def get_pipeline_mesh() -> Optional[Mesh]:
    mesh = _STATE[0]
    if mesh is not None and mesh.shape.get(PIPE_AXIS, 1) > 1:
        return mesh
    return None


def pipeline_microbatches(batch: int, n_stages: int, n_data: int = 1) -> int:
    """Configured M, or the largest M <= 2*n_stages with ``batch % M == 0``
    and the microbatch still divisible by the data axis (DP x PP)."""
    if _STATE[1]:
        return _STATE[1]
    m = 1
    for cand in range(1, min(batch, 2 * n_stages) + 1):
        if batch % cand == 0 and (batch // cand) % n_data == 0:
            m = cand
    return m


def pipeline_applied() -> int:
    """Trace-time engagement counter (asserted by tests and the dryrun)."""
    return _STATE[2]


def _note_applied() -> None:
    _STATE[2] += 1


def make_pipe_mesh(
    n_pipe: int,
    n_data: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A (data, pipe) mesh.  ``pipe`` innermost so stage hops ride ICI."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data * n_pipe > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_pipe} needs {n_data * n_pipe} devices, "
            f"have {len(devices)}"
        )
    arr = np.array(devices[: n_data * n_pipe]).reshape(n_data, n_pipe)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def stack_params(params_list: Sequence[Any]) -> Any:
    """Stack per-layer param pytrees into one tree with a leading layer dim.

    This is the scan-over-layers layout (the same one flax's ``nn.scan``
    produces); it is also exactly what the pipeline needs to shard stages.
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def _reshape_stages(stacked: Any, n_stages: int, interleave: int = 1) -> Any:
    """[L, ...] stacked layers -> [S, L//S, ...] stage blocks.

    With ``interleave=V``: -> [S, V, L//(S*V), ...] where device ``d``
    holds the stride-S blocks ``{v*S + d}`` (Megatron-style interleaved
    assignment — consecutive blocks live on consecutive devices, so the
    payload's chunk index is ``block // S`` on every device)."""
    blocks = n_stages * interleave

    def fold(x):
        if x.shape[0] % blocks:
            raise ValueError(
                f"{x.shape[0]} layers do not divide into {n_stages} stages"
                + (f" x {interleave} chunks" if interleave > 1 else "")
            )
        lc = x.shape[0] // blocks
        if interleave == 1:
            return x.reshape(n_stages, lc, *x.shape[1:])
        xb = x.reshape(blocks, lc, *x.shape[1:])
        order = np.array(
            [v * n_stages + d for d in range(n_stages) for v in range(interleave)]
        )
        return jnp.take(xb, order, axis=0).reshape(
            n_stages, interleave, lc, *x.shape[1:]
        )

    return jax.tree_util.tree_map(fold, stacked)


def pipeline_apply(
    stage_fn: Callable[..., jnp.ndarray],
    stage_params: Any,
    x: jnp.ndarray,
    mesh: Mesh,
    num_microbatches: int,
    shard_batch_over_data: bool = False,
    extras: Any = None,
    rng: Optional[jax.Array] = None,
    interleave: int = 1,
) -> jnp.ndarray:
    """Run ``x`` through ``S`` pipeline stages on the ``pipe`` mesh axis.

    Args:
      stage_fn: ``(per_stage_params, activation) -> activation``; applied
        by every stage to its resident microbatch each tick.  Must be
        shape-preserving (classic homogeneous-stack pipelining).  When
        ``extras``/``rng`` are given the signature extends to
        ``(params, activation, extras_mb, key)`` — ``extras_mb`` is the
        resident microbatch's slice of every extras leaf and ``key`` a
        per-(tick, stage) folded rng (None when ``rng`` is None).
      stage_params: pytree whose leaves have leading dim ``S`` =
        ``mesh.shape['pipe']``; leaf ``i`` holds stage ``i``'s params.
      x: ``[B, ...]`` batch; ``B`` must divide into ``num_microbatches``.
      mesh: a mesh containing a ``pipe`` axis (and optionally ``data``).
      num_microbatches: M.  Bubble fraction (S-1)/(M+S-1) for the plain
        GPipe schedule (``interleave=1``).
      interleave: V virtual stages per device (Megatron-style interleaved
        schedule).  With ``stage_params`` leaves shaped ``[S, V, ...]``
        (``_reshape_stages(..., interleave=V)`` assigns device ``d`` the
        stride-S blocks ``{v*S+d}``), microbatch groups of S circulate the
        ring V times; each device applies chunk ``b // S`` of the payload
        at block ``b``.  Wall = ``M*V + S - 1`` chunk-ticks where a chunk
        is 1/V of a stage, so the bubble shrinks from ``(S-1)`` stage-times
        to ``(S-1)/V`` — at the cost of V x more ppermute hops.  Requires
        ``M % S == 0`` and ``V=1`` reduces exactly to the GPipe schedule.
      shard_batch_over_data: shard the microbatch dim over ``data``
        (DP x PP).  Requires ``mb % mesh.shape['data'] == 0``.
      extras: optional pytree of per-batch tensors ``[B, ...]`` that ride
        along with the activations (attention bias, cross-attention
        memories).  Microbatched like ``x``; every stage reads the slice
        belonging to its RESIDENT microbatch (index ``t - stage``), so
        non-shape-preserving side inputs compose with the schedule.
      rng: optional base dropout key.

    Returns ``[B, ...]`` outputs (replicated over ``pipe``).
    """
    n_stages = mesh.shape[PIPE_AXIS]
    batch = x.shape[0]
    if batch % num_microbatches:
        raise ValueError(f"batch {batch} not divisible by M={num_microbatches}")
    if interleave > 1 and num_microbatches % n_stages:
        raise ValueError(
            f"interleaved schedule needs M % S == 0, got M={num_microbatches} "
            f"S={n_stages} (microbatch groups of S circulate the ring)"
        )
    mb = batch // num_microbatches
    n_data = mesh.shape.get(DATA_AXIS, 1) if shard_batch_over_data else 1
    if mb % n_data:
        raise ValueError(
            f"microbatch size {mb} not divisible by data axis {n_data}"
        )
    has_extras = extras is not None and bool(jax.tree_util.tree_leaves(extras))
    exs = extras if has_extras else ()
    wants_ctx = has_extras or rng is not None

    # batch tensors enter the shard_map FLAT ([B, ...], batch dim over
    # `data`); the [M, mb_local, ...] microbatch reshape happens INSIDE the
    # manual body where it is a free local reshape.  A global
    # [B@ (data x pipe)] -> [M, mb@data] reshape at the boundary is a
    # sharding transition GSPMD can only do by replicating and
    # repartitioning ("Involuntary full rematerialization" — real wasted
    # ICI traffic); the flat P(data) in_spec instead makes the boundary a
    # clean same-dim pipe all_gather, which the schedule needs anyway
    # (every microbatch resident per stage).
    data_spec = DATA_AXIS if shard_batch_over_data else None
    flat_spec = P(data_spec)
    params_spec = jax.tree_util.tree_map(lambda _: P(PIPE_AXIS), stage_params)
    exs_spec = (
        jax.tree_util.tree_map(lambda _: flat_spec, exs) if has_extras else ()
    )
    # the schedule is manual over data+pipe only; any OTHER mesh axis
    # (e.g. `model`) stays auto so GSPMD keeps partitioning the
    # within-stage matmuls — this is full DP x PP x TP in one program
    # (stage params arrive TP-sharded on their trailing dims, the
    # compiler inserts the model-axis collectives inside each tick).
    # Only go partial-manual when an auto axis is actually >1: size-1
    # axes gain nothing, and partial-auto shard_map requires a
    # surrounding jit (eager it rejects the auto axes in the specs).
    manual = tuple(a for a in (DATA_AXIS, PIPE_AXIS) if a in mesh.shape)
    auto_live = [
        a for a in mesh.axis_names if a not in manual and mesh.shape[a] > 1
    ]
    axis_names = manual if auto_live else None

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(params_spec, flat_spec, exs_spec, P()),
        out_specs=flat_spec,
        # the output IS replicated over pipe (psum below) but flows through
        # data-dependent wheres the replication checker cannot see through
        check_rep=False,
        axis_names=axis_names,
    )
    def run(params_blk, x_local, exs_flat, rng_local):
        # params_blk leaves: [1, layers_per_stage, ...] — this device's stage
        # (interleave > 1: [1, V, layers_per_chunk, ...] — V virtual stages)
        params_here = jax.tree_util.tree_map(lambda p: p[0], params_blk)
        idx = lax.axis_index(PIPE_AXIS)
        # local microbatch reshape (see in_specs note): this data lane's
        # rows split m-major into the same M microbatches per lane
        m = num_microbatches
        xs_local = x_local.reshape(m, x_local.shape[0] // m, *x_local.shape[1:])
        exs_local = (
            jax.tree_util.tree_map(
                lambda e: e.reshape(m, e.shape[0] // m, *e.shape[1:]), exs_flat
            )
            if has_extras
            else ()
        )
        ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def _ctx_out(chunk, state, m_c, t):
            if not wants_ctx:
                return stage_fn(chunk, state)
            ex_mb = (
                jax.tree_util.tree_map(
                    lambda e: lax.dynamic_index_in_dim(
                        e, m_c, 0, keepdims=False
                    ),
                    exs_local,
                )
                if has_extras
                else None
            )
            key = (
                jax.random.fold_in(rng_local, t * n_stages + idx)
                if rng is not None
                else None
            )
            return stage_fn(chunk, state, ex_mb, key)

        def tick_interleaved(carry, t):
            # closed-form group schedule: microbatch groups of S circulate
            # the ring V times; the payload at this device at tick t is
            # microbatch m = g*S + r, at global block b (local chunk b//S).
            # Entry: m enters stage 0 at tick g*S*V + r; one hop per tick;
            # b == idx (mod S) always, so ingest (b==0) happens only at
            # stage 0 and exit (b==SV-1) only at stage S-1 — the wrapped
            # exited payload is exactly what the next ingest overwrites,
            # making the schedule conflict-free with a single carry slot.
            state, outs = carry
            sv = n_stages * interleave
            r = jnp.mod(t - idx, n_stages)
            tr = t - r
            g = jnp.floor_divide(tr, sv)
            b = tr - g * sv
            mb_i = g * n_stages + r
            valid = jnp.logical_and(g >= 0, mb_i < m)
            m_c = jnp.clip(mb_i, 0, m - 1)
            feed = lax.dynamic_index_in_dim(xs_local, m_c, 0, keepdims=False)
            state = jnp.where(jnp.logical_and(b == 0, valid), feed, state)
            chunk = jax.tree_util.tree_map(
                lambda p: lax.dynamic_index_in_dim(
                    p,
                    jnp.clip(b // n_stages, 0, interleave - 1),
                    0,
                    keepdims=False,
                ),
                params_here,
            )
            out = _ctx_out(chunk, state, m_c, t)
            record = jnp.logical_and(b == sv - 1, valid)
            cur = lax.dynamic_index_in_dim(outs, m_c, 0, keepdims=False)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(record, out, cur), m_c, 0
            )
            nxt = lax.ppermute(out, PIPE_AXIS, ring)
            return (nxt, outs), None

        def tick(carry, t):
            state, outs = carry
            # stage 0 ingests microbatch t (clipped: late ticks re-read the
            # last microbatch, whose recomputed output is never recorded)
            feed = lax.dynamic_index_in_dim(
                xs_local, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            state = jnp.where(idx == 0, feed, state)
            # the microbatch resident at this stage is t - idx (what
            # stage 0 ingested idx ticks ago); its side inputs come
            # from the replicated extras buffer
            out = _ctx_out(params_here, state, jnp.clip(t - idx, 0, m - 1), t)
            # last stage records microbatch t-(S-1) once it has traversed
            # every stage
            o_idx = jnp.clip(t - (n_stages - 1), 0, m - 1)
            record = jnp.logical_and(idx == n_stages - 1, t >= n_stages - 1)
            cur = lax.dynamic_index_in_dim(outs, o_idx, 0, keepdims=False)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(record, out, cur), o_idx, 0
            )
            # one hop along the ring; stage S-1 -> 0 wraps (its payload is
            # overwritten by the stage-0 ingest next tick)
            nxt = lax.ppermute(out, PIPE_AXIS, ring)
            return (nxt, outs), None

        init = (jnp.zeros_like(xs_local[0]), jnp.zeros_like(xs_local))
        (_, outs), _ = lax.scan(
            tick_interleaved if interleave > 1 else tick,
            init,
            jnp.arange(num_microbatches * interleave + n_stages - 1),
        )
        # outputs are valid on the last stage only; replicate over pipe so
        # downstream (loss, heads) sees the full batch everywhere
        outs = lax.psum(
            jnp.where(idx == n_stages - 1, outs, jnp.zeros_like(outs)),
            PIPE_AXIS,
        )
        # back to flat [B_local, ...] so the boundary resharding stays a
        # same-dim transition (see in_specs note)
        return outs.reshape(
            outs.shape[0] * outs.shape[1], *outs.shape[2:]
        )

    # partial-auto shard_map must run under jit (eager rejects auto axes);
    # a concrete (non-traced) input means we're the outermost program
    run_fn = (
        jax.jit(run)
        if axis_names is not None and not isinstance(x, jax.core.Tracer)
        else run
    )
    out = run_fn(
        stage_params,
        x,
        exs,
        rng if rng is not None else jax.random.PRNGKey(0),
    )
    # hand the pipe axis back to batch parallelism for whatever follows
    # (heads, losses): the schedule's output is replicated over pipe, so
    # this constraint is a free slice — downstream compute then splits
    # over data x pipe like the towers do (mesh.batch_sharding)
    if shard_batch_over_data and n_stages > 1 and batch % (
        mesh.shape.get(DATA_AXIS, 1) * n_stages
    ) == 0:
        out = jax.lax.with_sharding_constraint(
            out,
            jax.sharding.NamedSharding(mesh, P((DATA_AXIS, PIPE_AXIS))),
        )
    return out


def pipeline_layers(
    apply_layer: Callable[..., jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    mesh: Mesh,
    num_microbatches: int,
    shard_batch_over_data: bool = False,
    extras: Any = None,
    rng: Optional[jax.Array] = None,
    interleave: int = 1,
) -> jnp.ndarray:
    """Pipeline a homogeneous layer stack.

    ``stacked_params`` has leading dim L (``stack_params`` layout);
    layers are split contiguously into ``S = mesh.shape['pipe']`` stage
    blocks of ``L // S``, and each stage scans its block — so the full
    program is scan(stages) o scan(layers-in-stage), all static.

    With ``extras``/``rng``, ``apply_layer`` is called as
    ``(layer_params, h, extras_mb, key)`` where ``key`` is additionally
    folded per layer-within-stage (None when ``rng`` is None).
    """
    n_stages = mesh.shape[PIPE_AXIS]
    staged = _reshape_stages(stacked_params, n_stages, interleave)
    wants_ctx = (
        extras is not None and bool(jax.tree_util.tree_leaves(extras))
    ) or rng is not None

    if not wants_ctx:

        def stage_fn(params_blk, h):
            def body(carry, p):
                return apply_layer(p, carry), None

            h, _ = lax.scan(body, h, params_blk)
            return h

        return pipeline_apply(
            stage_fn,
            staged,
            x,
            mesh,
            num_microbatches,
            shard_batch_over_data=shard_batch_over_data,
            interleave=interleave,
        )

    def stage_fn_ctx(params_blk, h, ex_mb, key):
        n_layers = jax.tree_util.tree_leaves(params_blk)[0].shape[0]

        def body(carry, inp):
            p, j = inp
            k = jax.random.fold_in(key, j) if key is not None else None
            return apply_layer(p, carry, ex_mb, k), None

        h, _ = lax.scan(body, h, (params_blk, jnp.arange(n_layers)))
        return h

    return pipeline_apply(
        stage_fn_ctx,
        staged,
        x,
        mesh,
        num_microbatches,
        shard_batch_over_data=shard_batch_over_data,
        extras=extras,
        rng=rng,
        interleave=interleave,
    )
