"""Fused LayerNorm as a Pallas TPU kernel with a custom VJP.

TPU-native analogue of apex's FusedLayerNorm (reference:
apex/csrc/layer_norm_cuda_kernel.cu, used by every LN in the model zoo —
SURVEY.md §2.2).  XLA already fuses our plain-jnp LayerNorm well, so this
kernel is primarily a perf/parity study and the building block for later
fusions (LN+matmul epilogues); ops/layers.LayerNorm can be switched onto it
via `use_pallas=True`.

Design: rows are processed in (block_rows, C) tiles resident in VMEM;
statistics accumulate in fp32 on the VPU; scale/bias broadcast from a
(1, C) block.  The backward RECOMPUTES mean/rstd from the x tile it
already holds instead of round-tripping saved statistics through HBM —
two extra VPU reductions per tile in exchange for two fewer operands
(and their awkward 1-D TPU layouts).  Gradient identity:

  dx = rstd * (dy*w - mean(dy*w) - x_hat * mean(dy*w * x_hat))

Partial dw/db block reductions are written as (8, C) tiles — Mosaic
requires the last two block dims to be multiples of (8, 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_ROWS = 256


def _fwd_kernel(x_ref, w_ref, b_ref, eps_ref, y_ref):
    x = x_ref[:].astype(jnp.float32)
    eps = eps_ref[0]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    y = xhat * w_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, w_ref, eps_ref, dy_ref, dx_ref, dw_ref, db_ref):
    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)
    eps = eps_ref[0]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    dyw = dy * w
    m1 = jnp.mean(dyw, axis=-1, keepdims=True)
    m2 = jnp.mean(dyw * xhat, axis=-1, keepdims=True)
    dx = rstd * (dyw - m1 - xhat * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype)
    # per-block partial reductions for dw/db, summed by the caller; each
    # of the tile's 8 rows carries the sum of a 1/8th row-slice.
    rows = x.shape[0]
    dw_ref[:] = jnp.sum((dy * xhat).reshape(8, rows // 8, -1), axis=1)[None]
    db_ref[:] = jnp.sum(dy.reshape(8, rows // 8, -1), axis=1)[None]


def _run_fwd(x2d, w, b, eps, block_rows, interpret):
    n, c = x2d.shape
    grid = (pl.cdiv(n, block_rows),)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((1,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), x2d.dtype),
        interpret=interpret,
    )(x2d, w, b, jnp.asarray([eps], jnp.float32))


def _run_bwd(x2d, w, eps, dy2d, block_rows, interpret):
    n, c = x2d.shape
    assert block_rows % 8 == 0, "block_rows must be a multiple of 8 (TPU sublanes)"
    nb = pl.cdiv(n, block_rows)
    dx, dw_p, db_p = pl.pallas_call(
        _bwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((1,), lambda i: (0,)),
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), x2d.dtype),
            jax.ShapeDtypeStruct((nb, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, c), jnp.float32),
        ],
        interpret=interpret,
    )(x2d, w, jnp.asarray([eps], jnp.float32), dy2d)
    return dx, dw_p.sum((0, 1)), db_p.sum((0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_layernorm(x, scale, bias, eps=1e-12, block_rows=DEFAULT_BLOCK_ROWS, interpret=False):
    y, _ = _fused_fwd(x, scale, bias, eps, block_rows, interpret)
    return y


def _fused_fwd(x, scale, bias, eps, block_rows, interpret):
    shape = x.shape
    c = shape[-1]
    x2d = x.reshape(-1, c)
    n = x2d.shape[0]
    pad = (-n) % block_rows
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    y = _run_fwd(x2d, scale, bias, eps, block_rows, interpret)
    return y[:n].reshape(shape), (x2d, scale, n, shape)


def _fused_bwd(eps, block_rows, interpret, res, dy):
    x2d, scale, n, shape = res
    c = shape[-1]
    dy2d = dy.reshape(-1, c)
    pad = x2d.shape[0] - n
    if pad:
        dy2d = jnp.pad(dy2d, ((0, pad), (0, 0)))
    dx, dw, db = _run_bwd(x2d, scale, eps, dy2d, block_rows, interpret)
    return dx[:n].reshape(shape), dw, db


fused_layernorm.defvjp(_fused_fwd, _fused_bwd)
