"""Fused LayerNorm as a Pallas TPU kernel with a custom VJP.

TPU-native analogue of apex's FusedLayerNorm (reference:
apex/csrc/layer_norm_cuda_kernel.cu, used by every LN in the model zoo —
SURVEY.md §2.2).  XLA already fuses our plain-jnp LayerNorm well, so this
kernel is primarily a perf/parity study and the building block for later
fusions (LN+matmul epilogues); ops/layers.LayerNorm can be switched onto it
via `use_pallas=True`.

Design: rows are processed in (block_rows, C) tiles resident in VMEM;
statistics accumulate in fp32 on the VPU; scale/bias broadcast from a
(1, C) block.  Backward recomputes x_hat from saved (mean, rstd) — the
standard two-pass fused-LN gradient:

  dx = rstd * (dy*w - mean(dy*w) - x_hat * mean(dy*w * x_hat))
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; interpret mode works anywhere
    from jax.experimental.pallas import tpu as pltpu

    _MEM = dict(memory_space=pltpu.ANY) if False else {}
except Exception:  # pragma: no cover
    _MEM = {}

DEFAULT_BLOCK_ROWS = 256


def _fwd_kernel(x_ref, w_ref, b_ref, eps_ref, y_ref, mean_ref, rstd_ref):
    x = x_ref[:].astype(jnp.float32)
    eps = eps_ref[0]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    y = xhat * w_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    mean_ref[:] = mean[..., 0]
    rstd_ref[:] = rstd[..., 0]


def _bwd_kernel(x_ref, w_ref, mean_ref, rstd_ref, dy_ref, dx_ref, dw_ref, db_ref):
    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)
    mean = mean_ref[:][..., None]
    rstd = rstd_ref[:][..., None]
    xhat = (x - mean) * rstd
    dyw = dy * w
    m1 = jnp.mean(dyw, axis=-1, keepdims=True)
    m2 = jnp.mean(dyw * xhat, axis=-1, keepdims=True)
    dx = rstd * (dyw - m1 - xhat * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype)
    # per-block partial reductions for dw/db (summed by the caller)
    dw_ref[:] = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[:] = jnp.sum(dy, axis=0, keepdims=True)


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
        out_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((block_rows,), lambda i: (i,)),
            pl.BlockSpec((block_rows,), lambda i: (i,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), x2d.dtype),
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
        ],
        interpret=interpret,
    )(x2d, w, b, jnp.asarray([eps], jnp.float32))


def _run_bwd(x2d, w, mean, rstd, dy2d, block_rows, interpret):
    n, c = x2d.shape
    nb = pl.cdiv(n, block_rows)
    dx, dw_p, db_p = pl.pallas_call(
        _bwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((block_rows,), lambda i: (i,)),
            pl.BlockSpec((block_rows,), lambda i: (i,)),
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), x2d.dtype),
            jax.ShapeDtypeStruct((nb, c), jnp.float32),
            jax.ShapeDtypeStruct((nb, c), jnp.float32),
        ],
        interpret=interpret,
    )(x2d, w, mean, rstd, dy2d)
    return dx, dw_p.sum(0), db_p.sum(0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_layernorm(x, scale, bias, eps=1e-12, block_rows=DEFAULT_BLOCK_ROWS, interpret=False):
    y, _ = _fwd(x, scale, bias, eps, block_rows, interpret)
    return y


def _fwd(x, scale, bias, eps, block_rows, interpret):
    shape = x.shape
    c = shape[-1]
    x2d = x.reshape(-1, c)
    n = x2d.shape[0]
    pad = (-n) % block_rows
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    y, mean, rstd = _run_fwd(x2d, scale, bias, eps, block_rows, interpret)
    return y[:n].reshape(shape), (x2d, scale, mean, rstd, n, shape)


def _fused_fwd(x, scale, bias, eps, block_rows, interpret):
    y, res = _fwd(x, scale, bias, eps, block_rows, interpret)
    return y, res


def _fused_bwd(eps, block_rows, interpret, res, dy):
    x2d, scale, mean, rstd, n, shape = res
    c = shape[-1]
    dy2d = dy.reshape(-1, c)
    pad = x2d.shape[0] - n
    if pad:
        dy2d = jnp.pad(dy2d, ((0, pad), (0, 0)))
    dx, dw, db = _run_bwd(x2d, scale, mean, rstd, dy2d, block_rows, interpret)
    return dx[:n].reshape(shape), dw, db


fused_layernorm.defvjp(_fused_fwd, _fused_bwd)
