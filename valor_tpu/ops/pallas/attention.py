"""Fused flash attention for TPU via Pallas, with an XLA fallback.

The hot attention sites (CLIP ViT over b*n_frames*197 tokens, AST, the
BERT fusion over ~1k tokens) run a Pallas flash kernel on TPU — the
analogue of the apex fmha kernels the reference vendors but never wires up
(SURVEY.md §2.2 "not exercised").  We build on the stock
jax.experimental.pallas.ops.tpu.flash_attention kernel (block-tiled,
online-softmax) and adapt our additive-bias masks to it:

  * sequences are padded to the kernel's 128-token block size; padded keys
    get NEG_INF bias, padded queries produce garbage rows that are sliced
    off,
  * the additive bias rides the kernel's `ab` operand (broadcast over
    heads), which covers all three fusion mask regimes without writing a
    bespoke masked kernel.

On CPU (tests) or when shapes are tiny, falls back to the einsum path in
ops/layers.py — numerics match to bf16 tolerance (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from valor_tpu.ops.layers import NEG_INF, dot_product_attention

_BLOCK = 128


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.lru_cache(maxsize=1)
def _kernel():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    return fa


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def flash_eligible(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    """Kernel constraints: TPU backend, long-enough sequences, supported
    head dim (lane-aligned or half-lane)."""
    b, h, nq, d = q.shape
    return on_tpu() and nq >= _BLOCK and k.shape[2] >= _BLOCK and d in (64, 128, 256)


def flash_attention(
    q: jnp.ndarray,  # [B, H, Q, D]
    k: jnp.ndarray,  # [B, H, K, D]
    v: jnp.ndarray,  # [B, H, K, D]
    bias: Optional[jnp.ndarray] = None,  # additive, broadcastable to [B, H, Q, K]
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Flash attention with additive bias (caller checks flash_eligible)."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    fa = _kernel()
    qp = _pad_to(q, 2, _BLOCK)
    kp = _pad_to(k, 2, _BLOCK)
    vp = _pad_to(v, 2, _BLOCK)
    nqp, nkp = qp.shape[2], kp.shape[2]
    if bias is None and nk == nkp:
        ab = None
    else:
        full = jnp.zeros((b, 1, nqp, nkp), jnp.float32)
        if bias is not None:
            bias4 = jnp.broadcast_to(bias, (b, bias.shape[1], nq, nk)).astype(jnp.float32)
            if bias4.shape[1] == 1:
                full = full.at[:, :, :nq, :nk].set(bias4)
            else:  # per-head bias: materialise all heads
                full = jnp.zeros((b, h, nqp, nkp), jnp.float32)
                full = full.at[:, :, :nq, :nk].set(bias4)
        if nk != nkp:  # mask padded keys
            full = full.at[:, :, :, nk:].set(NEG_INF)
        ab = jnp.broadcast_to(full, (b, h, nqp, nkp)).astype(jnp.float32)
    out = fa.flash_attention(
        qp.astype(dtype), kp.astype(dtype), vp.astype(dtype), ab=ab, sm_scale=1.0 / (d**0.5)
    )
    return out[:, :, :nq].astype(dtype)
