"""Fused fine-grained contrastive score as a Pallas TPU kernel.

The fine-matrix chain (reference model/pretrain.py:178-211: einsum
``atd,bvd->abtv`` -> multiplicative token masks -> max over each side's
tokens -> softmax-weighted sums) is the hot op of retrieval evaluation.
XLA materialises the 4-D ``[A, B, T, V]`` logits tensor in HBM (the very
buffer that forces the reference to slice galleries at 1200 rows and our
jnp path to chunk via lax.map) and then re-reads it for the max
reductions — at gallery scale the chain pays ~2 HBM passes over
A*B*T*V*4 bytes.

This kernel never materialises it: each (block_a, block_b) output tile
loads its token features into VMEM once, runs the V token-dots on the
MXU, and folds both max reductions + weighted sums in-register.  HBM
traffic drops to the feature tiles themselves, the op becomes MXU-bound,
and gallery chunking becomes unnecessary at any size.

Numerics match tasks/losses.fine_score exactly for float32 inputs:

  * token weights are softmaxed OUTSIDE the kernel (identical masked
    softmax),
  * the reference's multiplicative token masking (masked tokens
    contribute literal 0 to the maxes) is realised by zeroing masked
    token FEATURES before the kernel — a zero row dots to exactly 0,
  * dots accumulate in fp32 (``preferred_element_type``),
  * tiling padding along T is excluded from the gallery-side max with a
    finite -1e30 penalty (NOT treated as masked-zero: a fully-negative
    similarity row must keep its negative max, padding may not inject a
    0), and carries zero softmax weight on the query side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_PAD_NEG = -1e30


def _make_kernel(t_real: int):
    def kernel(fa_ref, fb_ref, wa_ref, wb_t_ref, out_ref):
        """One [block_a, block_b] output tile.

        fa:   [TA, T, D]  query token features (masked tokens zeroed)
        fb:   [TB, V, D]  gallery token features (masked tokens zeroed)
        wa:   [TA, T]     softmaxed query token weights (0 on padding)
        wb_t: [V, TB]     softmaxed gallery token weights, transposed
        """
        ta, t, d = fa_ref.shape
        tb, v, _ = fb_ref.shape
        a = fa_ref[...].reshape(ta * t, d)
        # padded query-token rows must not inject a 0 into the
        # gallery-side max over t (their features are zero, so s=0 there)
        t_pen = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (ta, t, tb), 1) < t_real,
            0.0,
            _PAD_NEG,
        )
        m_ab = jnp.full((ta * t, tb), _PAD_NEG, jnp.float32)
        b2a = jnp.zeros((ta, tb), jnp.float32)
        for vi in range(v):
            b_v = fb_ref[:, vi, :]  # [TB, D]
            s = jax.lax.dot_general(
                a, b_v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [TA*T, TB]
            m_ab = jnp.maximum(m_ab, s)
            # gallery-token direction: max over query tokens, weighted by wb
            mt = jnp.max(s.reshape(ta, t, tb) + t_pen, axis=1)  # [TA, TB]
            b2a = b2a + mt * wb_t_ref[vi : vi + 1, :]
        # query-token direction: m_ab holds the max over gallery tokens;
        # padded t rows carry wa == 0 (and m_ab == 0 there, never -inf:
        # s == 0 from the zeroed features wins the max over _PAD_NEG)
        a2b = jnp.sum(
            m_ab.reshape(ta, t, tb) * wa_ref[...].reshape(ta, t, 1), axis=1
        )
        out_ref[...] = 0.5 * (a2b + b2a)

    return kernel


def _masked_softmax(weight, mask):
    w = jnp.where(mask > 0, weight.astype(jnp.float32), -jnp.inf)
    return jax.nn.softmax(w, axis=-1)


def _pad(x, axis, to):
    size = x.shape[axis]
    pad = (-size) % to
    if not pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit, static_argnames=("block_a", "block_b", "interpret")
)
def fine_score_fused(
    feat_a: jnp.ndarray,  # [A, T, D]
    feat_b: jnp.ndarray,  # [B, V, D]
    mask_a: jnp.ndarray,  # [A, T] {0,1}
    mask_b: jnp.ndarray,  # [B, V]
    weight_a: jnp.ndarray,  # [A, T] raw logits
    weight_b: jnp.ndarray,  # [B, V]
    block_a: int = 16,
    block_b: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in fused equivalent of tasks/losses.fine_score -> [A, B] f32."""
    a_n, t_n, d = feat_a.shape
    b_n, v_n, _ = feat_b.shape
    wa = _masked_softmax(weight_a, mask_a)
    wb = _masked_softmax(weight_b, mask_b)

    # reference multiplicative masking: zeroed token features dot to 0
    fa = feat_a * mask_a.astype(feat_a.dtype)[:, :, None]
    fb = feat_b * mask_b.astype(feat_b.dtype)[:, :, None]

    # T must be a whole number of sublane tiles for the in-kernel
    # (TA*T, TB) <-> (TA, T, TB) regrouping; D a whole number of lanes
    t_pad = ((t_n + 7) // 8) * 8
    fa = _pad(_pad(_pad(fa, 1, t_pad), 2, 128), 0, block_a)
    fb = _pad(_pad(fb, 2, 128), 0, block_b)
    wa = _pad(_pad(wa, 1, t_pad), 0, block_a)
    wb_t = _pad(wb, 0, block_b).T
    d_p = fa.shape[2]

    a_p, b_p = fa.shape[0], fb.shape[0]
    grid = (a_p // block_a, b_p // block_b)
    out = pl.pallas_call(
        _make_kernel(t_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_a, fa.shape[1], d_p), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((block_b, v_n, d_p), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((block_a, fa.shape[1]), lambda i, j: (i, 0)),
            pl.BlockSpec((v_n, block_b), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_a, block_b), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((a_p, b_p), jnp.float32),
        interpret=interpret,
    )(fa, fb, wa, wb_t)
    return out[:a_n, :b_n]
