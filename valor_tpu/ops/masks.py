"""Attention-mask construction for the multimodal fusion encoder.

Reproduces the three mask regimes of the reference BERT fusion encoder as
pure, static-shape functions returning additive biases:

  * bidirectional          (reference: model/bert.py:795-803, casual=False)
  * causal-prefix          (model/bert.py:798-800: text block lower-triangular,
                            non-text queries blind to text keys)
  * full-masker two-stream (model/bert.py:874-878: doubled text block, the
                            second half holds one [MASK] query per position)

All functions return float biases in {0, NEG_INF} of shape [B, 1, L, L]
(broadcast over heads), matching `(1-mask)*-10000` (model/bert.py:803).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from valor_tpu.ops.layers import NEG_INF


def sequence_mask(tokens: jnp.ndarray) -> jnp.ndarray:
    """Padding mask from token ids (pad id = 0). [B, N] -> float {0,1}."""
    return (tokens != 0).astype(jnp.float32)


def concat_key_mask(
    text_mask: Optional[jnp.ndarray],
    prompt_mask: Optional[jnp.ndarray],
    n_video: int,
    n_audio: int,
    batch: int,
) -> jnp.ndarray:
    """Per-key validity over [text | prompt | video | audio]. [B, L]."""
    parts = []
    if text_mask is not None:
        parts.append(text_mask.astype(jnp.float32))
    if prompt_mask is not None:
        parts.append(prompt_mask.astype(jnp.float32))
    if n_video:
        parts.append(jnp.ones((batch, n_video), jnp.float32))
    if n_audio:
        parts.append(jnp.ones((batch, n_audio), jnp.float32))
    return jnp.concatenate(parts, axis=1)


def fusion_attention_bias_terms(
    key_mask: jnp.ndarray,  # [B, L] validity of every key slot
    text_len: int,  # length of the leading text block (0 if no text)
    causal: bool,
    full_masker: bool = False,
):
    """Additive fusion bias as a tuple of BROADCASTABLE terms.

    The dense [B, 1, L, L] bias is 229 MB at flagship fusion shapes and
    is re-read by every layer (~2% of the step's HBM traffic).  It
    factors exactly into a per-key padding term [B, 1, 1, L] plus a
    batch-independent structural term [1, 1, L, L] (~4 MB combined):
    `(1 - km*allowed)*NEG = (1-km)*NEG + (1-allowed)*NEG` pointwise up to
    doubling NEG where both mask (exp(NEG) and exp(2*NEG) are both
    exactly 0.0 in fp32, so softmax output is bit-identical).  The
    attention kernel adds each term into the scores epilogue without
    materialising their broadcast sum.
    """
    pad = ((1.0 - key_mask.astype(jnp.float32)) * NEG_INF)[:, None, None, :]
    if not (causal and text_len > 0):
        return (pad,)
    total = key_mask.shape[1]
    if full_masker:
        n = text_len // 2
        tril = jnp.tril(jnp.ones((n, n), jnp.float32))
        eye = jnp.eye(n, dtype=jnp.float32)
        block = jnp.zeros((total, total), jnp.float32)
        # queries = original tokens: causal over originals, blind to masks
        block = block.at[:n, :n].set(tril)
        # queries = [MASK] stream: causal over originals + own identity
        block = block.at[n : 2 * n, :n].set(tril)
        block = block.at[n : 2 * n, n : 2 * n].set(eye)
        # non-text queries see no text keys; see everything else
        block = block.at[2 * n :, 2 * n :].set(1.0)
        block = block.at[: 2 * n, 2 * n :].set(1.0)
        allowed = block
    else:
        n = text_len
        qi = jnp.arange(total)[:, None]
        ki = jnp.arange(total)[None, :]
        in_text_k = ki < n
        in_text_q = qi < n
        # within text: causal; text keys invisible to non-text queries
        allowed = jnp.where(
            in_text_k, jnp.logical_and(in_text_q, ki <= qi), True
        ).astype(jnp.float32)
    struct = ((1.0 - allowed) * NEG_INF)[None, None]
    return (pad, struct)


def fusion_attention_bias(
    key_mask: jnp.ndarray,  # [B, L] validity of every key slot
    text_len: int,  # length of the leading text block (0 if no text)
    causal: bool,
    full_masker: bool = False,
) -> jnp.ndarray:
    """Dense additive fusion bias [B, 1, L, L] (sum of the factored terms;
    kept for tests/tools — the model path uses the terms directly)."""
    terms = fusion_attention_bias_terms(key_mask, text_len, causal, full_masker)
    b, total = key_mask.shape
    out = jnp.zeros((b, 1, total, total), jnp.float32)
    for t in terms:
        out = out + t
    # clamp the doubly-masked entries back to a single NEG_INF so the
    # dense form stays in {0, NEG_INF} as documented
    return jnp.maximum(out, NEG_INF)


def causal_bias(length: int) -> jnp.ndarray:
    """Plain causal bias [1, 1, L, L] (CLIP text tower)."""
    tri = jnp.tril(jnp.ones((length, length), jnp.float32))
    return ((1.0 - tri) * NEG_INF)[None, None]


def padding_bias(key_mask: jnp.ndarray) -> jnp.ndarray:
    """Key-padding-only additive bias [B, 1, 1, L]."""
    return ((1.0 - key_mask.astype(jnp.float32)) * NEG_INF)[:, None, None, :]
