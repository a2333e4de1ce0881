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


def fusion_attention_bias(
    key_mask: jnp.ndarray,  # [B, L] validity of every key slot
    text_len: int,  # length of the leading text block (0 if no text)
    causal: bool,
    full_masker: bool = False,
) -> jnp.ndarray:
    """Build the additive fusion bias [B, 1, L, L]."""
    b, total = key_mask.shape
    mask = jnp.broadcast_to(key_mask[:, None, :], (b, total, total))
    if causal and text_len > 0:
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
            mask = mask * block[None]
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
            mask = mask * allowed[None]
    return ((1.0 - mask) * NEG_INF)[:, None, :, :]


def causal_bias(length: int) -> jnp.ndarray:
    """Plain causal bias [1, 1, L, L] (CLIP text tower)."""
    tri = jnp.tril(jnp.ones((length, length), jnp.float32))
    return ((1.0 - tri) * NEG_INF)[None, None]


def padding_bias(key_mask: jnp.ndarray) -> jnp.ndarray:
    """Key-padding-only additive bias [B, 1, 1, L]."""
    return ((1.0 - key_mask.astype(jnp.float32)) * NEG_INF)[:, None, None, :]
