"""On-device vectorized token masking.

Replaces the reference's TokenMasker (model/modeling.py:122-174), which runs
a Python double loop over a NumPy copy of the batch **on the host every
step** — a GPU->CPU->GPU sync in the middle of the hot loop.  Here the same
distribution is drawn with vectorized categorical sampling fully on device
under jit.

Semantics reproduced:
  * position 0 (BOS/CLS) and pad positions are never masked,
  * each eligible position is masked independently w.p. ``mask_prob``,
  * rows where nothing got masked get one forced mask on a random eligible
    position (the reference retries the whole row until >=1 masked;
    forcing a single uniform position is the same support with a slightly
    different joint law — divergence documented here),
  * a masked position becomes [MASK] w.p. 0.8, a random vocab token in
    [range_start, range_end) w.p. 0.1, stays itself w.p. 0.1,
  * labels are the source token at masked positions and -1 elsewhere.

Also provides full_mask (model/pretrain.py:137-142) and lm shift labels.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mask_tokens(
    rng: jax.Array,
    tokens: jnp.ndarray,  # [B, N] int32, 0 = pad
    mask_prob: float,
    mask_token: int,
    range_start: int = 106,
    range_end: int = 30522,
    replace_prob: float = 0.8,
    random_prob: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (masked_tokens, labels) with labels == -1 on unmasked slots."""
    tokens = jnp.asarray(tokens)
    b, n = tokens.shape
    r_ind, r_force, r_act, r_rand = jax.random.split(rng, 4)

    eligible = (tokens != 0).at[:, 0].set(False)  # never mask position 0
    draw = jax.random.uniform(r_ind, (b, n))
    indicator = jnp.logical_and(eligible, draw < mask_prob)

    # force one mask in all-zero rows (choose uniformly among eligible)
    need_force = ~jnp.any(indicator, axis=1)  # [B]
    gumbel = jax.random.gumbel(r_force, (b, n))
    scores = jnp.where(eligible, gumbel, -jnp.inf)
    forced = jax.nn.one_hot(jnp.argmax(scores, axis=1), n, dtype=bool)
    # rows with no eligible position at all keep an empty indicator
    any_eligible = jnp.any(eligible, axis=1)
    indicator = jnp.where(
        (need_force & any_eligible)[:, None], indicator | forced, indicator
    )

    action = jax.random.uniform(r_act, (b, n))
    rand_tok = jax.random.randint(r_rand, (b, n), range_start, range_end, tokens.dtype)
    masked = jnp.where(action < replace_prob, mask_token, tokens)
    masked = jnp.where(
        jnp.logical_and(action >= replace_prob, action < replace_prob + random_prob),
        rand_tok,
        masked,
    )
    out_tokens = jnp.where(indicator, masked, tokens)
    labels = jnp.where(indicator, tokens, -1)
    return out_tokens, labels


def full_mask(
    tokens: jnp.ndarray, mask_token: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stream full masking (reference: model/pretrain.py:137-142).

    Doubles the sequence: [tokens | MASK*n]; the label of mask-stream
    position n+j (j in [0, n-2]) is tokens[j+1] when that token is not pad.
    """
    b, n = tokens.shape
    mask_stream = jnp.full_like(tokens, mask_token)
    doubled = jnp.concatenate([tokens, mask_stream], axis=1)
    labels = -jnp.ones_like(doubled)
    nxt = tokens[:, 1:]  # [B, n-1]
    lab = jnp.where(nxt != 0, nxt, -1)
    labels = labels.at[:, n : 2 * n - 1].set(lab)
    return doubled, labels


def lm_shift_labels(tokens: jnp.ndarray) -> jnp.ndarray:
    """Next-token labels for 'lm' caption mode (model/pretrain.py:429-434)."""
    tokens = jnp.asarray(tokens)
    labels = jnp.zeros_like(tokens)
    labels = labels.at[:, :-1].set(tokens[:, 1:])
    return jnp.where(labels == 0, -1, labels)
