"""SCST (self-critical sequence training) REINFORCE step.

reference: model/pretrain.py:741-791 (forward_cap_scst) + :166-173
(reward_loss).  The greedy/sampled rollouts and the host CIDEr+BLEU reward
live in train/trainer.py; this module computes log-probs of the sampled
sequence under teacher forcing and takes the policy-gradient step.

TPU-native trick: for unimlm decoding, the per-step conditional
P(s_j | BOS, s_0..s_{j-1}, MASK) for ALL j is computed in ONE forward by
reusing the full-masker two-stream layout (ops/masks.py): input
[BOS, s_0..s_{L-2} | MASK*L], where mask-stream position j causally sees
exactly the prefix up to s_{j-1} and carries its shifted position id —
so no per-step re-decode is needed to score the rollout (the reference
collects log-probs during decoding instead, pretrain.py:1007-1011).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from valor_tpu.models.valor import BOS_TOKEN, EOS_TOKEN, MASK_TOKEN
from valor_tpu.train.step import TrainState


def scst_loss(
    model,
    params,
    batch,
    sequences: jnp.ndarray,  # [B, L] sampled rollout (EOS-filled)
    rewards: jnp.ndarray,  # [B] advantage (sample - alpha * greedy)
    caption_type: str,
    prompt_key: str = "prompt_tokens_caption",
    use_video: bool = True,
    use_audio: bool = True,
) -> jnp.ndarray:
    b, l = sequences.shape
    bos = jnp.full((b, 1), BOS_TOKEN, sequences.dtype)
    if caption_type == "unimlm":
        originals = jnp.concatenate([bos, sequences[:, :-1]], axis=1)  # [B, L]
        masks = jnp.full((b, l), MASK_TOKEN, sequences.dtype)
        txt_input = jnp.concatenate([originals, masks], axis=1)  # [B, 2L]
        full_masker = True
        read_slice = (l, 2 * l)
    else:  # lm
        txt_input = jnp.concatenate([bos, sequences[:, :-1]], axis=1)
        full_masker = False
        read_slice = (0, l)

    video_input = batch.get("video_input") if use_video else None
    audio_input = batch.get("audio_input") if use_audio else None
    logits = model.apply(
        {"params": params},
        txt_input,
        batch.get(prompt_key),
        video_input,
        audio_input,
        True,
        full_masker,
        None,
        method=model.fusion_logits,
    )
    logits = logits[:, read_slice[0] : read_slice[1]].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_logp = jnp.take_along_axis(logp, sequences[..., None], axis=-1)[..., 0]
    # include position j iff j == 0 or s_{j-1} != EOS (pretrain.py:166-169)
    prev_not_eos = jnp.concatenate(
        [jnp.ones((b, 1), bool), sequences[:, :-1] != EOS_TOKEN], axis=1
    )
    sel = prev_not_eos.astype(jnp.float32)
    weighted = -tok_logp * rewards[:, None] * sel
    return jnp.sum(weighted) / jnp.maximum(jnp.sum(sel), 1.0)


def make_scst_step(model, tx, caption_type: str, group: str):
    """Jitted REINFORCE update. Batch must carry precomputed fusion-space
    video_input/audio_input (encoded once per rollout batch)."""
    use_video = "v" in group
    use_audio = "a" in group

    @jax.jit
    def step(state: TrainState, batch, sequences, rewards):
        def loss_fn(params):
            return scst_loss(
                model, params, batch, sequences, rewards, caption_type,
                use_video=use_video, use_audio=use_audio,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            {"loss": loss},
        )

    return step
