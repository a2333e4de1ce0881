"""Autoregressive caption/QA generation, fully jitted.

Reference behaviour being reproduced (model/pretrain.py):
  * decode_greedy (:988-1028): greedy or multinomial sampling with an
    'unfinished' latch that pins finished rows to EOS; returns per-step
    logprobs for SCST.
  * decode_beam (:1054-1152): beam search with per-beam score carrying;
    a finished beam keeps its score for every candidate word (the
    reference duplicates it across the vocab — its dedup line is
    commented out, pretrain.py:1092) — reproduced exactly, tie-breaks
    included, so beam outputs match the reference token-for-token
    (tests/test_golden_fullmodel.py).
  * get_logits (:1031-1051): unimlm queries are [BOS, state..., MASK] and
    the MASK position is scored; lm queries are [BOS, state...] scoring the
    last position.

TPU-native design: everything runs on a fixed-size token buffer under
`lax.fori_loop` — the step index selects the scored position and the
attention mask, so one compiled program serves all steps.  The fusion
encoder re-runs on the buffer each step, which is exactly what the
reference does whenever cross-attention is on (pretrain.py:884-895); the
media cross-attention K/V dominate and are recomputed from fixed inputs
XLA keeps resident in HBM.
"""

from __future__ import annotations

import collections
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from valor_tpu.models.valor import BOS_TOKEN, EOS_TOKEN, MASK_TOKEN

# DecoderFn(txt_tokens [B,N], token_mask [B,N]) -> logits over positions [B,N,V]
DecoderFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]

NEG = -1e9


def _buffer_len(max_len: int, caption_type: str) -> int:
    # unimlm: [BOS | L generated | trailing MASK slot]; lm: [BOS | L generated]
    return max_len + 2 if caption_type == "unimlm" else max_len + 1


def _prepare_step(buffer, t, caption_type):
    """(tokens, token_mask, read_pos) for step t on the fixed buffer."""
    n = buffer.shape[-1]
    pos = jnp.arange(n)
    if caption_type == "unimlm":
        read_pos = t + 1
        tokens = jnp.where(pos[None] == read_pos, MASK_TOKEN, buffer)
    else:
        read_pos = t
        tokens = buffer
    mask = jnp.broadcast_to((pos[None] <= read_pos), buffer.shape).astype(jnp.float32)
    return tokens, mask, read_pos


def greedy_or_sample(
    decoder: DecoderFn,
    batch_size: int,
    max_len: int,
    caption_type: str = "unimlm",
    mode: str = "greedy",
    rng: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (sequences [B, max_len] filled with EOS after finish,
    logprobs [B, max_len] of sampled tokens — zeros in greedy mode)."""
    n = _buffer_len(max_len, caption_type)
    buffer0 = jnp.zeros((batch_size, n), jnp.int32).at[:, 0].set(BOS_TOKEN)
    sents0 = jnp.full((batch_size, max_len), EOS_TOKEN, jnp.int32)
    logp0 = jnp.zeros((batch_size, max_len), jnp.float32)
    unfinished0 = jnp.ones((batch_size,), bool)

    def body(t, carry):
        buffer, sents, logps, unfinished = carry
        tokens, mask, read_pos = _prepare_step(buffer, t, caption_type)
        logits = decoder(tokens, mask)
        step_logits = jax.lax.dynamic_index_in_dim(
            logits, read_pos, axis=1, keepdims=False
        ).astype(jnp.float32)
        if mode == "greedy":
            wt = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
            lp = jnp.zeros((batch_size,), jnp.float32)
        else:
            k = jax.random.fold_in(rng, t)
            wt = jax.random.categorical(k, step_logits).astype(jnp.int32)
            lp = jnp.take_along_axis(
                jax.nn.log_softmax(step_logits, axis=-1), wt[:, None], axis=1
            )[:, 0]
        new_unfinished = jnp.logical_and(unfinished, wt != EOS_TOKEN)
        wt = jnp.where(unfinished, wt, EOS_TOKEN)
        buffer = buffer.at[:, t + 1].set(wt)
        sents = sents.at[:, t].set(wt)
        logps = logps.at[:, t].set(lp)
        return buffer, sents, logps, new_unfinished

    _, sents, logps, _ = jax.lax.fori_loop(
        0, max_len, body, (buffer0, sents0, logp0, unfinished0)
    )
    return sents, logps


def beam_search(
    decoder: DecoderFn,
    batch_size: int,
    beam_size: int,
    max_len: int,
    caption_type: str = "unimlm",
) -> jnp.ndarray:
    """Returns best sequences [B, max_len].

    The decoder is called on B*K rows every step (media inputs must already
    be expanded to B*K rows by the caller, mirroring expand_tensor,
    pretrain.py:1135-1141).  At t=0 all non-zero beams carry -inf so the
    first top-k draws K distinct words from beam 0.
    """
    k_beam = beam_size
    n = _buffer_len(max_len, caption_type)
    buffer0 = jnp.zeros((batch_size, k_beam, n), jnp.int32).at[:, :, 0].set(BOS_TOKEN)
    score0 = jnp.where(
        jnp.arange(k_beam)[None] == 0, 0.0, NEG
    ) * jnp.ones((batch_size, 1))
    alive0 = jnp.ones((batch_size, k_beam), bool)

    def body(t, carry):
        buffer, score, alive = carry
        flat = buffer.reshape(batch_size * k_beam, n)
        tokens, mask, read_pos = _prepare_step(flat, t, caption_type)
        logits = decoder(tokens, mask)
        step_logp = jax.nn.log_softmax(
            jax.lax.dynamic_index_in_dim(logits, read_pos, axis=1, keepdims=False).astype(
                jnp.float32
            ),
            axis=-1,
        ).reshape(batch_size, k_beam, -1)
        vocab = step_logp.shape[-1]
        # finished beams keep their score for EVERY candidate word — the
        # reference duplicates the finished beam across the whole vocab
        # (pretrain.py:1092-1100: candidate = mask*cand + old*(1-mask));
        # top_k's lowest-index tie-break then matches torch.sort's stable
        # descending order, so beam outputs agree exactly (incl. which
        # live candidates get displaced).
        step_logp = jnp.where(alive[:, :, None], step_logp, 0.0)
        cand = score[:, :, None] + step_logp  # [B, K, V]
        top_score, top_idx = jax.lax.top_k(cand.reshape(batch_size, -1), k_beam)
        sel_beam = top_idx // vocab  # [B, K]
        sel_word = (top_idx % vocab).astype(jnp.int32)
        buffer = jnp.take_along_axis(buffer, sel_beam[:, :, None], axis=1)
        alive = jnp.take_along_axis(alive, sel_beam, axis=1)
        alive = jnp.logical_and(alive, sel_word != EOS_TOKEN)
        buffer = buffer.at[:, :, t + 1].set(sel_word)
        return buffer, top_score, alive

    buffer, score, _ = jax.lax.fori_loop(0, max_len, body, (buffer0, score0, alive0))
    best = jnp.argmax(score, axis=1)
    out = jnp.take_along_axis(buffer, best[:, None, None], axis=1)[:, 0]
    seqs = out[:, 1 : max_len + 1]
    # normalise: finished beams accumulate arbitrary tie-break words after
    # their EOS (reference behaviour too — consumers stop at first EOS);
    # pin them to EOS so raw sequences are clean
    hit = jnp.cumsum(seqs == EOS_TOKEN, axis=1) > 0
    return jnp.where(hit, EOS_TOKEN, seqs)


def expand_rows(x: Optional[jnp.ndarray], k: int) -> Optional[jnp.ndarray]:
    """[B, ...] -> [B*k, ...] row-repeat (expand_tensor, pretrain.py:1182-1188)."""
    if x is None or k == 1:
        return x
    return jnp.repeat(x, k, axis=0)


def make_fusion_decoder(
    model,
    params,
    prompt_tokens: Optional[jnp.ndarray],
    video_input: Optional[jnp.ndarray],
    audio_input: Optional[jnp.ndarray],
    full_masker: bool = False,
) -> DecoderFn:
    """Bind fixed media/prompt inputs into a DecoderFn over the text buffer.

    When the fusion encoder cross-attends to media, the per-layer cross K/V
    are projected ONCE here and reused by every decode step — the reference
    re-projects ~1k media tokens x 12 layers at every step because its
    cache is unusable under cross-attention (model/pretrain.py:884-895).
    """
    cross_kv = None
    if model.cfg.multimodal_use_cross_attn and (
        video_input is not None or audio_input is not None
    ):
        cross_kv = model.apply(
            {"params": params}, video_input, audio_input, method=model.fusion_cross_kv
        )
        video_input = audio_input = None  # media now live in the cache
    elif not model.cfg.multimodal_use_cross_attn and (
        prompt_tokens is not None or video_input is not None or audio_input is not None
    ):
        # in-sequence media: cache the [prompt|media] self-attn K/V once
        # (exact under the causal-prefix mask; see bert.precompute_ctx_kv)
        ctx_kv, ctx_mask = model.apply(
            {"params": params}, prompt_tokens, video_input, audio_input,
            method=model.fusion_ctx_kv,
        )

        def ctx_decoder(tokens, token_mask):
            return model.apply(
                {"params": params}, tokens, token_mask, ctx_kv, ctx_mask,
                method=model.fusion_logits_ctx,
            )

        return ctx_decoder

    def decoder(tokens, token_mask):
        return model.apply(
            {"params": params},
            tokens,
            prompt_tokens,
            video_input,
            audio_input,
            True,  # causal
            full_masker,
            token_mask,
            cross_kv,
            method=model.fusion_logits,
        )

    return decoder


class Generator:
    """Compile-once generation programs, reused across eval batches.

    The round-2 ``generate`` built fresh decoder closures per batch, so
    the `lax.fori_loop` decode re-traced on EVERY validate_cap/validate_qa
    batch (minutes per retrace on the tunneled TPU runtime).  Here every
    device computation is a cached ``jax.jit`` program taking params /
    media / prompt as ARGUMENTS — the second batch of the same shape
    triggers zero retrace (asserted in tests/test_generate.py), and the
    cache survives across validation rounds because ``generate()`` memoises
    one Generator per model object.
    """

    def __init__(self, model):
        self.model = model
        self._programs: Dict[Any, Any] = {}

    # -- program cache -----------------------------------------------------
    def _program(self, key, build):
        fn = self._programs.get(key)
        if fn is None:
            fn = jax.jit(build())
            self._programs[key] = fn
        return fn

    def stats(self) -> Dict[Any, int]:
        """(program key) -> number of compiled shape-specialisations."""
        return {k: f._cache_size() for k, f in self._programs.items()}

    # -- encode programs ---------------------------------------------------
    def _encode_video(self, params, pixels):
        m = self.model

        def build():
            def f(p, px):
                out = m.apply({"params": p}, px, method=m.encode_video)
                return m.apply({"params": p}, out, method=m.video_fusion_input)

            return f

        return self._program("encode_video", build)(params, pixels)

    def _encode_audio(self, params, spectrograms):
        m = self.model

        def build():
            def f(p, spec):
                out = m.apply({"params": p}, spec, method=m.encode_audio)
                return m.apply({"params": p}, out, method=m.audio_fusion_input)

            return f

        return self._program("encode_audio", build)(params, spectrograms)

    def _encode_audio_spans(self, params, wavs, valid):
        """device_fbank batches: mel extraction fuses into the encode jit
        (exactly as VALORModel.__call__ does on the train path)."""
        m = self.model

        def build():
            from valor_tpu.data.fbank import fbank_clips_from_spans

            def f(p, w, v):
                spec = fbank_clips_from_spans(
                    w, v,
                    melbins=m.cfg.audio_melbins,
                    target_length=m.cfg.audio_target_length,
                ).astype(jnp.dtype(m.cfg.dtype))
                out = m.apply({"params": p}, spec, method=m.encode_audio)
                return m.apply({"params": p}, out, method=m.audio_fusion_input)

            return f

        return self._program("encode_audio_spans", build)(params, wavs, valid)

    # -- decode program ----------------------------------------------------
    def _decode(self, caption_type: str, max_len: int, beam_size: int, mode: str):
        m = self.model

        def build():
            def f(p, prompt, v, a, rng):
                bsz = next(
                    x.shape[0] for x in (v, a, prompt) if x is not None
                )
                prompt_b = (
                    jnp.broadcast_to(prompt, (bsz,) + prompt.shape[1:])
                    if prompt is not None and prompt.shape[0] == 1
                    else prompt
                )
                if beam_size > 1:
                    dec = make_fusion_decoder(
                        m, p,
                        expand_rows(prompt_b, beam_size),
                        expand_rows(v, beam_size),
                        expand_rows(a, beam_size),
                    )
                    seqs = beam_search(dec, bsz, beam_size, max_len, caption_type)
                    logps = jnp.zeros((bsz, max_len), jnp.float32)
                else:
                    dec = make_fusion_decoder(m, p, prompt_b, v, a)
                    seqs, logps = greedy_or_sample(
                        dec, bsz, max_len, caption_type, mode, rng
                    )
                return seqs, logps

            return f

        return self._program(("decode", caption_type, max_len, beam_size, mode), build)

    # -- public ------------------------------------------------------------
    def generate(
        self,
        params,
        batch: Dict[str, Any],
        groups: Tuple[str, ...],
        *,
        caption_type: str = "unimlm",
        max_len: int = 30,
        beam_size: int = 1,
        mode: str = "greedy",
        rng: Optional[jnp.ndarray] = None,
        prompt_key: str = "prompt_tokens_caption",
    ) -> Dict[str, Any]:
        video_input = None
        audio_input = None
        if any("v" in g for g in groups) and batch.get("video_pixels") is not None:
            video_input = self._encode_video(params, batch["video_pixels"])
        if any("a" in g for g in groups):
            if batch.get("audio_waveforms") is not None:
                audio_input = self._encode_audio_spans(
                    params, batch["audio_waveforms"], batch["audio_valid_frames"]
                )
            elif batch.get("audio_spectrograms") is not None:
                audio_input = self._encode_audio(params, batch["audio_spectrograms"])
        tile = batch.get("tile_index")
        if tile is not None:
            tile = jnp.asarray(tile)
            video_input = video_input[tile] if video_input is not None else None
            audio_input = audio_input[tile] if audio_input is not None else None

        prompt = batch.get("question_prompt", batch.get(prompt_key))
        if prompt is not None:
            prompt = jnp.asarray(prompt)
        program = self._decode(caption_type, max_len, beam_size, mode)
        out: Dict[str, Any] = {}
        for g in groups:
            v = video_input if "v" in g else None
            a = audio_input if "a" in g else None
            seqs, logps = program(params, prompt, v, a, rng)
            out[f"generated_sequences_{g}"] = seqs
            out[f"logprobs_{g}"] = logps
        return out


# one Generator per live model object: eval rounds re-enter with the same
# model, so compiled decode programs persist across eval batches/rounds.
# A tiny LRU (not an unbounded dict) caps the footprint: each entry pins
# its model, the params captured in decoder closures, and every compiled
# executable — a process that builds many models (pytest, config sweeps)
# must not accumulate them forever, and on a shared 16 GB chip a leak
# here poisons co-tenant jobs.
_GENERATORS: "collections.OrderedDict[int, Generator]" = collections.OrderedDict()
_GENERATORS_MAX = 2


def get_generator(model) -> Generator:
    key = id(model)
    g = _GENERATORS.get(key)
    # `is not model` guards against CPython id() reuse after a gc
    if g is None or g.model is not model:
        g = Generator(model)
        _GENERATORS[key] = g
    _GENERATORS.move_to_end(key)
    while len(_GENERATORS) > _GENERATORS_MAX:
        _GENERATORS.popitem(last=False)
    return g


def generate(
    model,
    params,
    batch: Dict[str, Any],
    groups: Tuple[str, ...],
    *,
    caption_type: str = "unimlm",
    max_len: int = 30,
    beam_size: int = 1,
    mode: str = "greedy",
    rng: Optional[jnp.ndarray] = None,
    prompt_key: str = "prompt_tokens_caption",
) -> Dict[str, Any]:
    """generate_cap/generate_qa equivalent (pretrain.py:914-985, 1366-1459).

    Encodes media once, then decodes per modality group through the cached
    jit programs of :class:`Generator`.  Returns
    {'generated_sequences_<group>': [B, max_len], 'logprobs_<group>': ...}.
    """
    return get_generator(model).generate(
        params, batch, groups,
        caption_type=caption_type, max_len=max_len, beam_size=beam_size,
        mode=mode, rng=rng, prompt_key=prompt_key,
    )
