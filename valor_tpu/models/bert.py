"""BERT multimodal fusion encoder (flax).

Behavioural spec from the reference (model/bert.py):
  * BertEmbeddings (:173-218): word + position + token-type embeddings,
    LN(1e-12), with a dedicated 1-row prompt-type embedding; in full-masker
    mode the second (mask-stream) half reuses the first half's positions
    shifted by one (:198-201 — we reproduce the *intended* shifted-position
    behaviour; the reference's in-place hack is its own documented bug,
    SURVEY.md §7 hard-part 8).
  * Post-norm BertLayer (:423-496) with optional per-layer cross-attention
    to video/audio in 4 topologies: va_concate / va_parallel / video_audio /
    audio_video (:447-493).
  * Input assembly + mask regimes (:750-896): [text | prompt | video |
    audio] with bidirectional, causal-prefix, or full-masker masks; video/
    audio enter the sequence only when cross-attention is off.

The whole module is static-shape and jit-friendly; generation re-runs it on
a fixed-size token buffer (the reference must do the same whenever
cross-attention is on, model/pretrain.py:884-895).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from valor_tpu.ops.layers import (
    remat_wrap,
    Dense,
    LayerNorm,
    MlpBlock,
    MultiHeadAttention,
)
from valor_tpu.ops.masks import concat_key_mask, fusion_attention_bias_terms


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1  # hidden/attention dropout (reference bert 0.1)
    has_cross_attn: bool = False
    cross_attn_type: Optional[str] = None  # va_concate|va_parallel|video_audio|audio_video
    # Mixture-of-Experts FFN (TPU-native extension; the reference's FFNs
    # are dense).  moe_experts > 0 swaps the FFN of every moe_every-th
    # layer for ops.moe.MoEMlpBlock; the Switch aux loss is sown into the
    # "moe" collection (retrieve with apply(..., mutable=["moe"]) — a
    # no-op for callers that don't ask, so dense paths trace unchanged).
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_every: int = 1  # 1 = every layer, 2 = every other (GShard style)
    # grouped-query cross-attention (TPU-native extension): >0 projects
    # the per-layer media K/V to this many heads (< num_heads), each
    # serving a group of query heads (ops/layers.py _grouped_attention).
    # Shrinks the cross-attn K/V activations, their VJP residuals, and
    # the decode-time cross-KV cache by num_heads/kv_heads.
    cross_attn_kv_heads: int = 0
    # GPipe pipeline parallelism (TPU-native extension, parallel/pipeline.py):
    # >0 routes the layer stack through a pipelined shard_map+ppermute+scan
    # program over the mesh `pipe` axis installed via set_pipeline().  The
    # param tree is UNCHANGED (per-layer modules; stage blocks are stacked at
    # trace time and sliced by shard_map), so checkpoints/converters/TP specs
    # are layout-compatible with the sequential path.
    pipeline_stages: int = 0
    # interleaved (virtual-stage) schedule: V chunks of num_layers/(S*V)
    # layers per device, assigned stride-S (Megatron-style), shrinking the
    # pipeline bubble from (S-1) stage-times to (S-1)/V.  Requires
    # num_layers % (stages * interleave) == 0; falls back to the plain
    # GPipe schedule per-call when the microbatch count is not a multiple
    # of the stage count (the group schedule's requirement).
    pipeline_interleave: int = 1


class BertEmbeddings(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        init02 = nn.initializers.normal(0.02)
        self.word_embeddings = self.param(
            "word_embeddings", init02, (c.vocab_size, c.hidden_size), jnp.float32
        )
        self.position_embeddings = self.param(
            "position_embeddings", init02, (c.max_position_embeddings, c.hidden_size), jnp.float32
        )
        self.token_type_embeddings = self.param(
            "token_type_embeddings", init02, (c.type_vocab_size, c.hidden_size), jnp.float32
        )
        self.prompt_embedding = self.param(
            "prompt_embedding", init02, (1, c.hidden_size), jnp.float32
        )
        self.ln = LayerNorm(eps=1e-12, dtype=self.dtype, name="LayerNorm")

    def __call__(
        self,
        input_ids: jnp.ndarray,
        token_type: Optional[str] = None,  # None | 'prompt'
        full_masker: bool = False,
    ) -> jnp.ndarray:
        n = input_ids.shape[1]
        position_ids = jnp.arange(n)
        if full_masker and token_type is None:
            half = n // 2
            position_ids = jnp.concatenate([jnp.arange(half), jnp.arange(half) + 1])
        x = jnp.take(self.word_embeddings, input_ids, axis=0)
        x = x + jnp.take(self.position_embeddings, position_ids, axis=0)[None]
        if token_type == "prompt":
            x = x + self.prompt_embedding[0][None, None]
        else:
            x = x + self.token_type_embeddings[0][None, None]
        from valor_tpu.ops.layers import maybe_dropout

        return maybe_dropout(self, self.ln(x.astype(self.dtype)), self.cfg.dropout)


class _ResidualAttn(nn.Module):
    """attention -> dense -> LN(residual) — BertSelfOutput/BertCrossOutput
    (reference: model/bert.py:344-371)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0
    kv_heads: int = 0  # 0 = full multi-head; <num_heads = GQA

    def setup(self):
        self.attn = MultiHeadAttention(
            self.num_heads,
            dtype=self.dtype,
            dropout=self.dropout,
            kv_heads=self.kv_heads,
            name="attn",
        )
        self.ln = LayerNorm(eps=1e-12, dtype=self.dtype, name="ln")

    def __call__(self, x, kv, bias=None, extra_kv=None):
        h = self.attn(x, kv, bias, extra_kv=extra_kv)
        return self.ln(x + h)

    def compute_kv(self, mem):
        return self.attn.compute_kv(mem)


class BertFusionLayer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32
    layer_idx: int = 0

    def setup(self):
        c = self.cfg
        self._use_moe = c.moe_experts > 0 and (
            self.layer_idx % c.moe_every == c.moe_every - 1
        )
        self.self_attn = _ResidualAttn(c.num_heads, dtype=self.dtype, dropout=c.dropout, name="self_attn")
        if c.has_cross_attn:
            kvh = c.cross_attn_kv_heads
            if kvh and c.num_heads % kvh:
                raise ValueError(
                    f"{c.num_heads} heads not divisible by {kvh} kv heads"
                )
            if c.cross_attn_type == "va_concate":
                self.cross_attn = _ResidualAttn(c.num_heads, dtype=self.dtype, dropout=c.dropout, kv_heads=kvh, name="cross_attn")
            else:
                self.cross_attn_v = _ResidualAttn(c.num_heads, dtype=self.dtype, dropout=c.dropout, kv_heads=kvh, name="cross_attn_v")
                self.cross_attn_a = _ResidualAttn(c.num_heads, dtype=self.dtype, dropout=c.dropout, kv_heads=kvh, name="cross_attn_a")
        if self._use_moe:
            from valor_tpu.ops.moe import MoEMlpBlock

            self.mlp = MoEMlpBlock(
                num_experts=c.moe_experts,
                intermediate=c.intermediate,
                top_k=c.moe_top_k,
                capacity_factor=c.moe_capacity_factor,
                dtype=self.dtype,
                name="moe_mlp",
            )
        else:
            self.mlp = MlpBlock(c.intermediate, "gelu", dtype=self.dtype, name="mlp")
        self.out_ln = LayerNorm(eps=1e-12, dtype=self.dtype, name="out_ln")

    def compute_cross_kv(self, video_feat, audio_feat):
        """Per-layer cross-attention K/V cache for decode (one projection of
        the ~1k media tokens per rollout instead of per step — the reference
        cannot cache at all here, model/pretrain.py:884-895)."""
        c = self.cfg
        out = {}
        if not c.has_cross_attn:
            return out
        if c.cross_attn_type == "va_concate":
            mem = [f for f in (video_feat, audio_feat) if f is not None]
            if mem:
                mem = jnp.concatenate(mem, axis=1) if len(mem) > 1 else mem[0]
                out["cross_attn"] = self.cross_attn.compute_kv(mem.astype(self.dtype))
        else:
            if video_feat is not None:
                out["cross_attn_v"] = self.cross_attn_v.compute_kv(video_feat.astype(self.dtype))
            if audio_feat is not None:
                out["cross_attn_a"] = self.cross_attn_a.compute_kv(audio_feat.astype(self.dtype))
        return out

    def __call__(
        self,
        x: jnp.ndarray,
        bias: Optional[jnp.ndarray],
        video_feat: Optional[jnp.ndarray],
        audio_feat: Optional[jnp.ndarray],
        cross_kv: Optional[dict] = None,
        self_extra_kv=None,
    ) -> jnp.ndarray:
        c = self.cfg
        x = self.self_attn(x, x, bias, extra_kv=self_extra_kv)
        has_media = (
            video_feat is not None
            or audio_feat is not None
            or (cross_kv is not None and cross_kv)
        )
        if c.has_cross_attn and has_media:
            t = c.cross_attn_type
            if cross_kv:
                if t == "va_concate":
                    x = self.cross_attn(x, None, extra_kv=cross_kv["cross_attn"])
                elif t == "va_parallel":
                    parts = []
                    if "cross_attn_v" in cross_kv:
                        parts.append(self.cross_attn_v(x, None, extra_kv=cross_kv["cross_attn_v"]))
                    if "cross_attn_a" in cross_kv:
                        parts.append(self.cross_attn_a(x, None, extra_kv=cross_kv["cross_attn_a"]))
                    x = sum(parts) if len(parts) > 1 else parts[0]
                else:
                    order = ("v", "a") if t == "video_audio" else ("a", "v")
                    for mod in order:
                        key = f"cross_attn_{mod}"
                        if key in cross_kv:
                            x = getattr(self, key)(x, None, extra_kv=cross_kv[key])
            elif t == "va_concate":
                mem = [f for f in (video_feat, audio_feat) if f is not None]
                mem = jnp.concatenate(mem, axis=1) if len(mem) > 1 else mem[0]
                x = self.cross_attn(x, mem)
            elif t == "va_parallel":
                if video_feat is not None and audio_feat is not None:
                    x = self.cross_attn_v(x, video_feat) + self.cross_attn_a(x, audio_feat)
                elif video_feat is not None:
                    x = self.cross_attn_v(x, video_feat)
                else:
                    x = self.cross_attn_a(x, audio_feat)
            elif t in ("video_audio", "audio_video"):
                order = ("v", "a") if t == "video_audio" else ("a", "v")
                for mod in order:
                    feat = video_feat if mod == "v" else audio_feat
                    if feat is not None:
                        x = getattr(self, f"cross_attn_{mod}")(x, feat)
            else:
                raise ValueError(f"unknown cross_attn_type {t!r}")
        from valor_tpu.ops.layers import maybe_dropout

        if self._use_moe:
            h, aux = self.mlp(x)
            # no-op unless the caller passes mutable=["moe"]; dense paths
            # and existing eval/train programs trace unchanged
            self.sow("moe", "aux", aux)
        else:
            h = self.mlp(x)
        h = maybe_dropout(self, h, c.dropout)
        return self.out_ln(x + h)


class BertFusionEncoder(nn.Module):
    """Full fusion encoder: embeddings + mask construction + N layers."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        c = self.cfg
        if c.pipeline_stages > 0 and c.moe_experts > 0:
            # a MoE layer couples tokens ACROSS the batch (expert capacity
            # is claimed batch-wide), so microbatched pipelining would
            # change routing semantics; the two knobs also target the same
            # scaling budget.  Refuse loudly instead of silently diverging.
            raise ValueError("pipeline_stages and moe_experts are mutually exclusive")
        if c.pipeline_stages > 0 and c.num_layers % (
            c.pipeline_stages * max(c.pipeline_interleave, 1)
        ):
            raise ValueError(
                f"{c.num_layers} fusion layers do not divide into "
                f"{c.pipeline_stages} pipeline stages"
                + (
                    f" x {c.pipeline_interleave} interleaved chunks"
                    if c.pipeline_interleave > 1
                    else ""
                )
            )
        self.embeddings = BertEmbeddings(c, dtype=self.dtype, name="embeddings")
        layer_cls = BertFusionLayer
        if self.remat:
            layer_cls = remat_wrap(BertFusionLayer)
        self.layers = [
            layer_cls(c, dtype=self.dtype, layer_idx=i, name=f"layer_{i}")
            for i in range(c.num_layers)
        ]

    def embedding_table(self) -> jnp.ndarray:
        """Word-embedding table for tied-weight decoding (modeling.py:241)."""
        return self.embeddings.word_embeddings

    def precompute_cross_kv(self, video_feat, audio_feat):
        """Per-layer cross-attention K/V for the decode fast path."""
        return [layer.compute_cross_kv(video_feat, audio_feat) for layer in self.layers]

    def precompute_ctx_kv(self, task_prompt, video_feat, audio_feat):
        """Self-attention K/V of the [prompt|video|audio] context for the
        in-sequence (has_cross_attn=False) decode fast path.

        Under the causal-prefix mask (ops/masks.py) non-text positions never
        attend to text, so the context hidden states are text-independent:
        running the stack on the context alone reproduces them exactly, and
        the per-layer K/V can be cached for every decode step.  (The
        reference has no working cache here at all — model/bert.py:807.)
        Returns (kv_list, ctx_mask [B, Nc]).
        """
        c = self.cfg
        feats = []
        masks = []
        if task_prompt is not None:
            feats.append(self.embeddings(task_prompt, "prompt"))
            masks.append((task_prompt != 0).astype(jnp.float32))
        if video_feat is not None:
            feats.append(video_feat.astype(self.dtype))
            masks.append(jnp.ones(video_feat.shape[:2], jnp.float32))
        if audio_feat is not None:
            feats.append(audio_feat.astype(self.dtype))
            masks.append(jnp.ones(audio_feat.shape[:2], jnp.float32))
        x = jnp.concatenate(feats, axis=1) if len(feats) > 1 else feats[0]
        ctx_mask = jnp.concatenate(masks, axis=1) if len(masks) > 1 else masks[0]
        bias = ((1.0 - ctx_mask) * -1e4)[:, None, None, :]
        kv_list = []
        for layer in self.layers:
            kv_list.append(layer.self_attn.compute_kv(x))
            x = layer(x, bias, None, None)
        return kv_list, ctx_mask

    def decode_with_ctx(
        self,
        tokens: jnp.ndarray,  # [B, N] text buffer
        token_mask: jnp.ndarray,  # [B, N]
        ctx_kv_list: list,
        ctx_mask: jnp.ndarray,  # [B, Nc]
    ) -> jnp.ndarray:
        """Text-only decode forward attending to cached context K/V."""
        x = self.embeddings(tokens, None, False)
        b, n = tokens.shape
        nc = ctx_mask.shape[1]
        tm = token_mask.astype(jnp.float32)
        qi = jnp.arange(n)[:, None]
        ki = jnp.arange(n)[None, :]
        causal = (ki <= qi).astype(jnp.float32)[None]  # [1, N, N]
        text_part = causal * tm[:, None, :]
        ctx_part = jnp.broadcast_to(ctx_mask[:, None, :], (b, n, nc))
        mask = jnp.concatenate([text_part, ctx_part], axis=-1)
        bias = ((1.0 - mask) * -1e4)[:, None]
        for layer, kv in zip(self.layers, ctx_kv_list):
            x = layer(x, bias, None, None, self_extra_kv=kv)
        return x

    def __call__(
        self,
        tokens: Optional[jnp.ndarray],  # [B, N] int or None
        task_prompt: Optional[jnp.ndarray] = None,  # [B, P] int
        video_feat: Optional[jnp.ndarray] = None,  # [B, Nv, C]
        audio_feat: Optional[jnp.ndarray] = None,  # [B, Na, C]
        causal: bool = False,
        full_masker: bool = False,
        token_mask: Optional[jnp.ndarray] = None,  # override (tokens != 0)
        cross_kv_list: Optional[list] = None,  # per-layer decode K/V cache
    ) -> jnp.ndarray:
        c = self.cfg
        feats = []
        text_mask = None
        text_len = 0
        if tokens is not None:
            feats.append(self.embeddings(tokens, None, full_masker))
            text_mask = (
                token_mask.astype(jnp.float32)
                if token_mask is not None
                else (tokens != 0).astype(jnp.float32)
            )
            text_len = tokens.shape[1]
        prompt_mask = None
        if task_prompt is not None:
            feats.append(self.embeddings(task_prompt, "prompt"))
            prompt_mask = (task_prompt != 0).astype(jnp.float32)

        # video/audio join the token sequence only when cross-attn is off
        in_seq_video = video_feat if not c.has_cross_attn else None
        in_seq_audio = audio_feat if not c.has_cross_attn else None
        n_video = in_seq_video.shape[1] if in_seq_video is not None else 0
        n_audio = in_seq_audio.shape[1] if in_seq_audio is not None else 0
        if in_seq_video is not None:
            feats.append(in_seq_video.astype(self.dtype))
        if in_seq_audio is not None:
            feats.append(in_seq_audio.astype(self.dtype))

        x = jnp.concatenate(feats, axis=1) if len(feats) > 1 else feats[0]
        batch = x.shape[0]
        key_mask = concat_key_mask(text_mask, prompt_mask, n_video, n_audio, batch)
        bias = fusion_attention_bias_terms(key_mask, text_len, causal, full_masker)

        cross_v = video_feat.astype(self.dtype) if (c.has_cross_attn and video_feat is not None) else None
        cross_a = audio_feat.astype(self.dtype) if (c.has_cross_attn and audio_feat is not None) else None

        if cross_kv_list is None:
            pipelined = self._maybe_pipeline(x, bias, cross_v, cross_a)
            if pipelined is not None:
                return pipelined

        # optional sequence-parallel sharding of the residual stream
        # (no-op unless ModelConfig.sequence_parallel installed a mesh)
        from valor_tpu.parallel.activations import sequence_sharded

        x = sequence_sharded(x)
        for i, layer in enumerate(self.layers):
            kv = cross_kv_list[i] if cross_kv_list is not None else None
            x = sequence_sharded(layer(x, bias, cross_v, cross_a, cross_kv=kv))
        return x

    def _maybe_pipeline(self, x, bias, cross_v, cross_a):
        """Route the layer stack through the GPipe program when the
        production pipeline knob is engaged; None = use the sequential path.

        The stored param tree stays per-layer (``layer_i/...``) — stage
        blocks are stacked at trace time and shard_map slices each device's
        stage, so checkpoints, converters, and the TP specs are untouched.
        Falls back silently on shapes the schedule cannot microbatch
        (decode buffers, odd eval batches), mirroring the SP/EP no-op
        contract (parallel/activations.py, ops/moe.py).
        """
        c = self.cfg
        if c.pipeline_stages <= 0 or self.is_initializing():
            return None
        from valor_tpu.parallel.pipeline import (
            DATA_AXIS,
            PIPE_AXIS,
            _note_applied,
            get_pipeline_mesh,
            pipeline_layers,
            pipeline_microbatches,
        )

        mesh = get_pipeline_mesh()
        if mesh is None or mesh.shape[PIPE_AXIS] != c.pipeline_stages:
            return None
        batch = x.shape[0]
        n_data = mesh.shape.get(DATA_AXIS, 1)
        m = pipeline_microbatches(batch, c.pipeline_stages, n_data)
        if batch % m or (batch // m) % n_data:
            return None

        from valor_tpu.ops.layers import is_deterministic

        variables = self.variables["params"]
        trees = [variables[f"layer_{i}"] for i in range(c.num_layers)]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)

        # TP composes: on a (data, model, pipe) mesh the stacked kernels
        # keep their Megatron column/row sharding (partition.param_spec)
        # on the trailing dims — the pipeline shard_map is manual over
        # data+pipe only, so GSPMD partitions each stage's matmuls over
        # `model` exactly as in the sequential program (DP x PP x TP).
        from valor_tpu.parallel.mesh import MODEL_AXIS

        if mesh.shape.get(MODEL_AXIS, 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from valor_tpu.parallel.partition import param_spec

            def _constrain(path, x):
                rel = "/" + "/".join(
                    str(getattr(k, "key", k)) for k in path
                )
                spec = param_spec(rel, x.ndim - 1)
                ok = all(
                    d % mesh.shape[a] == 0
                    for d, a in zip(x.shape[1:], spec)
                    if a is not None
                )
                full = P(None, *spec) if ok else P()
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, full)
                )

            stacked = jax.tree_util.tree_map_with_path(_constrain, stacked)

        # per-batch side inputs ride the extras lane; batch-independent
        # bias terms (the [1,1,L,L] structural mask) close over the stage fn
        bias_terms = (
            tuple(bias)
            if isinstance(bias, (tuple, list))
            else ((bias,) if bias is not None else ())
        )
        batched_bias = tuple(t for t in bias_terms if t.shape[0] == batch)
        static_bias = tuple(t for t in bias_terms if t.shape[0] != batch)
        extras = list(batched_bias)
        has_v, has_a = cross_v is not None, cross_a is not None
        if has_v:
            extras.append(cross_v)
        if has_a:
            extras.append(cross_a)

        needs_rng = c.dropout > 0.0 and not is_deterministic()
        rng = self.make_rng("dropout") if needs_rng else None
        n_bias = len(batched_bias)
        template = BertFusionLayer(c, dtype=self.dtype, parent=None)

        def apply_layer(p, h, ex, key):
            terms = tuple(ex[:n_bias]) + static_bias
            vv = ex[n_bias] if has_v else None
            aa = ex[n_bias + int(has_v)] if has_a else None
            rngs = {"dropout": key} if key is not None else {}
            return template.apply(
                {"params": p}, h, terms or None, vv, aa, rngs=rngs
            )

        if self.remat:
            apply_layer = jax.checkpoint(apply_layer)
        # interleaved schedule needs microbatch groups of S: prefer an
        # S-multiple microbatch count the batch supports, else fall back
        # to the plain GPipe schedule per-call (same no-op contract as
        # the engagement checks above)
        interleave = max(c.pipeline_interleave, 1)
        if interleave > 1 and m % c.pipeline_stages:
            s = c.pipeline_stages
            for cand in (2 * s, s):
                if batch % cand == 0 and (batch // cand) % n_data == 0:
                    m = cand
                    break
            else:
                interleave = 1
        _note_applied()
        return pipeline_layers(
            apply_layer,
            stacked,
            x,
            mesh,
            m,
            shard_batch_over_data=mesh.shape.get(DATA_AXIS, 1) > 1,
            extras=tuple(extras),
            rng=rng,
            interleave=interleave,
        )


class BertPredictionHead(nn.Module):
    """dense -> gelu -> LN -> tied-embedding decode (+bias).

    reference: model/modeling.py:232-254; the decoder weight is tied to the
    fusion encoder's word embedding — the caller passes that table in.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, embedding_table: jnp.ndarray) -> jnp.ndarray:
        hidden = embedding_table.shape[1]
        h = Dense(hidden, dtype=self.dtype, name="dense")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = LayerNorm(eps=1e-12, dtype=self.dtype, name="layernorm")(h)
        logits = jnp.dot(h, embedding_table.T.astype(h.dtype))
        bias = self.param(
            "decoder_bias", nn.initializers.zeros, (embedding_table.shape[0],), jnp.float32
        )
        return logits + bias.astype(logits.dtype)
