"""VALOR tri-modal model: encoder zoo + task heads, TPU-native.

One flax module reproducing the reference's VALORModel/VALOR stack
(model/modeling.py:281-768 + model/pretrain.py:64-1517) as pure functions:

  * task dispatch happens on a static :class:`~valor_tpu.core.tasks.TaskSpec`
    so each (task, shape) pair compiles once,
  * contrastive negatives are global because the train step jits over the
    global batch (see tasks/losses.py docstring) — no manual all_gather,
  * token masking is the on-device vectorized op (ops/masking.py), removing
    the reference's per-step host sync (model/modeling.py:134-174),
  * generation re-runs the fusion encoder on a fixed-size token buffer
    (eval/generate.py); the reference does the same whenever cross-attention
    is enabled (model/pretrain.py:884-895).

Batch convention (all arrays, static shapes):
  bert_tokens/clip_tokens [B, N] int32 (pad=0)  — dual tokenizations
  video_pixels  [B, n_frames, H, W, 3] float    — normalised RGB (NHWC)
  audio_spectrograms [B, n_clips, melbins, target_length] float
  prompt_tokens [B, P] int32 or None            — pre-assembled task prompt
  (QA) question/answer fields documented at forward_qa.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from valor_tpu.core.config import ModelConfig
from valor_tpu.core.tasks import TaskSpec
from valor_tpu.models.ast import ASTConfig, ASTEncoder
from valor_tpu.models.bert import (
    BertConfig,
    BertFusionEncoder,
    BertPredictionHead,
)
from valor_tpu.models.clip import (
    CLIPProjections,
    CLIPTextTransformer,
    CLIPVisionTransformer,
    text_preset,
    vision_preset,
)
from valor_tpu.ops.layers import Dense, LayerNorm
from valor_tpu.ops.masking import full_mask, lm_shift_labels, mask_tokens
from valor_tpu.tasks import losses as L

# BERT special tokens (bert-base-uncased vocab; reference modeling.py:669-673)
BOS_TOKEN = 101  # [CLS]
EOS_TOKEN = 102  # [SEP]
MASK_TOKEN = 103  # [MASK]
MASK_RANGE_START = 106  # random-replacement range start (modeling.py:673)

MAX_FRAMES = 32  # frame/clip embedding rows (reference modeling.py:343-344)


def dataclasses_replace_no_cross(bert_cfg: BertConfig) -> BertConfig:
    import dataclasses as _dc

    # the standalone text encoder is always dense (the MoE knob targets the
    # fusion stack's FFN capacity)
    return _dc.replace(
        bert_cfg, has_cross_attn=False, cross_attn_type=None, moe_experts=0
    )


def bcast_prompt(prompt: Optional[jnp.ndarray], batch: int) -> Optional[jnp.ndarray]:
    """Task prompts are injected once per task as [1, P] (data/prompts.py);
    broadcast to the batch on device (the reference .expand()s on host,
    modeling.py:368)."""
    if prompt is None or prompt.shape[0] == batch:
        return prompt
    return jnp.broadcast_to(prompt, (batch,) + prompt.shape[1:])


class FineWeight(nn.Module):
    """Per-token weight MLP (reference: model/pretrain.py:104-112)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = Dense(self.dim, dtype=self.dtype, name="fc1")(x)
        h = jax.nn.relu(h)
        return Dense(1, dtype=self.dtype, name="fc2")(h)[..., 0]


class VALORModel(nn.Module):
    cfg: ModelConfig

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------
    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        self._dtype = dtype

        # per-encoder remat gate (remat_scope; core/config.py): remat only
        # where activations don't fit -> no backward recompute elsewhere
        def _remat(which: str) -> bool:
            if not c.checkpointing:
                return False
            tokens = {s.strip() for s in c.remat_scope.split(",") if s.strip()}
            bad = tokens - {"all", "vision", "text", "audio", "fusion", "none"}
            if bad or not tokens:
                # a typo OR an empty scope here would silently disable
                # checkpointing and only surface as an HBM OOM at
                # flagship shapes; an intentional no-remat config says so
                # explicitly with remat_scope='none' (or checkpointing
                # off)
                raise ValueError(
                    f"checkpointing=True with remat_scope={c.remat_scope!r}"
                    f"{' (unknown token(s) ' + repr(sorted(bad)) + ')' if bad else ''}; "
                    "valid tokens: all, vision, text, audio, fusion, none"
                )
            if tokens == {"none"}:
                return False
            return "all" in tokens or which in tokens
        self.is_clip_video = c.video_encoder_type.startswith("clip")
        self.is_clip_text = c.txt_encoder_type.startswith("clip")
        self.is_videoswin = c.video_encoder_type.startswith("videoswin")

        # ---- video encoder
        if self.is_clip_video or self.is_clip_text:
            import dataclasses as _dc

            clip_name = c.video_encoder_type if self.is_clip_video else c.txt_encoder_type
            vp = vision_preset(clip_name, c.video_resolution)
            tp = text_preset(clip_name)
            if c.clip_vision_layers:  # depth override (config.py rationale)
                vp = _dc.replace(vp, layers=c.clip_vision_layers)
            if c.clip_text_layers:
                tp = _dc.replace(tp, layers=c.clip_text_layers)
            self.clip_vision = CLIPVisionTransformer(
                vp,
                dtype=dtype,
                remat=_remat("vision"),
                name="clip_vision",
            )
            self.clip_text = CLIPTextTransformer(
                tp, dtype=dtype, remat=_remat("text"), name="clip_text"
            )
            self.clip_proj = CLIPProjections(
                vision_width=vp.width, text_width=tp.width, embed_dim=tp.embed_dim,
                name="clip_proj",
            )
            self.video_dim = vp.width
            self.txt_dim = tp.width
        if self.is_videoswin:
            from valor_tpu.models.videoswin import SwinTransformer3D, swin_preset

            self.video_encoder = SwinTransformer3D(
                swin_preset(c.video_encoder_type),
                dtype=dtype,
                remat=_remat("vision"),
                name="video_encoder",
            )
            self.video_dim = self.video_encoder.cfg.num_features

        # ---- audio encoder (AST is the only reference-supported type,
        # modeling.py:327-330 raises NotImplementedError otherwise)
        if not c.audio_encoder_type.startswith("ast"):
            raise NotImplementedError(
                f"audio_encoder_type {c.audio_encoder_type!r} (only 'ast')"
            )
        ast_cfg = ASTConfig(
            dropout=c.dropout,
            hidden_size=c.audio_hidden,
            layers=c.audio_layers,
            heads=c.audio_heads,
            intermediate=c.audio_intermediate,
            melbins=c.audio_melbins,
            target_length=c.audio_target_length,
            patch_size=c.audio_patch_size,
        )
        self.audio_encoder = ASTEncoder(ast_cfg, dtype=dtype, remat=_remat("audio"), name="audio_encoder")
        self.audio_dim = ast_cfg.hidden_size

        # ---- multimodal fusion (BERT)
        bert_cfg = BertConfig(
            dropout=c.dropout,
            vocab_size=c.fusion_vocab,
            hidden_size=c.fusion_hidden,
            num_layers=c.fusion_layers,
            num_heads=c.fusion_heads,
            intermediate=c.fusion_intermediate,
            has_cross_attn=c.multimodal_use_cross_attn,
            cross_attn_type=c.cross_attn_type if c.multimodal_use_cross_attn else None,
            moe_experts=c.fusion_moe_experts,
            moe_top_k=c.fusion_moe_top_k,
            moe_every=c.fusion_moe_every,
            moe_capacity_factor=c.fusion_moe_capacity_factor,
            pipeline_stages=c.fusion_pipeline_stages,
            pipeline_interleave=c.fusion_pipeline_interleave,
            cross_attn_kv_heads=c.fusion_cross_attn_kv_heads,
        )
        self.bert_cfg = bert_cfg
        self.multimodal_encoder = BertFusionEncoder(
            bert_cfg, dtype=dtype, remat=_remat("fusion"), name="multimodal_encoder"
        )
        self.multimodal_dim = bert_cfg.hidden_size
        self.cls_head = BertPredictionHead(dtype=dtype, name="cls_head")

        # ---- text encoder
        if not self.is_clip_text:
            if c.share_txt_and_multimodal:
                self.txt_encoder = self.multimodal_encoder
            else:
                txt_bert_cfg = dataclasses_replace_no_cross(bert_cfg)
                self.txt_encoder = BertFusionEncoder(
                    txt_bert_cfg, dtype=dtype, remat=_remat("text"), name="txt_encoder"
                )
            self.txt_dim = self.multimodal_dim

        # ---- contrastive heads
        use_clip_head = self.is_clip_video and self.is_clip_text and c.init_clip_head
        self.use_clip_head = use_clip_head
        if use_clip_head:
            contra_dim = text_preset(c.video_encoder_type).embed_dim
        else:
            contra_dim = c.contra_dim
            self.contra_head_t = Dense(contra_dim, use_bias=False, dtype=self._dtype, name="contra_head_t")
            self.contra_head_v = Dense(contra_dim, use_bias=False, dtype=self._dtype, name="contra_head_v")
        self.contra_dim = contra_dim
        self.contra_head_a = Dense(contra_dim, use_bias=False, dtype=self._dtype, name="contra_head_a")
        if c.contra_type == "coarse" and not c.late_fusion:
            self.va_fusion = Dense(contra_dim, dtype=self._dtype, name="va_fusion")
        if c.contra_type == "fine":
            self.text_fine_weight = FineWeight(contra_dim, dtype=self._dtype, name="text_fine_weight")
            self.video_fine_weight = FineWeight(contra_dim, dtype=self._dtype, name="video_fine_weight")
            self.audio_fine_weight = FineWeight(contra_dim, dtype=self._dtype, name="audio_fine_weight")
        self.contra_temp = self.param("contra_temp", lambda k, s: jnp.asarray(0.07), ())

        # ---- modality glue into the fusion space
        init02 = nn.initializers.normal(stddev=0.02)
        self.video_type_embeddings = self.param(
            "video_type_embeddings", init02, (1, 1, self.multimodal_dim), jnp.float32
        )
        self.audio_type_embeddings = self.param(
            "audio_type_embeddings", init02, (1, 1, self.multimodal_dim), jnp.float32
        )
        self.video_frame_embedding = self.param(
            "video_frame_embedding", init02, (1, MAX_FRAMES, self.multimodal_dim), jnp.float32
        )
        self.audio_frame_embedding = self.param(
            "audio_frame_embedding", init02, (1, MAX_FRAMES, self.multimodal_dim), jnp.float32
        )
        if self.video_dim != self.multimodal_dim:
            self.video_adapter = Dense(self.multimodal_dim, dtype=self._dtype, name="video_adapter")
            self.video_adapter_ln = LayerNorm(eps=1e-12, dtype=self._dtype, name="video_adapter_ln")
        if self.audio_dim != self.multimodal_dim:
            self.audio_adapter = Dense(self.multimodal_dim, dtype=self._dtype, name="audio_adapter")
            self.audio_adapter_ln = LayerNorm(eps=1e-12, dtype=self._dtype, name="audio_adapter_ln")

    # ------------------------------------------------------------------
    # encoders (reference: modeling.py:437-502)
    # ------------------------------------------------------------------
    def encode_video(self, video_pixels: jnp.ndarray) -> jnp.ndarray:
        """[B, n, H, W, 3] -> [B, n, x, C] (all tokens per frame).

        uint8 input is accepted: the host may ship raw pixels (4x less
        H2D + collate traffic than normalised f32 — VideoMapper
        output_uint8) and the (x/255 - mean)/std normalisation fuses
        into the patch-embed matmul here on device."""
        if video_pixels.dtype == jnp.uint8:
            from valor_tpu.data.pipeline import CLIP_MEAN, CLIP_STD, IMAGENET_MEAN, IMAGENET_STD

            mean, std = (
                (CLIP_MEAN, CLIP_STD)
                if self.is_clip_video
                else (IMAGENET_MEAN, IMAGENET_STD)
            )
            # normalise in fp32 (host float path parity), cast at the matmul;
            # XLA fuses the chain into the patch embed either way
            video_pixels = (
                (
                    video_pixels.astype(jnp.float32) / 255.0
                    - jnp.asarray(mean, jnp.float32)
                )
                / jnp.asarray(std, jnp.float32)
            ).astype(self._dtype)
        b, n = video_pixels.shape[:2]
        if self.is_videoswin:
            out = self.video_encoder(video_pixels)  # [B, D, Hp, Wp, C]
            bb, d, h, w, cc = out.shape
            return out.reshape(bb, d, h * w, cc)
        flat = video_pixels.reshape((b * n,) + video_pixels.shape[2:])
        out = self.clip_vision(flat)  # [B*n, 1+g*g, W]
        return out.reshape(b, n, out.shape[1], out.shape[2])

    def encode_audio(self, spectrograms: jnp.ndarray) -> jnp.ndarray:
        """[B, n, mel, len] -> [B, n, 1+tokens, C]."""
        b, n = spectrograms.shape[:2]
        flat = spectrograms.reshape((b * n,) + spectrograms.shape[2:])
        out = self.audio_encoder(flat)
        return out.reshape(b, n, out.shape[1], out.shape[2])

    def encode_text(
        self, tokens: jnp.ndarray, task_prompt: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        task_prompt = bcast_prompt(task_prompt, tokens.shape[0])
        if self.is_clip_text:
            out = self.clip_text(tokens, task_prompt=task_prompt, causal=True)
        else:
            out = self.txt_encoder(tokens, task_prompt=task_prompt, causal=False)
        if task_prompt is not None:
            out = out[:, : tokens.shape[1]]
        return out

    # ------------------------------------------------------------------
    # pooling (reference: modeling.py:373-406)
    # ------------------------------------------------------------------
    def pool_text(self, feature, tokens, contra_type=None):
        ct = contra_type or self.cfg.contra_type
        if ct == "coarse":
            if self.is_clip_text:
                idx = jnp.argmax(tokens, axis=-1)
                return feature[jnp.arange(tokens.shape[0]), idx]
            return feature[:, 0]
        return feature

    def pool_video(self, feature, contra_type=None):
        if self.is_videoswin:
            feature = jnp.mean(feature, axis=2)
        else:
            feature = feature[:, :, 0]
        ct = contra_type or self.cfg.contra_type
        return jnp.mean(feature, axis=1) if ct == "coarse" else feature

    def pool_audio(self, feature, contra_type=None):
        feature = feature[:, :, 0]
        ct = contra_type or self.cfg.contra_type
        return jnp.mean(feature, axis=1) if ct == "coarse" else feature

    # ------------------------------------------------------------------
    # fusion-space inputs (reference: modeling.py:485-502)
    # ------------------------------------------------------------------
    def video_fusion_input(self, video_output: jnp.ndarray) -> jnp.ndarray:
        b, n, x, _ = video_output.shape
        v = video_output
        if self.video_dim != self.multimodal_dim:
            v = self.video_adapter_ln(self.video_adapter(v))
        v = v + self.video_frame_embedding[:, :n, None, :].astype(v.dtype)
        v = v.reshape(b, n * x, self.multimodal_dim)
        return v + self.video_type_embeddings.astype(v.dtype)

    def audio_fusion_input(self, audio_output: jnp.ndarray) -> jnp.ndarray:
        b, n, x, _ = audio_output.shape
        a = audio_output
        if self.audio_dim != self.multimodal_dim:
            a = self.audio_adapter_ln(self.audio_adapter(a))
        a = a + self.audio_frame_embedding[:, :n, None, :].astype(a.dtype)
        a = a.reshape(b, n * x, self.multimodal_dim)
        return a + self.audio_type_embeddings.astype(a.dtype)

    # ------------------------------------------------------------------
    # contrastive feature extraction
    # ------------------------------------------------------------------
    def project_text(self, pooled):
        if self.use_clip_head:
            return self.clip_proj.project_text(pooled)
        return self.contra_head_t(pooled)

    def project_video(self, pooled):
        if self.use_clip_head:
            return self.clip_proj.project_visual(pooled)
        return self.contra_head_v(pooled)

    def temperature(self):
        # reference: modeling.py:420-423 — CLIP's learned logit scale when the
        # video tower is CLIP, otherwise a learned scalar initialised at 0.07
        if self.is_clip_video:
            return self.clip_proj.temperature()
        return self.contra_temp

    def contra_features(
        self,
        txt_tokens: Optional[jnp.ndarray],
        video_output: Optional[jnp.ndarray],
        audio_output: Optional[jnp.ndarray],
        prompt_tokens: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        """Pooled, projected, L2-normalised per-modality features."""
        out: Dict[str, Any] = {"feat_t": None, "feat_v": None, "feat_a": None, "txt_tokens": txt_tokens}
        if txt_tokens is not None:
            txt_out = self.encode_text(txt_tokens, prompt_tokens)
            pooled = self.pool_text(txt_out, txt_tokens)
            out["feat_t"] = L.l2_normalize(self.project_text(pooled))
        if video_output is not None:
            pooled = self.pool_video(video_output)
            out["feat_v"] = L.l2_normalize(self.project_video(pooled))
        if audio_output is not None:
            pooled = self.pool_audio(audio_output)
            out["feat_a"] = L.l2_normalize(self.contra_head_a(pooled))
        return out

    # ------------------------------------------------------------------
    # contrastive losses over modality groups
    # (reference: model/pretrain.py:295-401 and :596-702)
    # ------------------------------------------------------------------
    def _fine_parts(self, feats, txt_tokens):
        mask_t = (txt_tokens != 0).astype(jnp.float32) if txt_tokens is not None else None
        parts = {}
        if feats["feat_t"] is not None:
            parts["t"] = (feats["feat_t"], mask_t, self.text_fine_weight(feats["feat_t"]))
        if feats["feat_v"] is not None:
            fv = feats["feat_v"]
            parts["v"] = (fv, jnp.ones(fv.shape[:2], jnp.float32), self.video_fine_weight(fv))
        if feats["feat_a"] is not None:
            fa = feats["feat_a"]
            parts["a"] = (fa, jnp.ones(fa.shape[:2], jnp.float32), self.audio_fine_weight(fa))
        return parts

    def group_score_matrix(self, group: str, feats: Dict[str, Any], txt_tokens) -> jnp.ndarray:
        """Score matrix for one modality group ('tv','ta','tva','va','vta','atv')."""
        c = self.cfg
        if c.contra_type == "coarse":
            ft, fv, fa = feats["feat_t"], feats["feat_v"], feats["feat_a"]
            if group == "tv":
                return L.coarse_score(ft, fv)
            if group == "ta":
                return L.coarse_score(ft, fa)
            if group == "tva":
                if c.late_fusion:
                    return L.coarse_score(ft, fv) + L.coarse_score(ft, fa)
                fva = L.l2_normalize(self.va_fusion(jnp.concatenate([fv, fa], axis=-1)))
                return L.coarse_score(ft, fva)
            raise ValueError(f"coarse contra does not support group {group!r}")

        parts = self._fine_parts(feats, txt_tokens)

        def cat(keys):
            f = jnp.concatenate([parts[k][0] for k in keys], axis=1)
            m = jnp.concatenate([parts[k][1] for k in keys], axis=1)
            w = jnp.concatenate([parts[k][2] for k in keys], axis=1)
            return f, m, w

        if group == "tv":
            a, b = parts["t"], parts["v"]
        elif group == "ta":
            a, b = parts["t"], parts["a"]
        elif group == "va":
            a, b = parts["v"], parts["a"]
        elif group == "tva":
            if c.late_fusion:
                t, v, aa = parts["t"], parts["v"], parts["a"]
                ones = lambda p: jnp.ones_like(p[2])
                return L.fine_score(t[0], v[0], t[1], v[1], ones(t), ones(v)) + L.fine_score(
                    t[0], aa[0], t[1], aa[1], ones(t), ones(aa)
                )
            a, b = parts["t"], cat(["v", "a"])
        elif group == "vta":
            a, b = parts["v"], cat(["t", "a"])
        elif group == "atv":
            a, b = parts["a"], cat(["t", "v"])
        else:
            raise ValueError(group)
        if group == "tva" and c.fineweight_type == "none":
            a = (a[0], a[1], jnp.ones_like(a[2]))
            b = (b[0], b[1], jnp.ones_like(b[2]))
        return L.fine_score(a[0], b[0], a[1], b[1], a[2], b[2])

    def contra_loss_over_groups(self, groups, feats, txt_tokens) -> jnp.ndarray:
        temp = self.temperature()
        ls = [
            L.contrastive_loss(self.group_score_matrix(g, feats, txt_tokens), temp)
            for g in groups
        ]
        return sum(ls) / len(ls)

    # ------------------------------------------------------------------
    # caption / mlm heads (reference: model/pretrain.py:419-532)
    # ------------------------------------------------------------------
    def _bert_embedding_table(self):
        # tied-embedding decode: read the fusion encoder's word table
        # (reference ties cls decoder weight to it, modeling.py:241,645)
        return self.multimodal_encoder.embedding_table()

    def fusion_logits(
        self,
        txt_tokens: jnp.ndarray,
        prompt_tokens: Optional[jnp.ndarray],
        video_input: Optional[jnp.ndarray],
        audio_input: Optional[jnp.ndarray],
        causal: bool,
        full_masker: bool = False,
        token_mask: Optional[jnp.ndarray] = None,
        cross_kv_list: Optional[list] = None,
    ) -> jnp.ndarray:
        """Run fusion encoder and score all text positions. [B, N, V]."""
        prompt_tokens = bcast_prompt(prompt_tokens, txt_tokens.shape[0])
        out = self.multimodal_encoder(
            txt_tokens,
            task_prompt=prompt_tokens,
            video_feat=video_input,
            audio_feat=audio_input,
            causal=causal,
            full_masker=full_masker,
            token_mask=token_mask,
            cross_kv_list=cross_kv_list,
        )
        text_out = out[:, : txt_tokens.shape[1]]
        table = self._bert_embedding_table()
        return self.cls_head(text_out, table)

    def fusion_cross_kv(
        self,
        video_input: Optional[jnp.ndarray],
        audio_input: Optional[jnp.ndarray],
    ) -> list:
        """Precompute per-layer cross-attention K/V for decoding."""
        return self.multimodal_encoder.precompute_cross_kv(video_input, audio_input)

    def fusion_ctx_kv(self, prompt_tokens, video_input, audio_input):
        """Precompute [prompt|media] self-attn K/V for in-sequence decode
        (multimodal_use_cross_attn=False)."""
        media = video_input if video_input is not None else audio_input
        if media is not None:
            prompt_tokens = bcast_prompt(prompt_tokens, media.shape[0])
        return self.multimodal_encoder.precompute_ctx_kv(
            prompt_tokens, video_input, audio_input
        )

    def fusion_logits_ctx(self, tokens, token_mask, ctx_kv_list, ctx_mask):
        """Score text positions attending to the cached context."""
        out = self.multimodal_encoder.decode_with_ctx(
            tokens, token_mask, ctx_kv_list, ctx_mask
        )
        return self.cls_head(out, self._bert_embedding_table())

    def caption_inputs(self, txt_tokens: jnp.ndarray, train: bool):
        """(masked tokens, labels) for the caption objective."""
        c = self.cfg
        if c.caption_type == "unimlm":
            if c.full_masker:
                return full_mask(txt_tokens, MASK_TOKEN)
            rng = self.make_rng("mask")
            return mask_tokens(rng, txt_tokens, 0.6, MASK_TOKEN, MASK_RANGE_START, self.cfg.fusion_vocab)
        return txt_tokens, lm_shift_labels(txt_tokens)

    def group_caption_loss(
        self, group, txt_input, txt_labels, prompt_tokens, video_input, audio_input
    ) -> jnp.ndarray:
        v = video_input if "v" in group else None
        a = audio_input if "a" in group else None
        logits = self.fusion_logits(
            txt_input, prompt_tokens, v, a, causal=True, full_masker=self.cfg.full_masker
        )
        return L.masked_cross_entropy(logits, txt_labels, self.cfg.label_smoothing)

    # ------------------------------------------------------------------
    # task forwards
    # ------------------------------------------------------------------
    def __call__(self, batch: Dict[str, Any], task: TaskSpec, compute_loss: bool = True, train: bool = True):
        if batch.get("audio_waveforms") is not None:
            # device-side mel: the host ships clip-span waveforms
            # (AudioMapper device_fbank=True; fbank.py rationale)
            from valor_tpu.data.fbank import fbank_clips_from_spans

            batch = dict(batch)
            batch["audio_spectrograms"] = fbank_clips_from_spans(
                batch.pop("audio_waveforms"),
                batch.pop("audio_valid_frames"),
                melbins=self.cfg.audio_melbins,
                target_length=self.cfg.audio_target_length,
            ).astype(self._dtype)
        if task.family == "pt":
            return self.forward_pt(batch, task, compute_loss, train)
        if task.family == "ret":
            return self.forward_ret(batch, task, compute_loss)
        if task.family == "cap":
            return self.forward_cap(batch, task, compute_loss, train)
        if task.family == "qa":
            return self.forward_qa(batch, task, compute_loss, train)
        raise ValueError(task.family)

    def _text_for(self, batch, encoder_type):
        key = "clip_tokens" if encoder_type.startswith("clip") else "bert_tokens"
        return batch.get(key)

    def forward_pt(self, batch, task: TaskSpec, compute_loss=True, train=True):
        c = self.cfg
        video_output = (
            self.encode_video(batch["video_pixels"]) if task.uses_video else None
        )
        audio_output = (
            self.encode_audio(batch["audio_spectrograms"]) if task.uses_audio else None
        )
        out: Dict[str, Any] = {}

        if task.contra_groups:
            txt_contra = self._text_for(batch, c.txt_encoder_type)
            feats = self.contra_features(
                txt_contra, video_output, audio_output, batch.get("prompt_tokens_contra")
            )
            if compute_loss:
                out["contra_loss"] = (
                    self.contra_loss_over_groups(task.contra_groups, feats, txt_contra)
                    * c.contra_loss_ratio
                )
            else:
                out.update(feats)

        txt_tokens = self._text_for(batch, c.multimodal_encoder_type)
        video_input = self.video_fusion_input(video_output) if video_output is not None else None
        audio_input = self.audio_fusion_input(audio_output) if audio_output is not None else None

        if task.caption_groups:
            txt_input, txt_labels = self.caption_inputs(txt_tokens, train)
            ls = []
            for g in task.caption_groups:
                v = video_input if "v" in g else None
                a = audio_input if "a" in g else None
                logits = self.fusion_logits(
                    txt_input, batch.get("prompt_tokens_caption"), v, a,
                    causal=True, full_masker=self.cfg.full_masker,
                )
                if compute_loss:
                    ls.append(
                        L.masked_cross_entropy(logits, txt_labels, self.cfg.label_smoothing)
                    )
                else:
                    out[f"caption_scores_{g}"] = logits
            if compute_loss:
                out["caption_loss"] = sum(ls) / len(ls)
            else:
                out["txt_labels_caption"] = txt_labels

        if task.mlm_groups:
            rng = self.make_rng("mask")
            txt_input, txt_labels = mask_tokens(rng, txt_tokens, 0.15, MASK_TOKEN, MASK_RANGE_START, self.cfg.fusion_vocab)
            ls = []
            for g in task.mlm_groups:
                v = video_input if "v" in g else None
                a = audio_input if "a" in g else None
                # per-group MLM prompts (reference uses a DIFFERENT sentence
                # per modality group, pretrain.py:492/505/516)
                mlm_prompt = batch.get(f"prompt_tokens_mlm_{g}")
                if mlm_prompt is None:
                    mlm_prompt = batch.get("prompt_tokens_mlm")
                logits = self.fusion_logits(
                    txt_input, mlm_prompt, v, a, causal=False
                )
                if compute_loss:
                    ls.append(L.masked_cross_entropy(logits, txt_labels))
                else:
                    out[f"mlm_scores_{g}"] = logits
            if compute_loss:
                out["mlm_loss"] = sum(ls) / len(ls)
            else:
                out["txt_labels_mlm"] = txt_labels
        return out

    def forward_ret(self, batch, task: TaskSpec, compute_loss=True):
        c = self.cfg
        groups = task.contra_groups
        txt_tokens = (
            self._text_for(batch, c.txt_encoder_type) if any("t" in g for g in groups) else None
        )
        video_output = (
            self.encode_video(batch["video_pixels"]) if any("v" in g for g in groups) else None
        )
        audio_output = (
            self.encode_audio(batch["audio_spectrograms"]) if any("a" in g for g in groups) else None
        )
        feats = self.contra_features(
            txt_tokens, video_output, audio_output, batch.get("prompt_tokens_contra")
        )
        if not compute_loss:
            return feats
        return {"contra_loss": self.contra_loss_over_groups(groups, feats, txt_tokens)}

    def forward_cap(self, batch, task: TaskSpec, compute_loss=True, train=True):
        """Caption training loss (generation lives in eval/generate.py)."""
        c = self.cfg
        groups = task.caption_groups
        txt_tokens = self._text_for(batch, c.multimodal_encoder_type)
        video_output = (
            self.encode_video(batch["video_pixels"]) if any("v" in g for g in groups) else None
        )
        audio_output = (
            self.encode_audio(batch["audio_spectrograms"]) if any("a" in g for g in groups) else None
        )
        video_input = self.video_fusion_input(video_output) if video_output is not None else None
        audio_input = self.audio_fusion_input(audio_output) if audio_output is not None else None
        if not compute_loss:
            return {"video_input": video_input, "audio_input": audio_input}
        txt_input, txt_labels = self.caption_inputs(txt_tokens, train)
        ls = [
            self.group_caption_loss(
                g, txt_input, txt_labels, batch.get("prompt_tokens_caption"),
                video_input, audio_input,
            )
            for g in groups
        ]
        return {"caption_loss": sum(ls) / len(ls)}

    def forward_qa(self, batch, task: TaskSpec, compute_loss=True, train=True):
        """Generative QA loss.

        Batch fields (reference: model/pretrain.py:1212-1348, tiled on host):
          bert_tokens      [Bt, N]  answer tokens (already tiled per answer)
          question_prompt  [Bt, P]  question (+optional task prompt) tokens
          video_pixels     [Q, ...] unique per-question media
          tile_index       [Bt]     row -> question index (None if Bt == Q)
          answer_weights   [Bt]     weights (None if single-answer)
        """
        c = self.cfg
        groups = task.caption_groups
        txt_tokens = self._text_for(batch, c.multimodal_encoder_type)
        prompt = batch.get("question_prompt")
        video_output = (
            self.encode_video(batch["video_pixels"]) if any("v" in g for g in groups) else None
        )
        audio_output = (
            self.encode_audio(batch["audio_spectrograms"]) if any("a" in g for g in groups) else None
        )
        video_input = self.video_fusion_input(video_output) if video_output is not None else None
        audio_input = self.audio_fusion_input(audio_output) if audio_output is not None else None
        tile = batch.get("tile_index")
        if tile is not None:
            video_input = video_input[tile] if video_input is not None else None
            audio_input = audio_input[tile] if audio_input is not None else None
        if not compute_loss:
            return {"video_input": video_input, "audio_input": audio_input, "prompt": prompt}

        if c.caption_type == "unimlm":
            if c.full_masker:
                txt_input, labels = full_mask(txt_tokens, MASK_TOKEN)
            else:
                rng = self.make_rng("mask")
                txt_input, labels = mask_tokens(rng, txt_tokens, 0.99, MASK_TOKEN, MASK_RANGE_START, self.cfg.fusion_vocab)
        else:
            txt_input, labels = txt_tokens, lm_shift_labels(txt_tokens)

        # question count = rows of whichever unique-per-question media array
        # exists (reference normalises by len(answer_nums),
        # model/pretrain.py:1288); audio-only QA must NOT fall back to the
        # tiled answer-row count Bt.
        if batch.get("video_pixels") is not None:
            n_questions = batch["video_pixels"].shape[0]
        elif batch.get("audio_spectrograms") is not None:
            n_questions = batch["audio_spectrograms"].shape[0]
        else:
            n_questions = txt_tokens.shape[0]
        ls = []
        for g in groups:
            v = video_input if "v" in g else None
            a = audio_input if "a" in g else None
            logits = self.fusion_logits(
                txt_input, prompt, v, a, causal=True, full_masker=c.full_masker
            )
            ls.append(
                L.qa_weighted_cross_entropy(
                    logits, labels, batch.get("answer_weights"), n_questions
                )
            )
        return {"qa_loss": sum(ls) / len(ls)}
