"""CLIP vision + text towers (flax), as modified by VALOR.

Behavioural spec from the reference (model/clip.py):
  * VisionTransformer returns **all patch tokens** after ln_post, with no
    CLS projection (clip.py:259-274) — VALOR consumes the full token grid.
  * The text tower is extended with a learned prompt-type embedding and
    supports concatenating task-prompt / video / audio features with a
    causal-prefix mask (clip.py:372-427).
  * QuickGELU activation, pre-norm residual blocks (clip.py:167-197).
  * Positional embeddings are bilinearly resized when the input resolution
    differs from the checkpoint's (clip.py:470-491) — see
    models/convert.py:resize_pos_embed for the TPU-side surgery.

Architecture presets follow the released OpenAI checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from valor_tpu.ops.layers import Dense, LayerNorm, PreNormLayer, remat_wrap
from valor_tpu.ops.masks import fusion_attention_bias_terms, concat_key_mask


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    width: int = 768
    layers: int = 12
    patch_size: int = 16
    resolution: int = 224
    num_heads: int = 0  # 0 -> width // 64 (OpenAI convention)

    @property
    def heads(self) -> int:
        return self.num_heads or max(self.width // 64, 1)

    @property
    def grid(self) -> int:
        return self.resolution // self.patch_size


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    width: int = 512
    layers: int = 12
    vocab_size: int = 49408
    context_length: int = 77
    embed_dim: int = 512
    num_heads: int = 0  # 0 -> width // 64 (OpenAI convention)

    @property
    def heads(self) -> int:
        return self.num_heads or max(self.width // 64, 1)


_VISION_PRESETS = {
    "clip_vit_base_32": CLIPVisionConfig(width=768, layers=12, patch_size=32),
    "clip_vit_base_16": CLIPVisionConfig(width=768, layers=12, patch_size=16),
    "clip_vit_large_14": CLIPVisionConfig(width=1024, layers=24, patch_size=14),
    "clip_vit_large_14_336px": CLIPVisionConfig(
        width=1024, layers=24, patch_size=14, resolution=336
    ),
    # scaled-down variant for unit tests / ablations
    "clip_vit_tiny": CLIPVisionConfig(width=32, layers=2, patch_size=16, resolution=32, num_heads=2),
}
_TEXT_PRESETS = {
    "clip_vit_base_32": CLIPTextConfig(width=512, embed_dim=512),
    "clip_vit_base_16": CLIPTextConfig(width=512, embed_dim=512),
    "clip_vit_large_14": CLIPTextConfig(width=768, embed_dim=768),
    "clip_vit_large_14_336px": CLIPTextConfig(width=768, embed_dim=768),
    "clip_vit_tiny": CLIPTextConfig(width=32, layers=2, vocab_size=512, embed_dim=16, num_heads=2),
}


def vision_preset(name: str, resolution: Optional[int] = None) -> CLIPVisionConfig:
    cfg = _VISION_PRESETS[name]
    if resolution and resolution != cfg.resolution:
        cfg = dataclasses.replace(cfg, resolution=resolution)
    return cfg


def text_preset(name: str) -> CLIPTextConfig:
    return _TEXT_PRESETS[name]


class CLIPVisionTransformer(nn.Module):
    """ViT returning all tokens (CLS first), post-ln'd."""

    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels: [B, H, W, 3] (NHWC — TPU-native layout). -> [B, 1+g*g, W]."""
        c = self.cfg
        x = nn.Conv(
            features=c.width,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embed",
        )(pixels.astype(self.dtype))
        b = x.shape[0]
        x = x.reshape(b, -1, c.width)  # [B, g*g, W]
        cls = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=c.width**-0.5),
            (c.width,),
            jnp.float32,
        )
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c.width))
        x = jnp.concatenate([cls, x], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=c.width**-0.5),
            (c.grid * c.grid + 1, c.width),
            jnp.float32,
        )
        x = x + pos.astype(self.dtype)
        x = LayerNorm(eps=1e-5, dtype=self.dtype, name="ln_pre")(x)
        layer_cls = PreNormLayer
        if self.remat:
            layer_cls = remat_wrap(PreNormLayer)
        for i in range(c.layers):
            x = layer_cls(
                num_heads=c.heads,
                intermediate=c.width * 4,
                activation="quick_gelu",
                ln_eps=1e-5,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x)
        x = LayerNorm(eps=1e-5, dtype=self.dtype, name="ln_post")(x)
        return x


class CLIPTextTransformer(nn.Module):
    """CLIP text tower with VALOR's prompt/multimodal extension."""

    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        txt_tokens: jnp.ndarray,  # [B, N] int
        task_prompt: Optional[jnp.ndarray] = None,  # [B, P] int
        video_feat: Optional[jnp.ndarray] = None,  # [B, Nv, W]
        audio_feat: Optional[jnp.ndarray] = None,  # [B, Na, W]
        causal: bool = True,
    ) -> jnp.ndarray:
        c = self.cfg
        table = self.param(
            "token_embedding",
            nn.initializers.normal(stddev=0.02),
            (c.vocab_size, c.width),
            jnp.float32,
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (c.context_length, c.width),
            jnp.float32,
        )
        prompt_type = self.param(
            "prompt_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, c.width),
            jnp.float32,
        )
        b, n = txt_tokens.shape
        x = jnp.take(table, txt_tokens, axis=0).astype(self.dtype)
        x = x + pos[:n].astype(self.dtype)
        feats = [x]
        text_mask = (txt_tokens != 0).astype(jnp.float32)
        prompt_mask = None
        if task_prompt is not None:
            p = jnp.take(table, task_prompt, axis=0).astype(self.dtype)
            p = p + prompt_type[0].astype(self.dtype)
            p = p + pos[: task_prompt.shape[1]].astype(self.dtype)
            feats.append(p)
            prompt_mask = (task_prompt != 0).astype(jnp.float32)
        n_video = video_feat.shape[1] if video_feat is not None else 0
        n_audio = audio_feat.shape[1] if audio_feat is not None else 0
        if video_feat is not None:
            feats.append(video_feat.astype(self.dtype))
        if audio_feat is not None:
            feats.append(audio_feat.astype(self.dtype))
        x = jnp.concatenate(feats, axis=1) if len(feats) > 1 else feats[0]

        key_mask = concat_key_mask(text_mask, prompt_mask, n_video, n_audio, b)
        bias = fusion_attention_bias_terms(key_mask, text_len=n if causal else 0, causal=causal)

        layer_cls = PreNormLayer
        if self.remat:
            layer_cls = remat_wrap(PreNormLayer)
        for i in range(c.layers):
            x = layer_cls(
                num_heads=c.heads,
                intermediate=c.width * 4,
                activation="quick_gelu",
                ln_eps=1e-5,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, bias)
        x = LayerNorm(eps=1e-5, dtype=self.dtype, name="ln_final")(x)
        return x


class CLIPProjections(nn.Module):
    """visual.proj / text_projection / logit_scale as standalone params
    so VALOR's init_clip_head contra heads (model/pretrain.py:89-92) work."""

    vision_width: int
    text_width: int
    embed_dim: int

    def setup(self):
        self.visual_proj = self.param(
            "visual_proj",
            nn.initializers.normal(stddev=self.vision_width**-0.5),
            (self.vision_width, self.embed_dim),
            jnp.float32,
        )
        self.text_proj = self.param(
            "text_proj",
            nn.initializers.normal(stddev=self.text_width**-0.5),
            (self.text_width, self.embed_dim),
            jnp.float32,
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, jnp.log(1 / 0.07)),
            (),
        )

    def project_visual(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.dot(x, self.visual_proj.astype(x.dtype))

    def project_text(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.dot(x, self.text_proj.astype(x.dtype))

    def temperature(self) -> jnp.ndarray:
        """temp = 1/exp(logit_scale) (reference: model/modeling.py:420-421)."""
        return 1.0 / jnp.exp(self.logit_scale)

    def __call__(self):  # pragma: no cover - params-only module
        return self.logit_scale
