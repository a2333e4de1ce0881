"""AST-style audio spectrogram transformer (flax).

Behavioural spec from the reference:
  * AudioEmbeddings (model/modeling.py:738-762): Conv 16x16/stride 16 over a
    1-channel [melbins=64, target_length=512] log-mel image -> 4x32=128
    patch tokens (row-major over (freq, time)), prepend CLS, add learned
    positional embedding, dropout.
  * Encoder: 12-layer pre-norm transformer with a final LayerNorm
    (model/transformer.py:146-170), hidden 768, heads 12, ffn 3072,
    exact-erf gelu, LN eps 1e-12.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from valor_tpu.ops.layers import LayerNorm, PreNormLayer, remat_wrap


@dataclasses.dataclass(frozen=True)
class ASTConfig:
    hidden_size: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    melbins: int = 64
    target_length: int = 512
    patch_size: int = 16
    dropout: float = 0.1

    @property
    def tokens_per_clip(self) -> int:
        return (self.melbins // self.patch_size) * (self.target_length // self.patch_size)


class ASTEncoder(nn.Module):
    """[B, melbins, target_length] log-mel -> [B, 1+tokens, hidden]."""

    cfg: ASTConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, spectrogram: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        x = spectrogram[..., None]  # NHWC, 1 channel
        x = nn.Conv(
            features=c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embed",
        )(x.astype(self.dtype))
        b = x.shape[0]
        x = x.reshape(b, -1, c.hidden_size)  # row-major (freq, time) like reference
        cls = self.param(
            "cls_token", nn.initializers.normal(stddev=0.02), (1, 1, c.hidden_size), jnp.float32
        )
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c.hidden_size)), x], axis=1)
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(stddev=0.02),
            (c.tokens_per_clip + 1, c.hidden_size),
            jnp.float32,
        )
        from valor_tpu.ops.layers import maybe_dropout

        x = maybe_dropout(self, x + pos.astype(self.dtype), c.dropout)
        layer_cls = PreNormLayer
        if self.remat:
            layer_cls = remat_wrap(PreNormLayer)
        for i in range(c.layers):
            x = layer_cls(
                num_heads=c.heads,
                intermediate=c.intermediate,
                activation="gelu",
                ln_eps=1e-12,
                dtype=self.dtype,
                dropout=c.dropout,
                name=f"block_{i}",
            )(x)
        return LayerNorm(eps=1e-12, dtype=self.dtype, name="last_layernorm")(x)
