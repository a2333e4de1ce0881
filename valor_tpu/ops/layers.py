"""Core neural-net ops, TPU-first.

Replaces the reference's layer zoo (apex FusedLayerNorm, HF BertSelf*/
MultiHeadAttention in model/bert.py + model/transformer.py, nn.MultiheadAttention
in model/clip.py:172) with a single set of flax.linen modules:

  * parameters are stored fp32; activations run in a configurable compute
    dtype (bf16 on TPU — replacing the whole apex AMP O2 machinery,
    reference: apex/apex/amp/, train_utils.py:222; bf16 needs no loss
    scaling and XLA keeps softmax/LN accumulation in fp32 here),
  * attention is one einsum-based module with an optional additive bias
    mask and an optional fixed-size KV cache (decode path), so the three
    reference attention implementations collapse into one,
  * LayerNorm accumulates in fp32 regardless of compute dtype (numerical
    parity with apex's fused kernel, reference: apex/csrc/layer_norm_cuda*).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

NEG_INF = -1e4  # reference uses (1-mask)*-10000 (model/bert.py:803)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """erf-based gelu (reference: model/bert.py:52-57 / transformer.py:32-38).

    With a gelu stash dtype installed (set_gelu_stash_dtype) the backward
    reads a float8 copy of the pre-activation instead of the compute-dtype
    one AD would save; forward values are bit-identical either way."""
    if _GELU_STASH_DTYPE[0] is not None and x.dtype in (
        jnp.bfloat16,
        jnp.float16,
    ):
        return _gelu_stashed(x, _GELU_STASH_DTYPE[0])
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU  x*sigmoid(1.702x) (reference: model/clip.py:167-169)."""
    return x * jax.nn.sigmoid(1.702 * x)


ACT2FN = {"gelu": gelu_exact, "quick_gelu": quick_gelu, "relu": jax.nn.relu}


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics and cast-back to compute dtype.

    TPU-native stand-in for apex FusedLayerNorm (XLA fuses this into one
    kernel); eps defaults to the BERT value 1e-12 used throughout the
    reference (model/bert.py:182 etc.).
    """

    eps: float = 1e-12
    dtype: Dtype = jnp.float32
    use_pallas: bool = False  # route through the fused Pallas kernel

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        if self.use_pallas and dim % 128 == 0:
            from valor_tpu.ops.pallas.layernorm import fused_layernorm

            y = fused_layernorm(x, scale, bias, self.eps)
            return y.astype(self.dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


class Dense(nn.Module):
    """Linear layer with fp32 params and compute-dtype matmul."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features), jnp.float32
        )
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class Embed(nn.Module):
    """Token embedding with fp32 table, compute-dtype output."""

    num_embeddings: int
    features: int
    dtype: Dtype = jnp.float32
    embedding_init: Callable = nn.initializers.normal(stddev=0.02)

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding", self.embedding_init, (self.num_embeddings, self.features), jnp.float32
        )
        return jnp.take(table, ids, axis=0).astype(self.dtype)

    def attend(self, x: jnp.ndarray) -> jnp.ndarray:
        """Tied-weight decoding: x @ table.T (BERTPredictionHead tie,
        reference: model/modeling.py:241)."""
        table = self.get_variable("params", "embedding")
        return jnp.dot(x, table.T.astype(x.dtype))


import contextlib

# trace-time training-mode switch: dropout layers read this when the model
# is traced.  The train step traces inside `train_mode()`; eval programs
# trace in the default deterministic mode.  (reference: module.train()/
# .eval() — here the mode is baked per compiled program, which is exactly
# the jit semantics we want.)
_DETERMINISTIC = True


@contextlib.contextmanager
def train_mode():
    global _DETERMINISTIC
    prev = _DETERMINISTIC
    _DETERMINISTIC = False
    try:
        yield
    finally:
        _DETERMINISTIC = prev


def is_deterministic() -> bool:
    return _DETERMINISTIC


def maybe_dropout(module: "nn.Module", x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Functional dropout usable from any bound module method (setup- or
    compact-style); no-op when rate==0 or tracing in deterministic mode."""
    if rate > 0.0 and not _DETERMINISTIC:
        rng = module.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))
    return x


_REMAT_POLICY = [None]  # trace-time module-level switch

# trace-time dtype for the materialised attention logits (None = fp32).
# See dot_product_attention; set_scores_dtype("bfloat16") halves the
# [B,H,Q,K] intermediate's HBM traffic on bf16 models; the float8 types
# ("float8_e4m3fn"/"float8_e5m2") quarter it (scores are clamped to the
# type's finite range first — the NEG_INF mask value saturates, and
# exp(saturated) == exp(NEG_INF) == 0.0 in the fp32 softmax).
_SCORES_DTYPE = [None]


def set_scores_dtype(name) -> None:
    import jax.numpy as _jnp

    _SCORES_DTYPE[0] = None if not name or name == "float32" else _jnp.dtype(name)


# trace-time dtype for the gelu backward stash (None = let AD save the
# pre-activation in compute dtype).  The fc1 pre-activations [.., 4C] are
# among the largest *elementwise-consumed* residuals of the train step
# (rank_hbm, PERF_NOTES round-3 ranking); storing them float8 halves that
# traffic with NO change to the forward values — only gelu'(x) in the
# backward sees the quantisation, and the f8 upcast fuses into the
# elementwise dgelu (unlike matmul-operand residuals, which would need a
# materialised upcast and gain nothing on TPU).
_GELU_STASH_DTYPE = [None]


def set_gelu_stash_dtype(name) -> None:
    import jax.numpy as _jnp

    _GELU_STASH_DTYPE[0] = None if not name or name == "none" else _jnp.dtype(name)


# trace-time attention memory layout: "bshd" (default; reshape-only:
# Q/K/V stay [B,S,H,D] and the einsums contract the head dim in place)
# or "bhsd" (classic split_heads transpose).  Motivation: the round-4
# OOM buffer dump showed XLA materialising a 96 MB layout-transpose copy
# of EVERY fusion cross-attn K/V projection output ([64,917,768] {1,2,0})
# — the bshd layout removes the transpose at the source.  Forward math
# is identical (same contractions, different operand layouts); measured
# +1.1% on the real chip (PERF_NOTES.md round-4 ladder).
_ATTN_LAYOUT = ["bshd"]


def set_attention_layout(name: str) -> None:
    if name not in ("bhsd", "bshd"):
        raise ValueError(f"unknown attention layout {name!r}")
    _ATTN_LAYOUT[0] = name


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(1,))
def _gelu_stashed(x: jnp.ndarray, stash_dtype) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def _gelu_stashed_fwd(x, stash_dtype):
    return jax.nn.gelu(x, approximate=False), x.astype(stash_dtype)


def _gelu_stashed_bwd(stash_dtype, res, g):
    # gelu'(x) = Phi(x) + x * phi(x), computed fp32 from the f8 stash
    x = res.astype(jnp.float32)
    cdf = 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))
    pdf = jnp.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)
    return ((g.astype(jnp.float32) * (cdf + x * pdf)).astype(g.dtype),)


_gelu_stashed.defvjp(_gelu_stashed_fwd, _gelu_stashed_bwd)


def set_remat_policy(name) -> None:
    """Select the jax.checkpoint policy used when remat is on.

    None/"" -> save nothing (max memory savings, full recompute);
    any attribute of jax.checkpoint_policies (e.g. "dots_saveable",
    "dots_with_no_batch_dims_saveable") -> save those intermediates and
    skip their recompute in the backward pass — a compute/memory dial the
    reference's all-or-nothing --checkpointing lacks."""
    _REMAT_POLICY[0] = name or None


def remat_wrap(cls):
    """nn.remat with the globally-selected checkpoint policy."""
    import jax as _jax

    kw = {}
    if _REMAT_POLICY[0]:
        kw["policy"] = getattr(_jax.checkpoint_policies, _REMAT_POLICY[0])
    return nn.remat(cls, static_argnums=(), **kw)


def dot_product_attention(
    q: jnp.ndarray,  # [B, H, Q, D]
    k: jnp.ndarray,  # [B, H, K, D]
    v: jnp.ndarray,  # [B, H, K, D]
    bias: Optional[jnp.ndarray] = None,  # additive, broadcastable to [B,H,Q,K]
    dtype: Dtype = jnp.float32,
) -> jnp.ndarray:
    """Masked scaled-dot-product attention; softmax in fp32.

    One implementation serving BertSelfAttention / BertCrossAttention /
    clip's nn.MultiheadAttention / transformer.MultiHeadAttention
    (reference: model/bert.py:244-340, model/transformer.py:106-130).

    XLA's fused attention is the measured-fastest at every VALOR shape
    (197-token ViT frames, 257-token AST clips, ~1k-token fusion): a
    Pallas flash kernel — including a mask-native segment-ids variant
    with no materialised bias — lost every fwd+bwd A/B on v5e
    (PERF_NOTES.md "Flash-attention A/B"), so it was removed; flash
    block-tiling pays off at ≥4k tokens, which VALOR never reaches
    (SURVEY.md §5 long-context: seq <= ~1.7k).
    """
    depth = q.shape[-1]
    if k.shape[1] != q.shape[1]:
        # grouped-query attention: fewer K/V heads than Q heads (cross-attn
        # K/V narrowing — round-4 activation-bytes rung).  The einsum
        # broadcasts each K/V head over its query group; K/V are NEVER
        # materialised at full head count.
        return _grouped_attention(q, k, v, bias, dtype)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = _masked_softmax(scores / math.sqrt(depth), bias, dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype), v)
    return out


def _masked_softmax(scores, bias, dtype: Dtype) -> jnp.ndarray:
    """Shared scores epilogue: additive bias, half/f8 logit storage, fp32
    softmax.

    `bias` may be a tuple of independently-broadcastable terms (e.g.
    [B,1,1,K] padding + [1,1,Q,K] structure from
    fusion_attention_bias_terms): adding each separately lets XLA fuse
    the tiny reads into the scores epilogue instead of streaming a
    materialised [B,1,Q,K] tensor every layer.

    With a scores dtype installed, the [B,H,Q,K] logits are stored bf16
    (the matmul epilogue casts, the softmax kernel upcasts in-register):
    halves the largest intermediate's HBM traffic — the reference's
    apex-O2 fp16 mode likewise keeps these tensors in half precision.
    float8 types quarter it; clamp to the finite range first so the
    NEG_INF mask value saturates instead of overflowing e4m3fn (no inf)
    to NaN — softmax(clamped NEG) is still exactly 0.0 in fp32."""
    if bias is not None:
        for term in bias if isinstance(bias, (tuple, list)) else (bias,):
            scores = scores + term.astype(jnp.float32)
    if _SCORES_DTYPE[0] is not None and dtype != jnp.float32:
        sdt = _SCORES_DTYPE[0]
        if jnp.finfo(sdt).bits == 8:
            fmax = float(jnp.finfo(sdt).max)
            scores = jnp.clip(scores, -fmax, fmax)
        scores = scores.astype(sdt)
        return jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jax.nn.softmax(scores, axis=-1)


def _attention_bshd(
    q: jnp.ndarray,  # [B, Q, H, D]
    k: jnp.ndarray,  # [B, K, H, D]
    v: jnp.ndarray,  # [B, K, H, D]
    bias: Optional[jnp.ndarray],
    dtype: Dtype,
) -> jnp.ndarray:
    """Attention with Q/K/V in [B, S, H, D] layout (reshape-only heads):
    the einsums contract the head dim in place, so the projection outputs
    are never transposed.  Motivated by the round-4 OOM buffer dump, which
    showed XLA materialising a 96 MB layout-copy of EVERY fusion
    cross-attn K/V projection output under the classic split_heads
    transpose.  Same contractions, same fp32 softmax; returns [B,Q,H*D]
    (heads already merged — the reshape is free)."""
    b, qlen, h, depth = q.shape
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    probs = _masked_softmax(scores / math.sqrt(depth), bias, dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v)
    return out.reshape(b, qlen, h * depth)


def _grouped_attention_bshd(
    q: jnp.ndarray,  # [B, Q, H, D]
    k: jnp.ndarray,  # [B, K, Hk, D], Hk divides H
    v: jnp.ndarray,  # [B, K, Hk, D]
    bias: Optional[jnp.ndarray],
    dtype: Dtype,
) -> jnp.ndarray:
    """GQA in the transpose-free layout: grouped queries reshaped in
    place ([B,Q,Hk,G,D]); K/V projection outputs are never transposed
    (same motivation as _attention_bshd) and never repeated to full
    head count (same as _grouped_attention).  Returns [B,Q,H*D]."""
    b, qlen, h, depth = q.shape
    hk = k.shape[2]
    assert h % hk == 0, f"{h} query heads not divisible by {hk} kv heads"
    qg = q.reshape(b, qlen, hk, h // hk, depth)
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
    )
    terms = bias if isinstance(bias, (tuple, list)) else (
        (bias,) if bias is not None else ()
    )
    for term in terms:
        assert term.shape[1] == 1, "GQA bias must be head-broadcast"
    grouped_bias = tuple(t[:, :, None] for t in terms) or None
    probs = _masked_softmax(scores / math.sqrt(depth), grouped_bias, dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(dtype), v)
    return out.reshape(b, qlen, h * depth)


def _grouped_attention(
    q: jnp.ndarray,  # [B, H, Q, D]
    k: jnp.ndarray,  # [B, Hk, K, D], Hk divides H
    v: jnp.ndarray,  # [B, Hk, K, D]
    bias: Optional[jnp.ndarray],
    dtype: Dtype,
) -> jnp.ndarray:
    """GQA inner loop: queries reshaped [B, Hk, H/Hk, Q, D] so each K/V
    head serves its query group via einsum broadcasting (no repeat)."""
    b, h, qlen, depth = q.shape
    hk = k.shape[1]
    assert h % hk == 0, f"{h} query heads not divisible by {hk} kv heads"
    qg = q.reshape(b, hk, h // hk, qlen, depth)
    scores = jnp.einsum(
        "bhgqd,bhkd->bhgqk", qg, k, preferred_element_type=jnp.float32
    )
    terms = bias if isinstance(bias, (tuple, list)) else (
        (bias,) if bias is not None else ()
    )
    # [B|1, 1, Q|1, K] -> [B|1, 1, 1, Q|1, K]: broadcast over the kv-head
    # and group dims (per-head bias is unsupported here)
    for term in terms:
        assert term.shape[1] == 1, "GQA bias must be head-broadcast"
    grouped_bias = tuple(t[:, :, None] for t in terms) or None
    probs = _masked_softmax(scores / math.sqrt(depth), grouped_bias, dtype)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", probs.astype(dtype), v)
    return out.reshape(b, h, qlen, depth)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


class _LazyDense(nn.Module):
    """Dense whose width defaults to the input's last dim (features=0)."""

    features: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = self.features or x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], feats), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (feats,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class _KVDense(nn.Module):
    """K/V projection sized for ``kv_heads`` of the attention's head_dim.

    With kv_heads == num_heads this is exactly _LazyDense (same param
    names and shapes — checkpoint-compatible); with fewer KV heads the
    kernel is (C, kv_heads * head_dim)."""

    features: int = 0  # full attention width (0 -> infer from input)
    num_heads: int = 1
    kv_heads: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        full = self.features or x.shape[-1]
        feats = full // self.num_heads * self.kv_heads
        kernel = self.param(
            "kernel",
            nn.initializers.normal(stddev=0.02),
            (x.shape[-1], feats),
            jnp.float32,
        )
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        bias = self.param("bias", nn.initializers.zeros, (feats,), jnp.float32)
        return y + bias.astype(self.dtype)


class MultiHeadAttention(nn.Module):
    """Self- or cross-attention with optional additive bias and KV cache.

    The decode cache is caller-managed (pure-functional): pass ``cache_kv``
    = (k_cache, v_cache) of fixed length plus a validity bias; the module
    only computes fresh K/V for the provided kv inputs and the caller
    decides how to merge (see eval/generate.py).  This keeps the module
    shape-static and jit-friendly, unlike the reference's dict-of-tensors
    growing cache (model/bert.py:258-268).
    """

    num_heads: int
    dtype: Dtype = jnp.float32
    dropout: float = 0.0
    features: int = 0  # 0 -> infer from first input
    kv_heads: int = 0  # 0 -> num_heads; <num_heads = grouped-query (GQA)
    out_kernel_init: Callable = nn.initializers.normal(stddev=0.02)

    def setup(self):
        feats = self.features
        # setup-style so K/V projection is reusable for cache precompute.
        # With kv_heads < num_heads the K/V projections are narrower
        # (kv_heads/num_heads of the width) and each K/V head serves a
        # group of query heads (_grouped_attention) — a TPU-native
        # activation/KV-cache-bytes lever the reference has no analogue
        # for (its attention is always full multi-head, model/bert.py:244).
        self._kv_heads = self.kv_heads or self.num_heads
        self.query = _LazyDense(feats, dtype=self.dtype, name="query")
        self.key = _KVDense(
            feats, self.num_heads, self._kv_heads, dtype=self.dtype, name="key"
        )
        self.value = _KVDense(
            feats, self.num_heads, self._kv_heads, dtype=self.dtype, name="value"
        )
        self.out = _LazyDense(
            feats, dtype=self.dtype, kernel_init=self.out_kernel_init, name="out"
        )

    def __call__(
        self,
        q_in: jnp.ndarray,  # [B, Q, C]
        kv_in: Optional[jnp.ndarray],  # [B, K, C] or None (cache-only)
        bias: Optional[jnp.ndarray] = None,
        extra_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        return_kv: bool = False,
    ):
        # NB a fused [C,3C] QKV projection for self-attention (bit-identical
        # numerics, param tree untouched) was measured SLOWER on v5e:
        # 105.6 vs 107.7 samples/s flagship — XLA's async VMEM prefetch
        # pipelines the three separate dots better than one runtime-
        # concatenated kernel it cannot prefetch.  Deleted per the
        # win-or-delete rule; see PERF_NOTES.md round-3 campaign.
        if (
            _ATTN_LAYOUT[0] == "bshd"
            and kv_in is not None
            and extra_kv is None
            and not return_kv
        ):
            # transpose-free layout (see _attention_bshd /
            # _grouped_attention_bshd); cache-carrying paths (decode)
            # keep the classic [B,H,S,D] cache contract
            qp, kp, vp = self.query(q_in), self.key(kv_in), self.value(kv_in)
            b, qlen, c = qp.shape
            d = c // self.num_heads
            klen = kp.shape[1]
            fn = (
                _attention_bshd
                if self._kv_heads == self.num_heads
                else _grouped_attention_bshd
            )
            out = fn(
                qp.reshape(b, qlen, self.num_heads, d),
                kp.reshape(b, klen, self._kv_heads, d),
                vp.reshape(b, klen, self._kv_heads, d),
                bias,
                self.dtype,
            )
            out = maybe_dropout(self, out, self.dropout)
            return self.out(out)
        qh = split_heads(self.query(q_in), self.num_heads)
        if kv_in is not None:
            kh = split_heads(self.key(kv_in), self._kv_heads)
            vh = split_heads(self.value(kv_in), self._kv_heads)
            if extra_kv is not None:
                ek, ev = extra_kv  # [B, H, E, D] pre-split cached keys/values
                kh = jnp.concatenate([kh, ek.astype(kh.dtype)], axis=2)
                vh = jnp.concatenate([vh, ev.astype(vh.dtype)], axis=2)
        else:
            # cache-only attention: keys/values entirely from the cache
            # (decode path: cross-attn K/V precomputed once per rollout)
            assert extra_kv is not None
            kh, vh = (t.astype(qh.dtype) for t in extra_kv)
        out = dot_product_attention(qh, kh, vh, bias=bias, dtype=self.dtype)
        out = merge_heads(out)
        out = maybe_dropout(self, out, self.dropout)
        out = self.out(out)
        if return_kv:
            return out, (kh, vh)
        return out

    def compute_kv(self, kv_in: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Project and split K/V for caching (no attention)."""
        return (
            split_heads(self.key(kv_in), self._kv_heads),
            split_heads(self.value(kv_in), self._kv_heads),
        )


class MlpBlock(nn.Module):
    """Transformer FFN: dense -> act -> dense."""

    intermediate: int
    activation: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        h = Dense(self.intermediate, dtype=self.dtype, name="fc1")(x)
        h = ACT2FN[self.activation](h)
        return Dense(c, dtype=self.dtype, name="fc2")(h)


class PreNormLayer(nn.Module):
    """Pre-norm transformer layer (AST / CLIP style).

    reference: model/transformer.py:74-85 (AST prenorm) and
    model/clip.py:194-197 (CLIP residual block; activation differs).
    """

    num_heads: int
    intermediate: int
    activation: str = "gelu"
    ln_eps: float = 1e-12
    dtype: Dtype = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = LayerNorm(eps=self.ln_eps, dtype=self.dtype, name="ln1")(x)
        h = MultiHeadAttention(self.num_heads, dtype=self.dtype, name="attn")(h, h, bias)
        x = x + maybe_dropout(self, h, self.dropout)
        h = LayerNorm(eps=self.ln_eps, dtype=self.dtype, name="ln2")(x)
        h = MlpBlock(self.intermediate, self.activation, dtype=self.dtype, name="mlp")(h)
        return x + maybe_dropout(self, h, self.dropout)


class PostNormLayer(nn.Module):
    """Post-norm (BERT) layer without cross-attention."""

    num_heads: int
    intermediate: int
    activation: str = "gelu"
    ln_eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = MultiHeadAttention(self.num_heads, dtype=self.dtype, name="attn")(x, x, bias)
        x = LayerNorm(eps=self.ln_eps, dtype=self.dtype, name="ln1")(x + h)
        h = MlpBlock(self.intermediate, self.activation, dtype=self.dtype, name="mlp")(x)
        return LayerNorm(eps=self.ln_eps, dtype=self.dtype, name="ln2")(x + h)
