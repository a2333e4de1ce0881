"""Grouped-query cross-attention (fusion_cross_attn_kv_heads).

Round-4 activation-bytes lever: the per-layer media K/V (and the decode
cross-KV cache) shrink by num_heads/kv_heads.  The reference has no
analogue (model/bert.py:244 is always full multi-head); this is an opt-in
TPU-native extension like MoE/SP/PP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valor_tpu.models.bert import BertConfig, BertFusionEncoder
from valor_tpu.ops.layers import MultiHeadAttention, dot_product_attention


class TestGroupedAttentionOp:
    def test_matches_repeated_kv(self):
        """GQA == full attention with each K/V head explicitly repeated
        over its query group."""
        r = np.random.RandomState(0)
        q = jnp.asarray(r.randn(2, 8, 10, 4), jnp.float32)
        k = jnp.asarray(r.randn(2, 2, 7, 4), jnp.float32)
        v = jnp.asarray(r.randn(2, 2, 7, 4), jnp.float32)
        bias = jnp.asarray(r.randn(2, 1, 10, 7) * 0.1, jnp.float32)
        out = dot_product_attention(q, k, v, bias=bias)
        kr = jnp.repeat(k, 4, axis=1)
        vr = jnp.repeat(v, 4, axis=1)
        ref = dot_product_attention(q, kr, vr, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_bias_tuple_terms(self):
        r = np.random.RandomState(1)
        q = jnp.asarray(r.randn(2, 4, 6, 4), jnp.float32)
        k = jnp.asarray(r.randn(2, 2, 5, 4), jnp.float32)
        v = jnp.asarray(r.randn(2, 2, 5, 4), jnp.float32)
        pad = jnp.asarray(r.randn(2, 1, 1, 5), jnp.float32)
        struct = jnp.asarray(r.randn(1, 1, 6, 5), jnp.float32)
        out = dot_product_attention(q, k, v, bias=(pad, struct))
        ref = dot_product_attention(
            q, jnp.repeat(k, 2, 1), jnp.repeat(v, 2, 1), bias=(pad, struct)
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestMultiHeadAttentionKVHeads:
    def test_default_param_tree_unchanged(self):
        """kv_heads=0 produces the exact param shapes of the original
        module (checkpoint compatibility)."""
        x = jnp.zeros((2, 5, 16))
        base = MultiHeadAttention(4).init(jax.random.PRNGKey(0), x, x)
        gqa0 = MultiHeadAttention(4, kv_heads=0).init(jax.random.PRNGKey(0), x, x)
        assert jax.tree_util.tree_structure(base) == jax.tree_util.tree_structure(gqa0)
        for a, b in zip(
            jax.tree_util.tree_leaves(base), jax.tree_util.tree_leaves(gqa0)
        ):
            assert a.shape == b.shape

    def test_narrow_kv_params_and_output(self):
        x = jnp.asarray(np.random.RandomState(2).randn(2, 5, 16), jnp.float32)
        mem = jnp.asarray(np.random.RandomState(3).randn(2, 9, 16), jnp.float32)
        mod = MultiHeadAttention(4, kv_heads=2)
        params = mod.init(jax.random.PRNGKey(0), x, mem)["params"]
        assert params["key"]["kernel"].shape == (16, 8)  # 2 heads * d=4
        assert params["value"]["kernel"].shape == (16, 8)
        assert params["query"]["kernel"].shape == (16, 16)
        out = mod.apply({"params": params}, x, mem)
        assert out.shape == (2, 5, 16)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_cache_path_matches_direct(self):
        """compute_kv -> cache-only attention == direct attention (the
        decode path carries Hk-head caches)."""
        x = jnp.asarray(np.random.RandomState(4).randn(2, 5, 16), jnp.float32)
        mem = jnp.asarray(np.random.RandomState(5).randn(2, 9, 16), jnp.float32)
        mod = MultiHeadAttention(4, kv_heads=2)
        params = mod.init(jax.random.PRNGKey(0), x, mem)["params"]
        direct = mod.apply({"params": params}, x, mem)
        kv = mod.apply({"params": params}, mem, method=mod.compute_kv)
        assert kv[0].shape == (2, 2, 9, 4)
        cached = mod.apply({"params": params}, x, None, extra_kv=kv)
        np.testing.assert_allclose(
            np.asarray(cached), np.asarray(direct), atol=1e-5
        )


class TestFusionGQA:
    CFG = dict(
        vocab_size=128,
        hidden_size=16,
        num_layers=2,
        num_heads=4,
        intermediate=32,
        dropout=0.0,
        has_cross_attn=True,
    )

    def _inputs(self):
        r = np.random.RandomState(6)
        toks = r.randint(5, 100, size=(2, 6)).astype(np.int32)
        toks[:, 0] = 101
        video = jnp.asarray(r.randn(2, 5, 16), jnp.float32)
        audio = jnp.asarray(r.randn(2, 3, 16), jnp.float32)
        return jnp.asarray(toks), video, audio

    @pytest.mark.parametrize(
        "topo", ["va_concate", "va_parallel", "video_audio"]
    )
    def test_forward_and_grads(self, topo):
        toks, video, audio = self._inputs()
        cfg = BertConfig(cross_attn_type=topo, cross_attn_kv_heads=2, **self.CFG)
        enc = BertFusionEncoder(cfg)
        params = enc.init(jax.random.PRNGKey(0), toks, None, video, audio)["params"]

        def loss(p):
            out = enc.apply({"params": p}, toks, None, video, audio)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        val, g = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_param_savings(self):
        toks, video, audio = self._inputs()
        full = BertConfig(cross_attn_type="va_concate", **self.CFG)
        gqa = BertConfig(
            cross_attn_type="va_concate", cross_attn_kv_heads=1, **self.CFG
        )
        n = lambda cfg: sum(
            x.size
            for x in jax.tree_util.tree_leaves(
                BertFusionEncoder(cfg).init(
                    jax.random.PRNGKey(0), toks, None, video, audio
                )
            )
        )
        assert n(gqa) < n(full)

    def test_indivisible_heads_rejected(self):
        toks, video, audio = self._inputs()
        cfg = BertConfig(
            cross_attn_type="va_concate", cross_attn_kv_heads=3, **self.CFG
        )
        with pytest.raises(ValueError, match="divisible"):
            BertFusionEncoder(cfg).init(
                jax.random.PRNGKey(0), toks, None, video, audio
            )
