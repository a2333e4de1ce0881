"""Transpose-free attention layout (ModelConfig.attention_layout='bshd').

The round-4 OOM buffer dump showed XLA materialising a 96 MB layout-copy
of every fusion cross-attn K/V projection output under the classic
split_heads transpose; the bshd layout keeps Q/K/V in [B,S,H,D] and lets
the einsums contract the head dim in place.  Same contractions, same fp32
softmax — these tests pin numerical parity across the module surfaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valor_tpu.models.bert import BertConfig, BertFusionEncoder
from valor_tpu.ops.layers import MultiHeadAttention, set_attention_layout


@pytest.fixture(autouse=True)
def _restore():
    # each test computes its reference under the classic bhsd layout,
    # then switches to bshd (the production default) and asserts parity
    set_attention_layout("bhsd")
    yield
    set_attention_layout("bshd")


class TestBshdParity:
    def _mod_and_inputs(self):
        r = np.random.RandomState(0)
        x = jnp.asarray(r.randn(2, 7, 16), jnp.float32)
        mem = jnp.asarray(r.randn(2, 9, 16), jnp.float32)
        bias = jnp.asarray(r.randn(2, 1, 7, 9) * 0.2, jnp.float32)
        mod = MultiHeadAttention(4)
        params = mod.init(jax.random.PRNGKey(0), x, mem)["params"]
        return mod, params, x, mem, bias

    def test_cross_attention_parity(self):
        mod, params, x, mem, bias = self._mod_and_inputs()
        ref = mod.apply({"params": params}, x, mem, bias)
        set_attention_layout("bshd")
        out = mod.apply({"params": params}, x, mem, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_self_attention_parity_with_bias_tuple(self):
        mod, params, x, _, _ = self._mod_and_inputs()
        r = np.random.RandomState(1)
        pad = jnp.asarray(r.randn(2, 1, 1, 7), jnp.float32)
        struct = jnp.asarray(r.randn(1, 1, 7, 7), jnp.float32)
        ref = mod.apply({"params": params}, x, x, (pad, struct))
        set_attention_layout("bshd")
        out = mod.apply({"params": params}, x, x, (pad, struct))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_grads_parity(self):
        mod, params, x, mem, bias = self._mod_and_inputs()

        def loss(p, v):
            return jnp.sum(mod.apply({"params": p}, v, mem, bias) ** 2)

        ref = jax.grad(loss)(params, x)
        set_attention_layout("bshd")
        out = jax.grad(loss)(params, x)
        for a, b in zip(
            jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_cache_paths_keep_classic_contract(self):
        """return_kv / extra_kv (decode) still produce and consume
        [B,H,S,D] caches under the bshd switch."""
        mod, params, x, mem, _ = self._mod_and_inputs()
        set_attention_layout("bshd")
        out, kv = mod.apply({"params": params}, x, mem, return_kv=True)
        assert kv[0].shape == (2, 4, 9, 4)
        cached = mod.apply({"params": params}, x, None, extra_kv=kv)
        direct = mod.apply({"params": params}, x, mem)
        np.testing.assert_allclose(
            np.asarray(cached), np.asarray(direct), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(direct), atol=1e-5
        )


class TestGroupedBshdParity:
    """GQA (kv_heads < num_heads) under the transpose-free layout."""

    def _mod_and_inputs(self):
        r = np.random.RandomState(3)
        x = jnp.asarray(r.randn(2, 7, 16), jnp.float32)
        mem = jnp.asarray(r.randn(2, 9, 16), jnp.float32)
        pad = jnp.asarray(r.randn(2, 1, 1, 9) * 0.2, jnp.float32)
        mod = MultiHeadAttention(4, kv_heads=2)
        params = mod.init(jax.random.PRNGKey(0), x, mem)["params"]
        return mod, params, x, mem, pad

    def test_grouped_cross_attention_parity(self):
        mod, params, x, mem, pad = self._mod_and_inputs()
        ref = mod.apply({"params": params}, x, mem, (pad,))
        set_attention_layout("bshd")
        out = mod.apply({"params": params}, x, mem, (pad,))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_grouped_grads_parity(self):
        mod, params, x, mem, pad = self._mod_and_inputs()

        def loss(p, v):
            return jnp.sum(mod.apply({"params": p}, v, mem, (pad,)) ** 2)

        ref = jax.grad(loss)(params, x)
        set_attention_layout("bshd")
        out = jax.grad(loss)(params, x)
        for a, b in zip(
            jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_grouped_decode_cache_unchanged(self):
        """return_kv / extra_kv still route through the classic grouped
        path (the cache contract is [B,Hk,S,D]) under bshd."""
        mod, params, x, mem, _ = self._mod_and_inputs()
        set_attention_layout("bshd")
        out, kv = mod.apply({"params": params}, x, mem, return_kv=True)
        assert kv[0].shape == (2, 2, 9, 4)
        cached = mod.apply({"params": params}, x, None, extra_kv=kv)
        direct = mod.apply({"params": params}, x, mem)
        np.testing.assert_allclose(
            np.asarray(cached), np.asarray(direct), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(direct), atol=1e-5
        )


class TestFusionEncoderBshd:
    def test_full_encoder_parity(self):
        r = np.random.RandomState(2)
        toks = r.randint(5, 100, size=(2, 6)).astype(np.int32)
        toks[:, 0] = 101
        toks = jnp.asarray(toks)
        video = jnp.asarray(r.randn(2, 5, 16), jnp.float32)
        audio = jnp.asarray(r.randn(2, 3, 16), jnp.float32)
        cfg = BertConfig(
            vocab_size=128, hidden_size=16, num_layers=2, num_heads=4,
            intermediate=32, dropout=0.0, has_cross_attn=True,
            cross_attn_type="va_concate",
        )
        enc = BertFusionEncoder(cfg)
        params = enc.init(jax.random.PRNGKey(0), toks, None, video, audio)["params"]
        ref = enc.apply({"params": params}, toks, None, video, audio, causal=True)
        set_attention_layout("bshd")
        out = enc.apply({"params": params}, toks, None, video, audio, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
