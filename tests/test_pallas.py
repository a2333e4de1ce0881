"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from valor_tpu.ops.pallas.layernorm import fused_layernorm


def ref_layernorm(x, w, b, eps=1e-12):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * w + b


class TestFusedLayerNorm:
    def test_forward_parity(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(6, 10, 128), jnp.float32)
        w = jnp.asarray(rng.randn(128), jnp.float32)
        b = jnp.asarray(rng.randn(128), jnp.float32)
        y = fused_layernorm(x, w, b, 1e-12, 8, True)
        ref = ref_layernorm(x, w, b)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_grad_parity(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(4, 128), jnp.float32)
        w = jnp.asarray(rng.rand(128) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(128), jnp.float32)

        def f_pallas(x, w, b):
            return jnp.sum(jnp.sin(fused_layernorm(x, w, b, 1e-12, 8, True)))

        def f_ref(x, w, b):
            return jnp.sum(jnp.sin(ref_layernorm(x, w, b)))

        gp = jax.grad(f_pallas, argnums=(0, 1, 2))(x, w, b)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)
        for a, r in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-4)

    def test_row_padding(self):
        # row count not divisible by block_rows
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(5, 128), jnp.float32)
        w = jnp.ones(128)
        b = jnp.zeros(128)
        y = fused_layernorm(x, w, b, 1e-12, 8, True)
        ref = ref_layernorm(x, w, b)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-5)
