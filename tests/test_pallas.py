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


class TestFineScoreFused:
    """fine_score_fused vs tasks/losses.fine_score (the golden-tested jnp
    path) — unaligned A/B/T/V/D, real 0/1 masks, negative-similarity rows
    (the padding-penalty edge case: a max must be allowed to be negative)."""

    def _inputs(self, seed, a=9, b=21, t=7, v=5, d=48):
        rng = np.random.RandomState(seed)
        fa = jnp.asarray(rng.randn(a, t, d), jnp.float32)
        fb = jnp.asarray(rng.randn(b, v, d), jnp.float32)
        ma = jnp.asarray((rng.rand(a, t) > 0.3), jnp.float32)
        ma = ma.at[:, 0].set(1.0)  # every row keeps >=1 valid token
        mb = jnp.ones((b, v), jnp.float32)
        wa = jnp.asarray(rng.randn(a, t), jnp.float32)
        wb = jnp.asarray(rng.randn(b, v), jnp.float32)
        return fa, fb, ma, mb, wa, wb

    def test_parity_unaligned(self):
        from valor_tpu.ops.pallas.fine_score import fine_score_fused
        from valor_tpu.tasks.losses import fine_score

        args = self._inputs(0)
        ref = fine_score(*args)
        got = fine_score_fused(*args, block_a=8, block_b=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_parity_negative_rows(self):
        """All-negative similarities: T-padding must not inject a 0 into
        the gallery-side max."""
        from valor_tpu.ops.pallas.fine_score import fine_score_fused
        from valor_tpu.tasks.losses import fine_score

        fa, fb, ma, mb, wa, wb = self._inputs(1, a=4, b=4, t=3, v=2, d=16)
        # force every dot negative: opposite-sign constant features
        fa = jnp.abs(fa)
        fb = -jnp.abs(fb)
        ma = jnp.ones_like(ma)  # no masked-zero entries on either side
        ref = fine_score(fa, fb, ma, mb, wa, wb)
        got = fine_score_fused(fa, fb, ma, mb, wa, wb, block_a=8, block_b=128, interpret=True)
        assert float(np.max(np.asarray(ref))) < 0  # the edge case is live
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_parity_masked_tokens_zero_semantics(self):
        """Reference multiplicative masking: a masked token contributes a
        literal 0 to the maxes (NOT -inf)."""
        from valor_tpu.ops.pallas.fine_score import fine_score_fused
        from valor_tpu.tasks.losses import fine_score

        fa, fb, ma, mb, wa, wb = self._inputs(2, a=5, b=6, t=4, v=3, d=32)
        fa = -jnp.abs(fa)  # real tokens dot negative -> masked 0 wins max
        fb = jnp.abs(fb)
        ma = ma.at[:, 1].set(0.0)
        ref = fine_score(fa, fb, ma, mb, wa, wb)
        got = fine_score_fused(fa, fb, ma, mb, wa, wb, block_a=8, block_b=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
