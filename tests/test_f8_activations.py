"""Float8 activation-byte knobs (round-4 perf rung: the roofline says the
step is pinned at ~93% of HBM peak and the remaining bytes are the model's
own activations — PERF_NOTES.md round-3 roofline).

Two storage-dtype levers, both leaving matmul compute in bf16:
  * gelu_stash_dtype: the gelu backward reads a float8 copy of the fc1
    pre-activation instead of the compute-dtype residual AD would save.
    Forward is BIT-identical; only gelu'(x) sees the quantisation.
  * attention_logits_dtype='float8_*': the materialised [B,H,Q,K] logits
    are stored f8 (clamped to the finite range so the NEG_INF mask
    saturates instead of overflowing e4m3fn to NaN).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valor_tpu.ops.layers import (
    NEG_INF,
    dot_product_attention,
    gelu_exact,
    set_gelu_stash_dtype,
    set_scores_dtype,
)


@pytest.fixture(autouse=True)
def _restore_knobs():
    yield
    set_gelu_stash_dtype(None)
    set_scores_dtype(None)


class TestGeluStash:
    def test_forward_bit_identical(self):
        x = jnp.asarray(np.random.RandomState(0).randn(64, 128), jnp.bfloat16)
        ref = gelu_exact(x)
        set_gelu_stash_dtype("float8_e4m3fn")
        out = gelu_exact(x)
        assert out.dtype == ref.dtype
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(ref, np.float32)
        )

    def test_backward_within_f8_envelope(self):
        """grad through the stash == exact gelu' evaluated at the f8-rounded
        input — i.e. the ONLY error is the input quantisation (~6% relative
        for e4m3), not an algorithmic one."""
        x = jnp.asarray(
            np.random.RandomState(1).randn(512) * 2.0, jnp.bfloat16
        )

        def loss(fn, v):
            return jnp.sum(fn(v).astype(jnp.float32) ** 2)

        g_ref = jax.grad(lambda v: loss(gelu_exact, v))(x)
        set_gelu_stash_dtype("float8_e4m3fn")
        g_f8 = jax.grad(lambda v: loss(gelu_exact, v))(x)
        gr = np.asarray(g_ref, np.float32)
        gf = np.asarray(g_f8, np.float32)
        assert np.all(np.isfinite(gf))
        # tight correlation, bounded relative error on the bulk
        c = np.corrcoef(gr, gf)[0, 1]
        assert c > 0.999, c
        denom = np.maximum(np.abs(gr), 1e-2)
        assert np.median(np.abs(gf - gr) / denom) < 0.05

    def test_fp32_path_unaffected(self):
        """The stash only engages for half-precision activations: fp32
        models (strict-parity eval) keep exact AD."""
        set_gelu_stash_dtype("float8_e4m3fn")
        x = jnp.asarray(np.random.RandomState(2).randn(64), jnp.float32)
        g = jax.grad(lambda v: jnp.sum(gelu_exact(v) ** 2))(x)
        g_ref = jax.grad(
            lambda v: jnp.sum(jax.nn.gelu(v, approximate=False) ** 2)
        )(x)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))


class TestF8Scores:
    def _qkv(self, b=2, h=4, q=16, k=16, d=8):
        r = np.random.RandomState(3)
        return (
            jnp.asarray(r.randn(b, h, q, d), jnp.bfloat16),
            jnp.asarray(r.randn(b, h, k, d), jnp.bfloat16),
            jnp.asarray(r.randn(b, h, k, d), jnp.bfloat16),
        )

    @pytest.mark.parametrize("sdt", ["float8_e4m3fn", "float8_e5m2"])
    def test_masked_attention_finite_and_close(self, sdt):
        q, k, v = self._qkv()
        # padding mask with NEG_INF (overflows e4m3fn without the clamp)
        bias = np.zeros((2, 1, 1, 16), np.float32)
        bias[:, :, :, 12:] = NEG_INF
        bias = jnp.asarray(bias)
        ref = dot_product_attention(q, k, v, bias=bias, dtype=jnp.bfloat16)
        set_scores_dtype(sdt)
        out = dot_product_attention(q, k, v, bias=bias, dtype=jnp.bfloat16)
        o, r_ = np.asarray(out, np.float32), np.asarray(ref, np.float32)
        assert np.all(np.isfinite(o))
        # e4m3 logit rounding perturbs the softmax mildly; rank-robust
        assert np.corrcoef(o.ravel(), r_.ravel())[0, 1] > 0.98

    def test_masked_positions_still_zero(self):
        """exp(clamped NEG) must still be exactly 0: a masked key gets no
        weight even after f8 saturation."""
        q, k, _ = self._qkv()
        # v rows at masked positions get a huge value: any leak would show
        v = np.zeros((2, 4, 16, 8), np.float32)
        v[:, :, 12:, :] = 1e4
        bias = np.zeros((2, 1, 1, 16), np.float32)
        bias[:, :, :, 12:] = NEG_INF
        set_scores_dtype("float8_e4m3fn")
        out = dot_product_attention(
            q, k, jnp.asarray(v, jnp.bfloat16), bias=jnp.asarray(bias),
            dtype=jnp.bfloat16,
        )
        assert float(jnp.max(jnp.abs(out))) < 50.0

    def test_grads_finite(self):
        q, k, v = self._qkv()
        set_scores_dtype("float8_e5m2")

        def loss(qq):
            return jnp.sum(
                dot_product_attention(qq, k, v, dtype=jnp.bfloat16).astype(
                    jnp.float32
                )
                ** 2
            )

        g = jax.grad(loss)(q)
        assert np.all(np.isfinite(np.asarray(g, np.float32)))
