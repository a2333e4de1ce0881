"""MoE FFN (ops/moe.py): routing/dispatch parity, capacity drops, EP.

No reference counterpart (the reference's FFNs are dense); the oracle is
an explicit per-expert dense loop over the same params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valor_tpu.ops.moe import (
    MoEMlpBlock,
    expert_sharding_applied,
    set_expert_sharding,
)
from valor_tpu.parallel.mesh import make_mesh

G, S, M, H, E = 2, 8, 16, 32, 4


def make(top_k=2, capacity_factor=8.0, num_experts=E):
    m = MoEMlpBlock(
        num_experts=num_experts,
        intermediate=H,
        top_k=top_k,
        capacity_factor=capacity_factor,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(G, S, M), jnp.float32)
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    return m, params, x


def dense_reference(params, x, top_k):
    """Per-token weighted sum of the selected experts' dense FFNs."""
    logits = np.einsum("gsm,me->gse", np.asarray(x), np.asarray(params["router"]))
    gates = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    w2, b2 = np.asarray(params["w2"]), np.asarray(params["b2"])
    y = np.zeros_like(np.asarray(x))
    for g in range(x.shape[0]):
        for s in range(x.shape[1]):
            order = np.argsort(-gates[g, s])[:top_k]
            wsum = gates[g, s, order].sum()
            for e_i in order:
                h = np.asarray(
                    jax.nn.gelu(jnp.asarray(x[g, s] @ w1[e_i] + b1[e_i]), approximate=False)
                )
                y[g, s] += (gates[g, s, e_i] / wsum) * (h @ w2[e_i] + b2[e_i])
    return y


@pytest.mark.parametrize("top_k", [1, 2])
def test_matches_dense_loop(top_k):
    """With ample capacity, MoE == explicit per-token expert mixture."""
    m, params, x = make(top_k=top_k)
    y, aux = jax.jit(lambda p, v: m.apply({"params": p}, v))(params, x)
    ref = dense_reference(params, x, top_k)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
    assert np.isfinite(float(aux)) and float(aux) >= 1.0 - 1e-6


def test_capacity_drop_passthrough():
    """capacity_factor so small that slots overflow: dropped tokens get a
    zero update (residual semantics), kept tokens still match the oracle."""
    m, params, x = make(top_k=1, capacity_factor=1e-6)  # cap == 1 slot/expert
    y, _ = m.apply({"params": params}, x)
    y = np.asarray(y)
    ref = dense_reference(params, x, 1)
    logits = np.einsum("gsm,me->gse", np.asarray(x), np.asarray(params["router"]))
    first = np.argmax(logits, axis=-1)  # [G,S]
    n_kept = n_dropped = 0
    for g in range(G):
        claimed = set()
        for s in range(S):  # earlier tokens claim the single slot
            if first[g, s] in claimed:
                np.testing.assert_allclose(y[g, s], 0.0, atol=1e-6)
                n_dropped += 1
            else:
                claimed.add(first[g, s])
                np.testing.assert_allclose(y[g, s], ref[g, s], atol=1e-5)
                n_kept += 1
    assert n_kept and n_dropped, "fixture must exercise both outcomes"


def test_expert_parallel_sharding():
    """EP over the model axis: same numbers, constraint sites engaged."""
    m, params, x = make(top_k=2)
    ref, _ = m.apply({"params": params}, x)
    mesh = make_mesh(n_data=2, n_model=4)
    set_expert_sharding(mesh)
    try:
        y, aux = jax.jit(lambda p, v: m.apply({"params": p}, v))(params, x)
        y.block_until_ready()
        assert expert_sharding_applied() > 0
    finally:
        set_expert_sharding(None)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
    assert np.isfinite(float(aux))


def test_grads_finite_and_balanced_loss_gradient():
    """Total loss (task + aux) differentiates; router gets a gradient."""
    m, params, x = make(top_k=2)

    def loss(p):
        y, aux = m.apply({"params": p}, x)
        return jnp.sum(y**2) + 0.01 * aux

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert float(jnp.abs(g["router"]).sum()) > 0.0


def test_validation():
    m = MoEMlpBlock(num_experts=4, intermediate=H, top_k=5)
    x = jnp.zeros((G, S, M))
    with pytest.raises(ValueError, match="top_k"):
        m.init(jax.random.PRNGKey(0), x)
    m2 = MoEMlpBlock(num_experts=4, intermediate=H)
    with pytest.raises(ValueError, match="G, S, M"):
        m2.init(jax.random.PRNGKey(0), jnp.zeros((S, M)))
