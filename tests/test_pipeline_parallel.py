"""Pipeline parallelism (parallel/pipeline.py) vs the sequential stack.

The reference has no pipeline parallelism (train_utils.py:46 — DDP only);
this is a TPU-native extension.  Parity oracle: applying the same layers
sequentially on one device.  Runs on the 8-device CPU mesh (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valor_tpu.ops.layers import PostNormLayer
from valor_tpu.parallel.pipeline import (
    make_pipe_mesh,
    pipeline_apply,
    pipeline_layers,
    stack_params,
)

WIDTH, HEADS, INTER, LAYERS = 32, 4, 64, 8


@pytest.fixture(scope="module")
def stack():
    """L independently-initialised PostNorm layers + a batch."""
    layer = PostNormLayer(num_heads=HEADS, intermediate=INTER)
    x0 = jnp.zeros((2, 6, WIDTH))
    params = [
        layer.init(jax.random.PRNGKey(i), x0)["params"] for i in range(LAYERS)
    ]
    apply_one = lambda p, h: layer.apply({"params": p}, h)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 6, WIDTH), jnp.float32)
    return apply_one, stack_params(params), x


def sequential(apply_one, stacked, x):
    def body(h, p):
        return apply_one(p, h), None

    h, _ = jax.lax.scan(body, x, stacked)
    return h


@pytest.mark.parametrize("n_pipe,n_micro", [(4, 4), (4, 8), (8, 2), (2, 1)])
def test_forward_matches_sequential(stack, n_pipe, n_micro):
    apply_one, stacked, x = stack
    mesh = make_pipe_mesh(n_pipe)
    ref = sequential(apply_one, stacked, x)
    out = jax.jit(
        lambda p, v: pipeline_layers(apply_one, p, v, mesh, n_micro)
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize(
    "n_pipe,n_micro,interleave",
    [(2, 4, 2), (2, 2, 2), (4, 4, 2), (2, 2, 4), (4, 8, 2)],
)
def test_interleaved_matches_sequential(stack, n_pipe, n_micro, interleave):
    """Megatron-style interleaved schedule (V virtual stages per device):
    closed-form group scheduling in the same ring — forward parity vs the
    sequential stack at every (S, M, V) combination that divides LAYERS."""
    apply_one, stacked, x = stack
    if LAYERS % (n_pipe * interleave):
        pytest.skip("layers do not divide into S*V blocks")
    mesh = make_pipe_mesh(n_pipe)
    ref = sequential(apply_one, stacked, x)
    out = jax.jit(
        lambda p, v: pipeline_layers(
            apply_one, p, v, mesh, n_micro, interleave=interleave
        )
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_interleaved_grad_matches_sequential(stack):
    apply_one, stacked, x = stack
    mesh = make_pipe_mesh(4)

    def loss_pipe(p):
        return jnp.sum(
            pipeline_layers(apply_one, p, x, mesh, 4, interleave=2) ** 2
        )

    def loss_seq(p):
        return jnp.sum(sequential(apply_one, p, x) ** 2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_pipe), jax.tree_util.tree_leaves(g_seq)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3
        )


def test_interleaved_requires_group_divisibility(stack):
    """M % S != 0 cannot run the group schedule — loud error, no silent
    wrong answer."""
    apply_one, stacked, x = stack
    mesh = make_pipe_mesh(4)
    with pytest.raises(ValueError, match="M % S"):
        pipeline_layers(apply_one, stacked, x, mesh, 2, interleave=2)


def test_grad_matches_sequential(stack):
    """AD through scan+ppermute gives the reverse-flow pipeline for free."""
    apply_one, stacked, x = stack
    mesh = make_pipe_mesh(4)

    def loss_seq(p, v):
        return jnp.sum(sequential(apply_one, p, v) ** 2)

    def loss_pipe(p, v):
        return jnp.sum(pipeline_layers(apply_one, p, v, mesh, 4) ** 2)

    g_ref = jax.grad(loss_seq, argnums=(0, 1))(stacked, x)
    g_pipe = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(stacked, x)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pipe)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-4)


def test_dp_x_pp(stack):
    """2-way data x 4-way pipe: batch sharded over data, same numbers."""
    apply_one, stacked, x = stack
    mesh = make_pipe_mesh(4, n_data=2)
    ref = sequential(apply_one, stacked, x)
    out = jax.jit(
        lambda p, v: pipeline_layers(
            apply_one, p, v, mesh, 4, shard_batch_over_data=True
        )
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # and the gradient (AD must psum the replicated params over data)
    g_ref = jax.grad(
        lambda p: jnp.sum(sequential(apply_one, p, x) ** 2)
    )(stacked)
    g_pipe = jax.jit(
        jax.grad(
            lambda p: jnp.sum(
                pipeline_layers(
                    apply_one, p, x, mesh, 4, shard_batch_over_data=True
                )
                ** 2
            )
        )
    )(stacked)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pipe)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-4)


def test_stage_fn_api(stack):
    """pipeline_apply with a hand-built stage_fn (non-layer granularity)."""
    apply_one, stacked, x = stack
    mesh = make_pipe_mesh(4)
    staged = jax.tree_util.tree_map(
        lambda p: p.reshape(4, 2, *p.shape[1:]), stacked
    )

    def stage_fn(blk, h):
        h = apply_one(jax.tree_util.tree_map(lambda p: p[0], blk), h)
        return apply_one(jax.tree_util.tree_map(lambda p: p[1], blk), h)

    out = pipeline_apply(stage_fn, staged, x, mesh, 4)
    ref = sequential(apply_one, stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_errors(stack):
    apply_one, stacked, x = stack
    mesh = make_pipe_mesh(4)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_layers(apply_one, stacked, x[:7], mesh, 4)
    with pytest.raises(ValueError, match="divide"):
        # 8 layers do not divide into 3 stages
        pipeline_layers(apply_one, stacked, x, make_pipe_mesh(3), 4)
    with pytest.raises(ValueError, match="devices"):
        make_pipe_mesh(4, n_data=4)
