"""Fused multi-step train loop (lax.scan) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import tiny_model_config
from tests.test_model import make_batch
from valor_tpu.core.config import TrainConfig
from valor_tpu.core.tasks import parse_task
from valor_tpu.models.valor import VALORModel
from valor_tpu.train.optimizer import build_optimizer
from valor_tpu.train.step import TrainState, make_train_loop, make_train_step


class TestTrainLoop:
    def test_scan_matches_sequential(self):
        cfg = tiny_model_config()
        task = parse_task("ret%tv")
        batches = [make_batch(jax.random.PRNGKey(i)) for i in range(3)]
        model = VALORModel(cfg)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            batches[0], task, True, True,
        )["params"]
        tcfg = TrainConfig(num_train_steps=100, learning_rate=1e-3, clip_lr=1e-3, clip_lr_text=1e-3)
        tx = build_optimizer(params, tcfg)

        # sequential reference
        step = make_train_step(model, tx, donate=False)
        s1 = TrainState.create(params, tx)
        rng = jax.random.PRNGKey(7)
        for b in batches:
            s1, m1 = step(s1, b, rng, task)

        # fused scan over the same stacked batches
        loop = make_train_loop(model, tx, 3, donate=False)
        s2 = TrainState.create(params, tx)
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
        s2, m2 = loop(s2, stacked, rng, task)

        assert int(s2.step) == int(s1.step) == 3
        a = jax.tree_util.tree_leaves(s1.params)
        b_ = jax.tree_util.tree_leaves(s2.params)
        for x, y in zip(a, b_):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-5)
        assert np.isfinite(float(m2["total_loss"]))
