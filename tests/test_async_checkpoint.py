"""Async checkpointing: orbax AsyncCheckpointer behind
TrainConfig.async_checkpoint (train/checkpoints.py).

The reference blocks the whole job on torch.save every eval interval
(utils/save.py:38-64); the async saver commits in a background thread and
defers filesystem bookkeeping (best copy, previous-step cleanup) until the
write that produced it is durable — so a crash mid-write can never have
deleted the previous good checkpoint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tests.test_e2e import fixture_root  # noqa: F401  (fixture reuse)
from valor_tpu.train.checkpoints import ModelSaver
from valor_tpu.train.step import TrainState


def make_state(v: float) -> TrainState:
    return TrainState.create({"w": jnp.full((3,), v, jnp.float32)}, optax.sgd(0.1))


class TestAsyncCheckpoint:
    def test_deferred_bookkeeping_ordering(self, tmp_path):
        out = tmp_path / "out"
        saver = ModelSaver(str(out), use_async=True)
        assert saver.use_async

        saver.save(make_state(1.0), 1, best_name="ret")
        # the write is (possibly) still in flight; bookkeeping deferred
        assert saver._pending == (1, "ret")

        saver.save(make_state(2.0), 2)
        # save(2) drained save(1) first: best copied from step_1, and
        # step_1 itself must still exist (cleanup only runs once the NEXT
        # write is durable)
        assert saver._pending == (2, None)
        ckpt = out / "ckpt"
        assert (ckpt / "best_ret").exists()
        assert (ckpt / "step_1").exists()

        saver.finish()
        assert saver._pending is None
        assert not (ckpt / "step_1").exists()  # cleaned after step_2 durable
        assert (ckpt / "step_2").exists()
        saver.finish()  # idempotent

    def test_roundtrip_and_best_content(self, tmp_path):
        out = tmp_path / "out"
        saver = ModelSaver(str(out), use_async=True)
        saver.save(make_state(1.0), 1, best_name="ret")
        saver.save(make_state(2.0), 2)

        # restore() drains the in-flight write itself
        restored = saver.restore(make_state(0.0))
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["w"]), np.full(3, 2.0, np.float32)
        )
        assert restored["step"] == 2

        # best_ret holds step 1's params (copied before step_1 was removed)
        import orbax.checkpoint as ocp

        template = {
            "params": {"w": jnp.zeros((3,), jnp.float32)},
            "opt_state": make_state(0.0).opt_state,
            "step": 0,
            "micro_step": 0,
        }
        best = ocp.StandardCheckpointer().restore(
            str((out / "ckpt" / "best_ret").resolve()), template
        )
        np.testing.assert_array_equal(
            np.asarray(best["params"]["w"]), np.full(3, 1.0, np.float32)
        )

    def test_sync_default_unchanged(self, tmp_path):
        saver = ModelSaver(str(tmp_path / "out"))
        assert not saver.use_async
        saver.save(make_state(3.0), 1)
        # no pending state, checkpoint immediately durable
        assert saver._pending is None
        assert saver.latest_step() == 1

    def test_trainer_drains_async_writes(self, fixture_root, tmp_path):
        """Trainer.run() must finish() the saver so the final checkpoint is
        durable when run returns."""
        from tests.test_e2e import build_everything
        from valor_tpu.train.trainer import Trainer

        cfg, model, tx, state, meta, tok = build_everything(fixture_root, num_steps=2)
        saver = ModelSaver(str(tmp_path / "out"), use_async=True)
        trainer = Trainer(cfg, model, tx, state, meta, saver=saver)
        final = trainer.run()
        assert saver._pending is None  # run() drained the in-flight write
        assert saver.latest_step() == 2
        restored = saver.restore(state)
        a = jax.tree_util.tree_leaves(final.params)
        b = jax.tree_util.tree_leaves(restored["params"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
