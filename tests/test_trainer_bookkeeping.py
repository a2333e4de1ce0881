"""Trainer bookkeeping: step accounting under gradient accumulation,
per-task metric attribution (incl. the fused-loop flush path), and batched
metric readback.

reference: train_utils.py:277-398 — global_step increments once per
OPTIMIZER update (the accumulation gate), and loss meters are keyed by the
loader/task that produced the batch.
"""

import itertools

import jax.numpy as jnp
import pytest

from tests.conftest import tiny_model_config
from valor_tpu.core.config import Config, TrainConfig


class _StubState:
    """Minimal TrainState stand-in (step only)."""

    def __init__(self, step=0):
        self.step = step


def _make_trainer(tcfg: TrainConfig, meta, inner_steps=1):
    from valor_tpu.train.trainer import Trainer

    cfg = Config(model=tiny_model_config(), train=tcfg)
    trainer = Trainer.__new__(Trainer)
    trainer.cfg = cfg
    trainer.model = None
    trainer.tx = None
    trainer.state = _StubState()
    trainer.meta_loader = meta
    trainer.validate_fn = None
    trainer.saver = None
    trainer.scorer = None
    trainer.inner_steps = inner_steps
    trainer.meters = {}
    trainer.best = {}
    trainer.rng = None
    trainer._task_cache = {}
    trainer._pending_metrics = []
    from valor_tpu.eval.scorer import AdaptiveAlpha

    trainer.alpha = AdaptiveAlpha()
    return trainer


def _stub_step(counter, loss_by_task=None):
    def step(state, batch, rng, task):
        counter.append(task.raw)
        loss = (loss_by_task or {}).get(task.raw, 1.0)
        return _StubState(state.step + 1), {"total_loss": jnp.asarray(loss)}

    return step


class TestStepAccounting:
    def test_accumulation_runs_k_micro_batches_per_step(self):
        """num_train_steps counts optimizer updates: with accum=2 and
        num_train_steps=3 the loop must consume 6 micro-batches."""
        calls = []
        meta = (("ret%tv--a", {"x": 0}) for _ in itertools.count())
        tcfg = TrainConfig(
            num_train_steps=3, gradient_accumulation_steps=2, valid_steps=0
        )
        trainer = _make_trainer(tcfg, meta)
        trainer.train_step = _stub_step(calls)
        trainer.run()
        assert len(calls) == 6

    def test_no_accumulation_unchanged(self):
        calls = []
        meta = (("ret%tv--a", {"x": 0}) for _ in itertools.count())
        tcfg = TrainConfig(num_train_steps=4, valid_steps=0)
        trainer = _make_trainer(tcfg, meta)
        trainer.train_step = _stub_step(calls)
        trainer.run()
        assert len(calls) == 4

    def test_eval_cadence_on_optimizer_steps(self):
        """valid_steps compares against optimizer steps, not micro-batches."""
        calls = []
        evals = []
        meta = (("ret%tv--a", {"x": 0}) for _ in itertools.count())
        tcfg = TrainConfig(
            num_train_steps=4, gradient_accumulation_steps=2, valid_steps=2
        )
        trainer = _make_trainer(tcfg, meta)
        trainer.train_step = _stub_step(calls)
        trainer.evaluate_and_save = lambda step: evals.append(step)
        trainer.run()
        # evals at optimizer step 2, 4 (the final call re-evals at 4)
        assert evals[0] == 2
        assert len(calls) == 8


class TestMetricAttribution:
    def test_two_task_meters(self):
        """Each task's losses land in meters keyed by that task's name."""
        calls = []
        seq = [("ret%tv--A", {"x": 0}), ("cap%tv--B", {"x": 0})] * 3
        tcfg = TrainConfig(num_train_steps=6, valid_steps=0)
        trainer = _make_trainer(tcfg, iter(seq))
        trainer.train_step = _stub_step(
            calls, {"ret%tv": 2.0, "cap%tv": 5.0}
        )
        trainer.run()
        assert "ret%tv--A/total_loss" in trainer.meters
        assert "cap%tv--B/total_loss" in trainer.meters
        assert trainer.meters["ret%tv--A/total_loss"].val == pytest.approx(2.0)
        assert trainer.meters["cap%tv--B/total_loss"].val == pytest.approx(5.0)

    def test_fused_flush_labels_old_task(self):
        """A task switch before a full fused window flushes the buffered
        batches under the OLD task's name (round-1 bug: logged under new)."""
        calls = []
        seq = [("ret%tv--A", {"x": 0}), ("cap%tv--B", {"x": 0}), ("cap%tv--B", {"x": 0})]
        tcfg = TrainConfig(num_train_steps=3, valid_steps=0)
        trainer = _make_trainer(tcfg, iter(seq), inner_steps=2)
        trainer.train_step = _stub_step(calls, {"ret%tv": 2.0, "cap%tv": 5.0})

        def stub_loop(state, stacked, rng, task):
            calls.append(f"loop:{task.raw}")
            return _StubState(state.step + 2), {"total_loss": jnp.asarray(5.0)}

        trainer.train_loop = stub_loop
        trainer.run()
        # single ret batch flushed as a single step under its own name
        assert trainer.meters["ret%tv--A/total_loss"].val == pytest.approx(2.0)
        assert trainer.meters["cap%tv--B/total_loss"].val == pytest.approx(5.0)
        assert "loop:cap%tv" in calls

    def test_fused_tail_flushed_at_loader_exhaustion(self):
        """A finite loader ending mid-window must still train the buffered
        batches: 5 batches with inner_steps=4 -> one fused window (4) plus
        one flushed single step, never 4."""
        calls = []
        seq = [("ret%tv--A", {"x": i}) for i in range(5)]
        tcfg = TrainConfig(num_train_steps=100, valid_steps=0)
        trainer = _make_trainer(tcfg, iter(seq), inner_steps=4)
        trainer.train_step = _stub_step(calls, {"ret%tv": 2.0})

        def stub_loop(state, stacked, rng, task):
            calls.append(f"loop:{task.raw}")
            return _StubState(state.step + 4), {"total_loss": jnp.asarray(2.0)}

        trainer.train_loop = stub_loop
        state = trainer.run()
        assert calls == ["loop:ret%tv", "ret%tv"]  # window + flushed tail
        assert state.step == 5
