"""Input-pipeline scale + ZeRO optimizer-state sharding.

reference: data/loader.py:154-212 (PrefetchLoader) + torch DataLoader
n_workers; ZeRO has no reference counterpart (SURVEY §2.3: optional
TPU-native extension).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from valor_tpu.data.loader import DataLoader, ShardedBatchSampler


class _SlowDataset:
    """Deterministic items with a simulated decode cost."""

    def __init__(self, n, delay=0.0):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)
        return {"x": np.full((2,), i, np.int32)}


def _collate(items):
    return {"x": np.stack([it["x"] for it in items])}


class TestThreadedLoader:
    def test_order_and_content_match_serial(self):
        ds = _SlowDataset(32)
        mk = lambda w: DataLoader(  # noqa: E731
            ds, ShardedBatchSampler(32, 4, shuffle=True, seed=7), _collate, n_workers=w
        )
        serial = [b["x"].copy() for b in mk(0)]
        threaded = [b["x"].copy() for b in mk(8)]
        assert len(serial) == len(threaded) == 8
        for a, b in zip(serial, threaded):
            np.testing.assert_array_equal(a, b)

    def test_threads_overlap_decode(self):
        """8 workers on a 5ms-per-item dataset must beat serial clearly."""
        ds = _SlowDataset(64, delay=0.005)
        t0 = time.perf_counter()
        list(DataLoader(ds, ShardedBatchSampler(64, 8, shuffle=False), _collate, n_workers=0))
        serial = time.perf_counter() - t0
        t0 = time.perf_counter()
        list(DataLoader(ds, ShardedBatchSampler(64, 8, shuffle=False), _collate, n_workers=8))
        threaded = time.perf_counter() - t0
        assert threaded < serial / 2, (serial, threaded)

    def test_epoch_reshuffle_changes_order(self):
        ds = _SlowDataset(16)
        sampler = ShardedBatchSampler(16, 4, shuffle=True, seed=1)
        loader = DataLoader(ds, sampler, _collate, n_workers=4)
        e0 = np.concatenate([b["x"][:, 0] for b in loader])
        sampler.set_epoch(1)
        e1 = np.concatenate([b["x"][:, 0] for b in loader])
        assert sorted(e0.tolist()) == sorted(e1.tolist())
        assert e0.tolist() != e1.tolist()


    def test_repeat_mode_loops_epochs_in_one_pool(self):
        """repeat=True iterates forever (fresh shuffle per epoch) without
        tearing down the worker pool between epochs."""
        ds = _SlowDataset(8)
        loader = DataLoader(
            ds, ShardedBatchSampler(8, 4, shuffle=True, seed=3), _collate,
            n_workers=4, repeat=True,
        )
        it = iter(loader)
        seen = [next(it)["x"].copy() for _ in range(6)]  # 3 epochs worth
        # every epoch covers all 8 items
        for e in range(3):
            vals = sorted(np.concatenate(seen[2 * e: 2 * e + 2]).ravel().tolist())
            assert vals == sorted(np.repeat(np.arange(8), 2).tolist())
        # epochs reshuffle: not all epochs in the same order
        orders = [np.concatenate(seen[2 * e: 2 * e + 2]).ravel()[::2].tolist() for e in range(3)]
        assert any(o != orders[0] for o in orders[1:])

    def test_slow_consumer_still_sees_end_of_data(self):
        """The producer may finish while the bounded queue is still full
        (consumer behind); the end-of-data sentinel must use the same
        blocking put as the batches — dropping it deadlocks the consumer
        on q.get after draining."""
        ds = _SlowDataset(16)
        loader = DataLoader(
            ds, ShardedBatchSampler(16, 2, shuffle=False), _collate,
            n_workers=2, prefetch_batches=2,
        )
        got = 0
        for _ in loader:
            time.sleep(0.05)  # slower than production -> queue stays full
            got += 1
        assert got == 8  # terminates (no deadlock) with every batch seen

    def test_empty_per_host_sampler_raises_clear_error(self):
        """A train flow smaller than one per-host batch must fail with an
        actionable message, not PEP-479 'generator raised StopIteration'."""
        import pytest as _pytest

        from valor_tpu.data.loader import MetaLoader

        ds = _SlowDataset(2)
        # shuffle=True is the train regime: full lockstep batches only,
        # so 2 items with batch 4 yields zero batches per host
        empty = DataLoader(
            ds, ShardedBatchSampler(2, 4, shuffle=True), _collate,
        )
        ml = MetaLoader({"flow": (empty, 1)})
        with _pytest.raises(ValueError, match="yields no batches"):
            next(iter(ml))

    def test_close_stops_repeat_loader_threads(self):
        """Abandoning a repeat=True iterator parks its feeder thread on a
        full queue forever; close() must unblock it and let the worker
        pool exit — sweeps building several loaders per process (bench
        BENCH_DATA_SWEEP) rely on this to keep points independent."""
        import threading
        import time as _t

        base = threading.active_count()
        ds = _SlowDataset(8)
        loader = DataLoader(
            ds, ShardedBatchSampler(8, 4, shuffle=True, seed=3), _collate,
            n_workers=4, repeat=True,
        )
        it = iter(loader)
        next(it)  # spin up feeder + pool and fill the prefetch queue
        del it  # abandon the iterator (what a finished bench point does)
        loader.close()
        deadline = _t.monotonic() + 10.0
        while threading.active_count() > base and _t.monotonic() < deadline:
            _t.sleep(0.05)
        assert threading.active_count() <= base, (
            threading.active_count(), base)


class TestZeroOptimizerSharding:
    def test_moments_sharded_and_step_equal(self):
        """ZeRO placement shards big moment leaves over `data` and the
        train step stays numerically equal to the replicated one."""
        from tests.conftest import tiny_model_config
        from valor_tpu.core.config import Config, TrainConfig
        from valor_tpu.core.tasks import parse_task
        from valor_tpu.cli.build import build_model_and_state
        from valor_tpu.parallel.mesh import DATA_AXIS, make_mesh, shard_batch
        from valor_tpu.train.step import make_train_step

        assert len(jax.devices()) >= 8
        mesh = make_mesh(n_data=8, n_model=1)
        rng = np.random.RandomState(0)
        txt = rng.randint(106, 500, size=(8, 8)).astype(np.int32)
        txt[:, 0] = 101
        batch = {
            "bert_tokens": txt,
            "clip_tokens": txt,
            "video_pixels": rng.randn(8, 2, 32, 32, 3).astype(np.float32),
        }
        task_str = "pt_contra%tv_caption%tv"
        # fusion_hidden=32 -> moment dim0 ok; size floor forces most tiny
        # leaves replicated, so bump a dimension: vocab table is the big one
        mcfg = tiny_model_config(fusion_vocab=4096)
        losses = {}
        for zero in (False, True):
            cfg = Config(
                model=mcfg,
                train=TrainConfig(num_train_steps=10, zero_optimizer=zero, seed=0),
            )
            model, tx, state = build_model_and_state(
                cfg, {task_str: batch}, mesh=mesh
            )
            if zero:
                sharded = [
                    x
                    for x in jax.tree_util.tree_leaves(state.opt_state)
                    if hasattr(x, "sharding")
                    and isinstance(x.sharding, NamedSharding)
                    and x.sharding.spec
                    and x.sharding.spec[0] == DATA_AXIS
                ]
                assert sharded, "no ZeRO-sharded moment leaves"
            step = make_train_step(model, tx, donate=False)
            _, metrics = step(
                state, shard_batch(mesh, batch), jax.random.PRNGKey(3),
                parse_task(task_str),
            )
            losses[zero] = float(metrics["total_loss"])
        np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


class TestLoaderScaling:
    """Worker-count scaling of the threaded DataLoader (VERDICT round-2
    item 10).  The simulated decode releases the GIL (sleep), exactly like
    the real hot work — native libjpeg decode, C fbank, numpy resize — so
    this measures the loader's concurrency structure itself, independent
    of this CI host's core count.  Substantiates the PERF_NOTES
    extrapolation that a multi-core host hides the per-sample decode cost."""

    def _throughput(self, n_workers, delay=0.01, n=64, bs=8):
        ds = _SlowDataset(n, delay=delay)
        loader = DataLoader(
            ds, ShardedBatchSampler(n, bs, shuffle=False), _collate,
            n_workers=n_workers,
        )
        t0 = time.perf_counter()
        batches = list(loader)
        dt = time.perf_counter() - t0
        assert len(batches) == n // bs
        return n / dt

    def test_near_linear_scaling(self):
        tp = {w: self._throughput(w) for w in (1, 2, 4, 8)}
        eff = {w: tp[w] / (w * tp[1]) for w in (2, 4, 8)}
        # pure GIL-released waiting: the pool must keep w fetches in
        # flight; generous floors absorb CI jitter
        assert tp[2] > 1.4 * tp[1], (tp, eff)
        assert tp[4] > 2.2 * tp[1], (tp, eff)
        assert tp[8] > 3.5 * tp[1], (tp, eff)
        print("loader scaling samples/s:", {k: round(v, 1) for k, v in tp.items()},
              "efficiency:", {k: round(v, 2) for k, v in eff.items()})
