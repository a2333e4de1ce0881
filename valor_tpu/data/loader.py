"""Multi-dataset mixing, per-host sharding, and device prefetch.

Replaces the reference loader stack (data/loader.py):
  * MetaLoader (:75-124): per-step random task choice, synchronized across
    processes.  The reference broadcasts the choice over NCCL
    (any_broadcast, utils/distributed.py:146); here every host draws from
    the SAME seeded python Random, so the choice agrees with zero
    communication — the JAX single-program model makes the collective
    unnecessary.
  * AccumMetaLoader (:22-66): deterministic round-robin for grad accum.
  * DistributedSampler_wopadding (utils/distributed.py:161-189): per-host
    contiguous shard with drop-tail semantics.
  * PrefetchLoader (:154-212): CUDA side-stream H2D overlap becomes an
    async device_put one batch ahead (dispatch is async in JAX; the copy
    overlaps the running step).
"""

from __future__ import annotations

import random
import threading
import queue as queue_mod
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple


class ShardedBatchSampler:
    """Per-host strided shard (``order[shard::n_shards]`` — the reference's
    DistributedSampler_wopadding subsample, utils/distributed.py:185).

    Train (``shuffle=True``): every shard yields the SAME number of full
    batches — (n_items // n_shards) // batch_size, computed globally — so
    SPMD hosts stay in lockstep.  Eval (``shuffle=False``): every item is
    covered exactly once across shards; the final batch may be ragged and
    shard sizes may differ by one (multihost eval gathers per-host lists,
    so ragged shards are fine — dropping gallery items would silently
    clip retrieval metrics)."""

    def __init__(
        self,
        n_items: int,
        batch_size: int,
        shard: int = 0,
        n_shards: int = 1,
        shuffle: bool = True,
        seed: int = 0,
    ):
        self.n_items = n_items
        self.batch_size = batch_size
        self.shard = shard
        self.n_shards = n_shards
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _my_items(self) -> List[int]:
        order = list(range(self.n_items))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(order)
        return order[self.shard :: self.n_shards]

    def __iter__(self) -> Iterator[List[int]]:
        mine = self._my_items()
        n_batches = len(self)
        for b in range(n_batches):
            yield mine[b * self.batch_size : (b + 1) * self.batch_size]

    def __len__(self) -> int:
        if self.shuffle:  # identical on every shard
            return (self.n_items // self.n_shards) // self.batch_size
        mine = self.n_items // self.n_shards + int(
            self.shard < self.n_items % self.n_shards
        )
        return -(-mine // self.batch_size)


class DataLoader:
    """Map-style loader: sampler -> dataset -> collate.

    ``n_workers`` threads fetch samples concurrently (the hot work — native
    libjpeg decode, C fbank, numpy resize — releases the GIL, so threads
    scale like the reference's worker processes without pickling batches);
    two batches of sample futures stay in flight ahead of the consumer, and
    a background thread runs collate + hands batches over a small queue.
    Replaces the reference's torch DataLoader(n_workers) fork pool
    (train_utils.py:423-486)."""

    def __init__(
        self,
        dataset,
        sampler: ShardedBatchSampler,
        collate_fn: Callable,
        n_workers: int = 0,
        prefetch_batches: int = 2,
        repeat: bool = False,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.collate_fn = collate_fn
        self.n_workers = n_workers
        self.prefetch_batches = max(prefetch_batches, 1)
        self._stop = threading.Event()
        # repeat=True: iterate epochs forever INSIDE one worker pool
        # (sampler epoch bumped for a fresh shuffle each pass).  Restarting
        # iteration from outside instead tears down the pool and drains the
        # prefetch pipeline every epoch — ruinous on small datasets (the
        # per-epoch refill gap is prefetch_batches * batch build time).
        self.repeat = repeat

    def _batch_indices(self) -> Iterator[Any]:
        epoch = 0
        while True:
            yield from self.sampler
            if not self.repeat:
                return
            epoch += 1
            self.sampler.set_epoch(epoch)

    def _produce(self) -> Iterator[Any]:
        if self.n_workers <= 1:
            for batch_idx in self._batch_indices():
                yield self.collate_fn([self.dataset[i] for i in batch_idx])
            return
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(self.n_workers) as pool:
            it = self._batch_indices()
            pending: deque = deque()

            def submit():
                idx = next(it, None)
                if idx is not None:
                    pending.append([pool.submit(self.dataset.__getitem__, i) for i in idx])

            for _ in range(self.prefetch_batches):
                submit()
            while pending and not self._stop.is_set():
                futs = pending.popleft()
                submit()  # keep the pool fed while we block on results
                yield self.collate_fn([f.result() for f in futs])

    def __iter__(self) -> Iterator[Any]:
        if self.n_workers <= 0:
            yield from self._produce()
            return
        q: queue_mod.Queue = queue_mod.Queue(maxsize=max(2, self.prefetch_batches))
        sentinel = object()

        def interruptible_put(item) -> bool:
            """Blocking put that aborts on close(); True if delivered.
            A repeat=True producer whose consumer walked away would
            otherwise park on q.put forever, leaking the worker pool and
            its decoded batches."""
            while not self._stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def work():
            try:
                for b in self._produce():
                    if not interruptible_put(b):
                        return
            finally:
                # the sentinel must use the SAME interruptible blocking
                # put: a full queue here usually means the consumer is
                # merely behind, and dropping the sentinel would leave it
                # blocked on q.get forever after draining (end of a
                # finite loader with a slow consumer)
                interruptible_put(sentinel)
        t = threading.Thread(target=work, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is sentinel:
                break
            yield b

    def close(self):
        """Terminally stop background production.  repeat=True loaders
        never exhaust on their own; abandoning their iterator leaves the
        feeder thread parked on a full queue and the worker pool (plus
        ~prefetch_batches decoded batches) alive for the process
        lifetime.  Sweeps that build several loaders in one process
        (bench BENCH_DATA_SWEEP) must close each point before timing the
        next, or the leaked workers contaminate the measurement."""
        self._stop.set()

    def __len__(self) -> int:
        return len(self.sampler)


class MetaLoader:
    """Random task mixing with a shared-seed synchronized choice."""

    def __init__(
        self,
        loaders: Dict[str, Tuple[Any, int]],
        accum_steps: int = 1,
        seed: int = 0,
        mix_type: str = "random",  # 'random' | 'accum' (round-robin)
    ):
        self.name2loader = {}
        self.name2iter = {}
        self.pool: List[str] = []
        for name, spec in loaders.items():
            loader, ratio = spec if isinstance(spec, tuple) else (spec, 1)
            self.name2loader[name] = loader
            self.name2iter[name] = iter(loader)
            self.pool.extend([name] * ratio)
        self.accum_steps = accum_steps
        self.rng = random.Random(seed)  # same seed on every host
        self.mix_type = mix_type
        self.step = 0
        self.epoch = 0
        self.names = list(self.name2loader)

    def _next_task(self) -> str:
        if self.mix_type == "accum":
            return self.names[(self.step // self.accum_steps) % len(self.names)]
        if self.step % self.accum_steps == 0:
            self._task = self.rng.choice(self.pool)
        return self._task

    def __iter__(self):
        while True:
            task = self._next_task()
            self.step += 1
            try:
                batch = next(self.name2iter[task])
            except StopIteration:
                self.epoch += 1
                self.name2loader[task].sampler.set_epoch(self.epoch)
                self.name2iter[task] = iter(self.name2loader[task])
                try:
                    batch = next(self.name2iter[task])
                except StopIteration:
                    # a fresh iterator yielding nothing means the per-host
                    # sampler is EMPTY ((n_items // n_hosts) // batch < 1);
                    # re-raising StopIteration inside this generator would
                    # surface as PEP-479 "RuntimeError: generator raised
                    # StopIteration" with no hint at the cause
                    raise ValueError(
                        f"train flow {task!r} yields no batches: the "
                        "dataset is smaller than one per-host batch "
                        "(shrink batch_size or the host count)"
                    ) from None
            yield task, batch


class DevicePrefetcher:
    """Keep one device batch in flight (PrefetchLoader equivalent)."""

    def __init__(self, it: Iterator, put_fn: Callable[[Any], Any]):
        self.it = iter(it)
        self.put = put_fn
        self._next = None
        self._advance()

    def _advance(self):
        try:
            item = next(self.it)
        except StopIteration:
            self._next = None
            return
        if isinstance(item, tuple):
            task, batch = item
            self._next = (task, self.put(batch))
        else:
            self._next = self.put(item)

    def __iter__(self):
        while self._next is not None:
            out = self._next
            self._advance()  # dispatch the next H2D while caller computes
            yield out
