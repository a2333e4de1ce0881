"""Tracing / profiling / debug-mode subsystem.

The reference has essentially none of this (SURVEY.md §5: an unused
verbose_time flag).  First-class here:

  * trace(): jax.profiler trace context -> Perfetto/XProf dump dir,
  * StepTimer: wall-clock phase accounting (data / step / eval) with EMA,
  * enable_debug(): NaN checks (jax_debug_nans) + disable jit for
    interactive debugging — the role torch.autograd.set_detect_anomaly
    plays in the reference's commented-out line (train_utils.py:36).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax

from valor_tpu.core.logging import LOGGER, RunningMeter


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Profile everything inside the context to `log_dir` (Perfetto/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        LOGGER.info(f"profiler trace written to {log_dir}")


def annotate(name: str):
    """Named region visible in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


def enable_debug(nan_checks: bool = True, disable_jit: bool = False) -> None:
    if nan_checks:
        jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)
    LOGGER.info(f"debug mode: nan_checks={nan_checks} disable_jit={disable_jit}")


class StepTimer:
    """Per-phase wall-clock meter: timer.phase('data'): ... ."""

    def __init__(self) -> None:
        self.meters: Dict[str, RunningMeter] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self.meters:
                self.meters[name] = RunningMeter(f"time/{name}", smooth=0.9)
            self.meters[name](dt)

    def summary(self) -> Dict[str, float]:
        return {m.name: m.val for m in self.meters.values() if m.val is not None}
