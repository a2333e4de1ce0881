"""Logging, metric meters, and (optional) TensorBoard plumbing.

TPU-native replacement for the reference's utils/logger.py:17-99:
  * a process-0-only global LOGGER with optional file handler
  * an EMA RunningMeter (smooth=0.99) for per-loss smoothing
  * a TensorBoard wrapper with an internal global step (no-op if
    tensorboardX is unavailable; we never hard-depend on it)
"""

from __future__ import annotations

import logging
import math
import os
import sys
from typing import Dict, Optional

_LOG_FMT = "%(asctime)s - %(levelname)s - %(name)s -   %(message)s"
_DATE_FMT = "%m/%d/%Y %H:%M:%S"

logging.basicConfig(format=_LOG_FMT, datefmt=_DATE_FMT, level=logging.INFO)
LOGGER = logging.getLogger("valor_tpu")


def add_log_to_file(log_path: str) -> None:
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    fh = logging.FileHandler(log_path)
    fh.setFormatter(logging.Formatter(_LOG_FMT, datefmt=_DATE_FMT))
    LOGGER.addHandler(fh)


def is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # pragma: no cover - jax not initialised
        return True


class RunningMeter:
    """Exponential-moving-average meter (reference: utils/logger.py:72-98)."""

    def __init__(self, name: str, val: Optional[float] = None, smooth: float = 0.99):
        self._name = name
        self._sm = smooth
        self._val = val

    def __call__(self, value: float) -> None:
        value = float(value)
        if math.isnan(value) or math.isinf(value):
            return
        self._val = (
            value
            if self._val is None
            else self._val * self._sm + value * (1 - self._sm)
        )

    @property
    def val(self) -> Optional[float]:
        return self._val

    @property
    def name(self) -> str:
        return self._name

    def __str__(self) -> str:
        return f"{self._name}: {self._val:.4f}" if self._val is not None else f"{self._name}: n/a"


class TensorboardLogger:
    """Global-step-tracking TB wrapper (reference: utils/logger.py:27-69).

    Becomes a silent no-op when tensorboardX / torch SummaryWriter is absent.
    """

    def __init__(self) -> None:
        self._writer = None
        self._global_step = 0

    def create(self, path: str) -> None:
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._writer = SummaryWriter(path)
        except Exception:
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._writer = SummaryWriter(path)
            except Exception:
                LOGGER.info("tensorboard unavailable; scalar logging disabled")
                self._writer = None

    def set_step(self, step: int) -> None:
        self._global_step = step

    def step(self) -> None:
        self._global_step += 1

    @property
    def global_step(self) -> int:
        return self._global_step

    def add_scalar(self, tag: str, value: float, step: Optional[int] = None) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step if step is not None else self._global_step)

    def log_scalar_dict(self, d: Dict[str, float], prefix: str = "") -> None:
        for k, v in d.items():
            self.add_scalar(f"{prefix}{k}", float(v))


TB_LOGGER = TensorboardLogger()


class NoOp:
    """Swallow-everything stub used on non-main processes."""

    def __getattr__(self, _):  # noqa: ANN001
        return lambda *a, **k: None
