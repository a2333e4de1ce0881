"""LR ratio schedules.

reference: optim/sched.py:15-41 — a scalar ratio in [0,1] computed from
progress x = step / num_train_steps, multiplied onto each param group's
init_lr every step (train_utils.py:344-347).  Here each group's optax
schedule is ``init_lr * ratio(step)`` directly.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_linear(x, warmup_ratio):
    """Triangular: ramp to 1 at warmup, linear decay to 0 at x=1."""
    warm = x / warmup_ratio
    decay = jnp.maximum((x - 1.0) / (warmup_ratio - 1.0), 0.0)
    return jnp.where(x < warmup_ratio, warm, decay)


def warmup_cosine(x, warmup_ratio):
    warm = x / warmup_ratio
    decay = 0.5 * (1.0 + jnp.cos(jnp.pi * x))
    return jnp.where(x < warmup_ratio, warm, decay)


def warmup_constant(x, warmup_ratio):
    return jnp.where(x < warmup_ratio, x / warmup_ratio, 1.0)


_SCHEDULES = {
    "warmup_linear": warmup_linear,
    "warmup_cosine": warmup_cosine,
    "warmup_constant": warmup_constant,
}


def make_schedule(name: str, init_lr: float, num_train_steps: int, warmup_ratio: float):
    fn = _SCHEDULES[name]
    denom = max(num_train_steps, 1)

    def schedule(step):
        # optax counts updates 0-based; the reference bumps global_step
        # before setting the LR (train_utils.py:342-347), i.e. 1-based
        x = (jnp.asarray(step, jnp.float32) + 1.0) / denom
        return init_lr * fn(x, warmup_ratio)

    return schedule
