"""OneCycle-style cosine schedule over Adam's beta1.

Rebuild of ``/root/reference/mimikit/loops/beta_scheduler.py`` as an optax
transform: beta1 anneals ``initial -> max -> min`` with cosine phases.  Built
and wire-able but (like the reference) not in the default training path.
"""
from __future__ import annotations

import math

import optax

__all__ = ["beta_schedule", "adam_with_beta_schedule"]


def beta_schedule(
    max_beta: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
):
    """Returns step -> beta1 value (cosine warmup then cosine decay)."""
    initial = max_beta / div_factor
    final = initial / final_div_factor
    up_steps = max(1, int(pct_start * total_steps))
    down_steps = max(1, total_steps - up_steps)

    def schedule(step):
        step = min(step, total_steps)
        if step < up_steps:
            pct = step / up_steps
            return initial + (max_beta - initial) * (
                1 - math.cos(math.pi * pct)
            ) / 2
        pct = (step - up_steps) / down_steps
        return max_beta + (final - max_beta) * (1 - math.cos(math.pi * pct)) / 2

    return schedule


def adam_with_beta_schedule(
    learning_rate,
    max_beta: float,
    total_steps: int,
    b2: float = 0.999,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
):
    """Adam whose b1 follows the beta schedule (via inject_hyperparams)."""
    sched = beta_schedule(
        max_beta, total_steps, pct_start, div_factor, final_div_factor
    )

    @optax.inject_hyperparams
    def make(b1):
        return optax.adam(learning_rate, b1=b1, b2=b2)

    tx = make(b1=sched(0))

    def schedule_fn(step):
        return {"b1": sched(int(step))}

    return tx, schedule_fn
