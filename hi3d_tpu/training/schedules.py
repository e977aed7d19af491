"""LR-multiplier schedules (use with base_lr, multiplier in [f_min, f_max]).

Functional parity: reference sgm/lr_scheduler.py:4-135
(LambdaWarmUpCosineScheduler, LambdaWarmUpCosineScheduler2,
LambdaLinearScheduler). Hi3D's shipped configs use LambdaLinearScheduler with
one cycle (configs/train-v01.yaml:150-157 via scheduler_config).

Each class is callable on a host int (reference behavior) AND provides
`as_optax(base_lr)` returning a traced-step jnp schedule for optax, so the
whole optimizer update stays inside the jitted train step.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp


class LambdaWarmUpCosineScheduler:
    """Single-cycle linear warmup → cosine decay (lr_scheduler.py:4-49)."""

    def __init__(
        self,
        warm_up_steps: int,
        lr_min: float,
        lr_max: float,
        lr_start: float,
        max_decay_steps: int,
        verbosity_interval: int = 0,
    ):
        self.warm_up_steps = int(warm_up_steps)
        self.lr_min = float(lr_min)
        self.lr_max = float(lr_max)
        self.lr_start = float(lr_start)
        self.max_decay_steps = int(max_decay_steps)

    def schedule(self, n, **kwargs):
        if n < self.warm_up_steps:
            return (
                self.lr_max - self.lr_start
            ) / self.warm_up_steps * n + self.lr_start
        t = (n - self.warm_up_steps) / (self.max_decay_steps - self.warm_up_steps)
        t = min(t, 1.0)
        return self.lr_min + 0.5 * (self.lr_max - self.lr_min) * (
            1 + np.cos(t * np.pi)
        )

    def __call__(self, n, **kwargs):
        return self.schedule(n, **kwargs)

    def as_optax(self, base_lr: float = 1.0):
        def sched(step):
            n = jnp.asarray(step, jnp.float32)
            warm = (
                self.lr_max - self.lr_start
            ) / self.warm_up_steps * n + self.lr_start
            t = jnp.minimum(
                (n - self.warm_up_steps)
                / (self.max_decay_steps - self.warm_up_steps),
                1.0,
            )
            cos = self.lr_min + 0.5 * (self.lr_max - self.lr_min) * (
                1 + jnp.cos(t * jnp.pi)
            )
            return base_lr * jnp.where(n < self.warm_up_steps, warm, cos)

        return sched


class _MultiCycle:
    """Shared cycle bookkeeping for the 2-suffix schedulers."""

    def __init__(
        self,
        warm_up_steps: Sequence[int],
        f_min: Sequence[float],
        f_max: Sequence[float],
        f_start: Sequence[float],
        cycle_lengths: Sequence[int],
        verbosity_interval: int = 0,
    ):
        lens = {
            len(warm_up_steps),
            len(f_min),
            len(f_max),
            len(f_start),
            len(cycle_lengths),
        }
        if len(lens) != 1:
            raise ValueError("all schedule lists must have equal length")
        self.warm_up_steps = [int(v) for v in warm_up_steps]
        self.f_min = [float(v) for v in f_min]
        self.f_max = [float(v) for v in f_max]
        self.f_start = [float(v) for v in f_start]
        self.cycle_lengths = [int(v) for v in cycle_lengths]
        self.cum_cycles = np.cumsum([0] + list(self.cycle_lengths))

    def find_in_interval(self, n) -> int:
        interval = 0
        for cl in self.cum_cycles[1:]:
            if n <= cl:
                return interval
            interval += 1
        return len(self.cycle_lengths) - 1

    def __call__(self, n, **kwargs):
        return self.schedule(n, **kwargs)


class LambdaWarmUpCosineScheduler2(_MultiCycle):
    """Multi-cycle warmup+cosine (lr_scheduler.py:52-114)."""

    def schedule(self, n, **kwargs):
        cycle = self.find_in_interval(n)
        n = n - self.cum_cycles[cycle]
        if n < self.warm_up_steps[cycle]:
            return (
                self.f_max[cycle] - self.f_start[cycle]
            ) / self.warm_up_steps[cycle] * n + self.f_start[cycle]
        t = (n - self.warm_up_steps[cycle]) / (
            self.cycle_lengths[cycle] - self.warm_up_steps[cycle]
        )
        t = min(t, 1.0)
        return self.f_min[cycle] + 0.5 * (self.f_max[cycle] - self.f_min[cycle]) * (
            1 + np.cos(t * np.pi)
        )

    def as_optax(self, base_lr: float = 1.0):
        cum = jnp.asarray(self.cum_cycles[:-1], jnp.float32)

        def sched(step):
            n_all = jnp.asarray(step, jnp.float32)
            cycle = jnp.clip(
                jnp.searchsorted(cum, n_all, side="right") - 1,
                0,
                len(self.cycle_lengths) - 1,
            )
            wu = jnp.asarray(self.warm_up_steps, jnp.float32)[cycle]
            fmin = jnp.asarray(self.f_min, jnp.float32)[cycle]
            fmax = jnp.asarray(self.f_max, jnp.float32)[cycle]
            fstart = jnp.asarray(self.f_start, jnp.float32)[cycle]
            clen = jnp.asarray(self.cycle_lengths, jnp.float32)[cycle]
            n = n_all - cum[cycle]
            warm = (fmax - fstart) / wu * n + fstart
            t = jnp.minimum((n - wu) / (clen - wu), 1.0)
            cos = fmin + 0.5 * (fmax - fmin) * (1 + jnp.cos(t * jnp.pi))
            return base_lr * jnp.where(n < wu, warm, cos)

        return sched


class LambdaLinearScheduler(_MultiCycle):
    """Warmup then linear decay to f_min over the cycle (lr_scheduler.py:117-135)."""

    def schedule(self, n, **kwargs):
        cycle = self.find_in_interval(n)
        n = n - self.cum_cycles[cycle]
        if n < self.warm_up_steps[cycle]:
            return (
                self.f_max[cycle] - self.f_start[cycle]
            ) / self.warm_up_steps[cycle] * n + self.f_start[cycle]
        return self.f_min[cycle] + (self.f_max[cycle] - self.f_min[cycle]) * (
            self.cycle_lengths[cycle] - n
        ) / self.cycle_lengths[cycle]

    def as_optax(self, base_lr: float = 1.0):
        cum = jnp.asarray(self.cum_cycles[:-1], jnp.float32)

        def sched(step):
            n_all = jnp.asarray(step, jnp.float32)
            cycle = jnp.clip(
                jnp.searchsorted(cum, n_all, side="right") - 1,
                0,
                len(self.cycle_lengths) - 1,
            )
            wu = jnp.asarray(self.warm_up_steps, jnp.float32)[cycle]
            fmin = jnp.asarray(self.f_min, jnp.float32)[cycle]
            fmax = jnp.asarray(self.f_max, jnp.float32)[cycle]
            fstart = jnp.asarray(self.f_start, jnp.float32)[cycle]
            clen = jnp.asarray(self.cycle_lengths, jnp.float32)[cycle]
            n = n_all - cum[cycle]
            warm = (fmax - fstart) / wu * n + fstart
            lin = fmin + (fmax - fmin) * (clen - n) / clen
            return base_lr * jnp.where(n < wu, warm, lin)

        return sched
