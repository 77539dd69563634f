"""Learning-rate schedules.

Parity set with reference utils/misc_utils.py:129-148 `config_learning_rate`
(fixed / exponential-staircase / cosine with lower bound / cosine restarts
t_mul=2 / piecewise) plus the linear warm-up wrapper from train.py:93-96.
All schedules are pure jnp functions of the global step, usable inside jit.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def fixed(lr: float) -> Schedule:
    return lambda step: jnp.float32(lr)


def exponential(lr_init: float, decay_steps: int, decay_factor: float,
                lower_bound: float = 0.0) -> Schedule:
    """Staircase exponential decay with a floor
    (misc_utils.py:130-133 incl. the tf.maximum lower bound)."""
    def fn(step):
        p = jnp.floor(step.astype(jnp.float32) / decay_steps)
        return jnp.maximum(lr_init * decay_factor ** p, lower_bound)
    return fn


def cosine(lr_init: float, total_steps: int, lower_bound: float = 0.0
           ) -> Schedule:
    """lower + 0.5*(init-lower)*(1+cos(pi*step/total)) (misc_utils.py:134-137;
    note the reference does NOT clamp step/total at 1, so we don't either)."""
    def fn(step):
        t = step.astype(jnp.float32) / float(total_steps)
        return lower_bound + 0.5 * (lr_init - lower_bound) * (
            1.0 + jnp.cos(t * np.pi))
    return fn


def cosine_restarts(lr_init: float, first_decay_steps: int,
                    t_mul: float = 2.0, m_mul: float = 1.0,
                    alpha: float = 0.0) -> Schedule:
    """SGDR warm restarts, tf.train.cosine_decay_restarts parity
    (misc_utils.py:138-141 uses t_mul=2.0, m_mul=1.0)."""
    def fn(step):
        s = step.astype(jnp.float32) / float(first_decay_steps)
        if t_mul == 1.0:
            i_restart = jnp.floor(s)
            frac = s - i_restart
        else:
            # number of completed cycles n solves sum_{k<n} t_mul^k <= s
            i_restart = jnp.floor(
                jnp.log1p(s * (t_mul - 1.0)) / np.log(t_mul))
            sum_r = (t_mul ** i_restart - 1.0) / (t_mul - 1.0)
            frac = (s - sum_r) / t_mul ** i_restart
        m_fac = m_mul ** i_restart
        cosine_decayed = 0.5 * m_fac * (1.0 + jnp.cos(np.pi * frac))
        return lr_init * ((1 - alpha) * cosine_decayed + alpha)
    return fn


def piecewise(boundaries: Sequence[float], values: Sequence[float]
              ) -> Schedule:
    """tf.train.piecewise_constant parity (misc_utils.py:144-146)."""
    assert len(values) == len(boundaries) + 1
    bs = jnp.asarray(boundaries, jnp.float32)
    vs = jnp.asarray(values, jnp.float32)

    def fn(step):
        idx = jnp.sum(step.astype(jnp.float32) >= bs)
        return vs[idx]
    return fn


def with_warmup(schedule: Schedule, lr_init: float, warmup_steps: int
                ) -> Schedule:
    """Linear warm-up for the first `warmup_steps`, then `schedule` applied
    to (step - warmup_steps) — exactly train.py:93-96."""
    def fn(step):
        step = step.astype(jnp.float32)
        warm = lr_init * step / float(max(warmup_steps, 1))
        return jnp.where(step < warmup_steps, warm,
                         schedule(step - warmup_steps))
    return fn


def build_schedule(cfg) -> Schedule:
    """Build the schedule described by a finalized Config
    (train.py:93-98 + misc_utils.py:129-148)."""
    t = cfg.train
    total = cfg.train_batch_num or 1
    if t.lr_type == "fixed":
        sched = fixed(t.learning_rate_init)
    elif t.lr_type == "exponential":
        sched = exponential(t.learning_rate_init, max(cfg.lr_decay_freq, 1),
                            t.lr_decay_factor, t.lr_lower_bound)
    elif t.lr_type == "cosine_decay":
        train_steps = max(
            int((t.total_epochs - float(t.use_warm_up) * t.warm_up_epoch)
                * total), 1)
        sched = cosine(t.learning_rate_init, train_steps, t.lr_lower_bound)
    elif t.lr_type == "cosine_decay_restart":
        sched = cosine_restarts(t.learning_rate_init, max(cfg.lr_decay_freq, 1))
    elif t.lr_type == "piecewise":
        boundaries = cfg.pw_boundaries_steps or tuple(
            float(b) * total for b in t.pw_boundaries)
        sched = piecewise(boundaries, t.pw_values)
    else:
        raise ValueError(f"unsupported lr_type: {t.lr_type!r}")
    if t.use_warm_up:
        sched = with_warmup(sched, t.learning_rate_init,
                            int(t.warm_up_epoch * total))
    return sched
