"""Learning-rate schedules used across the three trainers.

Parity targets:
  * exponential decay `lrate * 0.1^(step / (lrate_decay*1000))` — vanilla
    NeRF (reference nerf/nerf.ipynb cell 19 §8).
  * log-linear lerp with reverse-cosine warmup delay — jaxnerf
    `learning_rate_decay` (reference plenoctree/nerf_sh/nerf/utils.py:483-515).
  * log-lerp with optional delay, per param group — Plenoxels
    `get_expon_lr_func` (reference svox2/opt/util/util.py:78 and
    svox2/opt/opt.py:375-384).

All are pure float functions of the step, usable both host-side and traced.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def exponential_decay(lrate_init: float, lrate_decay: float):
    """Vanilla NeRF schedule: 0.1 decay every lrate_decay*1000 steps."""

    def schedule(step):
        return lrate_init * (0.1 ** (step / (lrate_decay * 1000.0)))

    return schedule


def log_linear_decay(
    lr_init: float,
    lr_final: float,
    max_steps: int,
    *,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
):
    """jaxnerf / Plenoxels log-lerp schedule with reverse-cosine warmup.

    lr(step) = delay_rate(step) * exp(lerp(log lr_init, log lr_final, t)),
    t = clip(step/max_steps, 0, 1); the delay ramps from lr_delay_mult to 1
    over lr_delay_steps with a smooth half-cosine.
    """

    def schedule(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            np.log(lr_init) * (1.0 - t) + np.log(lr_final) * t
        )
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(jnp.asarray(step, jnp.float32) / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        return delay_rate * log_lerp

    return schedule
