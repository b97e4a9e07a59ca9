"""NeRF-SH training driver (the jaxnerf-style trainer, TPU-native).

Parity target: reference plenoctree/nerf_sh/train.py:61-131 (`train_step`):
  loss = MSE(fine) + MSE(coarse) + sparsity + weight_decay_mult * weight_l2
  * sparsity loss: sigma at uniform random points in a cube of radius
    `sparsity_radius`, loss = w * (1 - mean(exp(-length * relu(sigma))));
  * weight_l2 = sum(p^2)/num_params over ALL params;
  * Adam with the jaxnerf log-lerp LR schedule.

TPU design: instead of pmap + lax.pmean, the step is one jit over sharded
ray batches (params replicated); XLA derives the ICI gradient all-reduce
from the shardings. Stats come back per-step as scalars.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.models.nerf_sh import NeRFSHModel
from nerf_projects_tpu.train.schedules import log_linear_decay


class SHTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    key: jax.Array


class NeRFSHTrainer:
    def __init__(
        self,
        model: NeRFSHModel,
        *,
        lr_init: float = 5e-4,
        lr_final: float = 5e-6,
        max_steps: int = 1_000_000,
        lr_delay_steps: int = 2500,
        lr_delay_mult: float = 0.01,
        sparsity_weight: float = 0.0,
        sparsity_length: float = 0.05,
        sparsity_npoints: int = 10000,
        sparsity_radius: float = 1.5,
        weight_decay_mult: float = 0.0,
        randomized: bool = True,
    ):
        self.model = model
        self.sparsity_weight = sparsity_weight
        self.sparsity_length = sparsity_length
        self.sparsity_npoints = sparsity_npoints
        self.sparsity_radius = sparsity_radius
        self.weight_decay_mult = weight_decay_mult
        self.randomized = randomized
        self.schedule = log_linear_decay(
            lr_init,
            lr_final,
            max_steps,
            lr_delay_steps=lr_delay_steps,
            lr_delay_mult=lr_delay_mult,
        )
        self.tx = optax.adam(learning_rate=self.schedule)

    def init_state(self, key: jax.Array) -> SHTrainState:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        n = 4
        d = jax.random.normal(k2, (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = Rays(jnp.zeros((n, 3)), d, d)
        params = self.model.init(k1, k2, k3, rays, False)
        return SHTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            key=k4,
        )

    def loss_fn(self, params, keys, rays: Rays, pixels: jnp.ndarray):
        k0, k1, k2 = keys
        ret = self.model.apply(params, k0, k1, rays, self.randomized)
        rgb = ret[-1].rgb
        loss = jnp.mean((rgb - pixels[..., :3]) ** 2)
        psnr = -10.0 * jnp.log(loss) / jnp.log(10.0)
        stats = {"loss": loss, "psnr": psnr}
        total = loss
        if len(ret) > 1:
            loss_c = jnp.mean((ret[0].rgb - pixels[..., :3]) ** 2)
            stats["loss_c"] = loss_c
            stats["psnr_c"] = -10.0 * jnp.log(loss_c) / jnp.log(10.0)
            total = total + loss_c
        if self.sparsity_weight > 0:
            pts = jax.random.uniform(
                k2,
                (self.sparsity_npoints, 3),
                minval=-self.sparsity_radius,
                maxval=self.sparsity_radius,
            )
            _, sp_sigma = self.model.apply(
                params, pts, method=self.model.eval_points_raw
            )
            sp_sigma = jax.nn.relu(sp_sigma)
            loss_sp = self.sparsity_weight * (
                1.0 - jnp.mean(jnp.exp(-self.sparsity_length * sp_sigma))
            )
            stats["loss_sp"] = loss_sp
            total = total + loss_sp
        if self.weight_decay_mult > 0:
            leaves = jax.tree_util.tree_leaves(params)
            sq = sum(jnp.sum(p**2) for p in leaves)
            n = sum(p.size for p in leaves)
            weight_l2 = sq / n
            stats["weight_l2"] = weight_l2
            total = total + self.weight_decay_mult * weight_l2
        return total, stats

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: SHTrainState, rays: Rays, pixels: jnp.ndarray):
        key, k0, k1, k2 = jax.random.split(state.key, 4)
        (_, stats), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            state.params, (k0, k1, k2), rays, pixels
        )
        updates, opt_state = self.tx.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        return (
            SHTrainState(state.step + 1, params, opt_state, key),
            stats,
        )

    @functools.partial(jax.jit, static_argnums=0)
    def render_eval(self, params, rays: Rays):
        ret = self.model.apply(params, None, None, rays, False)
        fine = ret[-1]
        return {"rgb": fine.rgb, "disp": fine.disp, "acc": fine.acc}
