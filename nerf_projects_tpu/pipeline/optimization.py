"""PlenOctree finetuning on training images.

Parity target: reference plenoctree/octree/optimization.py:141-394 —
SGD (lr ~1e7) or Adam over the tree leaf data, full-image MSE per step
through the octree renderer, validation every `val_interval` epochs,
keeping the best tree and early-stopping when val PSNR drops.

TPU design: one jitted step renders a (chunked) ray batch of a full image
and applies the optimizer update; the tree topology stays fixed so every
step hits one compiled executable.
"""
from __future__ import annotations

from dataclasses import replace
import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.core.rays import camera_rays
from nerf_projects_tpu.models.octree import PlenOctree
from nerf_projects_tpu.obs.metrics import mse2psnr
from nerf_projects_tpu.ops.octree_render import (
    OctreeRenderOptions,
    volume_render_octree,
)


class OctreeFinetuner:
    def __init__(
        self,
        opts: OctreeRenderOptions = OctreeRenderOptions(),
        *,
        optimizer: str = "sgd",
        lr: float = 1e7,
        chunk: int = 8192,
    ):
        if optimizer not in ("sgd", "adam"):
            raise ValueError(optimizer)
        self.opts = opts
        self.optimizer = optimizer
        self.lr = lr
        self.chunk = chunk
        self._step = None
        self._adam_state = None

    def _make_step(self, tree: PlenOctree):
        opts = self.opts
        lr = self.lr
        optimizer = self.optimizer

        def loss_fn(data, rays, target):
            t2 = replace(tree, data=data)
            out = volume_render_octree(t2, rays, opts)
            return jnp.mean((out["rgb"] - target) ** 2)

        if optimizer == "sgd":

            @jax.jit
            def step(data, _state, rays, target):
                mse, g = jax.value_and_grad(loss_fn)(data, rays, target)
                return data - lr * g, _state, mse

        else:

            @jax.jit
            def step(data, state, rays, target):
                m, v, t = state
                mse, g = jax.value_and_grad(loss_fn)(data, rays, target)
                t = t + 1
                m = 0.9 * m + 0.1 * g
                v = 0.999 * v + 0.001 * g * g
                mhat = m / (1 - 0.9**t)
                vhat = v / (1 - 0.999**t)
                data = data - lr * mhat / (jnp.sqrt(vhat) + 1e-8)
                return data, (m, v, t), mse

        return step

    def _image_rays(self, ds, idx):
        rays = camera_rays(ds.height, ds.width, ds.intrinsics, jnp.asarray(ds.poses[idx]))
        return jax.tree_util.tree_map(lambda x: x.reshape(-1, 3), rays)

    def eval_psnr(self, tree: PlenOctree, ds, indices=None) -> float:
        indices = range(ds.images.shape[0]) if indices is None else indices
        render = jax.jit(lambda r: volume_render_octree(tree, r, self.opts)["rgb"])
        psnrs = []
        for v in indices:
            flat = self._image_rays(ds, v)
            n = flat.origins.shape[0]
            outs = []
            for i in range(0, n, self.chunk):
                sl = jax.tree_util.tree_map(lambda x: x[i : i + self.chunk], flat)
                pad = self.chunk - sl.origins.shape[0]
                if pad:
                    sl = jax.tree_util.tree_map(
                        lambda x: jnp.pad(x, ((0, pad), (0, 0)), mode="edge"), sl
                    )
                rgb = render(sl)
                outs.append(rgb[: self.chunk - pad] if pad else rgb)
            img = jnp.concatenate(outs, 0)
            mse = jnp.mean((img - ds.images[v].reshape(-1, 3)) ** 2)
            psnrs.append(float(mse2psnr(mse)))
        return float(np.mean(psnrs))

    def finetune(
        self,
        tree: PlenOctree,
        train_ds,
        val_ds=None,
        *,
        n_epochs: int = 10,
        val_interval: int = 2,
        early_stop: bool = True,
        verbose: bool = False,
    ) -> PlenOctree:
        """Returns the best tree (by val PSNR when val_ds given)."""
        step = self._make_step(tree)
        data = tree.data
        state = (
            (jnp.zeros_like(data), jnp.zeros_like(data), 0)
            if self.optimizer == "adam"
            else None
        )
        best_data = data
        best_psnr = -np.inf
        n_views = train_ds.images.shape[0]
        for epoch in range(n_epochs):
            for v in range(n_views):
                flat = self._image_rays(train_ds, v)
                target_full = jnp.asarray(
                    train_ds.images[v].reshape(-1, 3)
                )
                n = flat.origins.shape[0]
                for i in range(0, n, self.chunk):
                    sl = jax.tree_util.tree_map(
                        lambda x: x[i : i + self.chunk], flat
                    )
                    tgt = target_full[i : i + self.chunk]
                    pad = self.chunk - sl.origins.shape[0]
                    if pad:
                        sl = jax.tree_util.tree_map(
                            lambda x: jnp.pad(x, ((0, pad), (0, 0)), mode="edge"),
                            sl,
                        )
                        tgt = jnp.pad(tgt, ((0, pad), (0, 0)), mode="edge")
                    data, state, mse = step(data, state, sl, tgt)
            if val_ds is not None and (epoch + 1) % val_interval == 0:
                cur = self.eval_psnr(replace(tree, data=data), val_ds)
                if verbose:
                    print(f"epoch {epoch}: val psnr {cur:.2f}")
                if cur > best_psnr:
                    best_psnr = cur
                    best_data = data
                elif early_stop:
                    break
        else:
            if val_ds is None:
                best_data = data
        if val_ds is None:
            best_data = data
        return replace(tree, data=best_data)
