"""PlenOctree volume rendering — the svox `VolumeRenderer` equivalent.

Parity target: svox's `VolumeRenderer.render_persp` as used by the
reference conversion/eval pipeline (plenoctree/octree/nerf/utils.py:448-499
`eval_octree`, octree/optimization.py:312): per-ray octree queries of
[SH..., sigma] leaves, SH decode against viewdirs followed by sigmoid,
relu'd sigma composited with the standard transmittance recursion, white
background, early stop ("fast" mode) via the stop threshold.

TPU design: fixed-step masked march (static shapes) with the vectorized
fixed-depth tree descent from PlenOctree.query — no per-ray while loops.
Differentiable w.r.t. tree.data (gathers -> scatter-add in AD), which is
what octree finetuning optimizes (SURVEY.md §3.3).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.models.octree import PlenOctree
from nerf_projects_tpu.ops.sh import eval_sh_bases


class OctreeRenderOptions(NamedTuple):
    step_size: float = 1e-3         # march step in tree (unit-cube) units
    sigma_thresh: float = 1e-2      # svox default sigma threshold
    stop_thresh: float = 1e-2       # early-stop transmittance ("fast")
    background_brightness: float = 1.0
    max_steps: Optional[int] = None
    sh_deg: Optional[int] = None    # None = infer from data_dim
    color_mode: str = "sigmoid"     # "sigmoid" (PlenOctree) | "bias"
                                    # (+0.5 clamp, svox2/Plenoxels export)


def infer_sh_deg(data_dim: int) -> int:
    basis = (data_dim - 1) // 3
    deg = int(np.sqrt(basis)) - 1
    if 3 * (deg + 1) ** 2 + 1 != data_dim:
        raise ValueError(f"data_dim {data_dim} is not 3*(d+1)^2+1")
    return deg


def volume_render_octree(
    tree: PlenOctree,
    rays: Rays,
    opts: OctreeRenderOptions = OctreeRenderOptions(),
    *,
    return_depth: bool = False,
):
    """Render [R] rays through the octree -> dict(rgb [R, 3], acc, ...)."""
    sh_deg = (
        opts.sh_deg
        if opts.sh_deg is not None
        else infer_sh_deg(tree.data_dim)
    )
    basis_dim = (sh_deg + 1) ** 2

    inv = jnp.asarray(tree.invradius)
    origins_t = tree.world_to_tree(rays.origins)  # [R, 3]
    dirs_t = rays.directions * inv  # tree units per world-t

    world_len = jnp.linalg.norm(rays.directions, axis=-1)
    tnorm = jnp.linalg.norm(dirs_t, axis=-1)
    dt = opts.step_size / jnp.maximum(tnorm, 1e-12)  # t per step
    step_world = dt * world_len

    inv_d = 1.0 / jnp.where(jnp.abs(dirs_t) < 1e-12, 1e-12, dirs_t)
    t_lo = (0.0 - origins_t) * inv_d
    t_hi = (1.0 - origins_t) * inv_d
    t0 = jnp.maximum(jnp.max(jnp.minimum(t_lo, t_hi), axis=-1), 0.0)
    t1 = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    hit = t1 > t0

    if opts.max_steps is None:
        max_steps = int(np.ceil(np.sqrt(3.0) / opts.step_size)) + 1
    else:
        max_steps = opts.max_steps

    basis = eval_sh_bases(basis_dim, rays.viewdirs)  # [R, B]

    def render_chunkwise(carry, idx):
        """March one step for all rays (scan over steps keeps the peak
        memory at [R, D] instead of [R, S, D])."""
        log_T, rgb_acc, acc, depth_acc = carry
        t = t0 + idx.astype(jnp.float32) * dt
        valid = (t < t1) & hit
        pts_t = origins_t + t[:, None] * dirs_t
        pts_world = tree.tree_to_world(pts_t)
        vals = tree.query(pts_world)  # [R, D]
        sigma = jax.nn.relu(vals[:, -1])
        sigma = jnp.where(valid & (sigma > opts.sigma_thresh), sigma, 0.0)
        coeffs = vals[:, : 3 * basis_dim].reshape(-1, 3, basis_dim)
        decoded = jnp.einsum("rcb,rb->rc", coeffs, basis)
        if opts.color_mode == "sigmoid":
            rgb = jax.nn.sigmoid(decoded)
        elif opts.color_mode == "bias":
            rgb = jnp.maximum(decoded + 0.5, 0.0)
        else:
            raise ValueError(f"unknown color_mode {opts.color_mode!r}")

        T = jnp.exp(log_T)
        active = T > opts.stop_thresh
        tau = sigma * step_world
        alpha = 1.0 - jnp.exp(-tau)
        w = jnp.where(active, T * alpha, 0.0)
        rgb_acc = rgb_acc + w[:, None] * rgb
        depth_acc = depth_acc + w * t * world_len
        acc = acc + w
        log_T = log_T - jnp.where(active, tau, 0.0)
        return (log_T, rgb_acc, acc, depth_acc), None

    n_rays = rays.origins.shape[0]
    init = (
        jnp.zeros(n_rays),
        jnp.zeros((n_rays, 3)),
        jnp.zeros(n_rays),
        jnp.zeros(n_rays),
    )
    (log_T, rgb_acc, acc, depth_acc), _ = jax.lax.scan(
        render_chunkwise, init, jnp.arange(max_steps)
    )
    rgb = rgb_acc + (1.0 - acc[:, None]) * opts.background_brightness
    out = {"rgb": rgb, "acc": acc}
    if return_depth:
        out["depth"] = depth_acc
    return out


def render_image_octree(
    tree: PlenOctree,
    height: int,
    width: int,
    intrinsics,
    c2w,
    opts: OctreeRenderOptions = OctreeRenderOptions(),
    chunk: int = 16384,
):
    """Full-image render (the render_persp equivalent), chunked."""
    from nerf_projects_tpu.core.rays import camera_rays

    rays = camera_rays(height, width, intrinsics, jnp.asarray(c2w))
    flat = jax.tree_util.tree_map(lambda x: x.reshape(-1, 3), rays)
    n = height * width
    render = jax.jit(
        lambda r: volume_render_octree(tree, r, opts)["rgb"]
    )
    outs = []
    for i in range(0, n, chunk):
        sl = jax.tree_util.tree_map(lambda x: x[i : i + chunk], flat)
        pad = chunk - sl.origins.shape[0]
        if pad:
            sl = jax.tree_util.tree_map(
                lambda x: jnp.pad(x, ((0, pad), (0, 0)), mode="edge"), sl
            )
        rgb = render(sl)
        if pad:
            rgb = rgb[:-pad]
        outs.append(rgb)
    return jnp.concatenate(outs, 0).reshape(height, width, 3)
