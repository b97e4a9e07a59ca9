"""Procedural synthetic scenes for tests and dataset-free benchmarking.

The reference repo ships no data either — its tests render from
checkpoints or compare kernels on random grids (SURVEY.md §4). Here we go
further: an analytic volume scene (constant-density colored spheres) whose
ground-truth images are produced by the same compositing math at a very
fine step count, so trainers can be exercised end-to-end (loss -> PSNR)
hermetically, on any backend.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.core.rays import Rays, camera_rays
from nerf_projects_tpu.ops.render import volumetric_rendering


class SphereScene(NamedTuple):
    centers: jnp.ndarray  # [S, 3]
    radii: jnp.ndarray    # [S]
    colors: jnp.ndarray   # [S, 3]
    density: float


def default_scene() -> SphereScene:
    return SphereScene(
        centers=jnp.array(
            [[0.0, 0.0, 0.0], [0.6, 0.4, -0.2], [-0.5, -0.3, 0.3]], jnp.float32
        ),
        radii=jnp.array([0.5, 0.3, 0.35], jnp.float32),
        colors=jnp.array(
            [[0.9, 0.2, 0.2], [0.2, 0.8, 0.3], [0.2, 0.3, 0.9]], jnp.float32
        ),
        density=40.0,
    )


def scene_fields(scene: SphereScene, pts: jnp.ndarray):
    """Analytic (rgb, sigma) at [..., 3] points."""
    d2 = jnp.sum(
        (pts[..., None, :] - scene.centers) ** 2, axis=-1
    )  # [..., S]
    inside = d2 < scene.radii**2
    sigma = scene.density * inside.any(axis=-1).astype(jnp.float32)
    # Nearest-center color where inside; white elsewhere (doesn't matter,
    # sigma is 0 there).
    idx = jnp.argmin(d2 / scene.radii**2, axis=-1)
    rgb = scene.colors[idx]
    return rgb, sigma


def render_scene(
    scene: SphereScene,
    rays: Rays,
    near: float = 2.0,
    far: float = 6.0,
    num_samples: int = 256,
    white_bkgd: bool = True,
):
    """Ground-truth render with dense uniform sampling."""
    t = jnp.linspace(0.0, 1.0, num_samples)
    z_vals = near * (1 - t) + far * t
    z_vals = jnp.broadcast_to(z_vals, rays.batch_shape + (num_samples,))
    pts = (
        rays.origins[..., None, :]
        + rays.directions[..., None, :] * z_vals[..., None]
    )
    rgb, sigma = scene_fields(scene, pts)
    out = volumetric_rendering(
        rgb, sigma, z_vals, rays.directions, white_bkgd=white_bkgd
    )
    return out.rgb


def make_dataset(
    scene: SphereScene = None,
    *,
    n_views: int = 8,
    image_size: int = 64,
    focal: float = 80.0,
    radius: float = 4.0,
    near: float = 2.0,
    far: float = 6.0,
    seed: int = 0,
):
    """Render a small multi-view dataset: (images [V,H,W,3], rays pool).

    Returns dict with 'images', 'rays' (flattened Rays over all pixels of
    all views), 'poses', 'intrinsics'.
    """
    if scene is None:
        scene = default_scene()
    H = W = image_size
    K = np.array(
        [[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], dtype=np.float32
    )
    # Spread cameras over the sphere (varying elevation), not a single
    # ring — single-ring capture lets NeRF fake geometry with view-aligned
    # fog, which breaks octree extraction.
    from nerf_projects_tpu.core.rays import pose_spherical

    rng = np.random.default_rng(seed)
    thetas = np.linspace(-180.0, 180.0, n_views + 1)[:-1]
    phis = rng.uniform(-75.0, 15.0, n_views)
    poses = np.stack(
        [pose_spherical(t, p, radius) for t, p in zip(thetas, phis)], axis=0
    )
    render = jax.jit(
        lambda r: render_scene(scene, r, near=near, far=far)
    )
    # chunk ground-truth rendering by rows: dense sampling materializes
    # H*W*num_samples points (67M at 512^2 — past single-chip HBM)
    rows = max(1, min(H, (1 << 24) // max(W * 256, 1)))
    all_rays, all_rgb = [], []
    for v in range(n_views):
        rays = camera_rays(H, W, K, jnp.asarray(poses[v]))
        parts = [
            render(jax.tree_util.tree_map(
                lambda x: x[i : i + rows], rays))
            for i in range(0, H, rows)
        ]
        rgb = jnp.concatenate(parts, axis=0)
        all_rays.append(rays)
        all_rgb.append(rgb)
    images = jnp.stack(all_rgb)  # [V, H, W, 3]
    flat_rays = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs).reshape(-1, 3), *all_rays
    )
    return {
        "images": images,
        "pixels": images.reshape(-1, 3),
        "rays": flat_rays,
        "poses": poses,
        "intrinsics": K,
        "near": near,
        "far": far,
        "scene": scene,
    }


def ray_batches(key: jax.Array, dataset, batch_size: int):
    """Infinite generator of random ray batches from the pooled dataset."""
    n = dataset["pixels"].shape[0]
    while True:
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (batch_size,), 0, n)
        rays = jax.tree_util.tree_map(lambda x: x[idx], dataset["rays"])
        target = dataset["pixels"][idx]
        yield rays, target


def tile_batches(
    key: jax.Array, dataset, n_tiles: int, tile_h: int = 8, tile_w: int = 8
):
    """Infinite generator of COHERENT tile batches: each tile is a
    tile_h x tile_w pixel patch of one view (random view + offset).

    This is the TPU-native analog of the reference's global ray shuffle
    (svox2 opt.py epoch shuffle): the lockstep tile renderer
    (ops/tile_render.py) needs spatially coherent ray groups; tiles from
    random views/offsets keep gradient noise well-mixed. Yields
    (Rays [T, R], target [T, R, 3]) with R = tile_h*tile_w.
    """
    V, H, W = dataset["images"].shape[:3]
    dy, dx = jnp.meshgrid(
        jnp.arange(tile_h), jnp.arange(tile_w), indexing="ij"
    )
    dy = dy.reshape(-1)
    dx = dx.reshape(-1)
    while True:
        key, k1, k2, k3 = jax.random.split(key, 4)
        v = jax.random.randint(k1, (n_tiles,), 0, V)
        y0 = jax.random.randint(k2, (n_tiles,), 0, H - tile_h + 1)
        x0 = jax.random.randint(k3, (n_tiles,), 0, W - tile_w + 1)
        flat = (
            v[:, None] * (H * W)
            + (y0[:, None] + dy[None]) * W
            + (x0[:, None] + dx[None])
        )  # [T, R]
        rays = jax.tree_util.tree_map(lambda a: a[flat], dataset["rays"])
        target = dataset["pixels"][flat]
        yield rays, target
