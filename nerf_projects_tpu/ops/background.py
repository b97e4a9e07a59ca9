"""Background MSI (multi-sphere image) model for unbounded scenes.

Parity target: svox2's optional background model (svox2.py:497-521
background links/data, render_lerp_kernel_cuvol.cu:386-611 background
forward/backward, cubemap_util.cuh): `background_nlayers` concentric
spheres outside the foreground grid, each storing RGBA, composited behind
the foreground with the remaining transmittance.

TPU-first re-design: the reference parameterizes each sphere as a cubemap
(6 faces, per-face bilinear with edge handling — heavy branching); here
each layer is an equirectangular [H, W, 4] panorama sampled bilinearly —
branch-free, identical capability. Sphere radii follow the reference's
inverse-depth spacing r_i = 1 / (1 - i/n) (the MSI convention), and rays
intersect the spheres via the same concentric-spheres stepping
(ConcentricSpheresIntersector, svox2/svox2/utils.py:370-416).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BackgroundMSI(NamedTuple):
    """Equirect multi-sphere image: data [nlayers, H, W, 4] (rgb logits +
    density), radii [nlayers] (world units, increasing)."""

    data: jnp.ndarray
    radii: np.ndarray

    @staticmethod
    def create(
        nlayers: int = 16,
        reso: int = 128,
        *,
        inner_radius: float = 1.0,
        init_density: float = 0.1,
    ) -> "BackgroundMSI":
        # inverse-depth spacing: r_i = inner / (1 - i/n), last layer at
        # ~n*inner (far "infinity" shell), matching the reference's MSI
        # layout (svox2.py background init).
        i = np.arange(nlayers, dtype=np.float64)
        radii = inner_radius / (1.0 - i / nlayers)
        data = jnp.zeros((nlayers, reso, 2 * reso, 4), jnp.float32)
        if init_density:
            data = data.at[..., 3].set(init_density)
        return BackgroundMSI(data=data, radii=radii.astype(np.float32))


def _equirect_uv(dirs: jnp.ndarray):
    """Unit dirs [..., 3] -> (u, v) in [0, 1): longitude/latitude."""
    lon = jnp.arctan2(dirs[..., 0], -dirs[..., 2])  # [-pi, pi]
    lat = jnp.arcsin(jnp.clip(dirs[..., 1], -1.0, 1.0))  # [-pi/2, pi/2]
    u = (lon / (2 * jnp.pi)) + 0.5
    v = 0.5 - lat / jnp.pi
    return u, v


def sample_equirect(img: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear panorama sample. img [H, W, C]; dirs [..., 3] unit."""
    H, W = img.shape[:2]
    u, v = _equirect_uv(dirs)
    x = u * W - 0.5
    y = jnp.clip(v * H - 0.5, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0w = jnp.mod(x0, W)
    x1w = jnp.mod(x0 + 1, W)  # wrap longitude
    c00 = img[y0, x0w]
    c01 = img[y0, x1w]
    c10 = img[y0 + 1, x0w]
    c11 = img[y0 + 1, x1w]
    return (
        c00 * (1 - wx) * (1 - wy)
        + c01 * wx * (1 - wy)
        + c10 * (1 - wx) * wy
        + c11 * wx * wy
    )


def _sphere_exit_t(origins, dirs, radius):
    """t of the FAR intersection of |o + t d| = radius (NaN-free; rays are
    assumed to start inside the sphere, as MSI rays do)."""
    a = jnp.sum(dirs * dirs, axis=-1)
    b = 2.0 * jnp.sum(origins * dirs, axis=-1)
    c = jnp.sum(origins * origins, axis=-1) - radius**2
    disc = jnp.maximum(b * b - 4 * a * c, 0.0)
    return (-b + jnp.sqrt(disc)) / (2.0 * a)


def render_background(
    msi: BackgroundMSI,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    transmittance: jnp.ndarray,
    *,
    background_brightness: float = 1.0,
):
    """Composite the MSI behind the foreground.

    origins/dirs: [R, 3] world rays; transmittance: [R] leftover T after
    the foreground march. Returns rgb contribution [R, 3] (already scaled
    by T) — add to the foreground color instead of T * brightness.
    """
    n_layers = msi.data.shape[0]
    world_len = jnp.linalg.norm(dirs, axis=-1)
    radii = jnp.asarray(msi.radii)

    def layer(carry, i):
        log_T, rgb_acc, prev_t = carry
        radius = radii[i]
        t = _sphere_exit_t(origins, dirs, radius)
        pts = origins + t[:, None] * dirs
        pdirs = pts / jnp.maximum(
            jnp.linalg.norm(pts, axis=-1, keepdims=True), 1e-9
        )
        vals = sample_equirect(msi.data[i], pdirs)  # [R, 4]
        rgb = jax.nn.sigmoid(vals[:, :3])
        sigma = jax.nn.relu(vals[:, 3])
        seg = jnp.maximum(t - prev_t, 0.0) * world_len
        tau = sigma * seg
        alpha = 1.0 - jnp.exp(-tau)
        w = jnp.exp(log_T) * alpha
        return (log_T - tau, rgb_acc + w[:, None] * rgb, t), None

    init = (jnp.log(jnp.maximum(transmittance, 1e-10)), jnp.zeros(origins.shape[:1] + (3,)), jnp.zeros(origins.shape[0]))
    (log_T, rgb_acc, _), _ = jax.lax.scan(layer, init, jnp.arange(n_layers))
    # whatever survives all shells hits the solid background color
    rgb_acc = rgb_acc + jnp.exp(log_T)[:, None] * background_brightness
    return rgb_acc


def background_tv_loss(msi: BackgroundMSI) -> jnp.ndarray:
    """TV over each layer's panorama + across layers
    (inplace_tv_background_grad equivalent, svox2.py:1930)."""
    d = msi.data
    tv_h = jnp.mean(jnp.square(d[:, 1:] - d[:, :-1]))
    tv_w = jnp.mean(jnp.square(d[:, :, 1:] - d[:, :, :-1]))
    tv_l = jnp.mean(jnp.square(d[1:] - d[:-1]))
    return tv_h + tv_w + tv_l
