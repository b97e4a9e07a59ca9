"""Ray primitives and camera-ray generation.

Behavioral parity targets (see SURVEY.md §1 L2):
  * OpenGL convention (camera looks down -z, integer pixel coordinates):
    reference nerf/nerf_helpers.py:222-308 (`get_rays`, `get_rays_np`) and
    plenoctree/nerf_sh/nerf/utils.py:545-589 (`generate_rays`).
  * OpenCV convention (+z forward, half-pixel centers): reference
    svox2/svox2/svox2.py:157-183 (`Camera.gen_rays`).
  * NDC transform, OpenGL variant: reference nerf/nerf_helpers.py:311-369.

All functions are jnp-traceable with static shapes; rays are a NamedTuple
pytree so they pass through jit/shard_map/scan unchanged.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Rays(NamedTuple):
    """A bundle of rays. All fields broadcast over identical leading dims.

    viewdirs is the *normalized* direction used for view-dependent shading
    (kept separate because NDC-warped `directions` are not unit vectors).
    """

    origins: jnp.ndarray     # [..., 3]
    directions: jnp.ndarray  # [..., 3]
    viewdirs: jnp.ndarray    # [..., 3]

    @property
    def batch_shape(self):
        return self.origins.shape[:-1]


def _pixel_grid(height: int, width: int, dtype=jnp.float32):
    """Integer pixel coordinate grid: x in [0, W-1], y in [0, H-1], [H, W]."""
    x = jnp.arange(width, dtype=dtype)
    y = jnp.arange(height, dtype=dtype)
    return jnp.meshgrid(x, y, indexing="xy")


def camera_rays(
    height: int,
    width: int,
    intrinsics: jnp.ndarray,
    c2w: jnp.ndarray,
    *,
    pixel_center: float = 0.0,
) -> Rays:
    """Per-pixel pinhole rays, OpenGL convention (camera looks along -z).

    Matches reference `get_rays` (nerf/nerf_helpers.py:222): integer pixel
    coordinates (pixel_center=0.0), y flipped, z = -1 in camera frame.

    Args:
      height, width: image size.
      intrinsics: [3,3] K matrix (fx=K[0,0], fy=K[1,1], cx=K[0,2], cy=K[1,2]).
      c2w: [3,4] or [4,4] camera-to-world transform.
      pixel_center: offset added to pixel indices (0.0 for reference parity,
        0.5 for true pixel centers as used by jaxnerf `generate_rays`).

    Returns:
      Rays with origins/directions/viewdirs of shape [H, W, 3]. Directions
      are NOT normalized (matches reference); viewdirs are normalized.
    """
    K = jnp.asarray(intrinsics)
    c2w = jnp.asarray(c2w)
    x, y = _pixel_grid(height, width)
    x = x + pixel_center
    y = y + pixel_center
    dirs_cam = jnp.stack(
        [
            (x - K[0, 2]) / K[0, 0],
            -(y - K[1, 2]) / K[1, 1],
            -jnp.ones_like(x),
        ],
        axis=-1,
    )
    rot = c2w[:3, :3]
    directions = dirs_cam @ rot.T  # [H, W, 3] world-frame, unnormalized
    origins = jnp.broadcast_to(c2w[:3, -1], directions.shape)
    viewdirs = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    return Rays(origins=origins, directions=directions, viewdirs=viewdirs)


def camera_rays_opencv(
    height: int,
    width: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    c2w: jnp.ndarray,
) -> Rays:
    """Per-pixel pinhole rays, OpenCV convention (+z forward, +0.5 centers).

    Matches reference svox2 `Camera.gen_rays` (svox2/svox2/svox2.py:157-183):
    half-pixel centers, y NOT flipped, z = +1, normalized directions.
    """
    c2w = jnp.asarray(c2w)
    x, y = _pixel_grid(height, width)
    x = x + 0.5
    y = y + 0.5
    dirs_cam = jnp.stack(
        [(x - cx) / fx, (y - cy) / fy, jnp.ones_like(x)], axis=-1
    )
    dirs_cam = dirs_cam / jnp.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    rot = c2w[:3, :3]
    directions = dirs_cam @ rot.T
    origins = jnp.broadcast_to(c2w[:3, -1], directions.shape)
    return Rays(origins=origins, directions=directions, viewdirs=directions)


def ndc_rays(
    height: int,
    width: int,
    focal: float,
    near: float,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
):
    """Shift rays to the near plane and warp into OpenGL NDC space.

    Matches reference nerf/nerf_helpers.py:311-369 (`ndc_rays`) and the
    jaxnerf variant (plenoctree/nerf_sh/nerf/datasets.py:40-60): used for
    forward-facing (LLFF) scenes. Assumes rays have negative z in camera
    space and fx == fy == focal.
    """
    t = -(near + origins[..., 2]) / directions[..., 2]
    origins = origins + t[..., None] * directions

    ox, oy, oz = origins[..., 0], origins[..., 1], origins[..., 2]
    dx, dy, dz = directions[..., 0], directions[..., 1], directions[..., 2]

    o0 = -1.0 / (width / (2.0 * focal)) * ox / oz
    o1 = -1.0 / (height / (2.0 * focal)) * oy / oz
    o2 = 1.0 + 2.0 * near / oz
    d0 = -1.0 / (width / (2.0 * focal)) * (dx / dz - ox / oz)
    d1 = -1.0 / (height / (2.0 * focal)) * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz

    ndc_origins = jnp.stack([o0, o1, o2], axis=-1)
    ndc_directions = jnp.stack([d0, d1, d2], axis=-1)
    return ndc_origins, ndc_directions


def ndc_rays_opencv(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    ndc_coeffs: tuple,
):
    """OpenCV-convention NDC warp used by the Plenoxels path.

    Matches reference svox2/svox2/utils.py:576-597: +z forward rays with
    ndc_coeffs = (2*fx/W, 2*fy/H); near plane fixed at z = 1.
    """
    cx, cy = ndc_coeffs
    t = -(1.0 - origins[..., 2]) / directions[..., 2]
    origins = origins + t[..., None] * directions

    ox, oy, oz = origins[..., 0], origins[..., 1], origins[..., 2]
    dx, dy, dz = directions[..., 0], directions[..., 1], directions[..., 2]

    o0 = cx * ox / oz
    o1 = cy * oy / oz
    o2 = 1.0 - 2.0 / oz
    d0 = cx * (dx / dz - ox / oz)
    d1 = cy * (dy / dz - oy / oz)
    d2 = 2.0 / oz

    ndc_origins = jnp.stack([o0, o1, o2], axis=-1)
    ndc_directions = jnp.stack([d0, d1, d2], axis=-1)
    ndc_directions = ndc_directions / jnp.linalg.norm(
        ndc_directions, axis=-1, keepdims=True
    )
    return ndc_origins, ndc_directions


# ---------------------------------------------------------------------------
# Pose path helpers (host-side numpy; used by loaders and video rendering)
# ---------------------------------------------------------------------------

def _trans_t(t):
    return np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, t], [0, 0, 0, 1]], dtype=np.float32
    )


def _rot_phi(phi):
    c, s = np.cos(phi), np.sin(phi)
    return np.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def _rot_theta(th):
    c, s = np.cos(th), np.sin(th)
    return np.array(
        [[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def pose_spherical(theta: float, phi: float, radius: float) -> np.ndarray:
    """Camera-to-world pose on a sphere looking at the origin.

    Matches reference nerf/load_blender.py:29 (`pose_spherical`): the
    standard blender spiral-path pose used for test-time video rendering.
    Angles in degrees.
    """
    c2w = _trans_t(radius)
    c2w = _rot_phi(phi / 180.0 * np.pi) @ c2w
    c2w = _rot_theta(theta / 180.0 * np.pi) @ c2w
    c2w = (
        np.array(
            [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
            dtype=np.float32,
        )
        @ c2w
    )
    return c2w


def spherical_pose_path(n_poses: int = 40, phi: float = -30.0, radius: float = 4.0):
    """The reference's 40-pose render path (load_blender.py:80-84)."""
    thetas = np.linspace(-180.0, 180.0, n_poses + 1)[:-1]
    return np.stack([pose_spherical(t, phi, radius) for t in thetas], axis=0)


def equirect_rays(height: int, width: int, c2w: np.ndarray) -> "Rays":
    """360° equirectangular rays (reference nerf_sh/nerf/utils.py:591-624).

    Longitude spans [-pi, pi] over width, latitude [-pi/2, pi/2] over
    height; directions rotated by c2w, origins at the camera center.
    """
    c2w = jnp.asarray(c2w)
    x, y = _pixel_grid(height, width)
    lon = (x / width - 0.5) * 2.0 * jnp.pi
    lat = -(y / height - 0.5) * jnp.pi
    dirs_cam = jnp.stack(
        [
            jnp.cos(lat) * jnp.sin(lon),
            jnp.sin(lat),
            -jnp.cos(lat) * jnp.cos(lon),
        ],
        axis=-1,
    )
    directions = dirs_cam @ c2w[:3, :3].T
    origins = jnp.broadcast_to(c2w[:3, -1], directions.shape)
    return Rays(origins=origins, directions=directions, viewdirs=directions)
