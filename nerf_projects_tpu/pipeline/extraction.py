"""NeRF -> PlenOctree extraction.

Parity target: reference plenoctree/octree/extraction.py —
  * auto_scale (:251-293): sigma-thresholded bbox shrink on a
    2^init_grid_depth grid;
  * step1 (:295-362): sigma eval on the 2^(d+1)^3 cell-center grid,
    masking by sigma threshold (-log(1-alpha_thresh)/(2/reso)) or by max
    ray weight over training cameras (grid_weight_render), then d+1
    rounds of refine on leaves containing masked cells;
  * step2 (:364-403): samples_per_cell random points per finest leaf;
    NeRF-SH mode stores the plain mean of [SH coeffs, sigma]; projected
    vanilla-NeRF (RGBA) mode alpha-weights the rgb average;
  * sigma relu + save (:576-604);
  * project_nerf_to_sh (:224-248): Monte-Carlo SH projection of a
    view-dependent NeRF via cross-broadcast point x direction eval.

All model evaluation is chunked through a jitted eval function; topology
edits (refine) happen host-side between device phases.
"""
from __future__ import annotations

from dataclasses import replace
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.models.octree import PlenOctree
from nerf_projects_tpu.ops.sh import project_function_sh, spherical_uniform_dirs


def _chunked_sigma_eval(eval_fn, pts: np.ndarray, chunk: int) -> np.ndarray:
    """eval_fn(points [C,3]) -> (rgb_or_coeffs, sigma [C,1]); returns sigma [N]."""
    outs = []
    for i in range(0, len(pts), chunk):
        sl = pts[i : i + chunk]
        pad = chunk - len(sl)
        if pad:
            sl = np.concatenate([sl, np.zeros((pad, 3), sl.dtype)], 0)
        _, sigma = eval_fn(jnp.asarray(sl))
        sigma = np.asarray(sigma)[:, 0]
        outs.append(sigma[: chunk - pad] if pad else sigma)
    return np.concatenate(outs, 0)


def _cell_center_grid(reso: int, invradius, offset) -> np.ndarray:
    """World coords of the reso^3 cell centers (extraction.py:301-310)."""
    arr = (np.arange(reso, dtype=np.float32) + 0.5) / reso
    xs = (arr - offset[0]) / invradius[0]
    ys = (arr - offset[1]) / invradius[1]
    zs = (arr - offset[2]) / invradius[2]
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    return np.stack([gx, gy, gz], -1).reshape(-1, 3)


def auto_scale(
    eval_fn: Callable,
    center,
    radius,
    *,
    init_grid_depth: int = 8,
    scale_alpha_thresh: float = 0.01,
    chunk: int = 65536,
) -> Tuple[list, list]:
    """Shrink (center, radius) to the sigma-occupied bbox (extraction.py:251)."""
    reso = 2**init_grid_depth
    radius = np.broadcast_to(np.asarray(radius, np.float32), (3,))
    center = np.asarray(center, np.float32)
    invradius = 0.5 / radius
    offset = 0.5 * (1.0 - center / radius)
    grid = _cell_center_grid(reso, invradius, offset)
    sigmas = _chunked_sigma_eval(eval_fn, grid, chunk)
    approx_delta = 2.0 / reso
    sigma_thresh = -np.log(1.0 - scale_alpha_thresh) / approx_delta
    sel = grid[sigmas >= sigma_thresh]
    if len(sel) == 0:
        return center.tolist(), radius.tolist()
    lc = sel.min(0) - 0.5 / reso
    uc = sel.max(0) + 0.5 / reso
    return ((lc + uc) * 0.5).tolist(), ((uc - lc) * 0.5).tolist()


def grid_weight_render(
    sigmas: np.ndarray,
    c2w: np.ndarray,
    intrinsics: np.ndarray,
    height: int,
    width: int,
    *,
    step_size: float = 1e-3,
    ray_subsample: int = 1,
) -> np.ndarray:
    """Max per-cell ray weight for one camera over a dense sigma grid.

    jnp equivalent of svox `_C.grid_weight_render` (misc_kernel.cu:310-334;
    used at extraction.py:212): march camera rays through the [reso]^3
    sigma grid (nearest-cell lookup), compute transmittance weights, and
    scatter-max them into the visited cells.
    """
    from nerf_projects_tpu.core.rays import camera_rays

    reso = sigmas.shape[0]
    sig = jnp.asarray(sigmas)
    rays = camera_rays(
        height // ray_subsample,
        width // ray_subsample,
        np.asarray(intrinsics) / ray_subsample,
        jnp.asarray(c2w),
    )
    origins = rays.origins.reshape(-1, 3)
    dirs = rays.directions.reshape(-1, 3)

    # March in unit-cube coords: world [-1, 1] -> [0, 1) (tree convention
    # with radius 1 / center 0; callers pre-transform for other frames).
    o = origins * 0.5 + 0.5
    d = dirs * 0.5
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    t_lo = (0.0 - o) * inv_d
    t_hi = (1.0 - o) * inv_d
    t0 = jnp.maximum(jnp.max(jnp.minimum(t_lo, t_hi), -1), 0.0)
    t1 = jnp.min(jnp.maximum(t_lo, t_hi), -1)
    world_len = jnp.linalg.norm(dirs, axis=-1)
    dnorm = jnp.linalg.norm(d, axis=-1)
    dt = step_size / jnp.maximum(dnorm, 1e-12)
    step_world = dt * world_len

    max_steps = int(np.ceil(np.sqrt(3.0) / step_size)) + 1

    def step_fn(carry, idx):
        log_T, max_w = carry
        t = t0 + idx.astype(jnp.float32) * dt
        valid = t < t1
        pos = o + t[:, None] * d
        cell = jnp.clip((pos * reso).astype(jnp.int32), 0, reso - 1)
        s = sig[cell[:, 0], cell[:, 1], cell[:, 2]]
        s = jnp.where(valid, s, 0.0)
        tau = s * step_world
        w = jnp.exp(log_T) * (1.0 - jnp.exp(-tau))
        flat = (cell[:, 0] * reso + cell[:, 1]) * reso + cell[:, 2]
        max_w = max_w.at[flat].max(jnp.where(valid, w, 0.0))
        return (log_T - tau, max_w), None

    init = (jnp.zeros(o.shape[0]), jnp.zeros(reso**3))
    (log_T, max_w), _ = jax.lax.scan(step_fn, init, jnp.arange(max_steps))
    return np.asarray(max_w.reshape(reso, reso, reso))


def extract_octree(
    eval_fn: Callable,
    *,
    center=(0.0, 0.0, 0.0),
    radius=1.5,
    data_dim: int,
    init_grid_depth: int = 8,
    alpha_thresh: float = 0.01,
    samples_per_cell: int = 8,
    masking_mode: str = "sigma",
    weight_thresh: float = 1e-4,
    dataset=None,
    renderer_step_size: float = 1e-3,
    chunk: int = 65536,
    seed: int = 0,
    rgba_mode: bool = False,
) -> PlenOctree:
    """Build a PlenOctree from a field-evaluation function.

    eval_fn(points [C, 3]) -> (coeffs [C, data_dim-1], sigma [C, 1]) —
    the model's eval_points_raw (with zero fake viewdirs when applicable,
    matching extraction.py:319-322), pre-jitted by the caller.
    """
    tree = PlenOctree.create(
        data_dim,
        center=center,
        radius=radius,
        depth_limit=init_grid_depth + 2,
    )

    # ---- step 1: grid eval + masking + refine ---------------------------
    reso = 2 ** (init_grid_depth + 1)
    grid = _cell_center_grid(reso, tree.invradius, tree.offset)
    sigmas = _chunked_sigma_eval(eval_fn, grid, chunk)

    approx_delta = 2.0 / reso
    sigma_thresh = -np.log(1.0 - alpha_thresh) / approx_delta
    if masking_mode == "sigma":
        mask = sigmas >= sigma_thresh
    elif masking_mode == "weight":
        if dataset is None:
            raise ValueError("weight masking needs a dataset")
        grid_sig = sigmas.reshape(reso, reso, reso)
        max_weight = np.zeros_like(grid_sig)
        for v in range(dataset.poses.shape[0]):
            w = grid_weight_render(
                grid_sig,
                dataset.poses[v],
                dataset.intrinsics,
                dataset.height,
                dataset.width,
                step_size=renderer_step_size,
                ray_subsample=4,
            )
            max_weight = np.maximum(max_weight, w)
        mask = max_weight.reshape(-1) >= weight_thresh
    else:
        raise ValueError(masking_mode)

    pts = grid[mask]
    if len(pts) == 0:
        return tree

    for _ in range(init_grid_depth):
        lut = tree.leaf_order_lookup()
        node, cell = jax.jit(tree.locate)(jnp.asarray(pts))[:2]
        node = np.asarray(node)
        cell = np.asarray(cell)
        rows = lut[node, cell[:, 0], cell[:, 1], cell[:, 2]]
        leaf_mask = np.zeros(tree.n_leaves, bool)
        leaf_mask[rows[rows >= 0]] = True
        tree = tree.refine(leaf_mask)

    # ---- step 2: per-leaf sampling + averaging --------------------------
    cells, depths, corners, sizes = tree.leaf_depths_and_corners()
    finest = depths == depths.max()
    sel_cells = cells[finest]
    sel_corners = corners[finest]
    sel_sizes = sizes[finest]

    rng = np.random.default_rng(seed)
    S = samples_per_cell
    n_leaf = len(sel_cells)
    data = np.asarray(tree.data).copy()

    eval_chunk = max(1, chunk // S)
    for i in range(0, n_leaf, eval_chunk):
        c = slice(i, min(i + eval_chunk, n_leaf))
        nc = c.stop - c.start
        offs = rng.random((nc, S, 3)).astype(np.float32)
        unit_pts = sel_corners[c][:, None, :] + offs * sel_sizes[c][:, None, None]
        world_pts = (unit_pts - tree.offset) / tree.invradius
        flat = world_pts.reshape(-1, 3)
        coeffs, sigma = eval_fn(jnp.asarray(flat))
        coeffs = np.asarray(coeffs).reshape(nc, S, -1)
        sigma = np.asarray(sigma).reshape(nc, S, 1)
        if rgba_mode:
            # alpha-weighted rgb average (extraction.py:389-399)
            alpha = 1.0 - np.exp(-approx_delta * sigma)
            msum = alpha.sum(1)
            rgb_avg = (coeffs * alpha).sum(1) / np.maximum(msum, 1e-12)
            rgb_avg[msum[:, 0] < 1e-3] = 0
            rgba = np.concatenate([rgb_avg, sigma.mean(1)], -1)
        else:
            rgba = np.concatenate([coeffs, sigma], -1).mean(1)
        cc = sel_cells[c]
        data[cc[:, 0], cc[:, 1], cc[:, 2], cc[:, 3]] = rgba

    # sigma relu (extraction.py:576-577)
    data[..., -1] = np.maximum(data[..., -1], 0.0)
    return replace(tree, data=jnp.asarray(data))


def make_sh_projection_eval_fn(
    model_eval_cross: Callable,
    sh_deg: int,
    *,
    projection_samples: int = 100,
    seed: int = 0,
) -> Callable:
    """Wrap a vanilla (view-dependent) NeRF into an SH-coefficient eval_fn.

    model_eval_cross(points [N, 3], dirs [D, 3]) -> (rgb [N, D, 3],
    sigma [N, 1]) — the cross-broadcast eval of
    octree/nerf/model_utils.py:87-159. Projection per extraction.py:224-248.
    """
    dirs = spherical_uniform_dirs(jax.random.PRNGKey(seed), projection_samples)

    def eval_fn(points):
        rgb, sigma = model_eval_cross(points, dirs)
        coeffs = project_function_sh(rgb, dirs, sh_deg)  # [N, 3, B]
        return coeffs.reshape(points.shape[0], -1), sigma

    return eval_fn
