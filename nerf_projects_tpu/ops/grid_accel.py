"""Empty-space acceleration for grid rendering.

The reference accelerates its CUDA march with a per-cell distance
transform consumed by per-thread pointer chasing (`compute_skip_dist`,
render_util.cuh:235-298) — a pattern that maps poorly to TPU vector
units. The TPU-native equivalent implemented here:

  1. a coarse occupancy bitmap (links occupancy max-pooled by `factor`,
     then dilated once so it is a conservative superset);
  2. a cheap per-ray probe pass over the bitmap that shrinks the march
     interval to [t_enter, t_exit] of occupied space;
  3. the main march then spends its fixed step budget inside that
     interval only — giving the empty-space-skipping speedup with fully
     static shapes.

Because the bitmap is a superset of occupied cells, restricting the march
to [t_enter, t_exit] is exact (samples outside have zero density).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.models.sparse_grid import SparseGrid


class OccupancyGrid(NamedTuple):
    bitmap: jnp.ndarray  # bool [X/f, Y/f, Z/f] (conservative superset)
    factor: int


def build_occupancy(
    grid: SparseGrid,
    *,
    factor: int = 8,
    sigma_thresh: float = 0.0,
    dilate: int = 1,
) -> OccupancyGrid:
    """Coarse occupancy from links (+ optional density threshold).

    Host-side; rebuilt on topology changes like the reference's
    `accelerate()` (svox2.py:1487).
    """
    from scipy import ndimage

    links = np.asarray(grid.links)
    occ = links >= 0
    if sigma_thresh > 0:
        dens = np.zeros(links.shape, np.float32)
        sel = links >= 0
        dens[sel] = np.asarray(grid.density_data)[links[sel], 0]
        occ &= dens > sigma_thresh
    X, Y, Z = occ.shape
    pad = [(0, (-s) % factor) for s in occ.shape]
    occ = np.pad(occ, pad)
    coarse = occ.reshape(
        occ.shape[0] // factor, factor,
        occ.shape[1] // factor, factor,
        occ.shape[2] // factor, factor,
    ).any(axis=(1, 3, 5))
    if dilate > 0:
        coarse = ndimage.binary_dilation(
            coarse, structure=np.ones((3, 3, 3), bool), iterations=dilate
        )
    return OccupancyGrid(bitmap=jnp.asarray(coarse), factor=factor)


def occupied_aabb(occ: OccupancyGrid):
    """Tight axis-aligned bounding box of the occupied coarse cells, in
    FINE voxel units: (lo [3], hi [3], any_occ []). Gather-free (three
    axis reductions + argmax over <=few-hundred-element vectors), so it
    is cheap enough to recompute inside every jitted step."""
    b = occ.bitmap
    f = float(occ.factor)
    lo, hi = [], []
    for ax in range(3):
        red = tuple(a for a in range(3) if a != ax)
        line = b.any(axis=red)
        n = line.shape[0]
        first = jnp.argmax(line)
        last = n - 1 - jnp.argmax(line[::-1])
        lo.append(first.astype(jnp.float32) * f)
        hi.append((last.astype(jnp.float32) + 1.0) * f)
    return (jnp.stack(lo), jnp.stack(hi), b.any())


def aabb_t_range(
    occ: OccupancyGrid,
    origins_g: jnp.ndarray,
    dirs_g: jnp.ndarray,
    t0: jnp.ndarray,
    t1: jnp.ndarray,
):
    """Gather-free occupancy interval: slab-test each ray against the
    occupied-cell AABB. Conservative superset of the per-probe interval
    from `active_t_range` (AABB >= union of occupied cells), hence
    exact — samples in the extra span hit empty space and contribute
    zero density. Replaces the probe on hot plan paths: the probe's
    [R, n_probe] bitmap gather measured 16.1 ms of a 29 ms train step
    at the bench shape (R=5120), vs ~0 for this slab test."""
    lo, hi, any_occ = occupied_aabb(occ)
    inv = 1.0 / jnp.where(jnp.abs(dirs_g) < 1e-12, 1e-12, dirs_g)
    ta = (lo - origins_g) * inv
    tb = (hi - origins_g) * inv
    te = jnp.max(jnp.minimum(ta, tb), axis=-1)
    tx = jnp.min(jnp.maximum(ta, tb), axis=-1)
    te = jnp.maximum(te, t0)
    tx = jnp.minimum(tx, t1)
    # no occupied cells -> report miss (te > tx) like the probe
    te = jnp.where(any_occ, te, t1)
    tx = jnp.where(any_occ, tx, t0)
    return te, tx


def active_t_range(
    occ: OccupancyGrid,
    origins_g: jnp.ndarray,
    dirs_g: jnp.ndarray,
    t0: jnp.ndarray,
    t1: jnp.ndarray,
    *,
    n_probe: int = 256,
):
    """Shrink [t0, t1] to the occupied sub-interval per ray.

    origins_g/dirs_g are grid-space (fine voxel units); returns
    (t_enter [R], t_exit [R]) with t_enter >= t0, t_exit <= t1 and
    t_enter > t_exit when the ray hits nothing.

    Approximation note: occupancy is probed at `n_probe` uniform
    midpoints, so an occupied coarse cell crossed for less than one probe
    interval (a corner clip of an isolated cell) can fall between probes
    and the ray be marked empty. The interval *shrinking* is conservative
    (expanded one probe interval each side), but the any-hit detection is
    only guaranteed when the probe spacing (t1-t0)/n_probe maps to
    <= `factor` voxels along the ray; the default dilate=1 when building
    the bitmap makes a straddled miss require a >=2-cell-wide gap.
    """
    f = float(occ.factor)
    reso_c = jnp.asarray(occ.bitmap.shape)
    # probe points: midpoints of n_probe uniform sub-intervals
    frac = (jnp.arange(n_probe, dtype=jnp.float32) + 0.5) / n_probe
    t = t0[:, None] + frac[None, :] * (t1 - t0)[:, None]  # [R, P]
    pos = origins_g[:, None, :] + t[..., None] * dirs_g[:, None, :]
    cell = jnp.clip((pos / f).astype(jnp.int32), 0, reso_c - 1)
    hit = occ.bitmap[cell[..., 0], cell[..., 1], cell[..., 2]]  # [R, P]
    any_hit = hit.any(axis=-1)

    idx = jnp.arange(n_probe)
    first = jnp.min(jnp.where(hit, idx, n_probe), axis=-1)
    last = jnp.max(jnp.where(hit, idx, -1), axis=-1)
    span = (t1 - t0) / n_probe
    # expand by one probe interval each side for conservativeness
    t_enter = t0 + jnp.maximum(first - 1, 0) * span
    t_exit = t0 + jnp.minimum(last + 2, n_probe) * span
    t_enter = jnp.where(any_hit, t_enter, t1)
    t_exit = jnp.where(any_hit, t_exit, t0)
    return t_enter, t_exit
