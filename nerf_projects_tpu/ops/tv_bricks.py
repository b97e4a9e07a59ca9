"""Sampled TV gradients over BrickGrid storage.

Same regularizer semantics as ops/tv.py (reference
loss_kernel.cu:180-248 tv_grad_sparse_kernel), re-expressed for the
brick-major layout: a contiguous window of BRICK rows is sampled
(tv_sparsity as a fraction of bricks ~= fraction of cells), all 512
cells of each sampled brick get the per-cell TV gradient, and the
cross-brick face terms come from the +x/+y/+z neighbor bricks' first
planes. Everything is shifts + elementwise math + four wide row
scatter-adds — no per-cell gathers.

Sampling-distribution deviation (documented): the reference samples
cells uniformly over the FULL dense grid (including cells of entirely
empty regions, whose only effect is boundary gradients into active
neighbors); sampling bricks covers all cells of partially-empty bricks
but skips cells in fully-empty bricks, so active cells facing a
fully-empty brick miss that one inward boundary term. The per-cell
gradient math is otherwise identical, including the per-coefficient
norm and reso/256 axis scaling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from nerf_projects_tpu.ops.brick_grid import BRICK, BrickGrid


def sample_brick_window(key: jax.Array, n_bricks: int, window: int):
    """Contiguous brick-row window with wraparound (svox2.py:2230-2237
    adapted to brick granularity)."""
    start = jax.random.randint(key, (), 0, n_bricks)
    return ((start + jnp.arange(window, dtype=jnp.int32)) % n_bricks).astype(
        jnp.int32
    )


def _neighbor_rows(bg: BrickGrid, rows: jnp.ndarray, axis: int):
    """Brick row of the +axis neighbor of each sampled brick (-1 = none)."""
    coords = bg.brick_coords[rows]  # [w, 3]
    n = jnp.asarray(bg.bricks_shape)
    shifted = coords.at[:, axis].add(1)
    oob = shifted[:, axis] >= n[axis]
    safe = jnp.clip(shifted, 0, n - 1)
    nbr = bg.brick_links[safe[:, 0], safe[:, 1], safe[:, 2]]
    return jnp.where(oob, -1, nbr)


def tv_grad_brick_blocks(
    bg: BrickGrid,
    data: jnp.ndarray,
    rows: jnp.ndarray,
    *,
    scale: float,
    ignore_edge: bool,
):
    """Block form of `tv_grad_bricks`: returns (rows4 [4w], vals4
    [4w, 512, C]) where rows4 may contain -1 (no neighbor; the matching
    vals are zero). Row ids repeat; contributions are additive. The
    row-sparse trainer consumes this directly without materialising an
    O(nb) gradient array.

    data: [nb, 512] (density) or [nb, 512, C] (SH), OR a callable
    fetch(rows [w]) -> [w, 512, C] (the sparse trainer reads rows out
    of its kernel-layout state without a master-layout array existing).
    rows: sampled brick row ids [w]. ignore_edge matches the reference
    flag (False for density, True for SH: empty-neighbor diffs are
    zeroed).
    """
    if callable(data):
        fetch = data
    else:
        if data.ndim == 2:
            data = data[..., None]
        fetch = lambda r: data[r]  # noqa: E731
    w = rows.shape[0]
    B = BRICK

    def brick_vals(r):
        safe = jnp.maximum(r, 0)
        vals = fetch(safe)
        C = vals.shape[-1]
        vals = jnp.where((r >= 0)[:, None, None], vals, 0.0)
        mask = jnp.where(
            (r >= 0)[:, None], bg.cell_mask[safe], False
        )
        return (
            vals.reshape(w, B, B, B, C),
            mask.reshape(w, B, B, B),
        )

    v, m = brick_vals(rows)
    C, vdtype = v.shape[-1], v.dtype
    nxr = _neighbor_rows(bg, rows, 0)
    nyr = _neighbor_rows(bg, rows, 1)
    nzr = _neighbor_rows(bg, rows, 2)
    vx, mx = brick_vals(nxr)
    vy, my = brick_vals(nyr)
    vz, mz = brick_vals(nzr)

    # +axis neighbor values/masks for every cell of the base brick
    v_px = jnp.concatenate([v[:, 1:], vx[:, :1]], axis=1)
    m_px = jnp.concatenate([m[:, 1:], mx[:, :1]], axis=1)
    v_py = jnp.concatenate([v[:, :, 1:], vy[:, :, :1]], axis=2)
    m_py = jnp.concatenate([m[:, :, 1:], my[:, :, :1]], axis=2)
    v_pz = jnp.concatenate([v[:, :, :, 1:], vz[:, :, :, :1]], axis=3)
    m_pz = jnp.concatenate([m[:, :, :, 1:], mz[:, :, :, :1]], axis=3)

    if ignore_edge:
        dx = jnp.where(m_px[..., None], v_px - v, 0.0)
        dy = jnp.where(m_py[..., None], v_py - v, 0.0)
        dz = jnp.where(m_pz[..., None], v_pz - v, 0.0)
    else:
        dx, dy, dz = v_px - v, v_py - v, v_pz - v

    # per-coefficient norm (one reference thread per (cell, coeff));
    # scale normalized by the sampled-cell count like the reference
    # launcher (loss_kernel.cu:595 `scale / nl` — TV is a MEAN over
    # sampled cells; unnormalized it overpowers the data term by ~1e4)
    idelta = (scale / (w * B * B * B)) * jax.lax.rsqrt(
        1e-9 + dx * dx + dy * dy + dz * dz
    )
    X, Y, Z = bg.reso
    gx = dx * (X / 256.0) * idelta
    gy = dy * (Y / 256.0) * idelta
    gz = dz * (Z / 256.0) * idelta

    # base-side add uses the UNMASKED diffs (reference sm = -(dx+dy+dz)
    # regardless of neighbor activity), gated only on the base cell
    # being active; neighbor-side adds are masked by the receiving
    # cell's activity (MAYBE_ADD_SET lnk>=0).
    g_base = -(gx + gy + gz) * m[..., None]
    gx = gx * m_px[..., None]
    gy = gy * m_py[..., None]
    gz = gz * m_pz[..., None]

    # scatter within-brick parts: base grad + shifted-back neighbor adds
    local = g_base
    local = local.at[:, 1:].add(gx[:, :-1])
    local = local.at[:, :, 1:].add(gy[:, :, :-1])
    local = local.at[:, :, :, 1:].add(gz[:, :, :, :-1])

    # cross-brick face parts: last plane of g goes to the neighbor's
    # first plane
    def face_brick(plane, axis):
        buf = jnp.zeros((w, B, B, B, C), vdtype)
        if axis == 0:
            return buf.at[:, 0].set(plane)
        if axis == 1:
            return buf.at[:, :, 0].set(plane)
        return buf.at[:, :, :, 0].set(plane)

    rows4 = jnp.concatenate([rows, nxr, nyr, nzr])
    vals4 = jnp.concatenate(
        [
            local.reshape(w, B**3, C),
            face_brick(gx[:, -1], 0).reshape(w, B**3, C),
            face_brick(gy[:, :, -1], 1).reshape(w, B**3, C),
            face_brick(gz[:, :, :, -1], 2).reshape(w, B**3, C),
        ]
    )
    vals4 = jnp.where((rows4 >= 0)[:, None, None], vals4, 0.0)
    return rows4, vals4


def tv_grad_bricks(
    bg: BrickGrid,
    data: jnp.ndarray,
    rows: jnp.ndarray,
    *,
    scale: float,
    ignore_edge: bool,
) -> jnp.ndarray:
    """TV gradient contribution, scatter-added into zeros_like(data).

    See `tv_grad_brick_blocks` for the block form and argument docs.
    """
    squeeze = data.ndim == 2
    rows4, vals4 = tv_grad_brick_blocks(
        bg, data, rows, scale=scale, ignore_edge=ignore_edge
    )
    grad = jnp.zeros(
        data.shape if not squeeze else data.shape + (1,), data.dtype
    )
    grad = grad.at[jnp.maximum(rows4, 0)].add(vals4)
    return grad[..., 0] if squeeze else grad
