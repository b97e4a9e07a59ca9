"""Sampled-fraction total-variation gradients for the Plenoxels grid.

Parity target: the reference's in-place TV grad kernels
(svox2/svox2/csrc/loss_kernel.cu: tv_grad_sparse_kernel:180-248,
lumisphere_tv_grad_sparse_kernel:336-470) driven from
svox2/svox2/svox2.py inplace_tv_grad:1731 / inplace_tv_color_grad:1768 /
inplace_tv_lumisphere_grad:1822 / inplace_l2_color_grad:1897, with cell
selection from _get_rand_cells (svox2.py:2224-2241): a CONTIGUOUS window
of `max(int(sparse_frac * X*Y*Z), 1)` flat cell indices starting at a
random offset, wrapping around the end of the grid.

That contiguous-window choice (the reference's `tv_contiguous=1`
default, opt.py:239) is a gift on TPU: the base cell links and all three
(+x, +y, +z) neighbor links become *contiguous slices* of the flattened
links array (offset by 1, Z, and Y*Z rows) — zero gathers to find the
neighborhood. Only the compact data rows are true gathers, at 1% of the
grid per step instead of the whole grid.

Per selected cell with values v000 and neighbors v100/v010/v001
(empty -> 0, or copy of v000 when ignore_edge, matching the kernel's
null_val), the injected gradient is

    idelta = scale / sqrt(1e-9 + dx^2 + dy^2 + dz^2)   (unscaled diffs)
    g[link100] += dx * (X/256) * idelta   (and similarly y, z)
    g[link000] -= (dx*(X/256) + dy*(Y/256) + dz*(Z/256)) * idelta

exactly the reference kernel's atomicAdd structure (scatter-add here),
including the reso/256 axis scaling (loss_kernel.cu:23-52) and the
apply-scaling-after-the-norm order.

Deviation (documented): the reference reads data row 0 for neighbors
that fall off the +max grid boundary (`links_ptr[offx] : 0`,
loss_kernel.cu:212-215); we treat out-of-bounds neighbors as empty
(null_val), which is the intended semantics of the dense kernel.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nerf_projects_tpu.ops.sh import eval_sh_bases


def sample_window(key: jax.Array, grid_size: int, window: int) -> jnp.ndarray:
    """Contiguous flat-index window with wraparound (svox2.py:2230-2237)."""
    start = jax.random.randint(key, (), 0, grid_size)
    idx = (start + jnp.arange(window, dtype=jnp.int32)) % grid_size
    return idx.astype(jnp.int32)


def _window_links(links: jnp.ndarray, cells: jnp.ndarray):
    """Base + (+x, +y, +z) neighbor links for flat cell ids [W].

    Returns (lnk000, lnk100, lnk010, lnk001, oob100, oob010, oob001).
    All four fetches are flat gathers of int32 (the contiguous window
    makes them effectively slices after XLA's gather simplification).
    """
    X, Y, Z = links.shape
    flat = links.reshape(-1)
    n = X * Y * Z
    z = cells % Z
    y = (cells // Z) % Y
    x = cells // (Y * Z)
    lnk000 = flat[cells]
    oob100 = x + 1 >= X
    oob010 = y + 1 >= Y
    oob001 = z + 1 >= Z
    lnk100 = jnp.where(oob100, -1, flat[jnp.minimum(cells + Y * Z, n - 1)])
    lnk010 = jnp.where(oob010, -1, flat[jnp.minimum(cells + Z, n - 1)])
    lnk001 = jnp.where(oob001, -1, flat[jnp.minimum(cells + 1, n - 1)])
    return lnk000, lnk100, lnk010, lnk001


def _fetch(data: jnp.ndarray, lnk: jnp.ndarray, null_val: jnp.ndarray):
    safe = jnp.maximum(lnk, 0)
    return jnp.where((lnk >= 0)[:, None], data[safe], null_val)


def tv_grad_sampled(
    links: jnp.ndarray,
    data: jnp.ndarray,
    cells: jnp.ndarray,
    *,
    scale: float,
    ignore_edge: bool,
) -> jnp.ndarray:
    """TV gradient over the sampled cells, scatter-added into a
    zeros_like(data) array (caller adds it to the loss gradient).

    ignore_edge=False for density (reference passes False for sigma TV),
    True for SH data (missing neighbors copy the base value so no
    gradient flows across the sparse boundary).
    """
    lnk000, lnk100, lnk010, lnk001 = _window_links(links, cells)
    zero = jnp.zeros((1, data.shape[1]), data.dtype)
    v000 = _fetch(data, lnk000, zero)
    null_val = v000 if ignore_edge else zero
    v100 = _fetch(data, lnk100, null_val)
    v010 = _fetch(data, lnk010, null_val)
    v001 = _fetch(data, lnk001, null_val)

    dx = v100 - v000
    dy = v010 - v000
    dz = v001 - v000
    # Per-COEFFICIENT norm: the reference kernel runs one thread per
    # (cell, coefficient) pair, so the sqrt couples the three spatial
    # diffs of a single channel only (loss_kernel.cu:224-228).
    # scale / n_sampled: the reference launcher normalizes by the
    # sampled-cell count (loss_kernel.cu:595 `scale / nl`) — the TV
    # loss is a MEAN over sampled cells. Without it the per-edge TV
    # gradient is ~4 orders of magnitude stronger than the reference's
    # and (under RMSprop's scale-invariant updates) erodes any
    # occluded or weakly-constrained density at ~lr per step.
    scale = scale / cells.shape[0]
    idelta = scale * jax.lax.rsqrt(1e-9 + dx * dx + dy * dy + dz * dz)
    X, Y, Z = links.shape
    sx, sy, sz = X / 256.0, Y / 256.0, Z / 256.0
    gx = dx * (sx * idelta)
    gy = dy * (sy * idelta)
    gz = dz * (sz * idelta)

    grad = jnp.zeros_like(data)

    def add(grad, lnk, val):
        safe = jnp.maximum(lnk, 0)
        val = jnp.where((lnk >= 0)[:, None], val, 0.0)
        return grad.at[safe].add(val)

    grad = add(grad, lnk100, gx)
    grad = add(grad, lnk010, gy)
    grad = add(grad, lnk001, gz)
    grad = add(grad, lnk000, -(gx + gy + gz))
    return grad


def tv_lumisphere_grad_sampled(
    links: jnp.ndarray,
    sh_data: jnp.ndarray,
    cells: jnp.ndarray,
    key: jax.Array,
    *,
    basis_dim: int,
    scale: float,
    dir_factor: float = 0.0,
    dir_perturb_radians: float = 0.05,
) -> jnp.ndarray:
    """View-direction TV of the *decoded* color (lumisphere TV).

    Reference: inplace_tv_lumisphere_grad (svox2.py:1822-1896) +
    lumisphere_tv_grad_sparse_kernel (loss_kernel.cu:336-470). One random
    direction per call; decoded channel value c = sum_b sh[b]*basis[b];
    spatial diffs of c across +x/+y/+z plus an optional directional diff
    against a perturbed direction; gradient flows back through the SH
    coefficients (d c / d sh[b] = basis[b]).
    """
    k_dir, k_perturb = jax.random.split(key)
    d = jax.random.normal(k_dir, (3,))
    d = d / jnp.linalg.norm(d)
    basis = eval_sh_bases(basis_dim, d[None])[0]  # [B]

    if dir_factor > 0.0:
        # Small random rotation of d (reference uses a rotvec of norm
        # dir_perturb_radians; a first-order Rodrigues step matches to
        # O(theta^2) and keeps everything in jnp).
        axis = jax.random.normal(k_perturb, (3,))
        axis = axis / jnp.linalg.norm(axis) * dir_perturb_radians
        d_u = d + jnp.cross(axis, d)
        d_u = d_u / jnp.linalg.norm(d_u)
        basis_u = eval_sh_bases(basis_dim, d_u[None])[0]
    else:
        basis_u = basis

    lnk000, lnk100, lnk010, lnk001 = _window_links(links, cells)
    zero = jnp.zeros((1, sh_data.shape[1]), sh_data.dtype)
    v000 = _fetch(sh_data, lnk000, zero)
    # kernel uses v000 as null_val for missing neighbors
    v100 = _fetch(sh_data, lnk100, v000)
    v010 = _fetch(sh_data, lnk010, v000)
    v001 = _fetch(sh_data, lnk001, v000)

    W = cells.shape[0]

    def decode(v, b):
        return jnp.einsum(
            "wcb,b->wc", v.reshape(W, 3, basis_dim), b
        )  # [W, 3]

    c000 = decode(v000, basis)
    c100 = decode(v100, basis)
    c010 = decode(v010, basis)
    c001 = decode(v001, basis)
    c000u = decode(v000, basis_u)

    # Kernel math (loss_kernel.cu:414-446), per channel c:
    #   dx = (c100 - c000) * s_x   (scaled ONCE before the norm)
    #   du = (c000u - c000) * dir_factor
    #   idelta = scale * rsqrt(1e-9 + dx^2 + dy^2 + dz^2 + du^2)
    #   then dx *= s_x AGAIN (double scaling — reproduced), du *= df,
    #   and per-coefficient writes multiply by the basis value.
    X, Y, Z = links.shape
    sxa = (X / 256.0, Y / 256.0, Z / 256.0)
    dx = (c100 - c000) * sxa[0]
    dy = (c010 - c000) * sxa[1]
    dz = (c001 - c000) * sxa[2]
    du = (c000u - c000) * dir_factor
    idelta = (scale / cells.shape[0]) * jax.lax.rsqrt(
        1e-9 + dx * dx + dy * dy + dz * dz + du * du
    )  # [W, 3] per channel
    dx = dx * sxa[0]
    dy = dy * sxa[1]
    dz = dz * sxa[2]
    du = du * dir_factor

    def to_sh(cgrad, b):  # [W, 3] x [B] -> [W, 3*B]
        return (cgrad[..., None] * b).reshape(W, 3 * basis_dim)

    gx = to_sh(dx * idelta, basis)
    gy = to_sh(dy * idelta, basis)
    gz = to_sh(dz * idelta, basis)
    # base-cell write: -(dx+dy+dz)*sv + du*(basis_u - basis)
    g0 = to_sh(-(dx + dy + dz) * idelta, basis) + (
        ((du * idelta)[..., None] * (basis_u - basis)).reshape(
            W, 3 * basis_dim
        )
    )

    grad = jnp.zeros_like(sh_data)

    def add(grad, lnk, val):
        safe = jnp.maximum(lnk, 0)
        val = jnp.where((lnk >= 0)[:, None], val, 0.0)
        return grad.at[safe].add(val)

    grad = add(grad, lnk100, gx)
    grad = add(grad, lnk010, gy)
    grad = add(grad, lnk001, gz)
    grad = add(grad, lnk000, g0)
    return grad


def l2_color_grad(
    sh_data: jnp.ndarray, *, scale: float, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """L2 shrinkage gradient on SH coefficients.

    Reference inplace_l2_color_grad (svox2.py:1897-1929): grad +=
    (scaling / n_rows) * sh_data, where n_rows is the count of rows being
    touched (all rows, or the sparse indexer's nonzeros).
    """
    if mask is None:
        return (scale / sh_data.shape[0]) * sh_data
    nz = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    return jnp.where(mask[:, None], (scale / nz) * sh_data, 0.0)
