"""tv_grad_bricks must match the cell-level tv_grad_sampled (itself
twin-tested against the reference kernel semantics) when both sample the
same cell set."""
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_projects_tpu.models.sparse_grid import SparseGrid
from nerf_projects_tpu.ops.brick_grid import BRICK, from_sparse_grid
from nerf_projects_tpu.ops.tv import tv_grad_sampled
from nerf_projects_tpu.ops.tv_bricks import sample_brick_window, tv_grad_bricks


def random_grid(reso, channels, seed=0):
    rng = np.random.default_rng(seed)
    g = SparseGrid.create(reso, basis_dim=max(channels // 3, 1),
                          use_sphere_bound=True)
    data = rng.standard_normal((g.capacity, channels)).astype(np.float32)
    return replace(
        g,
        density_data=jnp.asarray(data[:, :1]),
        sh_data=jnp.asarray(data),
    )


def cells_of_bricks(bg, g, rows):
    """Flat dense-grid cell ids of every cell in the given brick rows,
    restricted to cells inside the (unpadded) grid."""
    X, Y, Z = g.links.shape
    coords = np.asarray(bg.brick_coords)[np.asarray(rows)]
    cells = []
    for bx, by, bz in coords:
        for lx in range(BRICK):
            for ly in range(BRICK):
                for lz in range(BRICK):
                    x, y, z = bx * 8 + lx, by * 8 + ly, bz * 8 + lz
                    if x < X and y < Y and z < Z:
                        cells.append((x * Y + y) * Z + z)
    return jnp.asarray(np.asarray(cells, np.int32))


def brick_grad_to_compact(bg, g, grad_bricks):
    """[nb, 512, C] brick-layout grads -> [cap, C] compact rows."""
    L = np.asarray(g.links)
    X, Y, Z = L.shape
    bl = np.asarray(bg.brick_links)
    gb = np.asarray(grad_bricks)
    if gb.ndim == 2:
        gb = gb[..., None]
    out = np.zeros((g.capacity, gb.shape[-1]), np.float32)
    xs, ys, zs = np.nonzero(L >= 0)
    r = bl[xs // 8, ys // 8, zs // 8]
    cib = ((xs % 8) * 8 + (ys % 8)) * 8 + (zs % 8)
    out[L[xs, ys, zs]] = gb[r, cib]
    return out


@pytest.mark.parametrize("reso,ignore_edge", [
    (16, False), (16, True), (24, True),
])
def test_matches_cell_level_tv(reso, ignore_edge):
    channels = 1 if not ignore_edge else 12
    g = random_grid(reso, channels, seed=reso)
    bg = from_sparse_grid(g)
    data_cells = g.density_data if channels == 1 else g.sh_data
    data_bricks = (
        bg.density_bricks if channels == 1
        else bg.sh_bricks
    )
    rows = sample_brick_window(jax.random.PRNGKey(0), bg.n_bricks,
                               max(bg.n_bricks // 3, 1))
    cells = cells_of_bricks(bg, g, rows)

    want = np.asarray(
        tv_grad_sampled(g.links, data_cells, cells, scale=0.37,
                        ignore_edge=ignore_edge)
    )
    got_b = tv_grad_bricks(bg, data_bricks, rows, scale=0.37,
                           ignore_edge=ignore_edge)
    got = brick_grad_to_compact(bg, g, got_b)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_no_grad_into_dead_cells():
    g = random_grid(16, 1, seed=5)
    bg = from_sparse_grid(g)
    rows = jnp.arange(bg.n_bricks, dtype=jnp.int32)
    grad = np.asarray(
        tv_grad_bricks(bg, bg.density_bricks, rows, scale=1.0,
                       ignore_edge=False)
    )
    dead = ~np.asarray(bg.cell_mask)
    assert np.abs(grad[dead]).max() == 0.0
