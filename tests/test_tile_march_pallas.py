"""Pallas tile-march kernel vs its jnp twin (ops/tile_render.py)."""
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nerf_projects_tpu.ops.pallas.tile_march as tm
from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.models.sparse_grid import SparseGrid
from nerf_projects_tpu.ops.brick_grid import from_sparse_grid
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.ops.tile_render import render_tiles


@pytest.fixture(autouse=True)
def interpret_mode():
    old = tm.INTERPRET
    tm.INTERPRET = True
    yield
    tm.INTERPRET = old


def random_grid(reso=32, basis_dim=9, seed=0):
    rng = np.random.default_rng(seed)
    g = SparseGrid.create(reso, basis_dim=basis_dim, use_sphere_bound=True)
    dens = rng.uniform(0.0, 6.0, (g.capacity, 1)).astype(np.float32)
    sh = (rng.standard_normal((g.capacity, 3 * basis_dim)) * 0.3).astype(
        np.float32
    )
    return replace(g, density_data=jnp.asarray(dens), sh_data=jnp.asarray(sh))


def tile_rays(n_tiles=2, seed=0):
    """Coherent perspective tiles of 128 rays."""
    rng = np.random.default_rng(seed)
    tiles = []
    for i in range(n_tiles):
        u = rng.standard_normal(3)
        cam = 2.5 * u / np.linalg.norm(u)
        fwd = -cam / 2.5
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right) + 1e-9
        up2 = np.cross(right, fwd)
        jj, ii = np.meshgrid(np.arange(16.0), np.arange(8.0))
        base = rng.uniform(-40, 40, 2)
        d = (
            fwd[None]
            + ((base[0] + jj.ravel()) / 200.0)[:, None] * right[None]
            + ((base[1] + ii.ravel()) / 200.0)[:, None] * up2[None]
        )
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.tile(cam[None], (128, 1))
        tiles.append((o.astype(np.float32), d.astype(np.float32)))
    o = np.stack([t[0] for t in tiles])
    d = np.stack([t[1] for t in tiles])
    return Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d))


class TestPallasMarch:
    def test_matches_jnp_twin(self):
        g = random_grid(32)
        bg = from_sparse_grid(g)
        rays = tile_rays(2)
        opts = GridRenderOptions(step_size=0.5)
        want = render_tiles(bg, rays, opts, steps_per_chunk=tm.SC,
                            return_depth=True)
        got = tm.render_tiles_pallas(bg, rays, opts, return_depth=True)
        assert float(got["window_miss"]) < 2e-3
        # rgb within bf16-matmul tolerance of the twin
        np.testing.assert_allclose(
            np.asarray(got["rgb"]), np.asarray(want["rgb"]),
            rtol=2e-2, atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(got["acc"]), np.asarray(want["acc"]),
            rtol=2e-2, atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(got["depth"]), np.asarray(want["depth"]),
            rtol=5e-2, atol=5e-2,
        )

    def test_sparsity_and_log_transmit(self):
        g = random_grid(16)
        bg = from_sparse_grid(g)
        rays = tile_rays(1, seed=3)
        opts = GridRenderOptions(step_size=0.5)
        want = render_tiles(bg, rays, opts, steps_per_chunk=tm.SC)
        got = tm.render_tiles_pallas(bg, rays, opts)
        np.testing.assert_allclose(
            np.asarray(got["log_transmit"]),
            np.asarray(want["log_transmit"]),
            rtol=3e-2, atol=3e-2,
        )
        np.testing.assert_allclose(
            np.asarray(got["sparsity_sum"]),
            np.asarray(want["sparsity_sum"]),
            rtol=3e-2, atol=3e-2,
        )

    def test_rejects_wrong_tile_size(self):
        g = random_grid(16)
        bg = from_sparse_grid(g)
        o = jnp.zeros((1, 64, 3))
        with pytest.raises(ValueError):
            tm.render_tiles_pallas(bg, Rays(o, o, o))
