"""BrickGrid + lockstep tile renderer: round-trip, parity vs the exact
gather renderer, gradient flow, and window-miss accounting."""
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.models.sparse_grid import SparseGrid
from nerf_projects_tpu.ops.brick_grid import (
    from_sparse_grid,
    gather_windows,
    to_sparse_grid,
)
from nerf_projects_tpu.ops.grid import GridRenderOptions, volume_render_grid
from nerf_projects_tpu.ops.tile_render import (
    render_tiles,
    tiles_from_image_rays,
    untile_image,
)


def random_grid(reso=32, basis_dim=4, seed=0, sphere=True):
    rng = np.random.default_rng(seed)
    g = SparseGrid.create(reso, basis_dim=basis_dim, use_sphere_bound=sphere)
    dens = rng.uniform(0.0, 6.0, (g.capacity, 1)).astype(np.float32)
    sh = (rng.standard_normal((g.capacity, 3 * basis_dim)) * 0.3).astype(
        np.float32
    )
    return replace(g, density_data=jnp.asarray(dens), sh_data=jnp.asarray(sh))


class TestBrickGrid:
    def test_round_trip_exact(self):
        g = random_grid(24, 4)  # 24 not divisible by 8 -> padding path
        bg = from_sparse_grid(g)
        g2 = to_sparse_grid(bg)
        assert g2.links.shape == g.links.shape
        # same activity pattern
        np.testing.assert_array_equal(
            np.asarray(g2.links) >= 0, np.asarray(g.links) >= 0
        )
        # same values at every active cell (row order may differ)
        L1, L2 = np.asarray(g.links), np.asarray(g2.links)
        act = L1 >= 0
        d1 = np.asarray(g.density_data)[L1[act]]
        d2 = np.asarray(g2.density_data)[L2[act]]
        np.testing.assert_allclose(d1, d2, rtol=1e-6)
        s1 = np.asarray(g.sh_data)[L1[act]]
        s2 = np.asarray(g2.sh_data)[L2[act]]
        np.testing.assert_allclose(s1, s2, rtol=1e-6)

    def test_create_brick_grid_matches_from_sparse(self):
        """Direct on-device construction == SparseGrid.create round trip
        (cell occupancy + init values); bench 512^3 setup relies on it."""
        from nerf_projects_tpu.ops.brick_grid import create_brick_grid

        g = SparseGrid.create(
            32, basis_dim=4, use_sphere_bound=True, init_density=0.7
        )
        bg_direct = create_brick_grid(32, basis_dim=4, init_density=0.7)
        g2 = to_sparse_grid(bg_direct)
        np.testing.assert_array_equal(
            np.asarray(g2.links) >= 0, np.asarray(g.links) >= 0
        )
        L1, L2 = np.asarray(g.links), np.asarray(g2.links)
        act = L1 >= 0
        np.testing.assert_allclose(
            np.asarray(g.density_data)[L1[act]],
            np.asarray(g2.density_data)[L2[act]],
            atol=1e-6,
        )
        # brick actives are a superset of from_sparse_grid's (closest-
        # point test); every data-carrying brick is present
        bg_rt = from_sparse_grid(g)
        assert bg_direct.n_bricks >= bg_rt.n_bricks
        assert bg_direct.reso == bg_rt.reso

    def test_gather_windows_matches_dense(self):
        g = random_grid(32, 4)
        bg = from_sparse_grid(g)
        # dense reference volume from links
        L = np.asarray(g.links)
        dense_d = np.zeros(L.shape, np.float32)
        dense_d[L >= 0] = np.asarray(g.density_data)[L[L >= 0], 0]
        wb = jnp.asarray([[0, 1, 2], [2, 2, 2]], jnp.int32)
        win_d, win_sh = gather_windows(bg, wb)
        assert win_d.shape == (2, 16, 16, 16)
        assert win_sh.shape == (2, 16, 16, 16, 12)
        for i, (bx, by, bz) in enumerate([(0, 1, 2), (2, 2, 2)]):
            ref = dense_d[
                bx * 8 : bx * 8 + 16,
                by * 8 : by * 8 + 16,
                bz * 8 : bz * 8 + 16,
            ]
            np.testing.assert_allclose(np.asarray(win_d[i]), ref, rtol=1e-6)


def parallel_tile_rays(n=64, x0=-2.0, span=0.5, seed=0):
    """Rays all parallel to +x from the same x-plane: identical t0, so
    the lockstep sampling coincides exactly with the per-ray march."""
    rng = np.random.default_rng(seed)
    yz = rng.uniform(-span, span, (n, 2)).astype(np.float32)
    o = np.concatenate([np.full((n, 1), x0, np.float32), yz], axis=-1)
    d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))
    return Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d))


class TestTileRenderParity:
    def test_matches_exact_renderer_on_parallel_rays(self):
        g = random_grid(32, 4)
        bg = from_sparse_grid(g)
        rays = parallel_tile_rays(64, span=0.15)
        opts = GridRenderOptions(step_size=0.5)
        exact = volume_render_grid(g, rays, opts, return_depth=True)
        tiled = render_tiles(
            bg,
            jax.tree_util.tree_map(lambda x: x[None], rays),
            opts,
            return_depth=True,
        )
        assert float(tiled["window_miss"]) == 0.0
        np.testing.assert_allclose(
            np.asarray(tiled["rgb"][0]), np.asarray(exact["rgb"]),
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(tiled["acc"][0]), np.asarray(exact["acc"]),
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(tiled["depth"][0]), np.asarray(exact["depth"]),
            rtol=5e-3, atol=5e-3,
        )
        np.testing.assert_allclose(
            np.asarray(tiled["log_transmit"][0]),
            np.asarray(exact["log_transmit"]),
            rtol=2e-3, atol=2e-3,
        )

    def test_perspective_tile_close_to_exact(self):
        """A real 8x8 perspective pixel tile: lockstep phase + shared
        basis are the only deviations; images must agree closely."""
        from nerf_projects_tpu.core.rays import camera_rays_opencv

        g = random_grid(32, 4, seed=3)
        bg = from_sparse_grid(g)
        H = W = 64
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0.0, 0.0, -2.5]
        rays = camera_rays_opencv(
            H, W, 70.0, 70.0, W / 2, H / 2, jnp.asarray(c2w)
        )
        flat = jax.tree_util.tree_map(lambda x: x.reshape(-1, 3), rays)
        opts = GridRenderOptions(step_size=0.5)
        exact = volume_render_grid(g, flat, opts)
        tiles = tiles_from_image_rays(flat, H, W, 8, 8)
        tiled = render_tiles(bg, tiles, opts)
        img_t = untile_image(tiled["rgb"], H, W, 8, 8).reshape(-1, 3)
        # grazing corner tiles can drop a handful of samples; they are
        # masked-to-empty and must stay rare + sub-visual
        assert float(tiled["window_miss"]) < 5e-4
        err = np.abs(np.asarray(img_t) - np.asarray(exact["rgb"]))
        mse = float(np.mean(err**2))
        psnr = -10 * np.log10(mse + 1e-12)
        assert psnr > 45.0, psnr  # deviations are sub-visual

    def test_gradients_flow_to_bricks(self):
        g = random_grid(16, 4)
        bg = from_sparse_grid(g)
        rays = jax.tree_util.tree_map(
            lambda x: x[None], parallel_tile_rays(32, span=0.2)
        )
        target = jnp.full((1, 32, 3), 0.2)

        def loss(dens, sh):
            b = replace(bg, density_bricks=dens, sh_bricks=sh)
            out = render_tiles(b, rays, GridRenderOptions())
            return jnp.mean((out["rgb"] - target) ** 2)

        gd, gs = jax.grad(loss, argnums=(0, 1))(
            bg.density_bricks, bg.sh_bricks
        )
        assert np.isfinite(np.asarray(gd)).all()
        assert float(jnp.abs(gd).sum()) > 0
        assert float(jnp.abs(gs).sum()) > 0

    def test_window_miss_counted_for_incoherent_tile(self):
        """Rays pointing in wildly different directions cannot share
        windows — the renderer must report misses, not garbage."""
        g = random_grid(32, 4)
        bg = from_sparse_grid(g)
        rng = np.random.default_rng(0)
        d = rng.standard_normal((64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.zeros((64, 3), np.float32)
        rays = Rays(*(jnp.asarray(x)[None] for x in (o, d, d)))
        out = render_tiles(bg, rays, GridRenderOptions())
        assert float(out["window_miss"]) > 0.01
        assert np.isfinite(np.asarray(out["rgb"])).all()


class TestTileTraining:
    def test_brick_trainer_converges_on_synthetic(self):
        """Tile-based training must converge like the cell path
        (mirror of test_grid.py's plenoxels convergence test)."""
        from nerf_projects_tpu.data.synthetic import make_dataset, tile_batches
        from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

        ds = make_dataset(n_views=6, image_size=64)
        g = SparseGrid.create(
            32, basis_dim=1, radius=1.3, use_sphere_bound=True,
            init_density=0.1,
        )
        bg = from_sparse_grid(g)
        trainer = PlenoxelsTrainer(
            GridRenderOptions(step_size=0.5),
            n_iters=300,
            lr_sigma=3e0,
            lr_sigma_delay_steps=0,
            lr_sh=1e-1,
            lambda_tv=1e-6,
            lambda_tv_sh=1e-7,
        )
        rms = trainer.init_rms_bricks(bg)
        batches = tile_batches(jax.random.PRNGKey(0), ds, 16, 8, 8)
        first = last = None
        for i in range(200):
            rays, target = next(batches)
            bg, rms, stats = trainer.train_step_tiles(
                bg, rms, rays, target, jnp.asarray(i, jnp.float32),
                jax.random.PRNGKey(i),
            )
            if i == 0:
                first = float(stats["psnr"])
        last = float(stats["psnr"])
        assert last > first + 5, (first, last)
        assert last > 20, last
