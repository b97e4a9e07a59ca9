"""SparseGrid + grid rendering tests: numpy twins, save/load, training."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.data.synthetic import default_scene, make_dataset, ray_batches, scene_fields
from nerf_projects_tpu.models.sparse_grid import SparseGrid
from nerf_projects_tpu.ops.grid import (
    GridRenderOptions,
    sample_grid,
    trilerp,
    volume_render_grid,
)
from nerf_projects_tpu.train.plenoxels_trainer import (
    PlenoxelsTrainer,
    build_neighbor_links,
    tv_loss,
)


def np_trilerp_dense(dense, gpts):
    """numpy twin: trilinear interp of a dense [X,Y,Z,C] array."""
    X, Y, Z, C = dense.shape
    out = np.zeros((len(gpts), C))
    for n, p in enumerate(gpts):
        l = np.clip(np.floor(p).astype(int), 0, [X - 2, Y - 2, Z - 2])
        w = np.clip(p - l, 0, 1)
        acc = np.zeros(C)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    wt = (
                        (w[0] if dx else 1 - w[0])
                        * (w[1] if dy else 1 - w[1])
                        * (w[2] if dz else 1 - w[2])
                    )
                    acc += wt * dense[l[0] + dx, l[1] + dy, l[2] + dz]
        out[n] = acc
    return out


class TestSparseGrid:
    def test_create_dense(self):
        g = SparseGrid.create(8, basis_dim=4)
        assert g.reso == (8, 8, 8)
        assert g.capacity == 512
        assert g.sh_data.shape == (512, 12)

    def test_sphere_bound_reduces_capacity(self):
        g = SparseGrid.create(16, use_sphere_bound=True)
        assert g.capacity < 16**3
        # sphere of radius 1 in unit cube: ~pi/6 of the volume
        assert g.capacity > 16**3 * 0.4

    def test_world_grid_roundtrip(self):
        g = SparseGrid.create(8, radius=1.3, center=(0.1, -0.2, 0.3))
        pts = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (20, 3)), jnp.float32)
        back = g.grid_to_world(g.world_to_grid(pts))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)

    def test_grid_coord_convention(self):
        # world center of voxel cube maps to grid center (reso-1)/2
        g = SparseGrid.create(8, radius=1.0)
        c = g.world_to_grid(jnp.zeros((1, 3)))
        np.testing.assert_allclose(np.asarray(c), 3.5, atol=1e-6)

    def test_save_load_roundtrip(self, tmp_path):
        g = SparseGrid.create(8, basis_dim=9, radius=1.2)
        g = g.tree_unflatten(
            g.tree_flatten()[1],
            (
                g.links,
                g.density_data + 1.0,
                g.sh_data + 0.25,
            ),
        )
        path = str(tmp_path / "grid.npz")
        g.save(path)
        g2 = SparseGrid.load(path)
        assert g2.basis_dim == 9
        np.testing.assert_array_equal(np.asarray(g2.links), np.asarray(g.links))
        np.testing.assert_allclose(
            np.asarray(g2.density_data), np.asarray(g.density_data)
        )
        # sh stored fp16
        np.testing.assert_allclose(
            np.asarray(g2.sh_data), np.asarray(g.sh_data), atol=1e-3
        )
        np.testing.assert_allclose(g2.radius, g.radius)

    def test_pytree_roundtrip(self):
        g = SparseGrid.create(4)
        leaves, treedef = jax.tree_util.tree_flatten(g)
        g2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert g2.reso == g.reso
        np.testing.assert_allclose(g2.radius, g.radius)


class TestTrilerp:
    def test_matches_dense_numpy(self):
        rng = np.random.default_rng(0)
        g = SparseGrid.create(8, basis_dim=1)
        dense_vals = rng.standard_normal((8, 8, 8, 2)).astype(np.float32)
        # write dense values into compact storage via links
        links = np.asarray(g.links)
        compact = np.zeros((g.capacity, 2), np.float32)
        compact[links] = dense_vals  # links is [X,Y,Z] of row ids
        gpts = rng.uniform(0, 7, (50, 3)).astype(np.float32)
        got = np.asarray(trilerp(g, jnp.asarray(compact), jnp.asarray(gpts)))
        want = np_trilerp_dense(dense_vals, gpts)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_empty_cells_contribute_zero(self):
        g = SparseGrid.create(4, basis_dim=1)
        links = np.asarray(g.links).copy()
        links[:] = -1  # all empty
        g = SparseGrid(
            links=jnp.asarray(links),
            density_data=g.density_data + 5.0,
            sh_data=g.sh_data,
            radius=g.radius,
            center=g.center,
            basis_dim=g.basis_dim,
        )
        out = trilerp(g, g.density_data, jnp.asarray([[1.5, 1.5, 1.5]]))
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_gradients_flow(self):
        g = SparseGrid.create(4, basis_dim=1)

        def f(density):
            from dataclasses import replace

            g2 = replace(g, density_data=density)
            return jnp.sum(trilerp(g2, g2.density_data, jnp.asarray([[1.3, 2.1, 0.7]])))

        grad = jax.grad(f)(g.density_data)
        # exactly 8 corners receive weight, summing to 1
        nz = np.asarray(grad).ravel()
        assert (nz > 0).sum() == 8
        np.testing.assert_allclose(nz.sum(), 1.0, atol=1e-5)


class TestGridRender:
    def test_empty_grid_renders_background(self):
        g = SparseGrid.create(16, basis_dim=1, init_density=0.0)
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
        rays = Rays(jnp.asarray([[0.0, 0, -3.0], [0, -3.0, 0]]), d, d)
        out = volume_render_grid(g, rays, GridRenderOptions())
        np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["acc"]), 0.0, atol=1e-6)

    def test_opaque_center_voxel(self):
        g = SparseGrid.create(16, basis_dim=1, init_density=0.0)
        # make a solid block in the middle with red-ish SH DC
        links = np.asarray(g.links)
        density = np.zeros((g.capacity, 1), np.float32)
        sh = np.zeros((g.capacity, 3), np.float32)
        sel = links[6:10, 6:10, 6:10].ravel()
        density[sel] = 1000.0
        C0 = 0.28209479177387814
        # Uniform color everywhere so boundary trilerp doesn't dilute it;
        # only density is localized to the block.
        sh[:, 0] = (0.9 - 0.5) / C0  # red channel decodes to 0.9
        sh[:, 1] = (0.1 - 0.5) / C0
        sh[:, 2] = (0.1 - 0.5) / C0
        from dataclasses import replace

        g = replace(
            g,
            density_data=jnp.asarray(density),
            sh_data=jnp.asarray(sh),
        )
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        rays = Rays(jnp.asarray([[0.0, 0.0, -3.0]]), d, d)
        out = volume_render_grid(g, rays, GridRenderOptions())
        rgb = np.asarray(out["rgb"][0])
        assert rgb[0] > 0.8 and rgb[1] < 0.2
        assert float(out["acc"][0]) > 0.99

    def test_miss_ray_is_background(self):
        g = SparseGrid.create(8, basis_dim=1, init_density=100.0)
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        rays = Rays(jnp.asarray([[50.0, 50.0, -3.0]]), d, d)  # misses AABB
        out = volume_render_grid(g, rays, GridRenderOptions())
        np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-6)


class TestTV:
    def test_constant_grid_zero_tv(self):
        g = SparseGrid.create(6, basis_dim=1)
        nbr = jnp.asarray(build_neighbor_links(np.asarray(g.links)))
        tv = float(tv_loss(jnp.ones((g.capacity, 1)), nbr))
        assert tv < 1e-5

    def test_tv_positive_for_noise(self):
        g = SparseGrid.create(6, basis_dim=1)
        nbr = jnp.asarray(build_neighbor_links(np.asarray(g.links)))
        rng = np.random.default_rng(0)
        tv = float(tv_loss(jnp.asarray(rng.standard_normal((g.capacity, 1))), nbr))
        assert tv > 0.5

    def test_neighbor_links_shape(self):
        g = SparseGrid.create(4)
        nbr = build_neighbor_links(np.asarray(g.links))
        assert nbr.shape == (64, 3)
        # interior cell has all 3 neighbors
        links = np.asarray(g.links)
        row = links[1, 1, 1]
        assert (nbr[row] >= 0).all()
        # far corner cell has none
        row = links[3, 3, 3]
        assert (nbr[row] == -1).all()


class TestPlenoxelsTraining:
    def test_grid_overfits_synthetic_scene(self):
        ds = make_dataset(n_views=6, image_size=32, radius=4.0)
        g = SparseGrid.create(
            32, basis_dim=1, radius=1.5, use_sphere_bound=False, init_density=0.1
        )
        # lrs scaled for the 32^3 test grid (the reference defaults
        # lr_sigma=3e1 / lr_sh=1e-2 are tuned for 256^3 voxel scale).
        trainer = PlenoxelsTrainer(
            GridRenderOptions(step_size=0.5),
            n_iters=300,
            lr_sigma=3e0,
            lr_sigma_delay_steps=0,
            lr_sh=1e-1,
            lambda_tv=1e-6,
            lambda_tv_sh=1e-7,
        )
        rms = trainer.init_rms(g)
        batches = ray_batches(jax.random.PRNGKey(0), ds, 1024)
        first = last = None
        for i in range(200):
            rays, target = next(batches)
            g, rms, stats = trainer.train_step(
                g, rms, rays, target, jnp.asarray(i, jnp.float32),
                jax.random.PRNGKey(i),
            )
            if i == 0:
                first = float(stats["psnr"])
        last = float(stats["psnr"])
        assert last > first + 5, (first, last)
        assert last > 20, last


class TestOccupancyAccel:
    def test_accelerated_render_matches_exact(self):
        from nerf_projects_tpu.ops.grid_accel import build_occupancy

        g = SparseGrid.create(32, basis_dim=1, init_density=0.0)
        links = np.asarray(g.links)
        dens = np.zeros((g.capacity, 1), np.float32)
        sh = np.zeros((g.capacity, 3), np.float32)
        sel = links[12:20, 12:20, 12:20].ravel()
        dens[sel] = 80.0
        C0 = 0.28209479177387814
        sh[:, 0] = (0.7 - 0.5) / C0
        from dataclasses import replace

        g = replace(g, density_data=jnp.asarray(dens), sh_data=jnp.asarray(sh))
        occ = build_occupancy(g, factor=4, sigma_thresh=1.0)
        assert int(np.asarray(occ.bitmap).sum()) < occ.bitmap.size

        key = jax.random.PRNGKey(0)
        d = jax.random.normal(key, (64, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = Rays(-3.0 * d, d, d)
        opts = GridRenderOptions(step_size=0.5)
        a = volume_render_grid(g, rays, opts)
        b = volume_render_grid(g, rays, opts, occupancy=occ, active_steps=48)
        np.testing.assert_allclose(
            np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(a["acc"]), np.asarray(b["acc"]), atol=2e-3
        )

    def test_miss_rays_stay_background(self):
        from nerf_projects_tpu.ops.grid_accel import build_occupancy

        g = SparseGrid.create(16, basis_dim=1, init_density=0.0)
        occ = build_occupancy(g, factor=4, sigma_thresh=1.0)
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        rays = Rays(jnp.asarray([[0.0, 0.0, -3.0]]), d, d)
        out = volume_render_grid(
            g, rays, GridRenderOptions(), occupancy=occ, active_steps=16
        )
        np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-5)


class TestBackends:
    def _grid(self):
        from dataclasses import replace

        g = SparseGrid.create(16, basis_dim=1, init_density=0.0)
        links = np.asarray(g.links)
        dens = np.zeros((g.capacity, 1), np.float32)
        sh = np.zeros((g.capacity, 3), np.float32)
        dens[links[6:10, 6:10, 6:10].ravel()] = 300.0
        C0 = 0.28209479177387814
        sh[:, 0] = (0.8 - 0.5) / C0
        return replace(g, density_data=jnp.asarray(dens), sh_data=jnp.asarray(sh))

    def _rays(self):
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        return Rays(jnp.asarray([[0.0, 0.0, -3.0]]), d, d)

    def test_nvol_backend(self):
        g, rays = self._grid(), self._rays()
        out = volume_render_grid(g, rays, GridRenderOptions(backend="nvol"))
        rgb = np.asarray(out["rgb"][0])
        assert rgb[0] > 0.6  # hits the red block
        np.testing.assert_allclose(float(out["acc"][0]), 1.0, atol=1e-4)

    def test_svox1_backend_close_to_cuvol(self):
        g, rays = self._grid(), self._rays()
        a = volume_render_grid(g, rays, GridRenderOptions())
        b = volume_render_grid(g, rays, GridRenderOptions(backend="svox1"))
        np.testing.assert_allclose(
            np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=0.1
        )

    def test_nvol_weights_sum_to_one_when_opaque(self):
        g, rays = self._grid(), self._rays()
        out = volume_render_grid(g, rays, GridRenderOptions(backend="nvol"))
        assert abs(float(np.asarray(out["weights"]).sum()) - 1.0) < 1e-4


class TestTopKColor:
    def test_matches_exact_render(self):
        from dataclasses import replace

        g = SparseGrid.create(32, basis_dim=9, init_density=0.0)
        links = np.asarray(g.links)
        rng = np.random.default_rng(0)
        dens = np.zeros((g.capacity, 1), np.float32)
        sh = rng.normal(0, 0.3, (g.capacity, 27)).astype(np.float32)
        sel = links[10:22, 10:22, 10:22].ravel()
        dens[sel] = 60.0
        g = replace(g, density_data=jnp.asarray(dens), sh_data=jnp.asarray(sh))
        d = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = Rays(-3.0 * d, d, d)
        opts = GridRenderOptions()
        exact = volume_render_grid(g, rays, opts)
        fast = volume_render_grid(g, rays, opts, color_top_k=64)
        np.testing.assert_allclose(
            np.asarray(fast["rgb"]), np.asarray(exact["rgb"]), atol=0.02
        )
        np.testing.assert_allclose(
            np.asarray(fast["acc"]), np.asarray(exact["acc"]), atol=1e-4
        )


class TestDenseDensityCache:
    def test_cached_render_matches(self):
        from dataclasses import replace

        from nerf_projects_tpu.ops.grid import make_render_cache

        g = SparseGrid.create(24, basis_dim=1, init_density=0.0)
        links = np.asarray(g.links)
        dens = np.zeros((g.capacity, 1), np.float32)
        dens[links[8:16, 8:16, 8:16].ravel()] = 40.0
        g = replace(g, density_data=jnp.asarray(dens))
        cache = make_render_cache(g)
        d = jax.random.normal(jax.random.PRNGKey(0), (32, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = Rays(-3.0 * d, d, d)
        a = volume_render_grid(g, rays, GridRenderOptions(), color_top_k=32)
        b = volume_render_grid(
            g, rays, GridRenderOptions(), color_top_k=32, dense_density=cache
        )
        np.testing.assert_allclose(
            np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=1e-4
        )
