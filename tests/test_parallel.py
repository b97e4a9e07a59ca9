"""Mesh/sharding tests on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.parallel.mesh import make_mesh, replicate, shard_rays
from nerf_projects_tpu.parallel.render import (
    host_shard_slice,
    is_main_process,
    render_image_sharded,
    render_rays_sharded,
)


def _rays(n):
    d = jax.random.normal(jax.random.PRNGKey(0), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return Rays(jnp.zeros((n, 3)), d, d)


class TestMesh:
    def test_make_mesh_all_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == jax.device_count()

    def test_2d_mesh(self):
        mesh = make_mesh(8, axes={"rays": 4, "grid": 2})
        assert mesh.axis_names == ("rays", "grid")
        assert mesh.devices.shape == (4, 2)

    def test_bad_axes_raise(self):
        with pytest.raises(ValueError):
            make_mesh(8, axes={"rays": 3})

    def test_shard_and_replicate_placement(self):
        mesh = make_mesh()
        rays = shard_rays(mesh, _rays(64))
        assert len(rays.origins.sharding.device_set) == 8
        params = replicate(mesh, {"w": jnp.ones((4, 4))})
        assert params["w"].sharding.is_fully_replicated


class TestShardedRender:
    def test_matches_single_device(self):
        mesh = make_mesh()
        rays = _rays(100)  # deliberately not a multiple of 8

        def render_fn(r):
            return {"rgb": jnp.tanh(r.directions * 2.0)}

        out = render_rays_sharded(mesh, render_fn, rays)
        want = np.tanh(np.asarray(rays.directions) * 2.0)
        np.testing.assert_allclose(out["rgb"], want, atol=1e-6)
        assert out["rgb"].shape == (100, 3)

    def test_image_render(self):
        mesh = make_mesh()
        H = W = 12
        d = jax.random.normal(jax.random.PRNGKey(1), (H, W, 3))
        rays = Rays(jnp.zeros((H, W, 3)), d, d)
        out = render_image_sharded(
            mesh, lambda r: {"rgb": r.directions * 0.5}, rays
        )
        assert out["rgb"].shape == (H, W, 3)
        np.testing.assert_allclose(out["rgb"], np.asarray(d) * 0.5, atol=1e-6)

    def test_real_grid_render_sharded(self):
        from nerf_projects_tpu.models.sparse_grid import SparseGrid
        from nerf_projects_tpu.ops.grid import GridRenderOptions, volume_render_grid

        g = SparseGrid.create(16, basis_dim=1, init_density=3.0)
        mesh = make_mesh()
        rays = _rays(64)
        rays = Rays(-3.0 * rays.directions, rays.directions, rays.viewdirs)
        want = volume_render_grid(g, rays, GridRenderOptions())
        got = render_rays_sharded(
            mesh, lambda r: volume_render_grid(g, r, GridRenderOptions()), rays
        )
        np.testing.assert_allclose(got["rgb"], np.asarray(want["rgb"]), atol=1e-5)


class TestHostHelpers:
    def test_single_process(self):
        assert is_main_process()
        sl = host_shard_slice(100)
        assert sl == slice(0, 100)
