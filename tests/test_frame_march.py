"""Whole-frame single-dispatch renderer vs the grouped tile march."""
import jax.numpy as jnp
import numpy as np
import pytest

import nerf_projects_tpu.ops.pallas.tile_march as tm
from nerf_projects_tpu.ops.brick_grid import from_sparse_grid
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.ops.pallas.frame_march import render_frame_pallas
from tests.test_tile_march_pallas import (
    random_grid,
    tile_rays,
    tile_rays_256,
)


@pytest.fixture(autouse=True)
def interpret_mode():
    old = tm.INTERPRET
    tm.INTERPRET = True
    yield
    tm.INTERPRET = old


def _setup(seed=0, n_tiles=3, r256=False):
    g = random_grid(16, seed=seed)
    bg = from_sparse_grid(g)
    rays = (tile_rays_256 if r256 else tile_rays)(n_tiles, seed=seed + 1)
    opts = GridRenderOptions(step_size=0.5)
    return bg, rays, opts


class TestRenderFramePallas:
    @pytest.mark.parametrize("group", [768, 8])
    def test_matches_grouped_march(self, group):
        bg, rays, opts = _setup()
        ka = tm.build_packed_kernel_arrays(bg)
        ref = tm.render_tiles_pallas(bg, rays, opts, kernel_arrays=ka)
        out = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, group=group,
            use_occupancy=False, return_depth=True,
        )
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(ref["rgb"]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["acc"]), np.asarray(ref["acc"]),
            rtol=1e-5, atol=1e-5,
        )

    def test_tuple_kernel_arrays_and_256(self):
        bg, rays, opts = _setup(seed=3, r256=True)
        ka = tm.build_kernel_arrays(bg)
        ref = tm.render_tiles_pallas(bg, rays, opts, kernel_arrays=ka)
        # group=10 forces tile runs to straddle group boundaries
        out = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, group=10,
            use_occupancy=False,
        )
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(ref["rgb"]),
            rtol=1e-5, atol=1e-5,
        )

    def test_occupancy_plan_matches(self):
        bg, rays, opts = _setup(seed=5)
        ka = tm.build_packed_kernel_arrays(bg)
        ref = tm.render_tiles_pallas(
            bg, rays, opts, kernel_arrays=ka, use_occupancy=True
        )
        out = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, use_occupancy=True
        )
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(ref["rgb"]),
            rtol=1e-5, atol=1e-5,
        )

    def test_max_windows_cap(self):
        bg, rays, opts = _setup(seed=7)
        ka = tm.build_packed_kernel_arrays(bg)
        full = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, use_occupancy=False,
        )
        # a generous per-tile budget is exact
        capped = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, use_occupancy=False,
            max_windows=int(full["n_windows"]),
        )
        np.testing.assert_allclose(
            np.asarray(capped["rgb"]), np.asarray(full["rgb"]),
            rtol=1e-5, atol=1e-5,
        )
        # a budget of 1 marches fewer windows and changes the frame
        fast = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, use_occupancy=False,
            max_windows=1,
        )
        assert int(fast["n_windows"]) < int(full["n_windows"])

    def test_term_cull_opaque_parity(self):
        """Analytic occlusion cull: on an opaque grid it must DROP
        windows yet keep the frame within march tolerance of the
        uncapped tile march (the culled windows' weights are zero by
        the transmittance bound)."""
        from dataclasses import replace

        # 32^3 so the sphere has fully-interior bricks: the cull's
        # min-density bound is 0 for any brick that straddles the
        # surface (empty cells), so it only fires through interiors
        g = random_grid(32, seed=11)
        # opaque regime: tau/sample >> 1 inside occupied bricks
        g = replace(g, density_data=g.density_data * 400.0 + 50.0)
        bg = from_sparse_grid(g)
        rays = tile_rays(3, seed=12)
        opts = GridRenderOptions(step_size=0.5)
        ka = tm.build_packed_kernel_arrays(bg)
        ref = tm.render_tiles_pallas(bg, rays, opts, kernel_arrays=ka)
        full = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, use_occupancy=False,
            term_cull=False,
        )
        culled = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, use_occupancy=False,
            term_cull=True,
        )
        assert int(culled["n_windows"]) < int(full["n_windows"])
        np.testing.assert_allclose(
            np.asarray(culled["rgb"]), np.asarray(ref["rgb"]),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(culled["rgb"]), np.asarray(full["rgb"]),
            rtol=1e-5, atol=1e-5,
        )

    def test_term_cull_translucent_noop(self):
        """With low densities the bound never fires: the cull must be
        a no-op (same window count, bit-identical output)."""
        bg, rays, opts = _setup(seed=13)
        ka = tm.build_packed_kernel_arrays(bg)
        a = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, use_occupancy=False,
            term_cull=True,
        )
        b = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, use_occupancy=False,
            term_cull=False,
        )
        assert int(a["n_windows"]) == int(b["n_windows"])
        np.testing.assert_array_equal(
            np.asarray(a["rgb"]), np.asarray(b["rgb"])
        )

    @pytest.mark.parametrize("r256", [False, True])
    def test_gather_fetch_parity(self, r256):
        """Gathered-fetch mode (per-window contiguous corner blocks,
        1-2 DMAs/step) must match the 8-row-fetch path bit for bit."""
        bg, rays, opts = _setup(seed=17, r256=r256)
        ka = (
            tm.build_kernel_arrays(bg) if r256
            else tm.build_packed_kernel_arrays(bg)
        )
        a = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, use_occupancy=False,
            gather_fetch=False,
        )
        b = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, use_occupancy=False,
            gather_fetch=True,
        )
        np.testing.assert_array_equal(
            np.asarray(a["rgb"]), np.asarray(b["rgb"])
        )
        np.testing.assert_array_equal(
            np.asarray(a["acc"]), np.asarray(b["acc"])
        )

    @pytest.mark.parametrize("r256", [False, True])
    @pytest.mark.parametrize("wps", [2, 4])
    def test_wps_parity(self, wps, r256):
        """Multi-window grid steps (wps) must be BIT-identical to
        wps=1: sub-windows run sequentially in-kernel and the per-tile
        run padding carries sentinel rows + out-of-range base steps."""
        bg, rays, opts = _setup(seed=19, r256=r256)
        ka = (
            tm.build_kernel_arrays(bg) if r256
            else tm.build_packed_kernel_arrays(bg)
        )
        a = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, use_occupancy=False,
            return_depth=True,
        )
        # group=8 forces padded tile runs to straddle group boundaries
        b = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, use_occupancy=False,
            return_depth=True, wps=wps, group=8,
        )
        for k in ("rgb", "acc", "depth", "log_transmit"):
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )

    def test_wps_with_term_cull_and_early_stop(self):
        """wps composes with the analytic cull + in-kernel early stop
        on an opaque scene (the ship render config)."""
        from dataclasses import replace

        g = random_grid(32, seed=23)
        g = replace(g, density_data=g.density_data * 400.0 + 50.0)
        bg = from_sparse_grid(g)
        rays = tile_rays(3, seed=24)
        opts = GridRenderOptions(step_size=0.5)
        ka = tm.build_packed_kernel_arrays(bg)
        ref = tm.render_tiles_pallas(bg, rays, opts, kernel_arrays=ka)
        out = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, use_occupancy=False,
            term_cull=True, early_stop=True, wps=4,
        )
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(ref["rgb"]),
            rtol=1e-4, atol=1e-4,
        )

    def test_r512_tiles_match_twin(self):
        """16x32-px tiles (512 rays): half the windows per frame of
        r256 at the same coverage — the per-window-instance cost is
        the frame renderer's invariant floor (round-4 floor probe), so
        bigger tiles are the FPS lever. Parity vs the jnp twin through
        the m-way lane relayout (m=4)."""
        import jax
        import jax.numpy as jnp
        from nerf_projects_tpu.core.rays import Rays
        from nerf_projects_tpu.ops.tile_render import render_tiles
        from tests.test_tile_march_pallas import random_grid as rg

        rng = np.random.default_rng(31)
        g = rg(32, seed=31)
        bg = from_sparse_grid(g)
        tiles = []
        for _ in range(2):
            u = rng.standard_normal(3)
            cam = 2.5 * u / np.linalg.norm(u)
            fwd = -cam / 2.5
            right = np.cross(fwd, [0.0, 1.0, 0.0])
            right /= np.linalg.norm(right) + 1e-9
            up2 = np.cross(right, fwd)
            jj, ii = np.meshgrid(np.arange(32.0), np.arange(16.0))
            base = rng.uniform(-40, 40, 2)
            d = (
                fwd[None]
                + ((base[0] + jj.ravel()) / 200.0)[:, None] * right[None]
                + ((base[1] + ii.ravel()) / 200.0)[:, None] * up2[None]
            )
            d = d / np.linalg.norm(d, axis=-1, keepdims=True)
            tiles.append((np.tile(cam[None], (512, 1)), d))
        o = jnp.asarray(np.stack([t[0] for t in tiles]), jnp.float32)
        d = jnp.asarray(np.stack([t[1] for t in tiles]), jnp.float32)
        rays = Rays(o, d, d)
        opts = GridRenderOptions(step_size=0.5)
        ka = tm.build_kernel_arrays(bg)
        want = render_tiles(bg, rays, opts, steps_per_chunk=tm.SC)
        out = render_frame_pallas(
            bg, rays, opts, kernel_arrays=ka, use_occupancy=False,
        )
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(want["rgb"]),
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out["acc"]), np.asarray(want["acc"]),
            rtol=2e-3, atol=2e-3,
        )
