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


def tile_rays_256(n_tiles=2, seed=0):
    """Coherent 16x16 perspective tiles of 256 rays."""
    rng = np.random.default_rng(seed)
    tiles = []
    for _ in range(n_tiles):
        u = rng.standard_normal(3)
        cam = 2.5 * u / np.linalg.norm(u)
        fwd = -cam / 2.5
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right) + 1e-9
        up2 = np.cross(right, fwd)
        jj, ii = np.meshgrid(np.arange(16.0), np.arange(16.0))
        base = rng.uniform(-40, 40, 2)
        d = (
            fwd[None]
            + ((base[0] + jj.ravel()) / 200.0)[:, None] * right[None]
            + ((base[1] + ii.ravel()) / 200.0)[:, None] * up2[None]
        )
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.tile(cam[None], (256, 1))
        tiles.append((o.astype(np.float32), d.astype(np.float32)))
    o = np.stack([t[0] for t in tiles])
    d = np.stack([t[1] for t in tiles])
    return Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d))


class Test256RayTiles:
    def test_fwd_matches_jnp_twin(self):
        """256-ray tiles (the grid-step halver) through the lane
        relayout helpers must match the einsum twin."""
        g = random_grid(32, seed=2)
        bg = from_sparse_grid(g)
        rays = tile_rays_256(2, seed=3)
        opts = GridRenderOptions(step_size=0.5)
        want = render_tiles(bg, rays, opts, steps_per_chunk=tm.SC)
        got = tm.render_tiles_pallas(bg, rays, opts)
        np.testing.assert_allclose(
            np.asarray(got["rgb"]), np.asarray(want["rgb"]),
            rtol=2e-2, atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(got["acc"]), np.asarray(want["acc"]),
            rtol=2e-2, atol=2e-2,
        )

    def test_fused_grads_match_128(self):
        """The same 512 rays as 2x256-ray tiles vs 4x128-ray tiles must
        produce identical fused gradients (same samples, same loss)."""
        import jax.tree_util as tu

        g = random_grid(32, seed=8)
        bg = from_sparse_grid(g)
        rays256 = tile_rays_256(2, seed=9)
        # the same rays regrouped into 4 tiles of 128
        rays128 = tu.tree_map(
            lambda x: x.reshape(4, 128, 3), rays256
        )
        tgt256 = jnp.full((2, 256, 3), 0.4)
        tgt128 = tgt256.reshape(4, 128, 3)
        opts = GridRenderOptions(step_size=0.5)
        _, gd256, gsh256, _ = tm.render_fused_tiles_pallas(
            bg, rays256, tgt256, opts)
        _, gd128, gsh128, _ = tm.render_fused_tiles_pallas(
            bg, rays128, tgt128, opts)
        # window plans differ (per-tile mean rays) -> small numeric
        # differences where a sample falls outside one plan's window;
        # the grids must agree almost everywhere
        gd256, gd128 = np.asarray(gd256), np.asarray(gd128)
        scale = np.abs(gd128).max() + 1e-12
        ok = np.isclose(gd256 / scale, gd128 / scale, atol=2e-3)
        assert ok.mean() > 0.97, ok.mean()


class TestPackedKernelArrays:
    def test_packed_render_matches_tuple(self):
        """One-fetch-per-corner packed arrays (density x3-interleaved in
        slot B) must render identically to the (density_z, sh_z) pair."""
        g = random_grid(32, seed=4)
        bg = from_sparse_grid(g)
        rays = tile_rays(2, seed=7)
        opts = GridRenderOptions(step_size=0.5)
        ka = tm.build_kernel_arrays(bg)
        packed = tm.pack_kernel_arrays(*ka)
        assert packed.shape == (bg.n_bricks + 1, bg.basis_dim + 1, 8, 192)
        want = tm.render_tiles_pallas(bg, rays, opts, kernel_arrays=ka)
        got = tm.render_tiles_pallas(bg, rays, opts,
                                     kernel_arrays=packed)
        for k in ("rgb", "acc", "log_transmit"):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]),
                rtol=1e-5, atol=1e-5, err_msg=k,
            )


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

    def test_prebuilt_kernel_arrays_match(self):
        """Prebuilt (density_z, sh_z) + geometry-only grid == default."""
        g = random_grid(32, seed=5)
        bg = from_sparse_grid(g)
        rays = tile_rays(2, seed=5)
        opts = GridRenderOptions(step_size=0.5)
        want = tm.render_tiles_pallas(bg, rays, opts)
        ka = tm.build_kernel_arrays(bg)
        slim = tm.geometry_only(bg)
        got = tm.render_tiles_pallas(slim, rays, opts, kernel_arrays=ka)
        np.testing.assert_array_equal(
            np.asarray(got["rgb"]), np.asarray(want["rgb"])
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


class TestFusedBackward:
    def _setup(self, seed=0):
        g = random_grid(16, basis_dim=9, seed=seed)  # 2^3 bricks: window
        bg = from_sparse_grid(g)                     # covers whole grid
        rays = tile_rays(2, seed=seed + 1)
        rng = np.random.default_rng(seed + 2)
        gt = jnp.asarray(rng.uniform(0, 1, (2, 128, 3)).astype(np.float32))
        return bg, rays, gt

    def _twin_loss(self, bg, rays, gt, *, beta=0.0, spars=0.0):
        def loss_fn(dens, sh):
            b = replace(bg, density_bricks=dens, sh_bricks=sh)
            out = render_tiles(b, rays, GridRenderOptions(),
                               steps_per_chunk=tm.SC)
            total = jnp.mean((out["rgb"] - gt) ** 2)
            if beta > 0:
                lt = out["log_transmit"]
                total = total + beta * jnp.mean(
                    lt + jnp.log(1.0 - jnp.exp(lt) + 1e-3)
                )
            if spars > 0:
                total = total + spars * jnp.sum(out["sparsity_sum"])
            return total

        return loss_fn

    @pytest.mark.parametrize("beta,spars", [(0.0, 0.0), (1e-3, 1e-4)])
    def test_grads_match_autodiff_twin(self, beta, spars):
        bg, rays, gt = self._setup()
        rgb, gd, gsh, aux = tm.render_fused_tiles_pallas(
            bg, rays, gt, GridRenderOptions(),
            beta_loss=beta, sparsity_loss=spars,
        )
        loss_fn = self._twin_loss(bg, rays, gt, beta=beta, spars=spars)
        want_d, want_s = jax.grad(loss_fn, argnums=(0, 1))(
            bg.density_bricks, bg.sh_bricks
        )
        # forward parity
        out_twin = render_tiles(bg, rays, GridRenderOptions(),
                                steps_per_chunk=tm.SC)
        np.testing.assert_allclose(np.asarray(rgb),
                                   np.asarray(out_twin["rgb"]),
                                   rtol=2e-2, atol=2e-2)
        # gradient parity (bf16 matmuls both sides, fp32 accum)
        wd, ws = np.asarray(want_d), np.asarray(want_s)
        gd, gsh = np.asarray(gd), np.asarray(gsh)
        scale_d = max(np.abs(wd).max(), 1e-12)
        scale_s = max(np.abs(ws).max(), 1e-12)
        np.testing.assert_allclose(gd / scale_d, wd / scale_d,
                                   atol=3e-2)
        np.testing.assert_allclose(gsh / scale_s, ws / scale_s,
                                   atol=3e-2)

    def test_bf16_grad_blocks_close_to_f32(self):
        """bf16 per-corner block emission: accumulation stays fp32, so
        the scattered grads track the f32-block path closely."""
        bg, rays, gt = self._setup(seed=5)
        _, gd32, gsh32, _ = tm.render_fused_tiles_pallas(
            bg, rays, gt, GridRenderOptions()
        )
        _, gd16, gsh16, _ = tm.render_fused_tiles_pallas(
            bg, rays, gt, GridRenderOptions(),
            grad_dtype=jnp.bfloat16,
        )
        for a, b in ((gd16, gd32), (gsh16, gsh32)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(b).max(), 1e-12)
            np.testing.assert_allclose(
                a / scale, b / scale, atol=1.2e-2
            )

    def test_sigmoid_mode_matches_twin(self):
        """PlenOctree decode (sigmoid) fwd + grads vs the einsum twin —
        the mode finetune_fast trains octree-baked grids with."""
        bg, rays, gt = self._setup(seed=7)
        opts = GridRenderOptions(color_mode="sigmoid")

        got = tm.render_tiles_pallas(bg, rays, opts)
        want = render_tiles(bg, rays, opts, steps_per_chunk=tm.SC)
        np.testing.assert_allclose(
            np.asarray(got["rgb"]), np.asarray(want["rgb"]),
            rtol=2e-2, atol=2e-2,
        )

        rgb, gd, gsh, aux = tm.render_fused_tiles_pallas(
            bg, rays, gt, opts
        )

        def loss_fn(dens, sh):
            b = replace(bg, density_bricks=dens, sh_bricks=sh)
            out = render_tiles(b, rays, opts, steps_per_chunk=tm.SC)
            return jnp.mean((out["rgb"] - gt) ** 2)

        want_d, want_s = jax.grad(loss_fn, argnums=(0, 1))(
            bg.density_bricks, bg.sh_bricks
        )
        wd, ws = np.asarray(want_d), np.asarray(want_s)
        gd, gsh = np.asarray(gd), np.asarray(gsh)
        scale_d = max(np.abs(wd).max(), 1e-12)
        scale_s = max(np.abs(ws).max(), 1e-12)
        np.testing.assert_allclose(gd / scale_d, wd / scale_d, atol=3e-2)
        np.testing.assert_allclose(gsh / scale_s, ws / scale_s, atol=3e-2)

    def test_grad_direction_reduces_loss(self):
        bg, rays, gt = self._setup(seed=5)
        loss_fn = self._twin_loss(bg, rays, gt)
        l0 = float(loss_fn(bg.density_bricks, bg.sh_bricks))
        _, gd, gsh, _ = tm.render_fused_tiles_pallas(
            bg, rays, gt, GridRenderOptions()
        )
        lr = 1e2
        l1 = float(loss_fn(bg.density_bricks - lr * gd,
                           bg.sh_bricks - lr * gsh))
        assert l1 < l0, (l0, l1)


class TestPallasTrainer:
    def test_pallas_train_step_reduces_loss(self):
        from nerf_projects_tpu.data.synthetic import make_dataset, tile_batches
        from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

        ds = make_dataset(n_views=4, image_size=64)
        g = SparseGrid.create(16, basis_dim=9, radius=1.3,
                              use_sphere_bound=True, init_density=0.1)
        bg = from_sparse_grid(g)
        tr = PlenoxelsTrainer(
            GridRenderOptions(), n_iters=100, lr_sigma=3e0,
            lr_sigma_delay_steps=0, lr_sh=1e-1,
            lambda_tv=1e-6, lambda_tv_sh=1e-7, lambda_sparsity=1e-6,
        )
        rms = tr.init_rms_bricks(bg)
        batches = tile_batches(jax.random.PRNGKey(0), ds, 2, 8, 16)
        mses = []
        for i in range(30):
            rays, target = next(batches)
            bg, rms, st = tr.train_step_tiles_pallas(
                bg, rms, rays, target, jnp.asarray(i, jnp.float32),
                jax.random.PRNGKey(i),
            )
            mses.append(float(st["mse"]))
        assert np.isfinite(mses).all()
        assert np.mean(mses[-5:]) < np.mean(mses[:5]) * 0.7, mses


class TestOccupancyRange:
    def test_occupancy_march_matches_full(self):
        """Restricting the march to occupied bricks must not change the
        render (the skipped interval is empty by construction)."""
        from dataclasses import replace as _replace

        # small dense object in the middle of a mostly-empty grid
        g = SparseGrid.create(32, basis_dim=9, use_sphere_bound=False,
                              init_density=0.0)
        links = np.asarray(g.links)
        rng = np.random.default_rng(0)
        dens = np.zeros((g.capacity, 1), np.float32)
        sh = np.zeros((g.capacity, 27), np.float32)
        for x in range(12, 20):
            for y in range(12, 20):
                for z in range(12, 20):
                    r = links[x, y, z]
                    dens[r] = rng.uniform(0, 6)
                    sh[r] = rng.standard_normal(27) * 0.3
        g = _replace(g, density_data=jnp.asarray(dens),
                     sh_data=jnp.asarray(sh))
        # prune empty bricks so the brick bitmap is meaningful
        from nerf_projects_tpu.ops import brick_grid as bgm

        bg = bgm.from_sparse_grid(g)
        keep = np.asarray(
            (np.abs(np.asarray(bg.density_bricks)).sum(-1) > 0)
        )
        # rebuild with only occupied bricks marked
        links_np = np.asarray(g.links).copy()
        occ_cells = np.zeros_like(links_np, dtype=bool)
        occ_cells[12:20, 12:20, 12:20] = True
        links_np[~occ_cells] = -1
        g2 = _replace(g, links=jnp.asarray(links_np))
        bg2 = bgm.from_sparse_grid(g2)

        rays = tile_rays(2, seed=7)
        opts = GridRenderOptions()
        full = tm.render_tiles_pallas(bg2, rays, opts)
        occ = tm.render_tiles_pallas(bg2, rays, opts, use_occupancy=True)
        # at this toy size the bound only ties the default; the shrink
        # is checked structurally below
        from nerf_projects_tpu.ops.tile_render import default_chunks

        assert tm.active_chunk_bound(bg2) <= default_chunks(bg2, 0.5, tm.SC) + 1
        # structural check: a small object inside a big grid gives a
        # much smaller bound than the full-diagonal chunk count
        big = bg2.__class__(
            brick_links=jnp.full((16, 16, 16), -1, jnp.int32),
            density_bricks=bg2.density_bricks,
            sh_bricks=bg2.sh_bricks,
            cell_mask=bg2.cell_mask,
            brick_coords=jnp.asarray([[7, 7, 7], [8, 8, 8]], jnp.int32),
            reso=(128, 128, 128),
            radius=bg2.radius,
            center=bg2.center,
            basis_dim=9,
        )
        assert tm.active_chunk_bound(big) <= 8
        assert default_chunks(big, 0.5, tm.SC) >= 27
        # the occupancy shrink moves the chunk-ladder start (T0), so
        # the two marches sample the same field at phase-shifted
        # quadrature points — small per-pixel differences are the
        # expected discretization effect, not an error (the same holds
        # between any two step-size-equal marches with different t0)
        np.testing.assert_allclose(
            np.asarray(occ["rgb"]), np.asarray(full["rgb"]),
            rtol=2e-2, atol=2e-2,
        )

    def test_aabb_range_is_conservative_superset(self):
        """aabb_t_range's interval contains the EXACT occupied span of
        every ray (brute-force dense sampling of the bitmap), so
        clipping the march to it drops only zero-density samples."""
        from nerf_projects_tpu.ops.grid_accel import (
            OccupancyGrid,
            aabb_t_range,
        )

        rng = np.random.default_rng(5)
        bitmap = np.zeros((16, 16, 16), bool)
        bitmap[4:9, 6:12, 3:7] = rng.random((5, 6, 4)) < 0.4
        occ = OccupancyGrid(bitmap=jnp.asarray(bitmap), factor=8)
        R = 64
        o_np = rng.uniform(0, 128, (R, 3)).astype(np.float32)
        d_np = rng.normal(size=(R, 3)).astype(np.float32)
        t0_np = np.zeros((R,), np.float32)
        t1_np = np.full((R,), 300.0, np.float32)
        te_a, tx_a = aabb_t_range(
            occ, jnp.asarray(o_np), jnp.asarray(d_np),
            jnp.asarray(t0_np), jnp.asarray(t1_np),
        )
        te_a, tx_a = np.asarray(te_a), np.asarray(tx_a)
        t = np.linspace(0.0, 300.0, 20000, dtype=np.float32)
        for r in range(R):
            pos = o_np[r] + t[:, None] * d_np[r]
            cell = np.clip((pos / 8.0).astype(np.int64), 0, 15)
            hit = bitmap[cell[:, 0], cell[:, 1], cell[:, 2]]
            inside = np.all((pos >= 0) & (pos < 128), axis=1)
            hit &= inside
            if not hit.any():
                continue
            te_exact, tx_exact = t[hit].min(), t[hit].max()
            assert te_a[r] <= te_exact + 0.05, r
            assert tx_a[r] >= tx_exact - 0.05, r
            assert te_a[r] < tx_a[r], r

    def test_layout_converters_match_take_path(self):
        """The MXU-matmul sh<->kernel layout converters are bit-exact
        vs the flat-lane permutation take they replaced."""
        for B in (1, 4, 9):
            rng = np.random.default_rng(B)
            sh = jnp.asarray(
                rng.normal(size=(5, 512, 3 * B)), jnp.float32
            )
            k_new = tm.sh_to_kernel_layout(sh, B)
            flat = sh.reshape(5, 512 * 3 * B)
            k_take = jnp.take(
                flat, tm._perm("sh_to_kernel", B), axis=1
            ).reshape(5, B, 8, 192)
            np.testing.assert_array_equal(
                np.asarray(k_new), np.asarray(k_take)
            )
            back = tm.kernel_layout_to_sh(k_new, B)
            np.testing.assert_array_equal(np.asarray(back), np.asarray(sh))


def shell_grid(reso=48, basis_dim=1, seed=11, r_lo=0.75, r_hi=1.02):
    """BrickGrid whose only ACTIVE bricks form a spherical shell —
    interior bricks have no storage (links -1), so most march chunks
    are fully-empty windows."""
    g = random_grid(reso, basis_dim=basis_dim, seed=seed)
    bg = from_sparse_grid(g)
    links = np.asarray(bg.brick_links)
    coords = np.argwhere(links >= 0)
    centers = (coords * 8.0 + 4.0) / reso * 2.0 - 1.0
    rad = np.linalg.norm(centers, axis=1)
    keep = (rad >= r_lo) & (rad <= r_hi)
    old_rows = links[coords[:, 0], coords[:, 1], coords[:, 2]]
    new_links = np.full_like(links, -1)
    new_rows = np.cumsum(keep) - 1
    kept = coords[keep]
    new_links[kept[:, 0], kept[:, 1], kept[:, 2]] = new_rows[keep]
    sel = old_rows[keep]
    return replace(
        bg,
        brick_links=jnp.asarray(new_links),
        density_bricks=bg.density_bricks[sel],
        sh_bricks=bg.sh_bricks[sel],
        cell_mask=bg.cell_mask[sel],
        brick_coords=bg.brick_coords[sel],
    )


class TestChunkCompaction:
    def test_render_exact_match(self):
        bg = shell_grid()
        rays = tile_rays(2, seed=9)
        opts = GridRenderOptions(step_size=0.5)
        want = tm.render_tiles_pallas(bg, rays, opts)
        ck = tm.required_chunks(bg, rays, opts, multiple=1)
        assert ck < tm.default_chunks_for(bg, opts)
        got = tm.render_tiles_pallas(bg, rays, opts, compact_chunks=ck)
        np.testing.assert_array_equal(
            np.asarray(got["rgb"]), np.asarray(want["rgb"])
        )

    def test_fused_grads_exact_match(self):
        bg = shell_grid(seed=12)
        rays = tile_rays(2, seed=10)
        opts = GridRenderOptions(step_size=0.5)
        gt = jnp.full(rays.origins.shape[:2] + (3,), 0.4)
        rgb0, gd0, gsh0, _ = tm.render_fused_tiles_pallas(
            bg, rays, gt, opts
        )
        ck = tm.required_chunks(bg, rays, opts, multiple=1)
        rgb1, gd1, gsh1, _ = tm.render_fused_tiles_pallas(
            bg, rays, gt, opts, compact_chunks=ck
        )
        np.testing.assert_array_equal(np.asarray(rgb0), np.asarray(rgb1))
        np.testing.assert_allclose(
            np.asarray(gd0), np.asarray(gd1), rtol=1e-6, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(gsh0), np.asarray(gsh1), rtol=1e-6, atol=1e-8
        )

    def test_bucketed_render_matches(self):
        bg = shell_grid(seed=13)
        rays = tile_rays(4, seed=14)
        opts = GridRenderOptions(step_size=0.5)
        want = tm.render_tiles_pallas(bg, rays, opts)
        got = tm.render_tiles_pallas_bucketed(bg, rays, opts, buckets=2)
        # the jitted bucket wrapper reorders a few fusions: float-noise
        # level differences only
        np.testing.assert_allclose(
            np.asarray(got["rgb"]), np.asarray(want["rgb"]),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(got["acc"]), np.asarray(want["acc"]),
            rtol=1e-5, atol=1e-6,
        )


class TestWindowsPerStep:
    """wps > 1 marches several consecutive chunks per kernel grid step
    (amortizing the per-step sequencing floor); results must be
    bit-identical to wps=1 — sub-windows run sequentially in-kernel and
    chunk-axis padding contributes exactly nothing."""

    def test_render_matches_wps1(self):
        from nerf_projects_tpu.ops.brick_grid import from_sparse_grid

        bg = from_sparse_grid(random_grid(24, seed=21))
        rays = tile_rays(3, seed=22)
        opts = GridRenderOptions(step_size=0.5)
        want = tm.render_tiles_pallas(bg, rays, opts)
        got = tm.render_tiles_pallas(bg, rays, opts, wps=4)
        for k in ("rgb", "acc", "log_transmit", "sparsity_sum"):
            np.testing.assert_array_equal(
                np.asarray(want[k]), np.asarray(got[k]), err_msg=k
            )

    def test_fused_grads_match_wps1(self):
        from nerf_projects_tpu.ops.brick_grid import from_sparse_grid
        from nerf_projects_tpu.train import plenoxels_sparse as ps

        bg = from_sparse_grid(random_grid(24, seed=23))
        rays = tile_rays(3, seed=24)
        gt = jnp.full(rays.origins.shape[:2] + (3,), 0.4)
        opts = GridRenderOptions(step_size=0.5)
        st = ps.packed_state_from_grid(bg)
        nb, B = bg.n_bricks, bg.basis_dim

        def scat(gp, rows):
            return (
                jnp.zeros((nb + 1, B + 1, 8, 192), jnp.float32)
                .at[rows.reshape(-1)]
                .add(gp.reshape(-1, B + 1, 8, 192).astype(jnp.float32))
            )

        r1 = tm.fused_grad_blocks(
            bg, rays, gt, opts, kernel_arrays=st.packed_k
        )
        r4 = tm.fused_grad_blocks(
            bg, rays, gt, opts, kernel_arrays=st.packed_k, wps=4
        )
        np.testing.assert_array_equal(
            np.asarray(r1[0]), np.asarray(r4[0])
        )
        np.testing.assert_allclose(
            np.asarray(scat(r1[2], r1[3])),
            np.asarray(scat(r4[2], r4[3])),
            rtol=1e-6, atol=1e-8,
        )

    def test_compacted_odd_chunks_pad(self):
        """compact_chunks not divisible by wps exercises _pad_chunks."""
        from nerf_projects_tpu.ops.brick_grid import from_sparse_grid

        bg = from_sparse_grid(shell_like_grid(seed=25))
        rays = tile_rays(3, seed=26)
        opts = GridRenderOptions(step_size=0.5)
        ck = tm.required_chunks(bg, rays, opts, multiple=1)
        if ck % 4 == 0:
            ck += 1  # force a non-multiple
        want = tm.render_tiles_pallas(bg, rays, opts, compact_chunks=ck)
        got = tm.render_tiles_pallas(
            bg, rays, opts, compact_chunks=ck, wps=4
        )
        np.testing.assert_array_equal(
            np.asarray(want["rgb"]), np.asarray(got["rgb"])
        )


def shell_like_grid(seed=0):
    """Sparse shell occupancy (active-chunk compaction has work to do)."""
    g = random_grid(24, seed=seed)
    return g


class TestSkipEmptyWindows:
    """skip_empty gates the march/backward bodies off for all-sentinel
    windows. rgb and SCATTERED grads are exact; the skipped windows'
    raw grad-block slices are garbage by contract (their rows are the
    sentinel, which every scatter consumer drops)."""

    def test_fused_exact_through_scatter(self):
        from nerf_projects_tpu.ops.brick_grid import from_sparse_grid
        from nerf_projects_tpu.train import plenoxels_sparse as ps

        bg = from_sparse_grid(random_grid(24, seed=31))
        rays = tile_rays(3, seed=32)
        gt = jnp.full(rays.origins.shape[:2] + (3,), 0.4)
        opts = GridRenderOptions(step_size=0.5)
        st = ps.packed_state_from_grid(bg)
        nb, B = bg.n_bricks, bg.basis_dim

        def scat(gp, rows):
            return (
                jnp.zeros((nb + 1, B + 1, 8, 192), jnp.float32)
                .at[rows.reshape(-1)]
                .add(gp.reshape(-1, B + 1, 8, 192).astype(jnp.float32))
            )[:nb]

        a = tm.fused_grad_blocks(
            bg, rays, gt, opts, kernel_arrays=st.packed_k
        )
        b = tm.fused_grad_blocks(
            bg, rays, gt, opts, kernel_arrays=st.packed_k,
            skip_empty=True, wps=4,
        )
        np.testing.assert_array_equal(
            np.asarray(a[0]), np.asarray(b[0])
        )
        np.testing.assert_allclose(
            np.asarray(scat(a[2], a[3])), np.asarray(scat(b[2], b[3])),
            rtol=1e-6, atol=1e-8,
        )

    def test_render_skip_matches(self):
        from nerf_projects_tpu.ops.brick_grid import from_sparse_grid

        bg = from_sparse_grid(random_grid(24, seed=33))
        rays = tile_rays(3, seed=34)
        opts = GridRenderOptions(step_size=0.5)
        want = tm.render_tiles_pallas(bg, rays, opts)
        # private path: render has no public skip flag; drive the call
        from nerf_projects_tpu.ops.pallas.tile_march import (
            _kernel_arrays,
            _march_call,
            _orig_with_base,
            _pack_rays,
            _plan_windows,
            default_chunks_for,
        )

        C = default_chunks_for(bg, opts)
        pack, geom = _pack_rays(bg, rays, opts, False)
        wb, rows = _plan_windows(bg, geom, C)
        (orig, rows), C, _ = _orig_with_base(
            wb, rows, bg.n_bricks, C, None
        )
        dz, sz = _kernel_arrays(bg)
        basisf = tm.eval_sh_bases(
            bg.basis_dim, tm._mean_viewdirs(rays)
        ).astype(jnp.float32)
        out = _march_call(dz, sz, rows, orig, basisf, pack, C,
                          bg.basis_dim, "bias", skip_empty=True)
        ref = _march_call(dz, sz, rows, orig, basisf, pack, C,
                          bg.basis_dim, "bias", skip_empty=False)
        # rows 0-6 (rgb/acc/depth/logT/sparsity) exact; row 7 (miss
        # diagnostic) legitimately differs for skipped empty windows
        np.testing.assert_array_equal(
            np.asarray(out[:, 0:7]), np.asarray(ref[:, 0:7])
        )
        del want
