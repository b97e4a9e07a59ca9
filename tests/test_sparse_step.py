"""Row-sparse trainer step vs the dense tile step (exact parity).

The sparse step's contract: identical numerics to
`PlenoxelsTrainer.train_step_tiles_pallas` (same kernels, same TV
sampling, same RMSprop recursion via closed-form lazy decay) at
O(touched) cost. Verified over multiple steps with disjoint ray sets so
rows go untouched across steps (exercising the b^D compensation).
"""
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nerf_projects_tpu.ops.pallas.tile_march as tm
from nerf_projects_tpu.ops.brick_grid import from_sparse_grid
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.train import plenoxels_sparse as ps
from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

from test_tile_march_pallas import random_grid, tile_rays


@pytest.fixture(autouse=True)
def interpret_mode():
    old = tm.INTERPRET
    tm.INTERPRET = True
    yield
    tm.INTERPRET = old


def make_trainer(**kw):
    # TV lambdas x512: tv_grad_* normalize by the sampled-cell count
    # (reference loss_kernel.cu:595), which is 1 brick = 512 cells at
    # these tiny grids; unscaled, the per-edge TV gradient drops below
    # scatter-order fp noise and RMSprop's sign-sized updates turn that
    # noise into lr-sized divergence between the (mathematically
    # identical) layouts under test.
    base = dict(
        n_iters=1000, lambda_tv=512e-4, lambda_tv_sh=512e-3,
        lambda_beta=1e-3, lambda_sparsity=1e-6,
        lr_sigma=3e1, lr_sigma_delay_steps=0, lr_sh=1e-2,
    )
    base.update(kw)
    return PlenoxelsTrainer(GridRenderOptions(step_size=0.5), **base)


class TestSparseStep:
    def _run_pair(self, trainer, n_steps=3, seed=0):
        g = random_grid(24, seed=seed)
        bg = from_sparse_grid(g)
        st = ps.sparse_state_from_grid(bg)
        rms = trainer.init_rms_bricks(bg)
        dense_bg = bg

        for i in range(n_steps):
            rays = tile_rays(2, seed=100 + 7 * i)
            target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
            key = jax.random.PRNGKey(i)
            step_i = jnp.asarray(i, jnp.int32)
            # sparse first: the dense step DONATES its bg buffers
            st, sstats = ps.train_step_tiles_sparse(
                trainer, dense_bg, st, rays, target, step_i, key
            )
            dense_bg, rms, dstats = trainer.train_step_tiles_pallas(
                dense_bg, rms, rays, target,
                step_i.astype(jnp.float32), key,
            )
            assert float(sstats["touched_overflow"]) == 0.0
            np.testing.assert_allclose(
                float(sstats["mse"]), float(dstats["mse"]),
                rtol=1e-5, atol=1e-7,
            )
        # Scatter-add ORDER differs between the two paths (dense: flat
        # blocks into [nb]; sparse: segments into [K]); f32 addition is
        # non-associative, and RMSprop's scale-invariant update
        # (lr*g/(sqrt((1-b)g^2))) amplifies order noise for cells whose
        # gradient nearly cancels. Assert near-total agreement instead
        # of elementwise equality.
        def mostly_equal(a, b, frac=0.995, rtol=1e-3, atol=1e-4):
            a, b = np.asarray(a), np.asarray(b)
            ok = np.isclose(a, b, rtol=rtol, atol=atol)
            assert ok.mean() > frac, f"only {ok.mean():.4f} close"

        out = ps.grid_from_sparse_state(dense_bg, st)
        mostly_equal(out.density_bricks, dense_bg.density_bricks)
        mostly_equal(out.sh_bricks, dense_bg.sh_bricks)
        # rms parity (lazy b^D decay == dense per-step decay)
        nb = dense_bg.n_bricks
        mostly_equal(
            st.rms_density[:nb].reshape(nb, 512), rms.rms_density
        )

    def test_parity_rmsprop(self):
        self._run_pair(make_trainer())

    def test_parity_sgd(self):
        self._run_pair(
            make_trainer(sigma_optim="sgd", sh_optim="sgd"), n_steps=2
        )

    def test_overflow_reported(self):
        trainer = make_trainer()
        g = random_grid(24, seed=1)
        bg = from_sparse_grid(g)
        st = ps.sparse_state_from_grid(bg)
        rays = tile_rays(2, seed=3)
        target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
        st2, stats = ps.train_step_tiles_sparse(
            trainer, bg, st, rays, target,
            jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0),
            max_touched=2,
        )
        assert float(stats["touched_overflow"]) > 0.0
        # state stays finite/usable despite dropped contributions
        assert bool(jnp.all(jnp.isfinite(st2.density_k)))

    def test_unsupported_regularizers_raise(self):
        trainer = make_trainer(lambda_l2_sh=1e-3)
        g = random_grid(16, seed=2)
        bg = from_sparse_grid(g)
        st = ps.sparse_state_from_grid(bg)
        rays = tile_rays(1, seed=4)
        target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
        with pytest.raises(ValueError, match="sparse step"):
            ps.train_step_tiles_sparse(
                trainer, bg, st, rays, target,
                jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0),
            )


class TestDenseKernelLayoutStep:
    def test_matches_brick_layout_dense_step(self):
        """The kernel-layout dense step (no per-step relayouts) must
        reproduce train_step_tiles_pallas: same kernels, same TV
        sampling, same dense RMSprop — only the state layout differs."""
        trainer = make_trainer()
        g = random_grid(24, seed=5)
        bg = from_sparse_grid(g)
        st = ps.sparse_state_from_grid(bg, shared_kernel_arrays=True)
        # reference A: the sparse step in shared-f32 mode (IDENTICAL
        # forward precision — marches the same f32 masters); proves
        # the dense scatter + dense RMSprop recursion.
        st_sp = ps.sparse_state_from_grid(bg, shared_kernel_arrays=True)
        # reference B: the brick-layout dense step (marches bf16
        # kernel-array copies — mse agrees to bf16 forward tolerance).
        dense_bg = jax.tree_util.tree_map(jnp.copy, bg)
        rms = trainer.init_rms_bricks(dense_bg)

        def mostly_equal(a, b, frac=0.995, rtol=1e-3, atol=1e-4):
            a, b = np.asarray(a), np.asarray(b)
            ok = np.isclose(a, b, rtol=rtol, atol=atol)
            assert ok.mean() > frac, f"only {ok.mean():.4f} close"

        for i in range(3):
            rays = tile_rays(2, seed=300 + 11 * i)
            target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
            key = jax.random.PRNGKey(i)
            step_i = jnp.asarray(i, jnp.int32)
            st, kstats = ps.train_step_tiles_dense_k(
                trainer, bg, st, rays, target, step_i, key,
            )
            st_sp, sstats = ps.train_step_tiles_sparse(
                trainer, bg, st_sp, rays, target, step_i, key,
            )
            dense_bg, rms, dstats = trainer.train_step_tiles_pallas(
                dense_bg, rms, rays, target,
                jnp.asarray(float(i)), key,
            )
            np.testing.assert_allclose(
                float(kstats["mse"]), float(sstats["mse"]),
                rtol=1e-5, atol=1e-7,
            )
            np.testing.assert_allclose(
                float(kstats["mse"]), float(dstats["mse"]), rtol=3e-3,
            )
        mostly_equal(st.density_k, st_sp.density_k)
        mostly_equal(st.sh_k, st_sp.sh_k)
        mostly_equal(st.rms_density, st_sp.rms_density)
        # brick-layout step cross-check at looser forward tolerance
        out = ps.grid_from_sparse_state(dense_bg, st)
        mostly_equal(out.density_bricks, dense_bg.density_bricks,
                     frac=0.98)


class TestPackedStep:
    def test_matches_dense_k_step(self):
        """Fully-packed step (one fetch/corner, one grad block/corner,
        one scatter, one optimizer sweep) must match the kernel-layout
        dense step — identical f32 forward, identical RMSprop."""
        trainer = make_trainer()
        g = random_grid(24, seed=6)
        bg = from_sparse_grid(g)
        st_k = ps.sparse_state_from_grid(bg, shared_kernel_arrays=True)
        st_p = ps.packed_state_from_grid(bg)

        def mostly_equal(a, b, frac=0.995, rtol=1e-3, atol=1e-4):
            a, b = np.asarray(a), np.asarray(b)
            ok = np.isclose(a, b, rtol=rtol, atol=atol)
            assert ok.mean() > frac, f"only {ok.mean():.4f} close"

        for i in range(3):
            rays = tile_rays(2, seed=500 + 3 * i)
            target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
            key = jax.random.PRNGKey(i)
            step_i = jnp.asarray(i, jnp.int32)
            st_p, pstats = ps.train_step_tiles_packed(
                trainer, bg, st_p, rays, target, step_i, key,
            )
            st_k, kstats = ps.train_step_tiles_dense_k(
                trainer, bg, st_k, rays, target, step_i, key,
            )
            np.testing.assert_allclose(
                float(pstats["mse"]), float(kstats["mse"]),
                rtol=1e-5, atol=1e-7,
            )
        B = bg.basis_dim
        nb = bg.n_bricks
        mostly_equal(st_p.packed_k[:, :B], st_k.sh_k)
        dens_p = np.asarray(
            st_p.packed_k[:, B].reshape(-1, 8, 64, 3)[..., 0]
        )
        mostly_equal(dens_p, st_k.density_k)
        # the three interleaved density lanes stay consistent
        d3 = np.asarray(st_p.packed_k[:, B]).reshape(-1, 8, 64, 3)
        np.testing.assert_allclose(d3[..., 0], d3[..., 1], rtol=1e-6)
        np.testing.assert_allclose(d3[..., 0], d3[..., 2], rtol=1e-6)
        # round-trip back to a grid
        out = ps.grid_from_packed_state(bg, st_p)
        assert out.density_bricks.shape == bg.density_bricks.shape
        assert bool(jnp.all(jnp.isfinite(out.sh_bricks)))


class TestSparseBf16Rms:
    def test_bf16_rms_close_to_f32(self):
        """bf16 RMS accumulator (the 512^3 memory option) tracks the
        f32-accumulator step closely (denominator-only use)."""
        trainer = make_trainer()
        g = random_grid(24, seed=9)
        bg = from_sparse_grid(g)
        st32 = ps.sparse_state_from_grid(bg)
        st16 = ps.sparse_state_from_grid(bg, rms_dtype=jnp.bfloat16)
        assert st16.rms_sh.dtype == jnp.bfloat16
        rays = tile_rays(2, seed=21)
        target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
        for i in range(2):
            k = jax.random.PRNGKey(i)
            step = jnp.asarray(i, jnp.int32)
            st32, _ = ps.train_step_tiles_sparse(
                trainer, bg, st32, rays, target, step, k)
            st16, _ = ps.train_step_tiles_sparse(
                trainer, bg, st16, rays, target, step, k)
        a = np.asarray(st16.density_k)
        b = np.asarray(st32.density_k)
        scale = np.abs(b).max() + 1e-12
        close = np.isclose(a / scale, b / scale, rtol=0, atol=2e-2)
        assert close.mean() > 0.99

    def test_shared_kernel_arrays_matches(self):
        """density_z/sh_z=None (march on f32 masters) == the bf16-copy
        state to bf16 tolerance."""
        trainer = make_trainer()
        g = random_grid(24, seed=15)
        bg = from_sparse_grid(g)
        st_c = ps.sparse_state_from_grid(bg)
        st_s = ps.sparse_state_from_grid(bg, shared_kernel_arrays=True)
        assert st_s.density_z is None
        rays = tile_rays(2, seed=31)
        target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
        for i in range(2):
            k = jax.random.PRNGKey(i)
            step = jnp.asarray(i, jnp.int32)
            st_c, _ = ps.train_step_tiles_sparse(
                trainer, bg, st_c, rays, target, step, k)
            st_s, _ = ps.train_step_tiles_sparse(
                trainer, bg, st_s, rays, target, step, k)
        assert st_s.density_z is None
        a, b = np.asarray(st_s.density_k), np.asarray(st_c.density_k)
        scale = np.abs(b).max() + 1e-12
        close = np.isclose(a / scale, b / scale, rtol=0, atol=2e-2)
        assert close.mean() > 0.99


class TestPackedTouchedStep:
    def test_matches_packed_dense_update(self):
        """Touched-row packed step == dense packed step numerics:
        identical kernels + TV; the lazy b^D rms decay must reproduce
        the dense sweep's per-step decay exactly (disjoint ray sets
        across steps leave rows untouched in between)."""
        trainer = make_trainer()
        g = random_grid(24, seed=9)
        bg = from_sparse_grid(g)
        st_d = ps.packed_state_from_grid(bg)
        st_t = ps.packed_state_from_grid(bg)

        for i in range(4):
            rays = tile_rays(2, seed=900 + 11 * i)
            target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
            key = jax.random.PRNGKey(i)
            step_i = jnp.asarray(i, jnp.int32)
            st_t, tstats = ps.train_step_tiles_packed_touched(
                trainer, bg, st_t, rays, target, step_i, key,
                max_touched=4096,
            )
            st_d, dstats = ps.train_step_tiles_packed(
                trainer, bg, st_d, rays, target, step_i, key,
            )
            np.testing.assert_allclose(
                float(tstats["mse"]), float(dstats["mse"]),
                rtol=1e-5, atol=1e-7,
            )
            assert float(tstats["touched_overflow"]) == 0.0
        np.testing.assert_allclose(
            np.asarray(st_t.packed_k), np.asarray(st_d.packed_k),
            rtol=1e-4, atol=1e-5,
        )
        # atol 1e-5: the first-visit bootstrap branches on rms == 0.0
        # exactly, and the two paths' scatter-accumulation orders can
        # disagree on whether a cancelling gradient is exactly zero —
        # a handful of near-zero rms entries differ at the 1e-6 level
        # (the reference's atomicAdd ordering has the same property)
        np.testing.assert_allclose(
            np.asarray(st_t.rms), np.asarray(st_d.rms),
            rtol=1e-4, atol=1e-5,
        )

    def test_pervisit_rms_gap_invariant(self):
        """rms_pervisit=True: the update must not depend on the GAP
        between touches (rms decays once per visit, not beta^delta).
        Two identical 2-step runs whose second step carries global step
        index 1 vs 500 must produce identical states (modulo the lr
        schedule, held constant here). The literal semantics
        (pervisit=False) must differ — beta^499 collapses the
        accumulator and the update degenerates toward
        lr*g/sqrt((1-b)g^2)."""
        g = random_grid(24, seed=12)
        bg = from_sparse_grid(g)
        rays = tile_rays(2, seed=55)
        target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
        key = jax.random.PRNGKey(3)

        def two_steps(trainer, second_step):
            st = ps.packed_state_from_grid(bg)
            st, _ = ps.train_step_tiles_packed_touched(
                trainer, bg, st, rays, target,
                jnp.asarray(0, jnp.int32), key, max_touched=4096,
            )
            st, _ = ps.train_step_tiles_packed_touched(
                trainer, bg, st, rays, target,
                jnp.asarray(second_step, jnp.int32), key,
                max_touched=4096,
            )
            return np.asarray(st.packed_k)

        # constant lr: isolate the rms semantics from the lr schedule
        lr_kw = dict(
            lr_sigma=1.0, lr_sigma_final=1.0,
            lr_sh=1e-2, lr_sh_final=1e-2,
        )
        pv = make_trainer(rms_pervisit=True, **lr_kw)
        a = two_steps(pv, 1)
        b = two_steps(pv, 500)
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

        lit = make_trainer(rms_pervisit=False, **lr_kw)
        c = two_steps(lit, 500)
        assert not np.allclose(b, c, rtol=1e-4, atol=1e-5)

    def test_overflow_reported(self):
        trainer = make_trainer()
        g = random_grid(24, seed=10)
        bg = from_sparse_grid(g)
        st = ps.packed_state_from_grid(bg)
        rays = tile_rays(2, seed=31)
        target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
        st, stats = ps.train_step_tiles_packed_touched(
            trainer, bg, st, rays, target,
            jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0),
            max_touched=8,
        )
        assert float(stats["touched_overflow"]) > 0.0
        assert bool(jnp.all(jnp.isfinite(st.packed_k)))


class TestTileReducedTouchedStep:
    """wps + tile_segment_reduce variants of the touched step: the MXU
    pre-reduction and multi-window kernel steps must reproduce the
    plain touched step's numerics."""

    def test_matches_plain_touched(self):
        trainer = make_trainer()
        g = random_grid(24, seed=40)
        bg = from_sparse_grid(g)
        opts = trainer.opts
        st_a = ps.packed_state_from_grid(bg)
        st_b = ps.packed_state_from_grid(bg)

        for i in range(3):
            rays = tile_rays(2, seed=700 + 3 * i)
            target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
            key = jax.random.PRNGKey(i)
            step_i = jnp.asarray(i, jnp.int32)
            kt = ps.required_tile_rows(bg, rays, opts)
            st_a, astats = ps.train_step_tiles_packed_touched(
                trainer, bg, st_a, rays, target, step_i, key,
                max_touched=4096,
            )
            st_b, bstats = ps.train_step_tiles_packed_touched(
                trainer, bg, st_b, rays, target, step_i, key,
                max_touched=4096, wps=4, tile_rows=kt,
            )
            np.testing.assert_allclose(
                float(astats["mse"]), float(bstats["mse"]),
                rtol=1e-6, atol=1e-8,
            )
            assert int(bstats["dropped_tile_rows"]) == 0
        np.testing.assert_allclose(
            np.asarray(st_a.packed_k), np.asarray(st_b.packed_k),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(st_a.rms), np.asarray(st_b.rms),
            rtol=1e-4, atol=1e-6,
        )

    def test_tile_reduce_exact_vs_scatter(self):
        """tile_segment_reduce == scatter-add of the same blocks."""
        trainer = make_trainer()
        g = random_grid(24, seed=41)
        bg = from_sparse_grid(g)
        st = ps.packed_state_from_grid(bg)
        rays = tile_rays(3, seed=42)
        target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
        nb, B = bg.n_bricks, bg.basis_dim
        _, _, gp, rows, _ = tm.fused_grad_blocks(
            bg, rays, target, trainer.opts, kernel_arrays=st.packed_k
        )
        kt = ps.required_tile_rows(bg, rays, trainer.opts)
        trows, tacc, dropped = ps.tile_segment_reduce(
            gp, rows, nb, kt
        )
        assert int(dropped) == 0

        def scat(blocks, rws):
            return (
                jnp.zeros((nb + 1, B + 1, 8, 192), jnp.float32)
                .at[rws.reshape(-1)]
                .add(
                    blocks.reshape(-1, B + 1, 8, 192).astype(
                        jnp.float32
                    )
                )[:nb]
            )

        want = scat(gp, rows)
        got = scat(tacc, trows)
        np.testing.assert_allclose(
            np.asarray(want), np.asarray(got), rtol=1e-6, atol=1e-7
        )

    def test_dropped_tile_rows_reported(self):
        trainer = make_trainer()
        g = random_grid(24, seed=43)
        bg = from_sparse_grid(g)
        st = ps.packed_state_from_grid(bg)
        rays = tile_rays(2, seed=44)
        target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
        st, stats = ps.train_step_tiles_packed_touched(
            trainer, bg, st, rays, target,
            jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0),
            max_touched=4096, tile_rows=8,
        )
        assert int(stats["dropped_tile_rows"]) > 0
        assert bool(jnp.all(jnp.isfinite(st.packed_k)))


class TestFlatWindowStep:
    """Flat active-window plan (ops/pallas/flat_train.py): both train
    kernels march exactly the batch's active windows instead of the
    (T, C) grid's batch-max padding — results must match the grouped
    kernels (inactive windows contribute exactly nothing)."""

    def test_flat_fused_matches_tc(self):
        from nerf_projects_tpu.ops.pallas.flat_train import (
            fused_grad_blocks_flat,
            required_windows,
        )

        bg = from_sparse_grid(random_grid(24, seed=50))
        rays = tile_rays(3, seed=51)
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

        want = tm.fused_grad_blocks(
            bg, rays, gt, opts, kernel_arrays=st.packed_k,
            use_occupancy=True, skip_empty=True,
            beta_loss=1e-3, sparsity_loss=1e-4,
        )
        wc = required_windows(bg, rays, opts)
        assert wc > 0
        # group=16 forces several groups with tiles straddling group
        # boundaries (the carry gather/scatter path)
        for group in (16, 640):
            got = fused_grad_blocks_flat(
                bg, rays, gt, opts, kernel_arrays=st.packed_k,
                w_cap=wc, group=group,
                beta_loss=1e-3, sparsity_loss=1e-4,
            )
            np.testing.assert_array_equal(
                np.asarray(want[0]), np.asarray(got[0]),
                err_msg=f"rgb group={group}",
            )
            np.testing.assert_allclose(
                np.asarray(scat(want[2], want[3])),
                np.asarray(scat(got[2], got[3])),
                rtol=1e-6, atol=1e-8,
                err_msg=f"grads group={group}",
            )
            assert int(got[4]["dropped_windows"]) == 0

    def test_flat_touched_step_matches(self):
        from nerf_projects_tpu.ops.pallas.flat_train import (
            required_windows,
        )

        trainer = make_trainer()
        g = random_grid(24, seed=52)
        bg = from_sparse_grid(g)
        st_a = ps.packed_state_from_grid(bg)
        st_b = ps.packed_state_from_grid(bg)
        for i in range(3):
            rays = tile_rays(2, seed=800 + 3 * i)
            target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
            key = jax.random.PRNGKey(i)
            step_i = jnp.asarray(i, jnp.int32)
            wc = required_windows(bg, rays, trainer.opts)
            st_a, astats = ps.train_step_tiles_packed_touched(
                trainer, bg, st_a, rays, target, step_i, key,
                max_touched=4096, use_occupancy=True,
            )
            st_b, bstats = ps.train_step_tiles_packed_touched(
                trainer, bg, st_b, rays, target, step_i, key,
                max_touched=4096, flat_windows=wc,
            )
            np.testing.assert_allclose(
                float(astats["mse"]), float(bstats["mse"]),
                rtol=1e-6, atol=1e-8,
            )
            assert int(bstats["dropped_active_chunks"]) == 0
        np.testing.assert_allclose(
            np.asarray(st_a.packed_k), np.asarray(st_b.packed_k),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(st_a.rms), np.asarray(st_b.rms),
            rtol=1e-4, atol=1e-6,
        )

    def test_required_touched_rows_exact(self):
        """The host-side bound covers every row the step touches: a
        touched step sized exactly to it reports zero overflow, and
        the bound is tight up to rounding + the worst-case TV term."""
        from nerf_projects_tpu.ops.pallas.flat_train import (
            required_windows,
        )

        trainer = make_trainer()
        bg = from_sparse_grid(random_grid(24, seed=57))
        st = ps.packed_state_from_grid(bg)
        rays = tile_rays(3, seed=58)
        target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
        nb = bg.n_bricks
        tv_w = max(int(trainer.tv_sparsity * nb), 1) + max(
            int(trainer.tv_sh_sparsity * nb), 1
        )
        k = ps.required_touched_rows(
            bg, rays, trainer.opts, tv_rows=4 * tv_w, multiple=16
        )
        assert 0 < k <= nb + 16 + 4 * tv_w
        wc = required_windows(bg, rays, trainer.opts)
        for kwargs in (
            {"use_occupancy": True},
            {"flat_windows": wc},
        ):
            _, stats = ps.train_step_tiles_packed_touched(
                trainer, bg, st, rays, target,
                jnp.asarray(0, jnp.int32), jax.random.PRNGKey(9),
                max_touched=k, **kwargs,
            )
            assert float(stats["touched_overflow"]) == 0.0

    def test_flat_overflow_reported(self):
        from nerf_projects_tpu.ops.pallas.flat_train import (
            fused_grad_blocks_flat,
        )

        bg = from_sparse_grid(random_grid(24, seed=53))
        rays = tile_rays(2, seed=54)
        gt = jnp.full(rays.origins.shape[:2] + (3,), 0.4)
        opts = GridRenderOptions(step_size=0.5)
        st = ps.packed_state_from_grid(bg)
        out = fused_grad_blocks_flat(
            bg, rays, gt, opts, kernel_arrays=st.packed_k,
            w_cap=8, group=8,
        )
        assert int(out[4]["dropped_windows"]) > 0
        assert bool(jnp.all(jnp.isfinite(out[0])))


class TestDenseOptimStep:
    """dense_optim=True: dense-sweep optimizer (no K-row machinery)
    must reproduce the touched step exactly under per-visit RMSprop —
    untouched elements stay bit-identical via where(g == 0)."""

    def test_matches_touched_pervisit(self):
        trainer = make_trainer(rms_pervisit=True)
        g = random_grid(24, seed=21)
        bg = from_sparse_grid(g)
        st_t = ps.packed_state_from_grid(bg)
        st_d = ps.packed_state_from_grid(bg)
        for i in range(3):
            rays = tile_rays(2, seed=210 + 7 * i)
            target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
            key = jax.random.PRNGKey(i)
            step_i = jnp.asarray(i, jnp.int32)
            st_t, ts = ps.train_step_tiles_packed_touched(
                trainer, bg, st_t, rays, target, step_i, key,
                max_touched=4096,
            )
            st_d, dstats = ps.train_step_tiles_packed_touched(
                trainer, bg, st_d, rays, target, step_i, key,
                max_touched=4096, dense_optim=True,
            )
            np.testing.assert_allclose(
                float(ts["mse"]), float(dstats["mse"]),
                rtol=1e-6, atol=1e-8,
            )
        np.testing.assert_allclose(
            np.asarray(st_t.packed_k), np.asarray(st_d.packed_k),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(st_t.rms), np.asarray(st_d.rms),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(st_t.last_step), np.asarray(st_d.last_step)
        )

    def test_matches_touched_flat_and_sgd(self):
        """flat plan + dense optimizer; and the SGD path."""
        from nerf_projects_tpu.ops.pallas.flat_train import (
            required_windows,
        )

        for kw in (dict(rms_pervisit=True),
                   dict(sigma_optim="sgd", sh_optim="sgd")):
            trainer = make_trainer(**kw)
            g = random_grid(24, seed=23)
            bg = from_sparse_grid(g)
            rays = tile_rays(2, seed=77)
            wc = required_windows(bg, rays, trainer.opts)
            target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
            st_t = ps.packed_state_from_grid(bg)
            st_d = ps.packed_state_from_grid(bg)
            for i in range(2):
                key = jax.random.PRNGKey(i)
                step_i = jnp.asarray(i, jnp.int32)
                st_t, _ = ps.train_step_tiles_packed_touched(
                    trainer, bg, st_t, rays, target, step_i, key,
                    max_touched=4096, flat_windows=wc,
                )
                st_d, _ = ps.train_step_tiles_packed_touched(
                    trainer, bg, st_d, rays, target, step_i, key,
                    max_touched=4096, flat_windows=wc,
                    dense_optim=True,
                )
            np.testing.assert_allclose(
                np.asarray(st_t.packed_k), np.asarray(st_d.packed_k),
                rtol=1e-5, atol=1e-6,
            )

    def test_defer_split_bit_identical(self):
        """dense_optim="defer" (two-program split for the 512^3
        remote-compile limit) must be BIT-identical to the fused
        dense_optim=True step: same accumulator, same sweep, just a
        program boundary between them. (Compared eager-vs-eager — a
        jitted sweep can FMA-contract the rms update and drift ulps
        from the eager fused path; within one compilation regime the
        split is exact.)"""
        trainer = make_trainer(rms_pervisit=True)
        g = random_grid(24, seed=29)
        bg = from_sparse_grid(g)
        st_f = ps.packed_state_from_grid(bg)
        st_s = ps.packed_state_from_grid(bg)
        for i in range(3):
            rays = tile_rays(2, seed=290 + 3 * i)
            target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
            key = jax.random.PRNGKey(i)
            step_i = jnp.asarray(i, jnp.int32)
            st_f, fs = ps.train_step_tiles_packed_touched(
                trainer, bg, st_f, rays, target, step_i, key,
                max_touched=4096, dense_optim=True,
            )
            st_mid, ds = ps.train_step_tiles_packed_touched(
                trainer, bg, st_s, rays, target, step_i, key,
                max_touched=4096, dense_optim="defer",
            )
            # state must flow through the defer step unchanged
            assert st_mid is st_s
            st_s = ps.dense_sweep_apply(
                trainer, bg, st_s, ds["dense_acc"],
                ds["touched_flag"], step_i,
            )
            np.testing.assert_array_equal(
                float(fs["mse"]), float(ds["mse"])
            )
        np.testing.assert_array_equal(
            np.asarray(st_f.packed_k), np.asarray(st_s.packed_k)
        )
        np.testing.assert_array_equal(
            np.asarray(st_f.rms), np.asarray(st_s.rms)
        )
        np.testing.assert_array_equal(
            np.asarray(st_f.last_step), np.asarray(st_s.last_step)
        )

    def test_literal_rms_rejected(self):
        trainer = make_trainer(rms_pervisit=False)
        g = random_grid(16, seed=25)
        bg = from_sparse_grid(g)
        st = ps.packed_state_from_grid(bg)
        rays = tile_rays(1, seed=5)
        target = jnp.full(rays.origins.shape[:2] + (3,), 0.35)
        import pytest as _pytest
        with _pytest.raises(ValueError, match="dense_optim"):
            ps.train_step_tiles_packed_touched(
                trainer, bg, st, rays, target,
                jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0),
                dense_optim=True,
            )
