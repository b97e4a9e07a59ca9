"""Learned basis types (3D texture + MLP) — twins and training."""
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.models.sparse_grid import SparseGrid
from nerf_projects_tpu.ops.basis import (
    BASIS_TYPE_3D_TEXTURE,
    BASIS_TYPE_MLP,
    eval_basis,
    eval_basis_3d,
    eval_basis_mlp,
    init_basis_3d,
    init_basis_mlp,
    reinit_learned_basis,
)
from nerf_projects_tpu.ops.grid import GridRenderOptions, volume_render_grid
from nerf_projects_tpu.ops.sh import eval_sh_bases


def numpy_trilerp_aligned(data, dirs):
    """align_corners=True trilinear reference."""
    r = data.shape[0]
    g = (dirs + 1.0) * 0.5 * (r - 1)
    out = np.zeros((len(dirs), data.shape[-1]))
    for i, p in enumerate(g):
        l = np.floor(p).astype(int)
        w = p - l
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    c = l + [dx, dy, dz]
                    if (c < 0).any() or (c > r - 1).any():
                        continue
                    cw = (
                        (w[0] if dx else 1 - w[0])
                        * (w[1] if dy else 1 - w[1])
                        * (w[2] if dz else 1 - w[2])
                    )
                    out[i] += data[c[0], c[1], c[2]] * cw
    return out


class TestBasis3D:
    def test_trilerp_matches_numpy(self):
        rng = np.random.default_rng(0)
        data = rng.standard_normal((8, 8, 8, 4)).astype(np.float32)
        d = rng.standard_normal((32, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        got = np.asarray(eval_basis_3d(jnp.asarray(data), jnp.asarray(d)))
        want = numpy_trilerp_aligned(data, d)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_sh_reinit_approximates_sh(self):
        data = init_basis_3d(basis_reso=32, basis_dim=9)
        data = reinit_learned_basis(data, jax.random.PRNGKey(0),
                                    init_type="sh")
        rng = np.random.default_rng(1)
        d = rng.standard_normal((64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        got = np.asarray(eval_basis_3d(data, jnp.asarray(d)))
        want = np.asarray(eval_sh_bases(9, jnp.asarray(d)))
        # texture interpolation of SH at reso 32: coarse but close
        assert np.abs(got - want).mean() < 0.05

    def test_sg_reinit_positive(self):
        data = init_basis_3d(8, 4)
        data = reinit_learned_basis(data, jax.random.PRNGKey(0),
                                    init_type="sg", sg_lambda_max=2.0)
        assert (np.asarray(data) > 0).all()
        assert (np.asarray(data) <= 1.0 + 1e-5).all()


class TestBasisMLP:
    def test_shapes_and_posenc(self):
        params = init_basis_mlp(jax.random.PRNGKey(0), basis_dim=9,
                                mlp_width=16, mlp_posenc_size=2)
        d = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((10, 3)), jnp.float32)
        out = eval_basis_mlp(params, d, mlp_posenc_size=2)
        assert out.shape == (10, 9)
        sig = eval_basis(BASIS_TYPE_MLP, 9, d, mlp_params=params,
                         mlp_posenc_size=2)
        assert ((np.asarray(sig) > 0) & (np.asarray(sig) < 1)).all()


class TestRenderWithBasis:
    def _grid(self):
        rng = np.random.default_rng(0)
        g = SparseGrid.create(16, basis_dim=4, use_sphere_bound=False,
                              init_density=1.0)
        sh = rng.standard_normal((g.capacity, 12)).astype(np.float32) * 0.3
        return replace(g, sh_data=jnp.asarray(sh))

    def _rays(self, n=32):
        rng = np.random.default_rng(1)
        d = rng.standard_normal((n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.zeros((n, 3), np.float32)
        return Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d))

    def test_sh_texture_matches_analytic_sh(self):
        """A fine SH-initialized texture must render ~like analytic SH."""
        g = self._grid()
        rays = self._rays()
        data = reinit_learned_basis(init_basis_3d(64, 4),
                                    jax.random.PRNGKey(0), init_type="sh")
        sh_mult = eval_basis(BASIS_TYPE_3D_TEXTURE, 4, rays.viewdirs,
                             basis_data=data)
        opts = GridRenderOptions()
        out_tex = volume_render_grid(g, rays, opts, sh_mult=sh_mult)
        out_sh = volume_render_grid(g, rays, opts)
        np.testing.assert_allclose(
            np.asarray(out_tex["rgb"]), np.asarray(out_sh["rgb"]),
            atol=0.03,
        )

    def test_train_step_with_texture_basis(self):
        from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

        g = self._grid()
        rays = self._rays()
        target = jnp.full((32, 3), 0.4)
        tr = PlenoxelsTrainer(GridRenderOptions(), n_iters=100,
                              lambda_tv=0.0, lambda_tv_sh=0.0,
                              lr_sigma_delay_steps=0)
        rms = tr.init_rms(g)
        basis = reinit_learned_basis(init_basis_3d(16, 4),
                                     jax.random.PRNGKey(0), init_type="sh")
        rms_b = jnp.zeros_like(basis)
        losses = []
        for i in range(15):
            g, rms, basis, rms_b, st = tr.train_step_with_basis(
                g, rms, basis, rms_b, rays, target,
                jnp.asarray(i, jnp.float32), jax.random.PRNGKey(i),
                basis_type=BASIS_TYPE_3D_TEXTURE, lr_basis=1e-2,
            )
            losses.append(float(st["mse"]))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(np.asarray(basis)).all()
        # basis actually moved
        ref = reinit_learned_basis(init_basis_3d(16, 4),
                                   jax.random.PRNGKey(0), init_type="sh")
        assert not np.allclose(np.asarray(basis), np.asarray(ref))

    def test_train_step_with_mlp_basis(self):
        from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

        g = self._grid()
        rays = self._rays()
        target = jnp.full((32, 3), 0.4)
        tr = PlenoxelsTrainer(GridRenderOptions(), n_iters=100,
                              lambda_tv=0.0, lambda_tv_sh=0.0,
                              lr_sigma_delay_steps=0)
        rms = tr.init_rms(g)
        params = init_basis_mlp(jax.random.PRNGKey(0), basis_dim=4)
        rms_b = jax.tree_util.tree_map(jnp.zeros_like, params)
        g2, rms2, params2, rms_b2, st = tr.train_step_with_basis(
            g, rms, params, rms_b, rays, target,
            jnp.asarray(0.0), jax.random.PRNGKey(0),
            basis_type=BASIS_TYPE_MLP, lr_basis=1e-3,
        )
        assert np.isfinite(float(st["mse"]))
        moved = any(
            not np.allclose(np.asarray(params2[k]), np.asarray(params[k]))
            for k in params
        )
        assert moved
