"""Tests for spherical-harmonic / spherical-Gaussian ops and the NeRF-SH model."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.models.nerf_sh import NeRFSHModel, validate_activations
from nerf_projects_tpu.ops.sg import eval_sg, euler2mat
from nerf_projects_tpu.ops.sh import (
    eval_sh,
    eval_sh_bases,
    project_function_sh,
    project_function_sh_lstsq,
    spherical_uniform_dirs,
)


class TestSH:
    def test_orthonormality(self):
        """Monte-Carlo check: integral over S^2 of b_i b_j = delta_ij."""
        dirs = np.asarray(
            spherical_uniform_dirs(jax.random.PRNGKey(0), 200000)
        )
        basis = np.asarray(eval_sh_bases(25, jnp.asarray(dirs)))
        gram = basis.T @ basis * (4 * np.pi / dirs.shape[0])
        np.testing.assert_allclose(gram, np.eye(25), atol=0.05)

    def test_deg0_constant(self):
        dirs = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        coeffs = jnp.ones((2, 3, 1))
        out = np.asarray(eval_sh(0, coeffs, dirs))
        np.testing.assert_allclose(out, 0.28209479177387814, atol=1e-6)

    def test_projection_roundtrip(self):
        """An SH-deg-2 function projects back to its own coefficients."""
        rng = np.random.default_rng(0)
        true_coeffs = jnp.asarray(rng.standard_normal((5, 3, 9)), jnp.float32)
        dirs = spherical_uniform_dirs(jax.random.PRNGKey(1), 20000)
        # evaluate the function at dirs: [5, D, 3]
        vals = eval_sh(2, true_coeffs[:, None, :, :], dirs[None, :, :])
        got_mc = project_function_sh(vals, dirs, 2)
        np.testing.assert_allclose(
            np.asarray(got_mc), np.asarray(true_coeffs), atol=0.15
        )
        got_ls = project_function_sh_lstsq(vals, dirs, 2)
        np.testing.assert_allclose(
            np.asarray(got_ls), np.asarray(true_coeffs), atol=1e-3
        )

    def test_reference_formula_deg1(self):
        """Twin of the reference eval_sh deg-1 branch (nerf_sh/nerf/sh.py:62-68)."""
        rng = np.random.default_rng(1)
        d = rng.standard_normal((7, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        sh = rng.standard_normal((7, 3, 4)).astype(np.float32)
        C0, C1 = 0.28209479177387814, 0.4886025119029199
        x, y, z = d[:, 0:1], d[:, 1:2], d[:, 2:3]
        want = (
            C0 * sh[..., 0]
            - C1 * y * sh[..., 1]
            + C1 * z * sh[..., 2]
            - C1 * x * sh[..., 3]
        )
        got = np.asarray(eval_sh(1, jnp.asarray(sh), jnp.asarray(d)))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestSG:
    def test_peak_at_lobe_center(self):
        mu = jnp.asarray([[0.0, 0.0, 1.0]])
        lam = jnp.asarray([2.0])  # softplus(2) ~ 2.13
        coeffs = jnp.ones((1, 3, 1))
        at_peak = eval_sg(lam, mu, coeffs, jnp.asarray([0.0, 0.0, 1.0]))
        off_peak = eval_sg(lam, mu, coeffs, jnp.asarray([1.0, 0.0, 0.0]))
        assert float(at_peak[0, 0]) > float(off_peak[0, 0])
        np.testing.assert_allclose(np.asarray(at_peak), 1.0, atol=1e-5)

    def test_spherical_mu_parameterization(self):
        # theta=0 -> +z lobe, same as cartesian [0,0,1]
        lam = jnp.asarray([1.0])
        coeffs = jnp.ones((1, 3, 1))
        a = eval_sg(lam, jnp.asarray([[0.0, 0.0]]), coeffs, jnp.asarray([0.0, 0.0, 1.0]))
        b = eval_sg(lam, jnp.asarray([[0.0, 0.0, 1.0]]), coeffs, jnp.asarray([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_euler2mat_identity(self):
        m = np.asarray(euler2mat(jnp.zeros(3)))
        np.testing.assert_allclose(m, np.eye(3), atol=1e-6)


class TestNeRFSHModel:
    def _rays(self, n=16):
        d = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return Rays(jnp.zeros((n, 3)), d, d)

    def _init_and_run(self, **kw):
        model = NeRFSHModel(
            num_coarse_samples=8,
            num_fine_samples=kw.pop("num_fine_samples", 8),
            net_depth=2,
            net_width=32,
            net_width_condition=16,
            max_deg_point=4,
            deg_view=2,
            **kw,
        )
        rays = self._rays()
        params = model.init(
            jax.random.PRNGKey(0),
            jax.random.PRNGKey(1),
            jax.random.PRNGKey(2),
            rays,
            False,
        )
        out = model.apply(
            params, jax.random.PRNGKey(1), jax.random.PRNGKey(2), rays, True
        )
        return model, params, out, rays

    def test_sh_mode(self):
        model, params, out, rays = self._init_and_run(sh_deg=2)
        assert len(out) == 2
        for level in out:
            assert level.rgb.shape == (16, 3)
            assert bool(jnp.isfinite(level.rgb).all())
            assert level.disp.shape == (16,)

    def test_sg_mode_has_global_params(self):
        model, params, out, _ = self._init_and_run(sg_dim=4)
        assert "sg_lambda" in params["params"]
        assert params["params"]["sg_mu_spher"].shape == (4, 2)
        assert bool(jnp.isfinite(out[-1].rgb).all())

    def test_viewdirs_mode(self):
        model, params, out, _ = self._init_and_run(use_viewdirs=True)
        assert bool(jnp.isfinite(out[-1].rgb).all())

    def test_coarse_only(self):
        model, params, out, _ = self._init_and_run(sh_deg=1, num_fine_samples=0)
        assert len(out) == 1

    def test_eval_points(self):
        model, params, _, _ = self._init_and_run(sh_deg=2)
        pts = jax.random.normal(jax.random.PRNGKey(3), (32, 3))
        dirs = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        raw_rgb, raw_sigma = model.apply(
            params, pts, dirs, method=model.eval_points_raw
        )
        assert raw_rgb.shape == (32, 27)  # 3 * (2+1)^2
        assert raw_sigma.shape == (32, 1)
        rgb, sigma = model.apply(params, pts, dirs, method=model.eval_points)
        assert rgb.shape == (32, 3)
        assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0
        assert float(sigma.min()) >= 0.0

    def test_exclusive_heads(self):
        import pytest

        with pytest.raises(ValueError):
            self._init_and_run(sh_deg=2, use_viewdirs=True)

    def test_validate_activations(self):
        import pytest

        validate_activations(jax.nn.sigmoid, jax.nn.relu)
        with pytest.raises(ValueError):
            validate_activations(lambda x: x, jax.nn.relu)  # unbounded rgb
        with pytest.raises(ValueError):
            validate_activations(jax.nn.sigmoid, lambda x: x)  # negative sigma
