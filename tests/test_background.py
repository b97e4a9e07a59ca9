"""Background MSI tests."""
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.models.sparse_grid import SparseGrid
from nerf_projects_tpu.ops.background import (
    BackgroundMSI,
    background_tv_loss,
    render_background,
    sample_equirect,
)
from nerf_projects_tpu.ops.grid import GridRenderOptions, volume_render_grid


class TestEquirect:
    def test_sample_constant_image(self):
        img = jnp.full((16, 32, 4), 0.7)
        d = jax.random.normal(jax.random.PRNGKey(0), (50, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        out = sample_equirect(img, d)
        np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-5)

    def test_longitude_wrap(self):
        img = jnp.zeros((8, 16, 1)).at[:, 0].set(1.0).at[:, -1].set(1.0)
        # direction exactly at the seam (-z axis is lon 0... seam at +-pi)
        d = jnp.asarray([[0.0, 0.0, 1.0]])  # lon = pi boundary
        out = sample_equirect(img, d)
        assert bool(jnp.isfinite(out).all())


class TestMSI:
    def test_empty_msi_gives_brightness(self):
        msi = BackgroundMSI.create(4, 16, init_density=0.0)
        o = jnp.zeros((3, 3))
        d = jax.random.normal(jax.random.PRNGKey(1), (3, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rgb = render_background(msi, o, d, jnp.ones(3))
        np.testing.assert_allclose(np.asarray(rgb), 1.0, atol=1e-5)

    def test_opaque_first_layer_color(self):
        msi = BackgroundMSI.create(4, 16)
        data = np.zeros((4, 16, 32, 4), np.float32)
        data[0, ..., 3] = 1e6        # opaque first shell
        data[0, ..., 0] = 5.0        # red sigmoid(5) ~ 0.993
        data[0, ..., 1] = -5.0
        data[0, ..., 2] = -5.0
        msi = BackgroundMSI(jnp.asarray(data), msi.radii)
        o = jnp.zeros((2, 3))
        d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        rgb = np.asarray(render_background(msi, o, d, jnp.ones(2)))
        assert (rgb[:, 0] > 0.98).all() and (rgb[:, 1] < 0.02).all()

    def test_transmittance_scales(self):
        msi = BackgroundMSI.create(2, 8, init_density=0.0)
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        full = render_background(msi, o, d, jnp.ones(1))
        half = render_background(msi, o, d, 0.5 * jnp.ones(1))
        np.testing.assert_allclose(np.asarray(half), np.asarray(full) * 0.5, atol=1e-5)

    def test_radii_increasing(self):
        msi = BackgroundMSI.create(8, 8, inner_radius=2.0)
        assert (np.diff(msi.radii) > 0).all()
        assert msi.radii[0] == pytest.approx(2.0)

    def test_tv_loss(self):
        msi = BackgroundMSI.create(2, 8)
        assert float(background_tv_loss(msi)) == 0.0  # constant layers
        noisy = BackgroundMSI(
            jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 16, 4)),
                        jnp.float32),
            msi.radii,
        )
        assert float(background_tv_loss(noisy)) > 0.1


class TestGridWithBackground:
    def test_grid_render_composites_msi(self):
        g = SparseGrid.create(8, basis_dim=1, init_density=0.0)
        msi = BackgroundMSI.create(2, 8, inner_radius=2.0)
        data = np.zeros((2, 8, 16, 4), np.float32)
        data[..., 3] = 1e6
        data[..., 1] = 5.0  # green background
        data[..., 0] = -5.0
        data[..., 2] = -5.0
        msi = BackgroundMSI(jnp.asarray(data), msi.radii)
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        rays = Rays(jnp.asarray([[0.0, 0.0, -3.0]]), d, d)
        out = volume_render_grid(
            g, rays, GridRenderOptions(), background=msi
        )
        rgb = np.asarray(out["rgb"][0])
        assert rgb[1] > 0.97 and rgb[0] < 0.03  # sees green MSI, not white

    def test_background_gradients_flow(self):
        g = SparseGrid.create(8, basis_dim=1, init_density=0.0)
        msi = BackgroundMSI.create(2, 8, inner_radius=2.0)
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        rays = Rays(jnp.asarray([[0.0, 0.0, -3.0]]), d, d)

        def loss(data):
            m = BackgroundMSI(data, msi.radii)
            out = volume_render_grid(g, rays, GridRenderOptions(), background=m)
            return jnp.sum(out["rgb"])

        grad = jax.grad(loss)(msi.data)
        assert float(jnp.abs(grad).sum()) > 0


class TestBackgroundTraining:
    def test_bg_step_learns_background_color(self):
        from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

        g = SparseGrid.create(8, basis_dim=1, init_density=0.0)
        msi = BackgroundMSI.create(2, 8, inner_radius=2.0)
        tr = PlenoxelsTrainer(
            GridRenderOptions(), n_iters=100,
            lr_sigma=1.0, lr_sigma_delay_steps=0, lr_sh=0.1,
            lambda_tv=0.0, lambda_tv_sh=0.0,
        )
        rms = tr.init_rms(g)
        rms_bg = jnp.zeros_like(msi.data)
        d = jax.random.normal(jax.random.PRNGKey(0), (128, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = Rays(jnp.zeros((128, 3)), d, d)
        target = jnp.broadcast_to(jnp.array([0.1, 0.8, 0.1]), (128, 3))
        first = None
        for i in range(60):
            g, msi, rms, rms_bg, st = tr.train_step_bg(
                g, msi, rms, rms_bg, rays, target,
                jnp.asarray(i, jnp.float32), jax.random.PRNGKey(i),
            )
            if i == 0:
                first = float(st["mse"])
        assert float(st["mse"]) < first * 0.5, (first, float(st["mse"]))
