"""Reference-layout (svox2 checkpoint) background MSI tests."""
import os

import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.models.sparse_grid import SparseGrid
from nerf_projects_tpu.ops.background import (
    SH_C0,
    BackgroundMSI,
    ReferenceBackground,
    equirect2xyz,
    load_reference_background,
    reference_to_msi,
    render_background,
    render_background_reference,
    sample_reference_background,
    xyz2equirect,
)


def make_ref_bg(nlayers=4, reso=8, rgb_logit=0.0, sigma=0.0, prune=None):
    cap = 2 * reso * reso
    links = np.arange(cap, dtype=np.int32).reshape(2 * reso, reso)
    if prune is not None:
        links.reshape(-1)[prune] = -1
    data = np.zeros((cap, nlayers, 4), np.float32)
    data[..., :3] = rgb_logit
    data[..., 3] = sigma
    return ReferenceBackground(jnp.asarray(data), jnp.asarray(links))


class TestEquirect:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        d = rng.normal(size=(128, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        xy = xyz2equirect(jnp.asarray(d), 16)
        d2 = np.asarray(equirect2xyz(xy, 16))
        np.testing.assert_allclose(d2, d, atol=1e-5)

    def test_reference_convention(self):
        # +z -> lon 0 -> x = reso; +y (up) -> y = 0
        xy = np.asarray(xyz2equirect(jnp.asarray([[0.0, 0.0, 1.0]]), 8))
        assert abs(xy[0, 0] - 8.0) < 1e-5 and abs(xy[0, 1] - 4.0) < 1e-5
        xy = np.asarray(xyz2equirect(jnp.asarray([[0.0, 1.0, 0.0]]), 8))
        assert abs(xy[0, 1]) < 1e-5


class TestSampleReference:
    def test_constant(self):
        bg = make_ref_bg(rgb_logit=0.7, sigma=1.3)
        rng = np.random.default_rng(1)
        d = rng.normal(size=(64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        out = np.asarray(
            sample_reference_background(
                bg, jnp.asarray(d), jnp.full((64,), 0.5)
            )
        )
        np.testing.assert_allclose(out[:, :3], 0.7, atol=1e-5)
        np.testing.assert_allclose(out[:, 3], 1.3, atol=1e-5)

    def test_pruned_reads_zero(self):
        bg = make_ref_bg(rgb_logit=1.0, sigma=1.0,
                         prune=np.arange(2 * 8 * 8))
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        out = np.asarray(
            sample_reference_background(bg, d, jnp.asarray([0.5]))
        )
        np.testing.assert_allclose(out, 0.0, atol=1e-7)

    def test_layer_interp(self):
        bg = make_ref_bg(nlayers=4)
        data = np.zeros((2 * 8 * 8, 4, 4), np.float32)
        data[:, :, 3] = np.asarray([0.0, 1.0, 2.0, 3.0])  # sigma = layer
        bg = ReferenceBackground(jnp.asarray(data), bg.links)
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        # invr such that z = (1-invr)*4 - 0.5 = 1.5 -> sigma 1.5
        invr = 1.0 - 2.0 / 4.0
        out = np.asarray(
            sample_reference_background(bg, d, jnp.asarray([invr]))
        )
        assert abs(out[0, 3] - 1.5) < 1e-5


class TestRenderReference:
    def test_empty_bg_gives_brightness(self):
        bg = make_ref_bg(sigma=0.0)
        o = jnp.zeros((4, 3))
        d = jnp.asarray(
            [[0, 0, 1.0], [1.0, 0, 0], [0, 1.0, 0],
             [0.577, 0.577, 0.577]]
        )
        out = render_background_reference(
            bg, o, d, jnp.ones((4,)), radius=1.0, center=(0, 0, 0),
            background_brightness=0.8,
        )
        np.testing.assert_allclose(np.asarray(out), 0.8, atol=1e-6)

    def test_opaque_bg_color(self):
        # very dense shells -> output = clamp(logit*C0 + 0.5)
        logit = 0.9
        bg = make_ref_bg(rgb_logit=logit, sigma=1e4)
        o = jnp.zeros((2, 3))
        d = jnp.asarray([[0, 0, 1.0], [0.707, 0.707, 0.0]])
        out = np.asarray(
            render_background_reference(
                bg, o, d, jnp.ones((2,)), radius=1.0, center=(0, 0, 0)
            )
        )
        expect = logit * SH_C0 + 0.5
        np.testing.assert_allclose(out, expect, rtol=1e-4)

    def test_transmittance_scales(self):
        bg = make_ref_bg(rgb_logit=0.5, sigma=1e4)
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[0, 0, 1.0]])
        full = np.asarray(render_background_reference(
            bg, o, d, jnp.ones((1,)), radius=1.0, center=(0, 0, 0)))
        half = np.asarray(render_background_reference(
            bg, o, d, jnp.full((1,), 0.5), radius=1.0, center=(0, 0, 0)))
        np.testing.assert_allclose(half, full * 0.5, rtol=1e-5)

    def test_anisotropic_radius_runs(self):
        bg = make_ref_bg(sigma=0.0)
        o = jnp.zeros((3, 3))
        d = jnp.eye(3)
        out = render_background_reference(
            bg, o, d, jnp.ones((3,)), radius=(1.0, 2.0, 1.5),
            center=(0.1, 0.0, -0.1),
        )
        assert np.all(np.isfinite(np.asarray(out)))


class TestGridDispatch:
    def test_volume_render_grid_accepts_reference_background(self):
        from nerf_projects_tpu.core.rays import Rays
        from nerf_projects_tpu.ops.grid import (
            GridRenderOptions,
            volume_render_grid,
        )

        g = SparseGrid.create(8, basis_dim=1, init_density=0.0)
        bg = make_ref_bg(sigma=100.0)
        data = np.array(bg.data)
        data[..., 0] = 1.2  # red only
        bg = ReferenceBackground(jnp.asarray(data), bg.links)
        rng = np.random.default_rng(3)
        d = rng.normal(size=(32, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = Rays(jnp.zeros((32, 3)), jnp.asarray(d), jnp.asarray(d))
        out = volume_render_grid(
            g, rays, GridRenderOptions(step_size=0.5), background=bg
        )
        rgb = np.asarray(out["rgb"])
        expect = 1.2 * SH_C0 + 0.5
        np.testing.assert_allclose(rgb[:, 0], expect, atol=2e-2)
        np.testing.assert_allclose(rgb[:, 1], 0.5, atol=2e-2)


class TestInterop:
    def test_npz_roundtrip(self, tmp_path):
        g = SparseGrid.create(8, basis_dim=4)
        bg = make_ref_bg(nlayers=3, reso=4, rgb_logit=0.25, sigma=0.5)
        p = os.path.join(tmp_path, "ck.npz")
        g.save(p, background=bg)
        z = np.load(p)
        assert "background_data" in z and "background_links" in z
        bg2 = load_reference_background(p)
        np.testing.assert_allclose(
            np.asarray(bg2.data), np.asarray(bg.data), atol=1e-6
        )
        assert bg2.links.shape == (8, 4)
        # plain checkpoint -> None
        g.save(os.path.join(tmp_path, "plain.npz"))
        assert load_reference_background(
            os.path.join(tmp_path, "plain.npz")) is None

    def test_reference_to_msi_matches_render(self):
        # band-limited (constant) background: both renderers agree on the
        # composited color up to the shell-placement differences
        logit = 0.4
        bg = make_ref_bg(nlayers=8, reso=16, rgb_logit=logit, sigma=50.0)
        msi = reference_to_msi(bg)
        assert isinstance(msi, BackgroundMSI)
        assert msi.data.shape == (8, 16, 32, 4)
        o = jnp.zeros((4, 3))
        d = jnp.asarray(
            [[0, 0, 1.0], [0, 0, -1.0], [1.0, 0, 0], [0, 1.0, 0]]
        )
        ref = np.asarray(render_background_reference(
            bg, o, d, jnp.ones((4,)), radius=1.0, center=(0, 0, 0)))
        ours = np.asarray(render_background(
            msi, o, d, jnp.ones((4,))))
        expect = logit * SH_C0 + 0.5
        np.testing.assert_allclose(ref, expect, rtol=2e-2)
        np.testing.assert_allclose(ours, expect, rtol=2e-2)
