"""Unit tests for core rendering ops against independent numpy references.

Follows the reference-twin test pattern from SURVEY.md §4: every op has a
slow, obviously-correct numpy implementation here, and the jnp/TPU version
must match it (fwd and, where relevant, numerics corner cases).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_projects_tpu.core.rays import camera_rays, camera_rays_opencv, ndc_rays
from nerf_projects_tpu.ops.posenc import posenc, posenc_dim
from nerf_projects_tpu.ops.render import volumetric_rendering
from nerf_projects_tpu.ops.sampling import (
    piecewise_constant_pdf,
    stratified_sample,
    cast_rays,
)


# ---------------------------------------------------------------------------
# numpy twins
# ---------------------------------------------------------------------------

def np_posenc_interleaved(x, num_freqs):
    """[x, sin(2^0 x), cos(2^0 x), sin(2^1 x), ...] — embedder.py semantics."""
    outs = [x]
    for i in range(num_freqs):
        f = 2.0 ** i
        outs.append(np.sin(x * f))
        outs.append(np.cos(x * f))
    return np.concatenate(outs, axis=-1)


def np_raw2outputs(rgb, sigma, z_vals, rays_d, white_bkgd=False):
    """Direct transcription of the vanilla raw2outputs math (notebook cell 9)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = np.concatenate(
        [dists, np.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * np.linalg.norm(rays_d[..., None, :], axis=-1)
    alpha = 1.0 - np.exp(-sigma * dists)
    ones = np.ones_like(alpha[..., :1])
    trans = np.cumprod(
        np.concatenate([ones, 1.0 - alpha + 1e-10], axis=-1), axis=-1
    )[..., :-1]
    weights = alpha * trans
    rgb_map = (weights[..., None] * rgb).sum(axis=-2)
    depth = (weights * z_vals).sum(axis=-1)
    acc = weights.sum(axis=-1)
    denom = np.maximum(1e-10, acc)
    disp = 1.0 / np.maximum(1e-10, depth / denom)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return rgb_map, disp, acc, weights, depth


def np_sample_pdf_nerf(bins, weights, u):
    """searchsorted-based inverse CDF, vanilla-NeRF numerics
    (nerf_helpers.py:372-439), given externally supplied uniforms u."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(axis=-1, keepdims=True)
    cdf = np.cumsum(pdf, axis=-1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], axis=-1)
    samples = np.empty(u.shape, dtype=np.float64)
    for r in range(u.shape[0]):
        inds = np.searchsorted(cdf[r], u[r], side="right")
        below = np.maximum(0, inds - 1)
        above = np.minimum(cdf.shape[-1] - 1, inds)
        cdf_lo, cdf_hi = cdf[r][below], cdf[r][above]
        bin_lo, bin_hi = bins[r][below], bins[r][above]
        denom = cdf_hi - cdf_lo
        denom = np.where(denom < 1e-5, 1.0, denom)
        t = (u[r] - cdf_lo) / denom
        samples[r] = bin_lo + t * (bin_hi - bin_lo)
    return samples


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

class TestPosenc:
    def test_matches_numpy_interleaved(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((17, 3)).astype(np.float32)
        got = np.asarray(posenc(jnp.asarray(x), 10))
        want = np_posenc_interleaved(x, 10)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_dims(self):
        assert posenc_dim(3, 10) == 63
        assert posenc_dim(3, 4) == 27
        x = jnp.ones((5, 3))
        assert posenc(x, 10).shape == (5, 63)
        assert posenc(x, 4, ordering="block").shape == (5, 27)

    def test_block_vs_interleaved_same_set(self):
        # Same features, different order: sorted values must agree.
        x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 3)), jnp.float32)
        a = np.sort(np.asarray(posenc(x, 6, ordering="interleaved")), axis=-1)
        b = np.sort(np.asarray(posenc(x, 6, ordering="block")), axis=-1)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_zero_freqs_identity(self):
        x = jnp.ones((2, 3))
        np.testing.assert_array_equal(np.asarray(posenc(x, 0)), np.asarray(x))


class TestVolumetricRendering:
    def test_matches_numpy(self):
        rng = np.random.default_rng(2)
        R, N = 11, 33
        rgb = rng.uniform(size=(R, N, 3)).astype(np.float32)
        sigma = rng.uniform(0, 30, size=(R, N)).astype(np.float32)
        z = np.sort(rng.uniform(2.0, 6.0, size=(R, N)).astype(np.float32), axis=-1)
        d = rng.standard_normal((R, 3)).astype(np.float32)
        out = volumetric_rendering(
            jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(z), jnp.asarray(d)
        )
        want = np_raw2outputs(rgb, sigma, z, d)
        np.testing.assert_allclose(np.asarray(out.rgb), want[0], rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.disp), want[1], rtol=2e-3)
        np.testing.assert_allclose(np.asarray(out.acc), want[2], rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.weights), want[3], rtol=2e-3, atol=1e-6)

    def test_white_background(self):
        # Zero density must render pure white on white_bkgd.
        rgb = jnp.zeros((4, 8, 3))
        sigma = jnp.zeros((4, 8))
        z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 8), (4, 8))
        d = jnp.ones((4, 3))
        out = volumetric_rendering(rgb, sigma, z, d, white_bkgd=True)
        np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-6)

    def test_opaque_first_sample(self):
        # Huge density at the first sample -> color == first sample's rgb.
        R, N = 3, 16
        rgb = jnp.broadcast_to(jnp.array([0.2, 0.5, 0.8]), (R, N, 3))
        sigma = jnp.zeros((R, N)).at[:, 0].set(1e8)
        z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, N), (R, N))
        d = jnp.ones((R, 3)) / jnp.sqrt(3.0)
        out = volumetric_rendering(rgb, sigma, z, d)
        np.testing.assert_allclose(np.asarray(out.rgb), [[0.2, 0.5, 0.8]] * R, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.depth), 2.0, atol=1e-4)


class TestSampling:
    def test_stratified_deterministic(self):
        z = stratified_sample(None, 5, 2.0, 6.0, (3,), randomized=False)
        np.testing.assert_allclose(
            np.asarray(z), np.broadcast_to(np.linspace(2, 6, 5), (3, 5)), atol=1e-6
        )

    def test_stratified_lindisp(self):
        z = stratified_sample(None, 3, 1.0, 3.0, (1,), lindisp=True, randomized=False)
        np.testing.assert_allclose(np.asarray(z[0]), [1.0, 1.5, 3.0], atol=1e-6)

    def test_stratified_randomized_in_bounds(self):
        key = jax.random.PRNGKey(0)
        z = stratified_sample(key, 64, 2.0, 6.0, (100,), randomized=True)
        z = np.asarray(z)
        assert (z >= 2.0).all() and (z <= 6.0).all()
        assert (np.diff(z, axis=-1) >= 0).all()  # stratified => sorted

    def test_sample_pdf_matches_searchsorted(self):
        rng = np.random.default_rng(3)
        R, M, N = 7, 63, 128
        bins = np.sort(rng.uniform(2, 6, size=(R, M)), axis=-1).astype(np.float32)
        weights = rng.uniform(0, 1, size=(R, M - 1)).astype(np.float32)
        # Deterministic u (linspace) for exact comparison.
        samples = piecewise_constant_pdf(
            None, jnp.asarray(bins), jnp.asarray(weights), N,
            randomized=False, mode="nerf",
        )
        u = np.broadcast_to(np.linspace(0.0, 1.0, N), (R, N))
        want = np_sample_pdf_nerf(bins.astype(np.float64), weights.astype(np.float64), u)
        np.testing.assert_allclose(np.asarray(samples), want, atol=2e-4)

    def test_sample_pdf_concentrates(self):
        # All weight on one bin -> all samples inside that bin.
        bins = jnp.broadcast_to(jnp.linspace(0.0, 10.0, 11), (2, 11))
        weights = jnp.zeros((2, 10)).at[:, 4].set(1.0)
        s = piecewise_constant_pdf(
            jax.random.PRNGKey(0), bins, weights, 64, randomized=True, mode="nerf"
        )
        s = np.asarray(s)
        assert ((s >= 3.9) & (s <= 5.1)).mean() > 0.95

    def test_sample_pdf_jaxnerf_zero_weights_safe(self):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (3, 9))
        weights = jnp.zeros((3, 8))
        s = piecewise_constant_pdf(
            jax.random.PRNGKey(1), bins, weights, 16, randomized=True, mode="jaxnerf"
        )
        assert np.isfinite(np.asarray(s)).all()

    def test_cast_rays(self):
        o = jnp.zeros((2, 3))
        d = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
        z = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        pts = np.asarray(cast_rays(z, o, d))
        np.testing.assert_allclose(pts[0, 1], [2.0, 0, 0])
        np.testing.assert_allclose(pts[1, 0], [0, 3.0, 0])


class TestRays:
    def test_center_pixel_points_forward(self):
        H = W = 5
        K = np.array([[10.0, 0, 2.0], [0, 10.0, 2.0], [0, 0, 1]])
        c2w = np.eye(4)
        rays = camera_rays(H, W, K, c2w)
        # center pixel (2,2): dir = (0, 0, -1) in camera == world frame here
        np.testing.assert_allclose(
            np.asarray(rays.directions[2, 2]), [0, 0, -1], atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(rays.origins[0, 0]), [0, 0, 0])

    def test_matches_numpy_reference(self):
        """Twin of get_rays_np (nerf_helpers.py:301-308)."""
        H, W = 4, 6
        K = np.array([[8.0, 0, 3.0], [0, 8.0, 2.0], [0, 0, 1]])
        rng = np.random.default_rng(4)
        c2w = np.eye(4)
        c2w[:3, :3] = np.linalg.qr(rng.standard_normal((3, 3)))[0]
        c2w[:3, 3] = rng.standard_normal(3)

        i, j = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy")
        dirs = np.stack(
            [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -np.ones_like(i)], -1
        )
        rays_d = np.sum(dirs[..., None, :] * c2w[:3, :3], -1)
        rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)

        rays = camera_rays(H, W, K, c2w)
        np.testing.assert_allclose(np.asarray(rays.directions), rays_d, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rays.origins), rays_o, atol=1e-6)

    def test_opencv_rays_normalized(self):
        rays = camera_rays_opencv(4, 4, 10.0, 10.0, 2.0, 2.0, np.eye(4))
        norms = np.linalg.norm(np.asarray(rays.directions), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-6)
        # +z forward, y NOT flipped: pixel below center has positive y dir.
        assert np.asarray(rays.directions)[3, 2, 1] > 0
        assert (np.asarray(rays.directions)[..., 2] > 0).all()

    def test_ndc_origin_on_near_plane(self):
        H = W = 8
        focal, near = 10.0, 1.0
        o = jnp.asarray([[0.0, 0.0, -2.0]])
        d = jnp.asarray([[0.1, -0.05, -1.0]])
        no, nd = ndc_rays(H, W, focal, near, o, d)
        # After shift to near plane, o2 = 1 + 2*near/oz with oz=-near -> -1
        np.testing.assert_allclose(np.asarray(no[0, 2]), -1.0, atol=1e-6)
        # Ray endpoint (t->inf) maps to z=1 in NDC: o2 + d2 = 1
        np.testing.assert_allclose(np.asarray(no[0, 2] + nd[0, 2]), 1.0, atol=1e-6)


class TestMultiDevice:
    def test_eight_devices_visible(self):
        assert jax.device_count() >= 8


class TestSortedResample:
    """Sort-free hierarchical resample: order-statistics uniforms +
    merge_sorted (NeRFRenderConfig.resample_sorted)."""

    def test_merge_sorted_matches_sort(self):
        rng = np.random.default_rng(0)
        from nerf_projects_tpu.ops.sampling import merge_sorted

        a = np.sort(rng.standard_normal((16, 9)), axis=-1).astype(
            np.float32
        )
        b = np.sort(rng.standard_normal((16, 23)), axis=-1).astype(
            np.float32
        )
        got = merge_sorted(jnp.asarray(a), jnp.asarray(b))
        want = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
        np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=0)

    def test_merge_sorted_with_ties(self):
        from nerf_projects_tpu.ops.sampling import merge_sorted

        a = jnp.asarray([[0.0, 1.0, 1.0, 2.0]])
        b = jnp.asarray([[1.0, 1.0, 3.0]])
        got = np.asarray(merge_sorted(a, b))[0]
        np.testing.assert_array_equal(
            got, [0.0, 1.0, 1.0, 1.0, 1.0, 2.0, 3.0]
        )

    def test_sorted_uniform_distribution(self):
        from nerf_projects_tpu.ops.sampling import sorted_uniform

        u = np.asarray(
            sorted_uniform(jax.random.PRNGKey(3), (512, 64))
        )
        assert (np.diff(u, axis=-1) >= 0).all()
        assert (u > 0).all() and (u < 1).all()
        # order statistics of 64 iid U(0,1): E[U_(i)] = i/(n+1)
        means = u.mean(axis=0)
        want = np.arange(1, 65) / 65.0
        assert np.abs(means - want).max() < 0.02

    def test_sorted_pdf_samples_ascending_and_same_distribution(self):
        rng = np.random.default_rng(5)
        bins = np.sort(rng.uniform(0, 8, (64, 17)), axis=-1)
        weights = rng.uniform(0.1, 2.0, (64, 16))
        s = np.asarray(piecewise_constant_pdf(
            jax.random.PRNGKey(0), jnp.asarray(bins),
            jnp.asarray(weights), 128, randomized=True, mode="nerf",
            sorted_u=True,
        ))
        assert (np.diff(s, axis=-1) >= 0).all()
        r = np.asarray(piecewise_constant_pdf(
            jax.random.PRNGKey(1), jnp.asarray(bins),
            jnp.asarray(weights), 128, randomized=True, mode="nerf",
        ))
        # same marginal distribution: compare pooled quantiles
        qs = np.linspace(0.05, 0.95, 10)
        dq = np.abs(
            np.quantile(s.ravel(), qs) - np.quantile(r.ravel(), qs)
        )
        assert dq.max() < 0.15, dq

    def test_render_rays_resample_sorted_path(self):
        """End-to-end render through the merge path: finite outputs,
        and with perturb=0 (deterministic linspace u) EXACTLY equal to
        the sort path."""
        import nerf_projects_tpu.models.pipeline as pl
        from nerf_projects_tpu.core.rays import Rays
        from nerf_projects_tpu.models.nerf import NeRFMLP

        mlp = NeRFMLP(depth=2, width=32, use_viewdirs=True)
        n = 16
        rng = np.random.default_rng(7)
        d = rng.standard_normal((n, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = Rays(
            jnp.zeros((n, 3)), jnp.asarray(d, jnp.float32),
            jnp.asarray(d, jnp.float32),
        )
        base = dict(
            num_coarse_samples=8, num_fine_samples=8,
            multires=4, multires_views=2, use_viewdirs=True,
            perturb=False,
        )
        cfg_a = pl.NeRFRenderConfig(**base)
        cfg_b = pl.NeRFRenderConfig(**base, resample_sorted=True)
        params = mlp.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3 * 2 * 4 + 3)),
            jnp.zeros((1, 3 * 2 * 2 + 3)),
        )
        apply_fn = lambda p, x, v: mlp.apply(p, x, v)  # noqa: E731
        out_a = pl.render_rays(
            None, params, None, apply_fn, rays, 2.0, 6.0, cfg_a,
            randomized=False,
        )
        out_b = pl.render_rays(
            None, params, None, apply_fn, rays, 2.0, 6.0, cfg_b,
            randomized=False,
        )
        assert bool(jnp.isfinite(out_b["rgb"]).all())
        np.testing.assert_array_equal(
            np.asarray(out_a["rgb"]), np.asarray(out_b["rgb"])
        )
