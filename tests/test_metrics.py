"""Metrics tests: SSIM against an independent scipy twin, PSNR identities."""
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_projects_tpu.obs.metrics import (
    compute_metrics,
    compute_ssim,
    img2mse,
    mse2psnr,
    to8b,
)


def scipy_ssim_twin(img1, img2, max_val=1.0, filter_size=11, filter_sigma=1.5,
                    k1=0.01, k2=0.03):
    """Independent SSIM: explicit per-pixel loops over scipy correlate."""
    from scipy.ndimage import correlate1d

    img1 = np.clip(img1.astype(np.float64), 0, max_val)
    img2 = np.clip(img2.astype(np.float64), 0, max_val)
    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((np.arange(filter_size) - hw + shift) / filter_sigma) ** 2
    filt = np.exp(-0.5 * f_i)
    filt /= filt.sum()

    def blur(z):
        out = np.empty_like(z)
        for c in range(z.shape[-1]):
            t = correlate1d(z[..., c], filt, axis=0, mode="constant")
            out[..., c] = correlate1d(t, filt, axis=1, mode="constant")
        return out

    mu1, mu2 = blur(img1), blur(img2)
    s11 = np.maximum(0, blur(img1 * img1) - mu1 * mu1)
    s22 = np.maximum(0, blur(img2 * img2) - mu2 * mu2)
    s12 = blur(img1 * img2) - mu1 * mu2
    s12 = np.sign(s12) * np.minimum(np.sqrt(s11 * s22), np.abs(s12))
    c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
    ssim_map = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s11 + s22 + c2)
    )
    return ssim_map.mean()


class TestMetrics:
    def test_psnr_identity(self):
        assert float(mse2psnr(jnp.asarray(0.01))) == pytest.approx(20.0, abs=1e-4)
        assert float(img2mse(jnp.zeros((4, 4, 3)), jnp.ones((4, 4, 3)))) == 1.0

    def test_to8b(self):
        x = np.array([-0.5, 0.0, 0.5, 1.0, 2.0])
        np.testing.assert_array_equal(to8b(x), [0, 0, 127, 255, 255])

    def test_ssim_identical_images(self):
        img = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(np.float32)
        assert float(compute_ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_matches_scipy_twin(self):
        rng = np.random.default_rng(1)
        a = rng.uniform(size=(48, 40, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        got = float(compute_ssim(a, b))
        want = scipy_ssim_twin(a, b)
        assert got == pytest.approx(want, abs=2e-4)

    def test_ssim_decreases_with_noise(self):
        rng = np.random.default_rng(2)
        a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        small = np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1)
        big = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1)
        assert float(compute_ssim(a, small)) > float(compute_ssim(a, big))

    def test_compute_metrics_keys(self):
        a = np.zeros((16, 16, 3), np.float32)
        m = compute_metrics(a, a)
        assert set(m) == {"mse", "psnr", "ssim"}
        assert m["ssim"] == pytest.approx(1.0, abs=1e-5)
