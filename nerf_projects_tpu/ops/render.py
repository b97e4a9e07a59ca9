"""Volume-rendering compositing (the NeRF `raw2outputs` math).

Parity targets:
  * vanilla NeRF: reference nerf/nerf.ipynb cell 9 (`raw2outputs`) — relu
    density, sigmoid rgb, 1e10 last dist, dists scaled by |d|, exclusive
    cumprod of (1 - alpha + 1e-10), disp = 1/clamp(depth/max(1e-10,acc)).
  * jaxnerf: plenoctree/nerf_sh/nerf/model_utils.py:176-222
    (`volumetric_rendering`) — same weights math, different disparity
    convention (disp = acc/depth gated into [0, 1e10]).

All accumulation in fp32 regardless of input dtype (PSNR-critical — see
SURVEY.md §7 "Matching numerics"). The whole function is elementwise +
cumulative ops over [R, N]: XLA fuses it with the MLP epilogue; no Pallas
needed for this stage.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RenderOutputs(NamedTuple):
    rgb: jnp.ndarray      # [..., 3] composited color
    disp: jnp.ndarray     # [...] disparity
    acc: jnp.ndarray      # [...] accumulated opacity
    weights: jnp.ndarray  # [..., N] per-sample weights
    depth: jnp.ndarray    # [...] expected depth


def compute_alpha_weights(sigma: jnp.ndarray, z_vals: jnp.ndarray, dirs: jnp.ndarray):
    """alpha/transmittance weights from density.

    sigma: [..., N] (post-activation, >= 0), z_vals: [..., N], dirs: [..., 3].
    Returns (alpha [..., N], weights [..., N]).
    """
    eps = 1e-10
    dists = jnp.concatenate(
        [
            z_vals[..., 1:] - z_vals[..., :-1],
            jnp.full_like(z_vals[..., :1], 1e10),
        ],
        axis=-1,
    )
    dists = dists * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    alpha = 1.0 - jnp.exp(-sigma * dists)
    # Exclusive cumulative transmittance with the reference's eps guard.
    trans = jnp.concatenate(
        [
            jnp.ones_like(alpha[..., :1]),
            jnp.cumprod(1.0 - alpha[..., :-1] + eps, axis=-1),
        ],
        axis=-1,
    )
    return alpha, alpha * trans


def volumetric_rendering(
    rgb: jnp.ndarray,
    sigma: jnp.ndarray,
    z_vals: jnp.ndarray,
    dirs: jnp.ndarray,
    *,
    white_bkgd: bool = False,
    disp_mode: str = "nerf",
) -> RenderOutputs:
    """Composite per-sample (rgb, sigma) into per-ray outputs.

    Args:
      rgb: [..., N, 3] colors in [0,1] (already activated).
      sigma: [..., N] densities (already activated, >= 0).
      z_vals: [..., N] sample depths.
      dirs: [..., 3] ray directions (norm scales dists to metric units).
      white_bkgd: composite over white using leftover transmittance.
      disp_mode: "nerf" (notebook cell 9) or "jaxnerf" (model_utils.py:176).
    """
    rgb = rgb.astype(jnp.float32)
    sigma = sigma.astype(jnp.float32)
    z_vals = z_vals.astype(jnp.float32)

    _, weights = compute_alpha_weights(sigma, z_vals, dirs)

    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth = jnp.sum(weights * z_vals, axis=-1)
    acc = jnp.sum(weights, axis=-1)

    if disp_mode == "nerf":
        denom = jnp.maximum(1e-10, acc)
        disp = 1.0 / jnp.maximum(1e-10, depth / denom)
    elif disp_mode == "jaxnerf":
        eps = 1e-10
        inv_eps = 1.0 / eps
        disp = acc / depth
        disp = jnp.where((disp > 0) & (disp < inv_eps) & (acc > eps), disp, inv_eps)
    else:
        raise ValueError(f"unknown disp_mode: {disp_mode!r}")

    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])

    return RenderOutputs(rgb=comp_rgb, disp=disp, acc=acc, weights=weights, depth=depth)
