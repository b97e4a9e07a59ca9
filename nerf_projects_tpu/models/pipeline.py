"""The hierarchical NeRF rendering pipeline (coarse + fine), fully jittable.

Functional equivalent of reference nerf/nerf.ipynb cell 10 (`render_rays`)
+ cell 15 (`run_network`) + cell 9 (`raw2outputs`), re-expressed as one pure
function over a ray batch:

    stratified z -> posenc -> coarse MLP -> composite -> inverse-CDF fine
    samples (stop-gradient) -> merge/sort -> fine MLP -> composite

TPU-first design decisions:
  * No chunking inside the pipeline — the caller picks a static ray-batch
    size; XLA sees one fused graph (posenc fuses into the first matmul,
    compositing fuses into the MLP epilogue).
  * The MLP runs on [R*N, C] flattened batches (big MXU matmuls) rather
    than the reference's python-loop `batchify` (notebook cell 8).
  * Sigma noise is added to the raw logit before relu, exactly as
    `raw2outputs` does (cell 9).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.ops.posenc import posenc
from nerf_projects_tpu.ops.render import volumetric_rendering
from nerf_projects_tpu.ops.sampling import (
    cast_rays,
    merge_sorted,
    piecewise_constant_pdf,
    stratified_sample,
)


class NeRFRenderConfig(NamedTuple):
    """Static rendering configuration (hashable; safe as a jit static arg).

    Field names mirror the reference flags (nerf/utils.py create_default_config).
    """

    num_coarse_samples: int = 64       # N_samples
    num_fine_samples: int = 0          # N_importance
    multires: int = 10                 # point posenc frequencies
    multires_views: int = 4            # viewdir posenc frequencies
    use_viewdirs: bool = True
    lindisp: bool = False
    perturb: bool = True               # stratified jitter (training)
    raw_noise_std: float = 0.0
    white_bkgd: bool = False
    posenc_ordering: str = "interleaved"
    pdf_mode: str = "nerf"
    # sort-free hierarchical resample: draw the pdf uniforms as order
    # statistics (sorted_uniform — identical distribution to the
    # reference's iid draws, whose RNG stream differs from torch
    # anyway) and MERGE the sorted fine samples with the sorted coarse
    # depths instead of sorting the concatenation (merge_sorted; rank
    # counts + unique-index scatters, no O(S log^2 S) bitonic sort)
    resample_sorted: bool = False


def _query_mlp(apply_fn, params, pts, viewdirs, cfg: NeRFRenderConfig):
    """Encode and evaluate the MLP at [R, N, 3] points -> raw [R, N, 4]."""
    r, n = pts.shape[0], pts.shape[1]
    flat_pts = pts.reshape(r * n, 3)
    if getattr(apply_fn, "accepts_raw_points", False):
        # posenc fused into the kernel (ops/pallas/fused_mlp.fused_apply_raw)
        vd = jnp.broadcast_to(viewdirs[:, None, :], (r, n, 3)).reshape(r * n, 3)
        raw = apply_fn(params, flat_pts, vd)
        return raw.reshape(r, n, raw.shape[-1])
    pts_enc = posenc(flat_pts, cfg.multires, ordering=cfg.posenc_ordering)
    if cfg.use_viewdirs:
        vd = jnp.broadcast_to(viewdirs[:, None, :], (r, n, 3)).reshape(r * n, 3)
        views_enc = posenc(vd, cfg.multires_views, ordering=cfg.posenc_ordering)
        raw = apply_fn(params, pts_enc, views_enc)
    else:
        raw = apply_fn(params, pts_enc)
    return raw.reshape(r, n, raw.shape[-1])


def _raw_to_outputs(key, raw, z_vals, dirs, cfg: NeRFRenderConfig, randomized):
    """Activate raw outputs and composite (notebook cell 9 semantics)."""
    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma_logit = raw[..., 3]
    if cfg.raw_noise_std > 0.0 and randomized:
        noise = jax.random.normal(key, sigma_logit.shape) * cfg.raw_noise_std
        sigma_logit = sigma_logit + noise
    sigma = jax.nn.relu(sigma_logit)
    return volumetric_rendering(
        rgb, sigma, z_vals, dirs, white_bkgd=cfg.white_bkgd, disp_mode="nerf"
    )


def render_rays(
    key: Optional[jax.Array],
    params_coarse: Any,
    params_fine: Optional[Any],
    apply_fn: Callable,
    rays: Rays,
    near,
    far,
    cfg: NeRFRenderConfig,
    *,
    randomized: bool = True,
):
    """Render a ray batch. Returns a dict matching the reference's `ret`.

    Keys: rgb, disp, acc, depth, weights (+ rgb0/disp0/acc0/z_std when
    num_fine_samples > 0). `randomized=False` disables all stochasticity
    (eval path: perturb=0, deterministic sample_pdf, no sigma noise).
    """
    n_rays = rays.origins.shape[0]
    if randomized and cfg.perturb:
        key, k_strat = jax.random.split(key)
    else:
        k_strat = None

    z_vals = stratified_sample(
        k_strat,
        cfg.num_coarse_samples,
        near,
        far,
        (n_rays,),
        lindisp=cfg.lindisp,
        randomized=randomized and cfg.perturb,
    )
    pts = cast_rays(z_vals, rays.origins, rays.directions)

    if randomized and cfg.raw_noise_std > 0:
        key, k_noise = jax.random.split(key)
    else:
        k_noise = None
    raw = _query_mlp(apply_fn, params_coarse, pts, rays.viewdirs, cfg)
    coarse = _raw_to_outputs(k_noise, raw, z_vals, rays.directions, cfg, randomized)

    out = {
        "rgb": coarse.rgb,
        "disp": coarse.disp,
        "acc": coarse.acc,
        "depth": coarse.depth,
        "weights": coarse.weights,
    }

    if cfg.num_fine_samples > 0:
        if randomized and cfg.perturb:
            key, k_pdf = jax.random.split(key)
        else:
            k_pdf = None
        z_mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = piecewise_constant_pdf(
            k_pdf,
            z_mids,
            coarse.weights[..., 1:-1],
            cfg.num_fine_samples,
            randomized=randomized and cfg.perturb,
            mode=cfg.pdf_mode,
            sorted_u=cfg.resample_sorted,
        )
        if cfg.resample_sorted:
            # z_samples ascending (sorted_u, or the linspace-u path)
            z_combined = merge_sorted(z_vals, z_samples)
        else:
            z_combined = jnp.sort(
                jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1
            )
        pts_fine = cast_rays(z_combined, rays.origins, rays.directions)
        if randomized and cfg.raw_noise_std > 0:
            key, k_noise2 = jax.random.split(key)
        else:
            k_noise2 = None
        params_f = params_fine if params_fine is not None else params_coarse
        raw_fine = _query_mlp(apply_fn, params_f, pts_fine, rays.viewdirs, cfg)
        fine = _raw_to_outputs(
            k_noise2, raw_fine, z_combined, rays.directions, cfg, randomized
        )
        # z_std over the newly drawn fine samples only (notebook cell 10).
        out.update(
            rgb0=coarse.rgb,
            disp0=coarse.disp,
            acc0=coarse.acc,
            rgb=fine.rgb,
            disp=fine.disp,
            acc=fine.acc,
            depth=fine.depth,
            weights=fine.weights,
            z_std=jnp.std(z_samples, axis=-1),
        )
    return out
