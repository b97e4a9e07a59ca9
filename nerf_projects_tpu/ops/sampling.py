"""Ray sampling: stratified coarse samples + inverse-CDF importance samples.

Parity targets:
  * stratified: reference nerf/nerf.ipynb cell 10 (render_rays) and
    plenoctree/nerf_sh/nerf/model_utils.py:104-142 (sample_along_rays) —
    identical math.
  * inverse CDF: two numerics variants exist in the reference —
    "nerf" (nerf/nerf_helpers.py:372-439, weights+1e-5 then searchsorted)
    and "jaxnerf" (model_utils.py:225-287, pad-sum-to-eps, sorted-mask
    interval search). Both are implemented here over the same TPU-friendly
    masked min/max interval search (no gather/searchsorted), which is exact
    inverse-CDF inversion for sorted CDFs.

Everything is static-shape and fully vectorized: [R, M] x [R, N] masked
compares run on the VPU; no data-dependent control flow.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def cast_rays(z_vals: jnp.ndarray, origins: jnp.ndarray, directions: jnp.ndarray):
    """Points o + z*d: [..., N] x [..., 3] -> [..., N, 3]."""
    return origins[..., None, :] + z_vals[..., None] * directions[..., None, :]


def stratified_sample(
    key: Optional[jax.Array],
    num_samples: int,
    near,
    far,
    batch_shape,
    *,
    lindisp: bool = False,
    randomized: bool = True,
    dtype=jnp.float32,
):
    """Stratified depths along rays in [near, far].

    near/far may be scalars or arrays broadcastable to batch_shape (+[1]).
    Returns z_vals of shape batch_shape + [num_samples].
    """
    t_vals = jnp.linspace(0.0, 1.0, num_samples, dtype=dtype)
    near = jnp.asarray(near, dtype)[..., None] if jnp.ndim(near) else jnp.asarray(near, dtype)
    far = jnp.asarray(far, dtype)[..., None] if jnp.ndim(far) else jnp.asarray(far, dtype)
    if lindisp:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    z_vals = jnp.broadcast_to(z_vals, tuple(batch_shape) + (num_samples,))

    if randomized:
        if key is None:
            raise ValueError("randomized stratified sampling requires a PRNG key")
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=dtype)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def sorted_uniform(key: jax.Array, shape, dtype=jnp.float32):
    """IID Uniform(0,1) order statistics, generated ALREADY SORTED along
    the last axis in O(n) (Lurie–Hartley exponential spacings:
    U_(i) = (E_1+..+E_i) / (E_1+..+E_{n+1}), E ~ Exp(1)). Same
    distribution as sorting n iid uniforms — the monotone inverse-CDF
    then yields sorted importance samples, so the coarse+fine combine
    is a sort-free MERGE (`merge_sorted`) instead of an O(S log^2 S)
    bitonic sort over the concatenated depths."""
    n = shape[-1]
    e = -jnp.log1p(-jax.random.uniform(
        key, tuple(shape[:-1]) + (n + 1,), dtype=dtype
    ))
    cs = jnp.cumsum(e, axis=-1)
    return cs[..., :n] / cs[..., -1:]


def merge_sorted(a: jnp.ndarray, b: jnp.ndarray):
    """Merge two per-row SORTED arrays along the last axis (ties: `a`
    first). Rank counts by one broadcast compare (VPU; XLA fuses the
    [.., Sa, Sb] boolean away) + two unique-index scatters — no sort.
    a: [..., Sa], b: [..., Sb] -> [..., Sa+Sb] sorted."""
    Sa, Sb = a.shape[-1], b.shape[-1]
    ia = jnp.arange(Sa) + jnp.sum(
        (b[..., None, :] < a[..., :, None]), axis=-1
    )
    ib = jnp.arange(Sb) + jnp.sum(
        (a[..., None, :] <= b[..., :, None]), axis=-1
    )
    out = jnp.zeros(a.shape[:-1] + (Sa + Sb,), a.dtype)
    bidx = tuple(
        jnp.arange(s).reshape(
            (1,) * i + (-1,) + (1,) * (a.ndim - 1 - i)
        )
        for i, s in enumerate(a.shape[:-1])
    )
    out = out.at[bidx + (ia,)].set(a)
    out = out.at[bidx + (ib,)].set(b)
    return out


def _invert_cdf(u: jnp.ndarray, cdf: jnp.ndarray, bins: jnp.ndarray):
    """Exact piecewise-linear inverse-CDF lookup.

    u: [..., N] uniform samples; cdf, bins: [..., M] sorted. For each u
    find the bracketing interval [cdf_lo, cdf_hi) and lerp within
    [bin_lo, bin_hi]. One O(M*N) boolean compare produces searchsorted-
    'right' indices by counting, then four take_along_axis gathers fetch
    the interval endpoints — ~6x less memory traffic than the jaxnerf
    masked min/max formulation (model_utils.py:269-283), same results.
    """
    # NOTE: do NOT replace this with searchsorted/take_along_axis — batched
    # minor-dim gathers serialize on TPU and measure ~10x slower than this
    # pure-VPU masked min/max formulation (the jaxnerf trick,
    # model_utils.py:269-283).
    mask = u[..., None, :] >= cdf[..., :, None]  # [..., M, N]

    def lo_hi(x):
        x_lo = jnp.max(jnp.where(mask, x[..., None], x[..., :1, None]), axis=-2)
        x_hi = jnp.min(jnp.where(~mask, x[..., None], x[..., -1:, None]), axis=-2)
        return x_lo, x_hi

    bins_lo, bins_hi = lo_hi(bins)
    cdf_lo, cdf_hi = lo_hi(cdf)
    return bins_lo, bins_hi, cdf_lo, cdf_hi


def piecewise_constant_pdf(
    key: Optional[jax.Array],
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    *,
    randomized: bool = True,
    mode: str = "nerf",
    sorted_u: bool = False,
):
    """Draw importance samples from the piecewise-constant PDF over `bins`.

    mode="nerf"    — vanilla-NeRF numerics (nerf_helpers.py:372-439):
                     bins [..., M], weights [..., M-1]; weights += 1e-5;
                     cdf = [0, cumsum(pdf)]; denom<1e-5 -> 1.
    mode="jaxnerf" — jaxnerf numerics (model_utils.py:225-287):
                     bins [..., M+1], weights [..., M]; pad weight sum to
                     1e-5; cdf = [0, min(1, cumsum(pdf[:-1])), 1];
                     u in [0, 1-eps]; nan_to_num + clip on t.

    Both return samples of shape [..., num_samples]; gradients are stopped
    (reference: z_samples.detach() / lax.stop_gradient).

    sorted_u: draw the uniforms as order statistics (`sorted_uniform`)
    so the returned samples are ASCENDING per ray — same distribution
    as the reference's iid draws (whose RNG stream differs from torch
    anyway), enabling the sort-free merge_sorted combine.
    """
    if mode == "nerf":
        weights = weights + 1e-5
        pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
        cdf = jnp.cumsum(pdf, axis=-1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
        # cdf and bins both [..., M]
        if randomized:
            draw = sorted_uniform if sorted_u else jax.random.uniform
            u = draw(
                key, cdf.shape[:-1] + (num_samples,), dtype=cdf.dtype
            )
        else:
            u = jnp.linspace(0.0, 1.0, num_samples, dtype=cdf.dtype)
            u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_samples,))
        bins_lo, bins_hi, cdf_lo, cdf_hi = _invert_cdf(u, cdf, bins)
        denom = cdf_hi - cdf_lo
        denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
        t = (u - cdf_lo) / denom
        samples = bins_lo + t * (bins_hi - bins_lo)
    elif mode == "jaxnerf":
        eps = 1e-5
        weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
        padding = jnp.maximum(0, eps - weight_sum)
        weights = weights + padding / weights.shape[-1]
        weight_sum = weight_sum + padding
        pdf = weights / weight_sum
        cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
        cdf = jnp.concatenate(
            [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])],
            axis=-1,
        )
        if randomized:
            draw = sorted_uniform if sorted_u else jax.random.uniform
            u = draw(
                key, cdf.shape[:-1] + (num_samples,), dtype=cdf.dtype
            )
        else:
            u = jnp.linspace(
                0.0, 1.0 - jnp.finfo(jnp.float32).eps, num_samples, dtype=cdf.dtype
            )
            u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_samples,))
        bins_lo, bins_hi, cdf_lo, cdf_hi = _invert_cdf(u, cdf, bins)
        t = jnp.clip(jnp.nan_to_num((u - cdf_lo) / (cdf_hi - cdf_lo), nan=0.0), 0, 1)
        samples = bins_lo + t * (bins_hi - bins_lo)
    else:
        raise ValueError(f"unknown sample_pdf mode: {mode!r}")

    return lax.stop_gradient(samples)


def sample_pdf(
    key: Optional[jax.Array],
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    z_vals: jnp.ndarray,
    num_samples: int,
    *,
    randomized: bool = True,
    mode: str = "nerf",
):
    """Hierarchical sampling: draw fine samples, merge+sort with coarse z_vals.

    Returns (z_vals_combined [..., Nc+Nf], points [..., Nc+Nf, 3]).
    Matches reference render_rays (notebook cell 10) / model_utils.py:289-314.
    """
    z_samples = piecewise_constant_pdf(
        key, bins, weights, num_samples, randomized=randomized, mode=mode
    )
    z_combined = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
    points = cast_rays(z_combined, origins, directions)
    return z_combined, points
