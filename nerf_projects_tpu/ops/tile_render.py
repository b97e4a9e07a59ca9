"""Lockstep tile renderer over a BrickGrid — the TPU-native cuvol march.

The reference marches each ray independently with per-sample corner
gathers (render_lerp_kernel_cuvol.cu:30-120). On TPU that shape is
gather-bound by ~2 orders of magnitude (NOTES_ROUND1.md), so this module
re-derives the march around what the hardware is good at:

  * rays are grouped into COHERENT TILES (pixels of one image patch) and
    all rays of a tile march in lockstep — at every step the tile's
    samples cluster inside a 16^3 window (2x2x2 bricks);
  * the window is fetched with 8 wide row gathers (ops/brick_grid.py);
  * trilinear interpolation becomes SEPARABLE HAT-MATRIX contractions:
    per axis a matrix A[i] = max(0, 1 - |x - i|) has exactly the two
    trilerp taps; contracting x on the MXU and y/z on the VPU
    reproduces the reference trilerp bit-for-bit for in-window samples;
  * compositing streams through a lax.scan over step chunks, carrying
    (log_transmit, rgb, acc, depth) — nothing of size [rays, steps]
    ever exists.

Numerics parity with ops/grid.py volume_render_grid (itself the tested
twin of the CUDA kernel): same AABB clip, sigma_thresh / stop_thresh
masking, +0.5 SH bias clamp, background brightness. Two documented
sampling deviations, both quality-neutral and bounded:
  1. lockstep phase: rays sample at t = T0_tile + s*dt_ray instead of
     t0_ray + s*dt_ray — the same step density with a per-ray phase
     shift of < 1 step (the reference's own phase is the arbitrary AABB
     entry point);
  2. the SH basis is evaluated at the tile's mean view direction
     (tile angular extent ~0.01 rad; SH deg<=4 varies smoothly, so the
     decode error is ~1e-4 relative — measured in tests).
Samples that would fall outside the window (pathological tiles) are
dropped and counted in the returned `window_miss` fraction; tests pin
it to 0 for sane tile/window geometry.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.ops.brick_grid import BRICK, BrickGrid, gather_windows
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.ops.sh import eval_sh_bases


def default_chunks(bg: BrickGrid, step_size: float,
                   steps_per_chunk: int) -> int:
    diag = float(np.linalg.norm(np.asarray(bg.reso, np.float64)))
    total = int(np.ceil(diag / step_size)) + 1
    return -(-total // steps_per_chunk)


def render_tiles(
    bg: BrickGrid,
    rays: Rays,
    opts: GridRenderOptions = GridRenderOptions(),
    *,
    steps_per_chunk: int = 12,
    n_chunks: Optional[int] = None,
    return_depth: bool = False,
):
    """Render rays [T, R] (T tiles of R coherent rays each).

    Returns dict with rgb/acc [T, R(,3)], log_transmit, sparsity_sum
    (sum of log(1+2 sigma^2) per ray, for the Cauchy sparsity loss),
    window_miss (scalar fraction), and depth when requested.
    """
    T, R = rays.origins.shape[:2]
    Sc = steps_per_chunk
    C = n_chunks or default_chunks(bg, opts.step_size, Sc)
    BX, BY, BZ = bg.bricks_shape
    ch = 3 * bg.basis_dim

    reso = jnp.asarray(bg.reso, jnp.float32)
    scale = reso * 0.5 / jnp.asarray(bg.radius)
    og = bg.world_to_grid(rays.origins)          # [T, R, 3]
    dg = rays.directions * scale                 # [T, R, 3]
    world_len = jnp.linalg.norm(rays.directions, axis=-1)
    gnorm = jnp.linalg.norm(dg, axis=-1)
    dt = opts.step_size / jnp.maximum(gnorm, 1e-12)   # [T, R]
    step_world = dt * world_len

    inv_d = 1.0 / jnp.where(jnp.abs(dg) < 1e-12, 1e-12, dg)
    t_lo = (0.0 - og) * inv_d
    t_hi = (reso - 1.0 - og) * inv_d
    t0 = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    t1 = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    t0 = jnp.maximum(t0, opts.near_clip / jnp.maximum(world_len, 1e-12))
    hit = t1 > t0

    big = jnp.float32(1e30)
    T0 = jnp.min(jnp.where(hit, t0, big), axis=-1)   # [T]
    T0 = jnp.where(jnp.isfinite(T0) & (T0 < big), T0, 0.0)

    # tile-shared SH basis at the mean view direction
    vmean = jnp.mean(rays.viewdirs, axis=1)
    vmean = vmean / jnp.maximum(
        jnp.linalg.norm(vmean, axis=-1, keepdims=True), 1e-12
    )
    basis = eval_sh_bases(bg.basis_dim, vmean)       # [T, B]

    iota16 = jnp.arange(16, dtype=jnp.float32)
    Bm2 = jnp.asarray([BX - 2, BY - 2, BZ - 2])

    def chunk_body(carry, c):
        cum_tau, rgb_acc, acc, depth_acc, spars, miss = carry
        s_idx = c * Sc + jnp.arange(Sc, dtype=jnp.float32)
        t = T0[:, None, None] + s_idx * dt[..., None]      # [T, R, Sc]
        valid = (t >= t0[..., None]) & (t < t1[..., None]) & hit[..., None]
        pos = og[:, :, None, :] + t[..., None] * dg[:, :, None, :]

        # window anchor from the valid-sample centroid
        vw = valid[..., None].astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(vw, axis=(1, 2)), 1.0)
        centroid = jnp.sum(pos * vw, axis=(1, 2)) / denom  # [T, 3]
        wb = jnp.clip(
            jnp.round(centroid / BRICK - 1.0).astype(jnp.int32), 0, Bm2
        )  # [T, 3]

        win_d, win_sh = gather_windows(bg, wb)  # [T,16,16,16], [...,ch]
        # decode SH once per window with the tile basis -> rgb window
        win_rgb = jnp.einsum(
            "txyzcb,tb->txyzc",
            win_sh.reshape(T, 16, 16, 16, 3, bg.basis_dim),
            basis,
        )
        win_cat = jnp.concatenate(
            [win_d[..., None], win_rgb], axis=-1
        )  # [T, 16, 16, 16, 4]

        local = pos - (wb[:, None, None, :] * BRICK).astype(jnp.float32)
        # soft gate matching the Pallas march: hat weights fade a
        # boundary sample over the last voxel instead of dropping it
        in_win = jnp.all((local > -1.0) & (local < 16.0), axis=-1)
        in_exact = jnp.all((local >= 0.0) & (local <= 15.0), axis=-1)
        eff = valid & in_win
        miss = miss + jnp.sum((valid & ~in_exact).astype(jnp.float32))

        # hat matrices [T, R, Sc, 16] per axis; invalid rows zeroed via x
        def hat(a):
            return jnp.maximum(
                0.0, 1.0 - jnp.abs(local[..., a, None] - iota16)
            )

        Ax = hat(0) * eff[..., None]
        Ay = hat(1)
        Az = hat(2)

        A = R * Sc
        V1 = jnp.einsum(
            "tak,tkm->tam",
            Ax.reshape(T, A, 16).astype(jnp.bfloat16),
            win_cat.reshape(T, 16, 16 * 16 * 4).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # [T, A, 16*16*4]
        V2 = jnp.sum(
            V1.reshape(T, A, 16, 16 * 4)
            * Ay.reshape(T, A, 16, 1),
            axis=2,
        )  # [T, A, 16*4]
        V3 = jnp.sum(
            V2.reshape(T, A, 16, 4) * Az.reshape(T, A, 16, 1), axis=2
        )  # [T, A, 4]
        out = V3.reshape(T, R, Sc, 4)
        sigma = out[..., 0]
        sigma = jnp.where(sigma > opts.sigma_thresh, sigma, 0.0)
        rgb_raw = out[..., 1:4]
        if opts.color_mode == "sigmoid":
            rgb = jax.nn.sigmoid(rgb_raw)
        else:
            rgb = jnp.maximum(rgb_raw + 0.5, 0.0)

        tau = sigma * step_world[..., None]                # [T, R, Sc]
        prefix = cum_tau[..., None] + jnp.concatenate(
            [jnp.zeros_like(tau[..., :1]),
             jnp.cumsum(tau[..., :-1], axis=-1)],
            axis=-1,
        )
        Tpref = jnp.exp(-prefix)
        alpha = 1.0 - jnp.exp(-tau)
        active = Tpref > opts.stop_thresh
        w = jnp.where(active, Tpref * alpha, 0.0)

        rgb_acc = rgb_acc + jnp.einsum("trs,trsc->trc", w, rgb)
        acc = acc + jnp.sum(w, axis=-1)
        depth_acc = depth_acc + jnp.sum(w * t, axis=-1)
        cum_tau = cum_tau + jnp.sum(jnp.where(active, tau, 0.0), axis=-1)
        spars = spars + jnp.sum(jnp.log1p(2.0 * sigma * sigma), axis=-1)
        return (cum_tau, rgb_acc, acc, depth_acc, spars, miss), None

    init = (
        jnp.zeros((T, R)),
        jnp.zeros((T, R, 3)),
        jnp.zeros((T, R)),
        jnp.zeros((T, R)),
        jnp.zeros((T, R)),
        jnp.float32(0.0),
    )
    (cum_tau, rgb_acc, acc, depth_acc, spars, miss), _ = jax.lax.scan(
        chunk_body, init, jnp.arange(C)
    )

    out_rgb = rgb_acc + (1.0 - acc[..., None]) * opts.background_brightness
    result = {
        "rgb": out_rgb,
        "acc": acc,
        "log_transmit": -cum_tau,
        "sparsity_sum": spars,
        "window_miss": miss / jnp.float32(T * R * Sc * C),
    }
    if return_depth:
        result["depth"] = depth_acc * world_len
    return result


def tiles_from_image_rays(rays: Rays, H: int, W: int,
                          tile_h: int, tile_w: int) -> Rays:
    """Reshape full-image rays [H*W] (row-major) into coherent tiles
    [T, tile_h*tile_w]. H, W must divide by the tile dims."""
    assert H % tile_h == 0 and W % tile_w == 0, (H, W, tile_h, tile_w)

    def rs(x):
        x = x.reshape(H // tile_h, tile_h, W // tile_w, tile_w, 3)
        x = jnp.transpose(x, (0, 2, 1, 3, 4))
        return x.reshape(-1, tile_h * tile_w, 3)

    return Rays(rs(rays.origins), rs(rays.directions), rs(rays.viewdirs))


def untile_image(vals: jnp.ndarray, H: int, W: int,
                 tile_h: int, tile_w: int) -> jnp.ndarray:
    """[T, tile_h*tile_w, C] -> [H, W, C] (inverse of tiles_from_image_rays)."""
    C = vals.shape[-1]
    v = vals.reshape(H // tile_h, W // tile_w, tile_h, tile_w, C)
    v = jnp.transpose(v, (0, 2, 1, 3, 4))
    return v.reshape(H, W, C)


def render_image_tiles(
    bg: BrickGrid,
    rays: Rays,
    H: int,
    W: int,
    opts: GridRenderOptions = GridRenderOptions(),
    *,
    tile_h: int = 8,
    tile_w: int = 16,
    tiles_per_batch: int = 128,
    return_depth: bool = False,
):
    """Full-image render through the lockstep tile path.

    rays: flat [H*W] row-major image rays. Tiles are processed in fixed
    batches under one jitted callable (re-used across batches/frames).
    Returns dict of [H, W, ...] images.
    """
    tiles = tiles_from_image_rays(rays, H, W, tile_h, tile_w)
    T = tiles.origins.shape[0]
    R = tile_h * tile_w
    pad = (-T) % tiles_per_batch
    if pad:
        tiles = jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])]
            ),
            tiles,
        )
    n_batches = (T + pad) // tiles_per_batch

    @jax.jit
    def render_batch(batch):
        return render_tiles(bg, batch, opts, return_depth=return_depth)

    outs = []
    for i in range(n_batches):
        sl = jax.tree_util.tree_map(
            lambda x: x[i * tiles_per_batch : (i + 1) * tiles_per_batch],
            tiles,
        )
        outs.append(render_batch(sl))
    merged = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs)[:T], *outs
    )
    result = {
        "rgb": untile_image(merged["rgb"], H, W, tile_h, tile_w),
        "acc": untile_image(merged["acc"][..., None], H, W, tile_h, tile_w)[
            ..., 0
        ],
    }
    if return_depth:
        result["depth"] = untile_image(
            merged["depth"][..., None], H, W, tile_h, tile_w
        )[..., 0]
    return result


def render_image_tiles_pallas_exact(
    bg: BrickGrid,
    rays: Rays,
    H: int,
    W: int,
    opts: GridRenderOptions = GridRenderOptions(),
    *,
    grid=None,
    kernel_arrays=None,
    tile_batch: int = 512,
    fallback_chunk: int = 2048,
):
    """Full-image Pallas tile render with an EXACT per-sample fallback
    for window-missed rays.

    The lockstep tile march drops the rare in-span sample that falls
    outside its chunk's 16-voxel window (`miss_per_ray`); for eval that
    shows up as dropped-geometry pixels at grazing tiles. Rays with a
    nonzero miss count are re-rendered through `volume_render_grid`
    (per-sample gathers, exact) and spliced in — the fast path covers
    ~99.5%+ of pixels, the exact path guarantees the rest.

    grid: SparseGrid for the fallback (defaults to to_sparse_grid(bg),
    which requires bg to carry master data). Returns (rgb [H, W, 3],
    stats dict with "fallback_rays").
    """
    from nerf_projects_tpu.ops.grid import volume_render_grid
    from nerf_projects_tpu.ops.pallas.tile_march import render_tiles_pallas

    flat = jax.tree_util.tree_map(lambda x: x.reshape(-1, 3), rays)
    tiles = tiles_from_image_rays(flat, H, W, 8, 16)
    parts, misses = [], []
    for i in range(0, tiles.origins.shape[0], tile_batch):
        sl = jax.tree_util.tree_map(
            lambda x: x[i : i + tile_batch], tiles)
        out = render_tiles_pallas(
            bg, sl, opts, kernel_arrays=kernel_arrays)
        parts.append(out["rgb"])
        misses.append(out["miss_per_ray"])
    img = untile_image(jnp.concatenate(parts, 0), H, W, 8, 16)
    miss = untile_image(
        jnp.concatenate(misses, 0)[..., None], H, W, 8, 16)[..., 0]
    bad = np.asarray(miss > 0).reshape(-1)
    n_bad = int(bad.sum())
    if n_bad:
        if grid is None:
            from nerf_projects_tpu.ops.brick_grid import to_sparse_grid

            grid = to_sparse_grid(bg)
        idx = np.nonzero(bad)[0]
        # per-sample fallback memory scales with samples/ray (~56/voxel
        # diag at step 0.5): the padded [N*S, 27] corner gather hit
        # 13.9 GB and OOMed 15.75 GB HBM at 512^3/800^2 (the round-5
        # quality-resume crash). Hold N*S*pad roughly at the 256^3
        # default's footprint by shrinking the chunk quadratically.
        reso_max = max(bg.brick_links.shape) * 8
        fallback_chunk = max(
            128, int(fallback_chunk * min(1.0, (256 / reso_max) ** 2))
        )
        ex = jax.jit(
            lambda gg, r: volume_render_grid(gg, r, opts)["rgb"])
        fixed = []
        for i in range(0, len(idx), fallback_chunk):
            ii = idx[i : i + fallback_chunk]
            pad = fallback_chunk - len(ii)
            ii_p = np.concatenate([ii, np.full(pad, ii[-1])]) if pad else ii
            sl = jax.tree_util.tree_map(
                lambda x: x.reshape(-1, 3)[jnp.asarray(ii_p)], rays)
            o = ex(grid, sl)
            fixed.append(o[: len(ii)] if pad else o)
        img = img.reshape(-1, 3).at[jnp.asarray(idx)].set(
            jnp.concatenate(fixed, 0)).reshape(H, W, 3)
    return img, {"fallback_rays": n_bad}
