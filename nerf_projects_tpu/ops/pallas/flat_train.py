"""Flat-window fused train kernels over a BrickGrid.

The (T, C) train kernels march every tile for the batch-MAX active
chunk count: on surface scenes the mean active count is far below the
max (bench shell scene: mean 11.8 vs max 52 of 56 planned), so ~80%
of marched windows are sentinel padding whose per-window floor
(sequencing + fetch issue) still costs. This module plans the batch
the way the whole-frame renderer does (frame_march.py): every ACTIVE
(tile, window) pair is compacted into a flat tile-major list, and
both the forward and the fetch-free backward march exactly those
windows — the train-path counterpart of the reference's ray-length
adaptivity (render_lerp_kernel_cuvol.cu marches each ray only while
it intersects occupied space; a fixed-shape TPU grid cannot, but the
flat plan recovers the same economy at plan level with static
shapes).

Only the PACKED state layout is supported (one kernel array
[nb+1, B+1, 8, 192], one gradient block per window corner) — this is
the ship train path (plenoxels_sparse.train_step_tiles_packed_touched).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.ops.brick_grid import BRICK, BrickGrid
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.ops.pallas.tile_march import (
    SC,
    _bwd_frame_group,
    _march_frame_group,
    _pack_rays,
    _plan_windows,
    active_chunk_bound,
)
from nerf_projects_tpu.ops.sh import eval_sh_bases


def _static_chunk_bound(bg, step_size: float) -> int:
    """Chunk bound from the (static) links-array shape — usable when
    `bg` is a traced jit argument (active_chunk_bound reads concrete
    brick coords on host). Conservative: covers the full grid
    diagonal; the flat plan compacts inactive windows away, so a
    looser bound costs only plan-side cumsum width, not march time."""
    import numpy as np

    span = np.asarray(bg.brick_links.shape, np.float64) * BRICK
    diag = float(np.linalg.norm(span))
    return int(np.ceil(diag / (SC * step_size))) + 2


def _flat_plan(bg, rays, opts, w_cap, group):
    """Flat tile-major active-window plan (cumsum compaction, no
    sort) — the training twin of render_frame_pallas's plan. Returns
    (tw, first, rows_f, orig_f, basis_f, pack, geom, n_act, Wp)."""
    T = rays.origins.shape[0]
    nb = bg.n_bricks
    if isinstance(bg.brick_coords, jax.core.Tracer):
        # bg is a jit argument: coords are not concrete on host
        C = _static_chunk_bound(bg, opts.step_size)
    else:
        C = active_chunk_bound(bg, opts.step_size)
    pack, geom = _pack_rays(bg, rays, opts, True)
    wb, rows = _plan_windows(bg, geom, C)            # [T,C,3], [T,C,8]
    base = jnp.broadcast_to(
        (jnp.arange(C, dtype=jnp.int32) * SC)[None, :, None], (T, C, 1)
    )
    orig = jnp.concatenate(
        [(wb * BRICK).astype(jnp.int32), base], axis=-1
    )                                                 # [T, C, 4]
    mv = jnp.mean(rays.viewdirs, axis=1)
    basis = eval_sh_bases(
        bg.basis_dim,
        mv / jnp.maximum(
            jnp.linalg.norm(mv, axis=-1, keepdims=True), 1e-12
        ),
    ).astype(jnp.float32)                             # [T, B]

    active = jnp.any(rows != nb, axis=-1).reshape(-1)  # [T*C]
    af = active.astype(jnp.int32)
    pos = jnp.cumsum(af) - af                          # exclusive
    n_act = pos[-1] + af[-1]
    Wp = -(-w_cap // group) * group
    keep = active & (pos < Wp)
    dest = jnp.where(keep, pos, Wp)

    def compact(x, fill):
        flat = x.reshape((T * C,) + x.shape[2:])
        out = jnp.full((Wp,) + flat.shape[1:], fill, flat.dtype)
        return out.at[dest].set(flat, mode="drop")

    tw = compact(
        jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32)[:, None], (T, C)
        ),
        T,
    )                                                  # [Wp]
    rows_f = compact(rows.astype(jnp.int32), nb)[:, None]   # [Wp,1,8]
    orig_f = compact(orig, 0)[:, None]                 # [Wp, 1, 4]
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (tw[1:] != tw[:-1]).astype(jnp.int32)]
    )
    basis_ext = jnp.concatenate([basis, jnp.zeros_like(basis[:1])])
    basis_f = basis_ext[tw]                            # [Wp, B]
    return tw, first, rows_f, orig_f, basis_f, pack, geom, n_act, Wp


def required_windows(bg, rays, opts=GridRenderOptions()) -> int:
    """Host-side exact active-window count for this batch — the tight
    `w_cap` when the same rays are marched every step (bench), or a
    sizing probe otherwise (overflowing windows are dropped and
    reported in aux['dropped_windows'])."""
    nb = bg.n_bricks
    C = active_chunk_bound(bg, opts.step_size)
    _, geom = _pack_rays(bg, rays, opts, True)
    _, rows = _plan_windows(bg, geom, C)
    return int(jnp.sum(jnp.any(rows != nb, axis=-1)))


def fused_grad_blocks_flat(
    bg: BrickGrid,
    rays: Rays,
    rgb_gt: jnp.ndarray,
    opts: GridRenderOptions = GridRenderOptions(),
    *,
    kernel_arrays,
    w_cap: int,
    beta_loss: float = 0.0,
    sparsity_loss: float = 0.0,
    grad_dtype=jnp.float32,
    group: int = 640,
):
    """Fused render + gradient over the flat active-window plan:
    returns (rgb_out [T,r,3], gp_blocks [Wp,8,B+1,8,192] (packed
    gradient block per window corner), rows [Wp,8] (nb = sentinel),
    aux). Bit-identical math to fused_grad_blocks with packed
    kernel_arrays — the plan marches the same windows minus the
    sentinel padding the (T, C) grid carries.

    `w_cap` (static): capacity for active windows; overflow windows
    are dropped front-to-back per the flat order and counted in
    aux['dropped_windows']. Size with required_windows.
    """
    if rays.origins.shape[1] not in (128, 256):
        raise ValueError("tile size must be 128 or 256 rays")
    # a batch below one group marches exactly w_cap windows (no
    # round-up-to-group sentinel padding)
    group = min(group, w_cap)
    if opts.color_mode not in ("bias", "sigmoid"):
        raise NotImplementedError(
            f"flat march: unknown color mode {opts.color_mode!r}"
        )
    if isinstance(kernel_arrays, (tuple, list)) or kernel_arrays is None:
        raise ValueError(
            "flat train path requires the packed kernel array "
            "[nb+1, B+1, 8, 192]"
        )
    T, r = rays.origins.shape[:2]
    nb = bg.n_bricks
    B = bg.basis_dim
    A = SC * r
    packed_k = kernel_arrays

    (tw, first, rows_f, orig_f, basis_f, pack, geom, n_act,
     Wp) = _flat_plan(bg, rays, opts, w_cap, group)
    n_groups = Wp // group
    pack_ext = jnp.concatenate([pack, jnp.zeros_like(pack[:1])])

    def run_groups(pack_e, carry0, step_fn):
        """Shared group loop: gather per-slot rows, call step_fn per
        group, scatter the slot results back into the [T+1] carry."""
        carry = carry0
        outs = []
        for g in range(n_groups):
            s = g * group
            tw_g = jax.lax.dynamic_slice(tw, (s,), (group,))
            first_g = jax.lax.dynamic_slice(first, (s,), (group,))
            first_g = first_g.at[0].set(1)
            lt_g = jnp.cumsum(first_g) - 1             # local slot
            rows_g = jax.lax.dynamic_slice(
                rows_f, (s, 0, 0), (group, 1, 8))
            orig_g = jax.lax.dynamic_slice(
                orig_f, (s, 0, 0), (group, 1, 4))
            basis_g = jax.lax.dynamic_slice(
                basis_f, (s, 0), (group, basis_f.shape[1]))
            tiles_g = jnp.full((group,), T, jnp.int32).at[lt_g].set(
                tw_g)
            pack_g = pack_e[tiles_g]
            state_g = carry[tiles_g]
            out_g, per_w = step_fn(
                lt_g, first_g, rows_g, orig_g, basis_g, pack_g,
                state_g, s)
            carry = carry.at[tiles_g].set(out_g)
            outs.append(per_w)
        return carry, outs

    # ---- forward: compositing rows + the per-sample field stream
    def fwd_step(lt_g, first_g, rows_g, orig_g, basis_g, pack_g,
                 state_g, s):
        out_g, samp_g = _march_frame_group(
            packed_k, None, lt_g, first_g, rows_g, orig_g, basis_g,
            pack_g, state_g, B, opts.color_mode,
            emit_samples=True, sentinel=nb,
        )
        return out_g, samp_g

    fwd_carry, samp_groups = run_groups(
        pack_ext, jnp.zeros((T + 1, 8, r), jnp.float32), fwd_step)
    fwd = fwd_carry[:T]                               # [T, 8, r]
    samples = jnp.concatenate(samp_groups, axis=0)    # [Wp, 1, 8, A]

    acc = fwd[:, 3]
    rgb_out = (
        jnp.moveaxis(fwd[:, 0:3], 1, 2)
        + (1.0 - acc[..., None]) * opts.background_brightness
    )                                                 # [T, r, 3]

    n_rays = T * r
    g = 2.0 * (rgb_out - rgb_gt) / (3.0 * n_rays)
    S_total = jnp.sum(g * rgb_out, axis=-1)           # [T, r]
    if beta_loss > 0:
        log_T = -fwd[:, 5]
        T_fin = jnp.exp(log_T)
        S_total = S_total + (beta_loss / n_rays) * (
            1.0 - T_fin / (1.0 - T_fin + 1e-3)
        )
    pack2 = pack.at[:, 12:15].set(jnp.moveaxis(g, -1, 1))
    pack2 = pack2.at[:, 15].set(S_total)
    pack2_ext = jnp.concatenate([pack2, jnp.zeros_like(pack2[:1])])

    # ---- fetch-free backward over the same plan
    def bwd_step(lt_g, first_g, rows_g, orig_g, basis_g, pack_g,
                 state_g, s):
        samp_g = jax.lax.dynamic_slice(
            samples, (s, 0, 0, 0), (group, 1, 8, A))
        state_out, grads_g = _bwd_frame_group(
            lt_g, first_g, rows_g, orig_g, basis_g, pack_g, state_g,
            samp_g, B, float(sparsity_loss), opts.color_mode,
            grad_dtype, sentinel=nb,
        )
        return state_out, grads_g

    _, grad_groups = run_groups(
        pack2_ext, jnp.zeros((T + 1, 8, r), jnp.float32), bwd_step)
    gp_blocks = jnp.concatenate(grad_groups, axis=0)[:, 0]
    # [Wp, 8, B+1, 8, 192]

    aux = {
        "acc": acc,
        "log_transmit": -fwd[:, 5],
        "sparsity_sum": fwd[:, 6],
        "window_miss": jnp.sum(fwd[:, 7]) / (
            jnp.maximum(n_act, 1).astype(jnp.float32) * SC * r
        ),
        "n_windows": n_act,
        "dropped_windows": jnp.maximum(n_act - Wp, 0),
        "dropped_active_chunks": jnp.maximum(n_act - Wp, 0),
    }
    return rgb_out, None, gp_blocks, rows_f[:, 0], aux
