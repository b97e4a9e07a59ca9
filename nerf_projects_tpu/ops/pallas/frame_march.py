"""Single-dispatch whole-frame renderer over a BrickGrid.

The interactive-rendering answer to the reference's real-time octree
renderer (plenoctree/README.md headline; svox render_persp `fast`
mode, octree/nerf/utils.py:448-499). The bucketed tile renderer
(ops/pallas/tile_march.py::render_tiles_pallas_bucketed) costs ~8 host
dispatches plus per-bucket planning per frame — through the device
relay that alone caps frames near 1 Hz. This module renders a whole
frame in ONE jitted program:

  * plan: every (tile, window) pair of the frame is classified
    active/empty on device; active windows are COMPACTED into a flat
    tile-major list with a cumsum + scatter (no sort). A frame pays
    for exactly the windows its rays intersect — grazing tiles no
    longer inherit the deepest tile's chunk span, the win that made
    bucketing exact, without the bucketing dispatches;
  * march: `lax.fori_loop` over <=768-window groups (the Mosaic SMEM
    grid budget, tile_march._MAX_GRID_STEPS). Within a group each
    tile's windows are consecutive, sharing one output-block slot that
    stays VMEM-resident (the same revisiting that the (T, C) grid
    uses); across groups the per-tile compositing rows are carried in
    a [T+1, 8, r] frame array — gathered into group slots before the
    kernel and scattered back after, so a tile whose run crosses a
    group boundary resumes mid-march. Dummy slots ride a sentinel row.

The number of groups actually marched is data-dependent (fori_loop on
the active-window count); the compiled program is shared by all frames
of a (grid topology, tile count) pair.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.ops.brick_grid import BRICK, BrickGrid
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.ops.pallas.tile_march import (
    SC,
    _MAX_GRID_STEPS,
    _SIGMA_THRESH,
    _STOP_THRESH,
    _march_frame_group,
    _pack_rays,
    _plan_windows,
    default_chunks_for,
)
from nerf_projects_tpu.ops.sh import eval_sh_bases


def render_frame_pallas(
    bg: BrickGrid,
    rays: Rays,
    opts: GridRenderOptions = GridRenderOptions(),
    *,
    kernel_arrays,
    n_chunks: Optional[int] = None,
    use_occupancy: bool = True,
    group: int = 640,
    max_windows: Optional[int] = None,
    return_depth: bool = False,
    early_stop: bool = True,
    term_cull: bool = True,
    gather_fetch: bool = False,
    wps: int = 1,
):
    """Render a whole frame of [T, r] ray tiles in one jitted program.

    Semantics match render_tiles_pallas (same kernel body); requires
    prebuilt `kernel_arrays` — either the packed [nb+1, B+1, 8, 192]
    array or the (density_z, sh_z) pair — since rebuilding the layout
    per frame is an eval-path cost this renderer exists to delete.

    `max_windows`: optional cap on the active windows marched PER
    TILE (front-to-back) — the plan-level analogue of the reference
    renderer's early-stop `fast` mode: each tile keeps its nearest
    `max_windows` occupied windows and drops the rest, which for
    surface scenes are almost always fully occluded.

    `early_stop` (default on): in-kernel all-rays-saturated skip —
    once every ray of a tile has -log T past -log(opts.stop_thresh),
    the remaining windows' march bodies are predicated away (their
    weights are exactly zero, so rgb/acc/depth/log_transmit are
    bit-identical; only the aux sparsity/miss accumulators stop).
    The fetches still issue but overlap; for opaque scenes this cuts
    the marched compute by the occluded-window fraction.

    `term_cull` (default on): plan-level analytic occlusion cull —
    the data-dependent counterpart of the in-kernel skip that also
    deletes the window's eight corner FETCHES (the dominant per-window
    cost, ~5.6 us fixed vs ~5 us compute at r=256). Per window the
    plan gathers the minimum cell density over its 8 corner bricks;
    since trilerp is a convex combination of surrounding cells, every
    in-window sample's sigma is >= that minimum, so
    (SC-2) * min_step_world * min_sigma lower-bounds the window's
    contribution to every ray's optical depth (2 samples of margin for
    chunk-edge partial validity). Windows whose exclusive running
    bound exceeds -log(stop_thresh) would march with every weight
    zeroed and are dropped from the plan. Exact up to window-miss
    artifacts (rays whose samples leave the shared window, tracked by
    the march's aux miss counter); the cull only ever fires through
    fully-occupied interior bricks, where misses are rarest. This is
    the TPU answer to the reference's per-ray early termination
    (render_lerp_kernel_cuvol.cu ray loop / svox `fast` mode): the
    termination decision runs on the PLAN, so the march never even
    schedules occluded windows.

    Wrap in jax.jit with opts/group static; everything inside is
    traceable with static shapes.

    Hardware limits (round-3 compile bisect): the Mosaic compiler
    crashes above ~640 flat grid steps per call (the grouped (T, C)
    kernels survive up to 768 — the flat variant's 5 prefetch arrays
    push the per-step SMEM bookkeeping over first), and the packed
    single-array fetch crashes with r=256 tiles at any group size —
    pass the (density_z, sh_z) TUPLE for 256-ray tiles.
    """
    assert not (gather_fetch and wps > 1)
    T, r = rays.origins.shape[:2]
    nb = bg.n_bricks
    if isinstance(kernel_arrays, (tuple, list)):
        density_z, sh_z = kernel_arrays
    else:
        density_z, sh_z = kernel_arrays, None

    C = n_chunks or default_chunks_for(bg, opts)
    pack, geom = _pack_rays(bg, rays, opts, use_occupancy)
    wb, rows = _plan_windows(bg, geom, C)            # [T,C,3], [T,C,8]
    base = jnp.broadcast_to(
        (jnp.arange(C, dtype=jnp.int32) * SC)[None, :, None], (T, C, 1)
    )
    orig = jnp.concatenate(
        [(wb * BRICK).astype(jnp.int32), base], axis=-1
    )                                                 # [T, C, 4]
    basis = eval_sh_bases(
        bg.basis_dim,
        jnp.mean(rays.viewdirs, axis=1)
        / jnp.maximum(
            jnp.linalg.norm(
                jnp.mean(rays.viewdirs, axis=1), axis=-1, keepdims=True
            ),
            1e-12,
        ),
    ).astype(jnp.float32)                             # [T, B]

    # ---- flat tile-major compaction of active windows (no sort):
    # cumsum positions preserve the (t, c) order, c front-to-back
    active = jnp.any(rows != nb, axis=-1)              # [T, C]
    if term_cull:
        if sh_z is None:   # packed layout: density rides slot B
            dmin = density_z[:, bg.basis_dim].min(axis=(1, 2))
        else:
            dmin = density_z.min(axis=(1, 2))          # [nb+1]
        dmin = jnp.where(
            dmin > _SIGMA_THRESH, dmin, 0.0
        ).astype(jnp.float32)                          # sentinel -> 0
        minsig = dmin[rows].min(axis=-1)               # [T, C]
        swm = pack[:, 11].min(axis=-1)                 # [T] min dt*len
        tau_lb = minsig * swm[:, None] * float(max(SC - 2, 1))
        cum = jnp.cumsum(tau_lb, axis=1) - tau_lb      # exclusive
        active = active & (cum < -float(np.log(_STOP_THRESH)))
    if max_windows is not None:
        rank = jnp.cumsum(active.astype(jnp.int32), axis=1)
        active = active & (rank <= max_windows)
    # wps > 1: each grid step of the march kernel runs `wps`
    # consecutive windows, amortizing the per-step sequencing floor
    # (the dominant fixed cost — fwd_march_constrows: corner DMAs are
    # ~free). A step's windows must share one tile/out slot, so each
    # tile's run is padded to a wps multiple with windows that carry
    # sentinel corner rows (skipped in-kernel) + an out-of-range base
    # step (contributes exactly nothing even if marched).
    assert group % wps == 0
    af2 = active.astype(jnp.int32)                     # [T, C]
    cnt = af2.sum(axis=1)                              # [T]
    padded = -(-cnt // wps) * wps if wps > 1 else cnt
    ends = jnp.cumsum(padded)
    tile_base = ends - padded                          # exclusive
    rank_t = jnp.cumsum(af2, axis=1) - af2             # excl, per tile
    n_act = ends[-1]
    slack = T * (wps - 1) if wps > 1 else 0
    Wp = -(-(T * C + slack) // group) * group
    dest = jnp.where(
        active, tile_base[:, None] + rank_t, Wp
    ).reshape(-1)                                      # drop inactive

    def compact(x, fill):
        flat = x.reshape((T * C,) + x.shape[2:])
        out = jnp.full((Wp,) + flat.shape[1:], fill, flat.dtype)
        return out.at[dest].set(flat, mode="drop")

    if wps > 1:
        # position p belongs to tile t iff tile_base[t] <= p < ends[t]
        # — true for the run-padding slots too, which keeps the
        # first-flag/slot machinery seeing one contiguous run per tile
        p = jnp.arange(Wp, dtype=jnp.int32)
        tw = jnp.where(
            p < n_act,
            jnp.searchsorted(ends, p, side="right").astype(jnp.int32),
            T,
        )
    else:
        tw = compact(
            jnp.broadcast_to(
                jnp.arange(T, dtype=jnp.int32)[:, None], (T, C)
            ),
            T,
        )                                              # [Wp]
    rows_f = compact(rows.astype(jnp.int32), nb)[:, None]   # [Wp,1,8]
    # padding windows get base step 2^24: every tt lands past t1, so
    # valid == 0 and even a marched padding window adds exactly zero
    # (including the aux miss row)
    orig_fill = jnp.zeros((Wp, 4), jnp.int32).at[:, 3].set(1 << 24)
    orig_f = orig_fill.at[dest].set(
        orig.reshape(T * C, 4), mode="drop"
    )[:, None]                                         # [Wp, 1, 4]
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (tw[1:] != tw[:-1]).astype(jnp.int32)]
    )
    basis_ext = jnp.concatenate([basis, jnp.zeros_like(basis[:1])])
    basis_f = basis_ext[tw]                            # [Wp, B]
    pack_ext = jnp.concatenate([pack, jnp.zeros_like(pack[:1])])

    n_groups = -(-n_act // group)                      # traced scalar

    def body(g, carry):
        s = g * group
        tw_g = jax.lax.dynamic_slice(tw, (s,), (group,))
        first_g = jax.lax.dynamic_slice(first, (s,), (group,))
        first_g = first_g.at[0].set(1)
        lt_g = jnp.cumsum(first_g) - 1                 # local slot
        rows_g = jax.lax.dynamic_slice(
            rows_f, (s, 0, 0), (group, 1, 8))
        orig_g = jax.lax.dynamic_slice(
            orig_f, (s, 0, 0), (group, 1, 4))
        basis_g = jax.lax.dynamic_slice(
            basis_f, (s, 0), (group, basis_f.shape[1]))
        # slot -> frame tile (unused slots -> dummy row T)
        tiles_g = jnp.full((group,), T, jnp.int32).at[lt_g].set(tw_g)
        pack_g = pack_ext[tiles_g]
        state_g = carry[tiles_g]
        logt = -float(np.log(opts.stop_thresh)) if early_stop else None
        if gather_fetch:
            # XLA row-gather of each window's 8 corner bricks into a
            # contiguous per-window buffer: the kernel then fetches
            # 1-2 big DMAs per step instead of 8 row fetches (the
            # per-window fetch-issue cost is the frame renderer's
            # dominant term), at the price of one extra HBM
            # write+read of the gathered stream per group
            rws = rows_g[:, 0]                       # [group, 8]
            if sh_z is None:
                dz_g, sz_g = density_z[rws], None
            else:
                dz_g, sz_g = density_z[rws], sh_z[rws]
            out_g = _march_frame_group(
                dz_g, sz_g, lt_g, first_g, None, orig_g, basis_g,
                pack_g, state_g, bg.basis_dim, opts.color_mode,
                early_stop_logt=logt, gathered=True,
            )
        else:
            out_g = _march_frame_group(
                density_z, sh_z, lt_g, first_g, rows_g, orig_g,
                basis_g, pack_g, state_g, bg.basis_dim,
                opts.color_mode, early_stop_logt=logt,
                sentinel=(nb if wps > 1 else None), wps=wps,
            )
        return carry.at[tiles_g].set(out_g)

    carry0 = jnp.zeros((T + 1, 8, r), jnp.float32)
    out = jax.lax.fori_loop(0, n_groups, body, carry0)[:T]

    world_len = geom[6]
    acc = out[:, 3]
    result = {
        "rgb": jnp.moveaxis(out[:, 0:3], 1, 2)
        + (1.0 - acc[..., None]) * opts.background_brightness,
        "acc": acc,
        "log_transmit": -out[:, 5],
        "n_windows": n_act,
    }
    if return_depth:
        result["depth"] = out[:, 4] * world_len
    return result
