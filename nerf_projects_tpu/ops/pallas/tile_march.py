"""Pallas TPU kernel: fused lockstep tile march over a BrickGrid.

This is the framework's cuvol render kernel — the TPU answer to the
reference's warp-per-ray CUDA march
(svox2/svox2/csrc/render_lerp_kernel_cuvol.cu:30-120 forward,
:1070-1195 fused) — built on the tile/window decomposition of
ops/tile_render.py (same math; that module is the jnp twin these
kernels are tested against):

  * grid = (tiles, chunks), chunks minor — the sequential TPU grid IS
    the ray march; per-ray compositing state lives in the output block,
    which stays VMEM-resident across a tile's whole chunk sweep;
  * the 2x2x2-brick window arrives as 8 scalar-prefetch-indexed block
    fetches (one per corner brick) that Mosaic double-buffers against
    compute; empty bricks alias a zero sentinel row, so runs of empty
    windows re-fetch nothing;
  * trilinear interpolation contracts PER BRICK with no transposes:
    a brick row [512] is already [lx, ly*lz] row-major, so
    V1_k = brick_k^T @ Ax_k is one MXU matmul and the y/z reductions
    are VPU multiplies against hat slices;
  * the per-ray exclusive prefix of optical depth is a strictly-lower
    triangular [SC, SC] matmul (no cumsum primitive in-kernel).

Sample layout: samples live in lanes as A = SC*128 with a = s*128 + r
(row-major reshape of [SC steps, 128 rays]).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.ops.brick_grid import BRICK, BrickGrid
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.ops.sh import eval_sh_bases

INTERPRET = False

R = 128          # default rays per tile (one lane group); 256 supported
SC = 16          # steps per chunk

# ray-pack rows (fp32 [T, 16, 128]):
#   0-2 og xyz | 3-5 dg xyz | 6 dt | 7 t0 | 8 t1 | 9 T0 (bcast) |
#   10 basis (first basis_dim lanes) | 11 step_world
PACK_ROWS = 16

_SIGMA_THRESH = 1e-8
_STOP_THRESH = 1e-7
# fused density+color x-stage dot (see _make_fwd_kernel); TM_XFUSE=0
# falls back to two separate dots for hardware A/B. Read at kernel
# BUILD time (inside _make_fwd_kernel), not import time, so in-process
# A/Bs that flip the env var between pallas_call constructions see it;
# note jit/pallas caches keyed on config do NOT include this gate —
# flip it only across fresh kernel builds.
import os as _os


def _xfuse_enabled():
    return _os.environ.get("TM_XFUSE", "1") != "0"

# Mosaic keeps per-grid-step scalar state in SMEM (~1 KB/step measured:
# a (40 tiles x 38 chunks) grid overflowed the 1 MB SMEM by 27%);
# keep each pallas_call's grid under this many steps and lax.map over
# tile groups beyond it.
_MAX_GRID_STEPS = 768


def _tile_groups(T: int, n_chunks: int):
    tg = max(1, min(T, _MAX_GRID_STEPS // max(n_chunks, 1)))
    pad = (-T) % tg
    return tg, pad


def _group(x, tg):
    return x.reshape((x.shape[0] // tg, tg) + x.shape[1:])

# static (dx, dy, dz) corner order, dz fastest — matches brick_grid offs
_CORNERS = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]


# ---------------------------------------------------------------------------
# In-kernel lane relayouts. Mosaic reshapes between [SC, r] and
# [1, SC*r] are only supported when one side has 128 lanes; for
# r >= 256 the direct [16, r] <-> [1, SC*r] cast is an internal
# compiler error. Route through [m*SC, 128] (m = r/128; one side 128 —
# legal both ways) with m-way row (de)interleave as 0/1 selection
# matmuls (strided sublane slicing is unsafe on TPU).
# ---------------------------------------------------------------------------

def _m_select(SC: int, m: int):
    ri = jax.lax.broadcasted_iota(jnp.int32, (SC, m * SC), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (SC, m * SC), 1)
    return [
        (ci == m * ri + k).astype(jnp.float32) for k in range(m)
    ]


def _lanes_unflat(x, SC: int, r: int):
    """[1, SC*r] (lane a = s*r + j) -> [SC, r]."""
    if r == 128:
        return x.reshape(SC, r)
    m = r // 128
    y = x.reshape(m * SC, 128)
    parts = [
        jax.lax.dot_general(
            P, y, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for P in _m_select(SC, m)
    ]
    return jnp.concatenate(parts, axis=1)


def _lanes_flat(x, SC: int, r: int):
    """[SC, r] -> [1, SC*r] (lane a = s*r + j)."""
    if r == 128:
        return x.reshape(1, SC * r)
    m = r // 128
    Ps = _m_select(SC, m)
    y = None
    for k, P in enumerate(Ps):
        term = jax.lax.dot_general(
            P, x[:, 128 * k : 128 * (k + 1)],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = term if y is None else y + term
    return y.reshape(1, SC * r)


def _mean_viewdirs(rays: Rays):
    vmean = jnp.mean(rays.viewdirs, axis=1)
    return vmean / jnp.maximum(
        jnp.linalg.norm(vmean, axis=-1, keepdims=True), 1e-12
    )


def _pack_rays(bg: BrickGrid, rays: Rays, opts: GridRenderOptions,
               use_occupancy: bool = False):
    """Per-tile ray geometry + the [T, 16, 128] kernel pack.

    use_occupancy: shrink each ray's [t0, t1] to the active-brick span
    (brick_links >= 0 IS a factor-8 occupancy bitmap) so the lockstep
    march spends its chunk budget inside occupied space — the TPU
    replacement for the reference's per-ray skip-dist pointer chasing
    (compute_skip_dist, render_util.cuh:235-298). True/"aabb" uses the
    gather-free occupied-AABB slab test (the per-probe bitmap gather
    costs ~16 ms/step at the bench shape); "probe" keeps the tighter
    per-ray probe interval.
    """
    T = rays.origins.shape[0]
    reso = jnp.asarray(bg.reso, jnp.float32)
    scale = reso * 0.5 / jnp.asarray(bg.radius)
    og = bg.world_to_grid(rays.origins)
    dg = rays.directions * scale
    world_len = jnp.linalg.norm(rays.directions, axis=-1)
    gnorm = jnp.linalg.norm(dg, axis=-1)
    dt = opts.step_size / jnp.maximum(gnorm, 1e-12)

    inv_d = 1.0 / jnp.where(jnp.abs(dg) < 1e-12, 1e-12, dg)
    t_lo = (0.0 - og) * inv_d
    t_hi = (reso - 1.0 - og) * inv_d
    t0 = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    t1 = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    t0 = jnp.maximum(t0, opts.near_clip / jnp.maximum(world_len, 1e-12))
    if use_occupancy:
        from nerf_projects_tpu.ops.grid_accel import (
            OccupancyGrid,
            aabb_t_range,
            active_t_range,
        )

        occ = OccupancyGrid(bitmap=bg.brick_links >= 0, factor=BRICK)
        shrink = (active_t_range if use_occupancy == "probe"
                  else aabb_t_range)
        te, tx = shrink(
            occ, og.reshape(-1, 3), dg.reshape(-1, 3),
            t0.reshape(-1), t1.reshape(-1),
        )
        t0 = jnp.maximum(t0, te.reshape(t0.shape))
        t1 = jnp.minimum(t1, tx.reshape(t1.shape))
    hit = t1 > t0
    big = jnp.float32(1e30)
    T0 = jnp.min(jnp.where(hit, t0, big), axis=-1)
    T0 = jnp.where(T0 < big, T0, 0.0)

    vmean = jnp.mean(rays.viewdirs, axis=1)
    vmean = vmean / jnp.maximum(
        jnp.linalg.norm(vmean, axis=-1, keepdims=True), 1e-12
    )
    basis = eval_sh_bases(bg.basis_dim, vmean)  # [T, B]

    r_count = rays.origins.shape[1]
    pack = jnp.zeros((T, PACK_ROWS, r_count), jnp.float32)
    pack = pack.at[:, 0:3].set(jnp.moveaxis(og, -1, 1))
    pack = pack.at[:, 3:6].set(jnp.moveaxis(dg, -1, 1))
    pack = pack.at[:, 6].set(dt)
    pack = pack.at[:, 7].set(jnp.where(hit, t0, big))
    pack = pack.at[:, 8].set(jnp.where(hit, t1, -big))
    pack = pack.at[:, 9].set(T0[:, None])
    pack = pack.at[:, 10, : basis.shape[1]].set(basis)
    pack = pack.at[:, 11].set(dt * world_len)
    return pack, (og, dg, dt, T0, t0, t1, world_len)


def _plan_windows(bg: BrickGrid, geom, n_chunks: int):
    """Analytic window plan: per (tile, chunk) window voxel origin + the
    8 corner brick rows (empty -> sentinel row nb).

    The window for chunk c is centered on the MIDPOINT of the hit-ray
    bundle's min/max positions at the chunk-center step — a 2-brick
    window has only 16-voxel extent and the brick-aligned origin costs
    up to 4 voxels of centering, so the bundle (whose transverse spread
    is depth x tile angle) needs every remaining voxel of slack. The
    previous hit-MEAN centroid let edge rays of grazing tiles fall
    outside the window (dropped-sample image stripes, window_miss up to
    2% at 800^2)."""
    og, dg, dt, T0, t0, t1, _ = geom
    BX, BY, BZ = bg.bricks_shape
    hit = t1 > t0                                               # [T, R]
    c = jnp.arange(n_chunks, dtype=jnp.float32)
    big = jnp.float32(1e30)
    # a ray contributes to chunk c's extent iff its valid span
    # intersects the chunk's step interval [c*SC, c*SC + SC)
    ts = T0[:, None, None] + (c * SC)[None, :, None] * dt[:, None, :]
    te = T0[:, None, None] + (
        c * SC + (SC - 1)
    )[None, :, None] * dt[:, None, :]                           # [T, C, R]
    live = (
        hit[:, None, :]
        & (ts < t1[:, None, :])
        & (te >= t0[:, None, :])
    )
    # clamp the endpoint evaluations to the ray's valid span so a ray
    # that dies mid-chunk doesn't inflate the extent past its exit
    tsc = jnp.clip(ts, t0[:, None, :], t1[:, None, :])
    tec = jnp.clip(te, t0[:, None, :], t1[:, None, :])
    any_live = jnp.any(live, axis=2)                            # [T, C]
    wbs = []
    bm2 = (BX - 2, BY - 2, BZ - 2)
    for a in range(3):
        # per-axis so XLA fuses the affine producers into the ray
        # reductions instead of materializing [T, C, R, 3]
        o_a = og[..., a][:, None, :]
        d_a = dg[..., a][:, None, :]
        p0 = o_a + tsc * d_a                                    # [T, C, R]
        p1 = o_a + tec * d_a
        lo = jnp.minimum(p0, p1)
        hi = jnp.maximum(p0, p1)
        pmin = jnp.min(jnp.where(live, lo, big), axis=2)        # [T, C]
        pmax = jnp.max(jnp.where(live, hi, -big), axis=2)
        pmin = jnp.where(any_live, pmin, 0.0)
        pmax = jnp.where(any_live, pmax, 0.0)
        # the window [8k, 8k+16) usably covers samples in [8k, 8k+15]
        # (trilerp reads cell+1). Feasible origins: 8k <= pmin AND
        # pmax <= 8k + 15; pick the centered one inside that interval.
        kmin = jnp.ceil((pmax - 15.0) / BRICK)
        kmax = jnp.floor(pmin / BRICK)
        kc = jnp.round((pmin + pmax) / (2.0 * BRICK) - 1.0)
        k = jnp.where(
            kmin <= kmax, jnp.clip(kc, kmin, kmax), kc
        )  # infeasible extent (> 15 voxels): stay centered
        wbs.append(jnp.clip(k.astype(jnp.int32), 0, bm2[a]))
    wb = jnp.stack(wbs, axis=-1)                                # [T, C, 3]

    offs = jnp.asarray(_CORNERS, jnp.int32)
    coords = wb[:, :, None, :] + offs  # [T, C, 8, 3]
    rows = bg.brick_links[
        coords[..., 0], coords[..., 1], coords[..., 2]
    ]
    rows = jnp.where(rows < 0, bg.n_bricks, rows).astype(jnp.int32)
    return wb, rows


def _orig_with_base(wb, rows, nb: int, C: int, compact: "Optional[int]"):
    """[T, C, 4] kernel plan: window voxel origin + base step; applies
    chunk compaction when `compact` is set below C. Returns
    ((orig [T, C', 4], rows [T, C', 8]), C', dropped) where `dropped`
    is the total ACTIVE chunks truncated by an undersized `compact`
    bound (0 when exact; callers surface it so silent geometry loss is
    detectable — advisor r2)."""
    if compact is not None and compact < C:
        active_n = jnp.sum(
            jnp.any(rows != nb, axis=-1).astype(jnp.int32), axis=1
        )
        dropped = jnp.sum(jnp.maximum(active_n - compact, 0))
        wb, rows_c, base = _compact_chunks(wb, rows, nb, compact)
        C = compact
        orig = jnp.concatenate(
            [(wb * BRICK).astype(jnp.int32), base[..., None]], axis=-1
        )
        return (orig, rows_c), C, dropped
    T = wb.shape[0]
    base = jnp.broadcast_to(
        (jnp.arange(C, dtype=jnp.int32) * SC)[None, :], (T, C)
    )
    orig = jnp.concatenate(
        [(wb * BRICK).astype(jnp.int32), base[..., None]], axis=-1
    )
    return (orig, rows), C, jnp.zeros((), jnp.int32)


def _compact_chunks(wb, rows, nb: int, c_keep: int):
    """Pack each tile's ACTIVE chunks (any non-sentinel corner) to the
    front, keeping front-to-back order, and truncate to c_keep. EXACT:
    a fully-empty window contributes zero opacity, so skipping it does
    not change compositing; chunks beyond c_keep are only dropped if
    the tile has more than c_keep active chunks (callers size c_keep
    from the scene; see required_chunks)."""
    active = jnp.any(rows != nb, axis=-1)              # [T, C]
    order = jnp.argsort(~active, axis=1, stable=True)  # actives first
    idx = order[:, :c_keep]                            # [T, C']
    rows_c = jnp.take_along_axis(rows, idx[..., None], axis=1)
    wb_c = jnp.take_along_axis(wb, idx[..., None], axis=1)
    base = (idx * SC).astype(jnp.int32)
    return wb_c, rows_c, base


def required_chunks(bg: BrickGrid, rays: Rays,
                    opts: GridRenderOptions = GridRenderOptions(),
                    *, use_occupancy: bool = False,
                    multiple: int = 8) -> int:
    """Host-side helper: the max ACTIVE chunk count any tile needs for
    these rays (rounded up to `multiple` to bound recompiles). Run
    OUTSIDE jit; pass the result as compact_chunks= to the render/train
    entry points."""
    C = default_chunks_for(bg, opts)
    pack, geom = _pack_rays(bg, rays, opts, use_occupancy)
    wb, rows = _plan_windows(bg, geom, C)
    active = jnp.any(rows != bg.n_bricks, axis=-1)
    need = int(jnp.max(jnp.sum(active.astype(jnp.int32), axis=1)))
    need = max(need, 1)
    return min(C, -(-need // multiple) * multiple)


def render_tiles_pallas_bucketed(
    bg: BrickGrid,
    rays: Rays,
    opts: GridRenderOptions = GridRenderOptions(),
    *,
    kernel_arrays=None,
    buckets: int = 3,
    use_occupancy: bool = False,
    return_depth: bool = False,
):
    """Eval-path renderer that BUCKETS tiles by their active-chunk
    count and renders each bucket with its own compacted chunk bound —
    grazing tiles no longer force the whole batch to march the longest
    span. Host-side planning (run OUTSIDE jit); bucket sizes and
    per-bucket bounds are stable across calls with the same tile count,
    so compile variants are few and cached. Exact (see
    _compact_chunks)."""
    import numpy as _np

    C = default_chunks_for(bg, opts)
    active = _np.asarray(
        _active_counts_jit(bg, rays, opts, use_occupancy, C)
    )
    order = _np.argsort(active, kind="stable")
    T = order.shape[0]
    keys = None
    parts = []
    grps = [g for g in _np.array_split(order, min(buckets, T))
            if g.size]
    for grp in grps:
        ck = min(C, max(8, -(-int(active[grp].max()) // 8) * 8))
        sub = jax.tree_util.tree_map(
            lambda x: x[jnp.asarray(grp)], rays
        )
        # one jitted call per bucket (cached per config) — eager per-op
        # dispatch through the device relay costs ~20 ms/op otherwise
        out = _bucket_render_jit(
            opts, ck, use_occupancy, return_depth,
            kernel_arrays is not None,
        )(bg, sub, kernel_arrays)
        if keys is None:
            keys = [k for k in out
                    if k not in ("window_miss", "dropped_active_chunks")]
        parts.append(out)
    # reassemble in original tile order with ONE concat + take per key
    inv = _np.argsort(_np.concatenate(grps), kind="stable")
    inv = jnp.asarray(inv)
    return {
        k: jnp.concatenate([p[k] for p in parts], axis=0)[inv]
        for k in keys
    }


@functools.partial(
    jax.jit, static_argnames=("opts", "use_occupancy", "n_chunks")
)
def _active_counts_jit(bg, rays, opts, use_occupancy, n_chunks):
    pack, geom = _pack_rays(bg, rays, opts, use_occupancy)
    wb, rows = _plan_windows(bg, geom, n_chunks)
    return jnp.sum(
        jnp.any(rows != bg.n_bricks, -1).astype(jnp.int32), axis=1
    )


_BUCKET_RENDER_CACHE = {}


def _bucket_render_jit(opts, ck, use_occupancy, return_depth, has_ka):
    key = (opts, ck, use_occupancy, return_depth, has_ka)
    fn = _BUCKET_RENDER_CACHE.get(key)
    if fn is None:
        def render(bg, sub, ka):
            return render_tiles_pallas(
                bg, sub, opts, kernel_arrays=ka,
                compact_chunks=ck, use_occupancy=use_occupancy,
                return_depth=return_depth,
            )

        fn = jax.jit(render)
        _BUCKET_RENDER_CACHE[key] = fn
    return fn


def default_chunks_for(bg: BrickGrid, opts: GridRenderOptions) -> int:
    from nerf_projects_tpu.ops.tile_render import default_chunks

    return default_chunks(bg, opts.step_size, SC)


def _make_fwd_kernel(basis_dim: int, r: int = R,
                     color_mode: str = "bias",
                     emit_samples: bool = False,
                     packed: bool = False,
                     flat_state: bool = False,
                     early_stop_logt=None,
                     gathered: bool = False,
                     wps: int = 1,
                     sentinel=None):
    """flat_state: the FLAT-WINDOW variant (render_frame_pallas). The
    grid is (W, 1) over a frame's active windows in tile-major order;
    per-tile compositing state is seeded from a `state` input block on
    each tile's first window (prefetched `first` flag) instead of the
    grouped variant's chunk-0 zero init — out-block revisiting carries
    it across the tile's consecutive windows exactly as the (T, C)
    grid does. flat_state + emit_samples (the flat TRAINING forward)
    emits one per-window field block, consumed by the flat backward
    (_bwd_frame_group); flat_state + sentinel skips padding windows
    exactly as the (T, C) grid does (their samples stay garbage but
    the backward skips the same windows and every scatter consumer
    drops the sentinel row)."""
    assert not (gathered and emit_samples)
    assert not (gathered and not flat_state)
    # wps (windows per grid step): the (T, C) grid marches `wps`
    # consecutive chunks per step — the per-step fixed cost
    # (sequencing ~3.7 us; corner DMAs measured fully hidden, see the
    # fwd_march_constrows bisect) amortizes over wps windows. The
    # caller pads C to a wps multiple with sentinel rows + an
    # out-of-range base step (contributes exactly nothing). Sub-windows
    # run sequentially in-kernel, so results are bit-identical to
    # wps=1. flat_state + wps: the FLAT window list is padded per-TILE
    # to a wps multiple (render_frame_pallas), so the wps windows of a
    # step always share one tile/out slot; padding windows carry
    # sentinel rows + an out-of-range base step and are skipped.
    assert wps == 1 or not gathered
    assert wps == 1 or not emit_samples or not flat_state
    # sentinel (int, = nb): skip the march body for ALL-SENTINEL
    # windows (every corner empty). Exact for rgb/acc/depth/prefix and
    # sparsity (an empty window contributes zero); only the aux
    # window_miss diagnostic stops counting rays inside content-free
    # windows. With chunk compaction the per-tile chunk count is the
    # MAX active count over the batch, so tiles below the max march
    # sentinel padding — this deletes their VPU/MXU work (the
    # sequencing floor remains; wps amortizes that).
    assert sentinel is None or not gathered
    xfuse = _xfuse_enabled()  # bound at kernel BUILD time, per config

    def kernel(*refs):
        if flat_state and gathered:
            # gathered mode: the caller pre-gathered each window's 8
            # corner bricks into ONE contiguous per-window block, so
            # the step issues 1-2 big DMAs instead of 8 row fetches
            # (rows leave the scalar-prefetch set entirely)
            (_tw_ref, first_ref, orig_ref, basis_ref,
             pack_ref) = refs[:5]
            rest = refs[5:]
            state_ref, rest = rest[0], rest[1:]
        elif flat_state:
            # tw_ref is consumed by the index maps only
            (_tw_ref, first_ref, rows_ref, orig_ref, basis_ref,
             pack_ref) = refs[:6]
            rest = refs[6:]
            state_ref, rest = rest[0], rest[1:]
        else:
            rows_ref, orig_ref, basis_ref, pack_ref = refs[:4]
            rest = refs[4:]
        if packed:
            # ONE block per corner (1, B+1, 8, 192): SH slots 0..B-1,
            # density x3-interleaved in slot B — halves the per-step
            # DMA issues, the dominant cost of the latency-bound march
            if gathered:
                gref = rest[0]
                out_ref = rest[1]
                samp_ref = None

                def get_pk(k, i=0):
                    return gref[0, k]
            else:
                pk = rest[:8 * wps]
                out_ref = rest[8 * wps]
                samp_ref = rest[8 * wps + 1] if emit_samples else None

                def get_pk(k, i=0):
                    return pk[i * 8 + k][0]
        else:
            if gathered:
                gd_ref, gs_ref = rest[0], rest[1]
                out_ref = rest[2]
                samp_ref = None

                def get_d(k, i=0):
                    return gd_ref[0, k]

                def get_sh(k, i=0):
                    return gs_ref[0, k]
            else:
                bricks = rest[:8 * wps]      # density (1, 8, 64) each
                sh = rest[8 * wps:16 * wps]  # SH (1, B, 8, 192) each
                out_ref = rest[16 * wps]
                samp_ref = (
                    rest[16 * wps + 1] if emit_samples else None
                )

                def get_d(k, i=0):
                    return bricks[i * 8 + k][0]

                def get_sh(k, i=0):
                    return sh[i * 8 + k][0]
        t = pl.program_id(0)
        c = pl.program_id(1)

        if flat_state:
            @pl.when(first_ref[t * wps] == 1)
            def _():
                out_ref[...] = state_ref[...]
        else:
            @pl.when(c == 0)
            def _():
                out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        def _march_window(i=0):
            # ti: the row of the per-window scalar-prefetch arrays
            # (orig/basis): the WINDOW index on the flat grid, the tile
            # index on the (T, C) grid
            if flat_state:
                ti, cc = t * wps + i, 0
            else:
                ti, cc = t, (c if wps == 1 else c * wps + i)
            pack = pack_ref[0]            # [16, 128]
            og = pack[0:3]
            dg = pack[3:6]
            dt = pack[6:7]
            t0 = pack[7:8]
            t1 = pack[8:9]
            T0 = pack[9:10]
            step_world = pack[11:12]

            A = SC * r
            # t values per (step, ray) in [SC, R]; the chunk's base step
            # comes from the plan (orig col 3) so empty chunks can be
            # compacted away without changing the t parametrization
            step_idx = (
                orig_ref[ti, cc, 3].astype(jnp.float32)
                + jax.lax.broadcasted_iota(jnp.int32, (SC, r), 0).astype(
                    jnp.float32
                )
            )
            tt = T0 + step_idx * dt                     # [SC, R]
            valid = (tt >= t0) & (tt < t1)

            ox = orig_ref[ti, cc, 0].astype(jnp.float32)
            oy = orig_ref[ti, cc, 1].astype(jnp.float32)
            oz = orig_ref[ti, cc, 2].astype(jnp.float32)

            lx = _lanes_flat(og[0:1] + tt * dg[0:1], SC, r) - ox
            ly = _lanes_flat(og[1:2] + tt * dg[1:2], SC, r) - oy
            lz = _lanes_flat(og[2:3] + tt * dg[2:3], SC, r) - oz
            # SOFT window gate: the hat-weight A-matrices fade a sample
            # linearly to zero over the last voxel on each side, so a
            # boundary sample (the 8-voxel brick granularity of window
            # origins cannot always cover the bundle's full extent —
            # see _plan_windows) degrades to a partial-weight estimate
            # instead of dropping outright. Samples outside the EXACT
            # [0, 15] span are still counted in miss row 7 so eval
            # paths can re-render them through the exact path.
            in_win_f = (
                (lx > -1.0) & (lx < 16.0)
                & (ly > -1.0) & (ly < 16.0)
                & (lz > -1.0) & (lz < 16.0)
            ).astype(jnp.float32)
            in_exact_f = (
                (lx >= 0.0) & (lx <= 15.0)
                & (ly >= 0.0) & (ly <= 15.0)
                & (lz >= 0.0) & (lz <= 15.0)
            ).astype(jnp.float32)
            # bool vectors cannot be relaid out on TPU; reshape as float
            valid_f = _lanes_flat(valid.astype(jnp.float32), SC, r)
            eff = valid_f * in_win_f

            iota16 = jax.lax.broadcasted_iota(jnp.int32, (16, A), 0).astype(
                jnp.float32
            )
            Ax = jnp.maximum(0.0, 1.0 - jnp.abs(lx - iota16)) * eff
            Ay = jnp.maximum(0.0, 1.0 - jnp.abs(ly - iota16))
            Az = jnp.maximum(0.0, 1.0 - jnp.abs(lz - iota16))

            sigma_acc = jnp.zeros((1, A), jnp.float32)
            rgb_acc4 = jnp.zeros((3, A), jnp.float32)
            Axb = Ax.astype(jnp.bfloat16)                # [16, A]
            # corners PAIRED over dx: for each (dy, dz) the x-stage matmul
            # stacks both dx bricks along the contraction (K=16) — its
            # output IS the dx-sum, so the VPU y/z reduction stages run 4x
            # instead of 8x and the MXU sees half the matmul issues.
            for j in range(4):
                dy, dz = j >> 1, j & 1
                k0, k1 = j, 4 + j
                Ayk = Ay[dy * 8 : dy * 8 + 8]
                Azk = Az[dz * 8 : dz * 8 + 8]

                # SH decode with the tile basis: kernel-layout bricks are
                # [B, 8(lx), 192(ly,lz,c)], so the decode is B scalar
                # multiply-adds — no lane-splitting reshapes (Mosaic cannot
                # shape-cast 27 lanes into 3x9).
                def decode(src):
                    Wc = src[0].astype(jnp.float32) * basis_ref[ti, 0]
                    for b in range(1, basis_dim):
                        Wc = Wc + src[b].astype(jnp.float32) * basis_ref[ti, b]
                    return Wc

                if packed:
                    Wp = jnp.concatenate(
                        [decode(get_pk(k0, i)), decode(get_pk(k1, i))],
                        axis=0
                    )                                    # [16, 192]
                    dp = jnp.concatenate(
                        [get_pk(k0, i)[basis_dim],
                         get_pk(k1, i)[basis_dim]],
                        axis=0
                    )                                    # [16, 192]
                else:
                    Wp = jnp.concatenate(
                        [decode(get_sh(k0, i)), decode(get_sh(k1, i))],
                        axis=0
                    )
                    dp = jnp.concatenate(
                        [get_d(k0, i), get_d(k1, i)], axis=0
                    )                                    # [16, 64]

                # ONE fused x-stage matmul for density + color: the
                # two dots share Axb and K=16, so stacking along M
                # halves the per-window MXU issues (each issue has
                # fixed pipeline overhead at K=16) — results are the
                # same contraction, element-wise identical. The stack
                # costs a [16, nd+192] VMEM concat per corner pair;
                # TM_XFUSE=0 keeps the two separate dots (frame-path
                # A/B: at many small windows the concat can cost more
                # than the saved MXU issue).
                if xfuse:
                    nd = dp.shape[1]                     # 192 | 64
                    V1 = jax.lax.dot_general(
                        jnp.concatenate([dp, Wp], axis=1).astype(
                            jnp.bfloat16
                        ), Axb,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                    # [nd+192, A]
                    V1d = V1[:nd]
                    V1c = V1[nd:]                        # [192, A]
                else:
                    V1d = jax.lax.dot_general(
                        dp.astype(jnp.bfloat16), Axb,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    V1c = jax.lax.dot_general(
                        Wp.astype(jnp.bfloat16), Axb,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                    # [192, A]
                if packed:
                    # density rides slot B of the packed block, repeated
                    # x3 across the (ly,lz,ch) lanes — trilerp through the
                    # same 192-wide path as color (rows identical; take 0)
                    V2d = jnp.sum(
                        V1d.reshape(8, 24, A) * Ayk[:, None, :], axis=0
                    )                                    # [24, A]
                    sigma_acc = sigma_acc + jnp.sum(
                        V2d.reshape(8, 3, A) * Azk[:, None, :], axis=0
                    )[0:1]
                else:
                    V2d = jnp.sum(
                        V1d.reshape(8, 8, A) * Ayk[:, None, :], axis=0
                    )                                    # [8, A] (lz)
                    sigma_acc = sigma_acc + jnp.sum(
                        V2d * Azk, axis=0
                    )[None]
                V2c = jnp.sum(
                    V1c.reshape(8, 24, A) * Ayk[:, None, :], axis=0
                )                                        # [24, A] (lz, ch)
                rgb_acc4 = rgb_acc4 + jnp.sum(
                    V2c.reshape(8, 3, A) * Azk[:, None, :], axis=0
                )                                        # [3, A]

            if emit_samples:
                # pre-activation per-sample fields for the fetch-free
                # backward: row 0 sigma_acc, rows 1..3 rgb_acc
                samp_ref[0, i] = jnp.concatenate(
                    [sigma_acc, rgb_acc4, jnp.zeros((4, A), jnp.float32)],
                    axis=0,
                )
            sigma = sigma_acc                            # [1, A]
            sigma = jnp.where(sigma > _SIGMA_THRESH, sigma, 0.0)
            if color_mode == "sigmoid":                  # PlenOctree decode
                rgb = 1.0 / (1.0 + jnp.exp(-rgb_acc4))   # [3, A]
            else:                                        # Plenoxels +0.5 clamp
                rgb = jnp.maximum(rgb_acc4 + 0.5, 0.0)   # [3, A]

            tau = _lanes_unflat(sigma, SC, r) * step_world   # [SC, R]
            # exclusive prefix over steps: strictly-lower-triangular matmul
            r_iota = jax.lax.broadcasted_iota(jnp.int32, (SC, SC), 0)
            c_iota = jax.lax.broadcasted_iota(jnp.int32, (SC, SC), 1)
            Lstrict = (c_iota < r_iota).astype(jnp.float32)
            prefix = out_ref[0, 5:6, :] + jax.lax.dot_general(
                Lstrict, tau,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # [SC, R]
            Tpref = jnp.exp(-prefix)
            alpha = 1.0 - jnp.exp(-tau)
            active = Tpref > _STOP_THRESH
            w = jnp.where(active, Tpref * alpha, 0.0)    # [SC, R]

            w_flat = _lanes_flat(w, SC, r)
            for ch in range(3):
                out_ref[0, ch : ch + 1, :] += jnp.sum(
                    _lanes_unflat(rgb[ch : ch + 1] * w_flat, SC, r),
                    axis=0,
                )[None]
            out_ref[0, 3:4, :] += jnp.sum(w, axis=0)[None]
            out_ref[0, 4:5, :] += jnp.sum(w * tt, axis=0)[None]
            out_ref[0, 5:6, :] += jnp.sum(
                jnp.where(active, tau, 0.0), axis=0
            )[None]
            sig2 = _lanes_unflat(sigma, SC, r)
            out_ref[0, 6:7, :] += jnp.sum(
                jnp.log1p(2.0 * sig2 * sig2), axis=0
            )[None]
            miss = valid_f * (1.0 - in_exact_f)
            out_ref[0, 7:8, :] += jnp.sum(
                _lanes_unflat(miss, SC, r), axis=0
            )[None]

        if flat_state and (early_stop_logt is not None
                           or (sentinel is not None and wps > 1)):
            # all-rays-saturated skip (render fast path): once every
            # lane's accumulated -log T passed -log(stop_thresh), each
            # further window's weights are exactly zero — skip the
            # whole march body (the aux sparsity/miss rows [6]/[7] stop
            # accumulating; the returned rgb/acc/depth/log_transmit are
            # bit-identical). The analogue of svox render_persp `fast`
            # (octree/nerf/utils.py:448-499). With wps > 1 the skip is
            # per sub-window (out_ref[5] updates sequentially between
            # them), AND-combined with the sentinel check that drops
            # the per-tile wps-alignment padding windows.
            for i in range(wps):
                cond = None
                if early_stop_logt is not None:
                    cond = jnp.min(out_ref[0, 5, :]) < early_stop_logt
                if sentinel is not None and wps > 1:
                    wi = t * wps + i
                    act = rows_ref[wi, 0, 0] != sentinel
                    for k in range(1, 8):
                        act = act | (rows_ref[wi, 0, k] != sentinel)
                    cond = act if cond is None else (cond & act)
                pl.when(cond)(functools.partial(_march_window, i))
        elif sentinel is None:
            for i in range(wps):
                _march_window(i)
        else:
            for i in range(wps):
                cc = c if wps == 1 else c * wps + i
                act = rows_ref[t, cc, 0] != sentinel
                for k in range(1, 8):
                    act = act | (rows_ref[t, cc, k] != sentinel)
                pl.when(act)(functools.partial(_march_window, i))

    return kernel


def _append_sentinel(x):
    return jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)


def _kernel_arrays(bg: BrickGrid):
    """Kernel-layout brick arrays in bf16 (halves the window DMA, the
    dominant per-step traffic; interpolation matmuls are bf16 anyway and
    the fp32 path is preserved through the f32 accumulators)."""
    density_z = _append_sentinel(
        bg.density_bricks.reshape(bg.n_bricks, 8, 64).astype(jnp.bfloat16)
    )
    sh_z = _append_sentinel(
        sh_to_kernel_layout(
            bg.sh_bricks.astype(jnp.bfloat16), bg.basis_dim
        )
    )
    return density_z, sh_z


build_kernel_arrays = jax.jit(_kernel_arrays)


def pack_kernel_arrays(density_z, sh_z):
    """Pack (density_z [nb+1, 8, 64], sh_z [nb+1, B, 8, 192]) into ONE
    array [nb+1, B+1, 8, 192]: slot B carries density x3-interleaved
    over the (ly,lz,ch) lanes (lane j holds density[j // 3]). The march
    then fetches ONE block per window corner instead of two — the
    per-grid-step DMA-issue latency is the render path's dominant cost
    (~0.45 us per fetch measured at 512^3)."""
    d192 = jnp.repeat(density_z, 3, axis=-1)[:, None]
    return jnp.concatenate([sh_z, d192.astype(sh_z.dtype)], axis=1)


build_packed_kernel_arrays = jax.jit(
    lambda bg: pack_kernel_arrays(*_kernel_arrays(bg))
)


def geometry_only(bg: BrickGrid) -> BrickGrid:
    """Shrink the fp32 master data arrays to free HBM, keeping the
    geometry (links/coords/mask) and n_bricks intact — valid wherever
    prebuilt `kernel_arrays` are supplied (eval/render paths)."""
    import dataclasses

    nb = bg.n_bricks
    return dataclasses.replace(
        bg,
        density_bricks=jnp.zeros((nb, 1), bg.density_bricks.dtype),
        sh_bricks=jnp.zeros((nb, 1, 1), bg.sh_bricks.dtype),
    )


def _pad_chunks(orig, rows, nb: int, wps: int):
    """Pad the chunk axis to a multiple of wps with windows that
    contribute exactly nothing: sentinel corner rows (nb) and a base
    step far past every ray's [t0, t1) span."""
    C = orig.shape[1]
    padc = (-C) % wps
    if padc == 0:
        return orig, rows, C
    T = orig.shape[0]
    pad_orig = jnp.zeros((T, padc, 4), orig.dtype).at[:, :, 3].set(
        jnp.int32(1 << 22)
    )
    orig = jnp.concatenate([orig, pad_orig], axis=1)
    rows = jnp.concatenate(
        [rows, jnp.full((T, padc, 8), nb, rows.dtype)], axis=1
    )
    return orig, rows, C + padc


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "basis_dim", "color_mode",
                     "emit_samples", "wps", "skip_empty"),
)
def _march_call(density_z, sh_z, rows, orig, basisf, pack, n_chunks,
                basis_dim, color_mode="bias", emit_samples=False,
                wps=1, skip_empty=False):
    """density_z [nb+1, 8, 64]; sh_z [nb+1, B, 8, 192] (kernel layout).
    Packed mode: density_z [nb+1, B+1, 8, 192] with sh_z=None (see
    pack_kernel_arrays) — one corner fetch instead of two.

    Tiles are processed in SMEM-sized groups via lax.map (see
    _MAX_GRID_STEPS). `n_chunks` must be a multiple of `wps` (callers
    pad with _pad_chunks). Grouping is sized on the PREFETCHED
    (tile, chunk) entry count — SMEM holds the full rows/orig arrays
    at ~64 B/scalar regardless of how many chunks one grid step
    marches, so wps must not enlarge the groups (measured: wps=2
    doubled the group and overflowed scoped SMEM by 50%)."""
    assert n_chunks % wps == 0
    T_full = pack.shape[0]
    tg, padn = _tile_groups(T_full, n_chunks)
    if padn:
        nb = density_z.shape[0] - 1
        rows = jnp.concatenate(
            [rows, jnp.full((padn,) + rows.shape[1:], nb, rows.dtype)]
        )
        orig = jnp.concatenate(
            [orig, jnp.zeros((padn,) + orig.shape[1:], orig.dtype)]
        )
        basisf = jnp.concatenate(
            [basisf, jnp.zeros((padn,) + basisf.shape[1:], basisf.dtype)]
        )
        pack = jnp.concatenate(
            [pack, jnp.zeros((padn,) + pack.shape[1:], pack.dtype)]
        )

    def one_group(args):
        rows_g, orig_g, basisf_g, pack_g = args
        return _march_group(
            density_z, sh_z, rows_g, orig_g, basisf_g, pack_g,
            n_chunks, basis_dim, color_mode, emit_samples, wps,
            skip_empty,
        )

    outs = jax.lax.map(
        one_group,
        (_group(rows, tg), _group(orig, tg), _group(basisf, tg),
         _group(pack, tg)),
    )
    if emit_samples:
        out, samp = outs
        return (
            out.reshape(-1, 8, pack.shape[-1])[:T_full],
            samp.reshape((-1,) + samp.shape[2:])[:T_full],
        )
    return outs.reshape(-1, 8, pack.shape[-1])[:T_full]


def _march_group(density_z, sh_z, rows, orig, basisf, pack, n_chunks,
                 basis_dim, color_mode="bias", emit_samples=False,
                 wps=1, skip_empty=False):
    T = pack.shape[0]
    r = pack.shape[-1]
    A = SC * r
    packed = sh_z is None

    def dspec(k, i):
        # full-brick blocks; sublane dim 8 (TPU requires the
        # second-to-last block dim divisible by 8)
        return pl.BlockSpec(
            (1, 8, 64),
            lambda t, c, rows, orig, basisf, k=k, i=i: (
                rows[t, c * wps + i, k], 0, 0),
            memory_space=pltpu.VMEM,
        )

    def sspec(k, i, nslots=basis_dim):
        return pl.BlockSpec(
            (1, nslots, 8, 192),
            lambda t, c, rows, orig, basisf, k=k, i=i: (
                rows[t, c * wps + i, k], 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    if packed:
        brick_specs = [sspec(k, i, basis_dim + 1)
                       for i in range(wps) for k in range(8)]
        brick_args = [density_z] * (8 * wps)
    else:
        brick_specs = [
            *[dspec(k, i) for i in range(wps) for k in range(8)],
            *[sspec(k, i) for i in range(wps) for k in range(8)],
        ]
        brick_args = [*([density_z] * (8 * wps)),
                      *([sh_z] * (8 * wps))]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T, n_chunks // wps),
        in_specs=[
            pl.BlockSpec(
                (1, PACK_ROWS, r),
                lambda t, c, rows, orig, basisf: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *brick_specs,
        ],
        out_specs=(
            (
                pl.BlockSpec(
                    (1, 8, r),
                    lambda t, c, rows, orig, basisf: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, wps, 8, A),
                    lambda t, c, rows, orig, basisf: (t, c, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            )
            if emit_samples
            else pl.BlockSpec(
                (1, 8, r),
                lambda t, c, rows, orig, basisf: (t, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((T, 8, r), jnp.float32),
        *(
            [jax.ShapeDtypeStruct((T, n_chunks, 8, A), jnp.float32)]
            if emit_samples
            else []
        ),
    )
    extra = {}
    if wps > 1:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    res = pl.pallas_call(
        _make_fwd_kernel(basis_dim, r, color_mode, emit_samples,
                         packed=packed, wps=wps,
                         sentinel=(
                             density_z.shape[0] - 1 if skip_empty
                             else None
                         )),
        grid_spec=grid_spec,
        out_shape=out_shape if emit_samples else out_shape[0],
        interpret=INTERPRET,
        **extra,
    )(rows, orig, basisf, pack, *brick_args)
    return res


def _march_frame_group(density_z, sh_z, lt, first, rows, orig, basisf,
                       pack_g, state_g, basis_dim, color_mode="bias",
                       early_stop_logt=None, gathered=False,
                       emit_samples=False, sentinel=None, wps: int = 1):
    """One flat window group of a whole-frame march (see
    ops/pallas/frame_march.py). The grid is (W, 1) over active windows
    in tile-major order; consecutive windows of the same tile share an
    output block slot (`lt`, the LOCAL tile slot), which carries the
    compositing state across the tile's windows exactly as the (T, C)
    grid's chunk axis does. Each tile's first window in this group
    (`first` flag) seeds its slot from `state_g` — the caller gathers
    those rows from the frame-level carry, so a tile whose window run
    crosses a group boundary resumes mid-march.

      lt     [W]        int32  local out/pack/state slot per window
      first  [W]        int32  1 on each tile's first window here
      rows   [W, 1, 8]  int32  corner brick rows (sentinel nb = empty)
      orig   [W, 1, 4]  int32  window voxel origin xyz + base step
      basisf [W, B]     f32    SH basis of the window's tile
      pack_g [S, 16, r] f32    ray pack rows per local slot
      state_g[S, 8, r]  f32    carry rows per local slot

    `gathered`: density_z/sh_z are PER-WINDOW pre-gathered corner
    blocks ([W, 8, B+1, 8, 192] packed, or ([W, 8, 8, 64],
    [W, 8, B, 8, 192])) — the step issues 1-2 contiguous DMAs instead
    of 8 row fetches, and `rows` leaves the scalar-prefetch set (pass
    rows=None).

    Returns out [S, 8, r]; slots never referenced by `lt` are
    unspecified (callers scatter through a dummy row)."""
    assert not (gathered and (emit_samples or sentinel is not None))
    # wps > 1: `wps` consecutive flat windows per grid step, amortizing
    # the per-step sequencing floor (the dominant fixed cost; corner
    # DMAs measured ~free — fwd_march_constrows bisect). The caller
    # pads each tile's window run to a wps multiple so a step never
    # straddles tiles, and passes sentinel so padding windows skip.
    assert wps == 1 or not (gathered or emit_samples)
    W = lt.shape[0]
    assert W % wps == 0
    S = pack_g.shape[0]
    r = pack_g.shape[-1]
    packed = sh_z is None

    if gathered:
        def local(_i):
            return pl.BlockSpec(
                (1, pack_g.shape[1] if _i == 0 else 8, r),
                lambda w, c, lt, first, orig, basisf: (lt[w], 0, 0),
                memory_space=pltpu.VMEM,
            )

        gmap5 = lambda w, c, lt, first, orig, basisf: (w, 0, 0, 0, 0)
        gmap4 = lambda w, c, lt, first, orig, basisf: (w, 0, 0, 0)
        if packed:
            brick_specs = [pl.BlockSpec(
                (1, 8, basis_dim + 1, 8, 192), gmap5,
                memory_space=pltpu.VMEM,
            )]
            brick_args = [density_z]
        else:
            brick_specs = [
                pl.BlockSpec((1, 8, 8, 64), gmap4,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, basis_dim, 8, 192), gmap5,
                             memory_space=pltpu.VMEM),
            ]
            brick_args = [density_z, sh_z]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(W, 1),
            in_specs=[local(0), local(1), *brick_specs],
            out_specs=pl.BlockSpec(
                (1, 8, r),
                lambda w, c, lt, first, orig, basisf: (lt[w], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            _make_fwd_kernel(basis_dim, r, color_mode, packed=packed,
                             flat_state=True,
                             early_stop_logt=early_stop_logt,
                             gathered=True),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, 8, r), jnp.float32),
            interpret=INTERPRET,
        )(lt, first, orig, basisf, pack_g, state_g, *brick_args)

    def local(_i):
        return pl.BlockSpec(
            (1, pack_g.shape[1] if _i == 0 else 8, r),
            lambda w, c, lt, first, rows, orig, basisf: (
                lt[w * wps], 0, 0),
            memory_space=pltpu.VMEM,
        )

    def dspec(k, i=0):
        return pl.BlockSpec(
            (1, 8, 64),
            lambda w, c, lt, first, rows, orig, basisf, k=k, i=i: (
                rows[w * wps + i, 0, k], 0, 0),
            memory_space=pltpu.VMEM,
        )

    def sspec(k, i=0, nslots=basis_dim):
        return pl.BlockSpec(
            (1, nslots, 8, 192),
            lambda w, c, lt, first, rows, orig, basisf, k=k, i=i: (
                rows[w * wps + i, 0, k], 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    if packed:
        brick_specs = [sspec(k, i, basis_dim + 1)
                       for i in range(wps) for k in range(8)]
        brick_args = [density_z] * (8 * wps)
    else:
        brick_specs = [
            *[dspec(k, i) for i in range(wps) for k in range(8)],
            *[sspec(k, i) for i in range(wps) for k in range(8)],
        ]
        brick_args = [*([density_z] * (8 * wps)),
                      *([sh_z] * (8 * wps))]

    state_spec = pl.BlockSpec(
        (1, 8, r),
        lambda w, c, lt, first, rows, orig, basisf: (lt[w * wps], 0, 0),
        memory_space=pltpu.VMEM,
    )
    if emit_samples:
        A = SC * r
        out_specs = (
            state_spec,
            pl.BlockSpec(
                (1, 1, 8, A),
                lambda w, c, lt, first, rows, orig, basisf: (
                    w, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        out_shape = (
            jax.ShapeDtypeStruct((S, 8, r), jnp.float32),
            jax.ShapeDtypeStruct((W, 1, 8, A), jnp.float32),
        )
    else:
        out_specs = state_spec
        out_shape = jax.ShapeDtypeStruct((S, 8, r), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(W // wps, 1),
        in_specs=[local(0), local(1), *brick_specs],
        out_specs=out_specs,
    )
    extra = {}
    if wps > 1 or r > 256:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    return pl.pallas_call(
        _make_fwd_kernel(basis_dim, r, color_mode,
                         emit_samples=emit_samples, packed=packed,
                         flat_state=True,
                         early_stop_logt=early_stop_logt,
                         sentinel=sentinel, wps=wps),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=INTERPRET,
        **extra,
    )(lt, first, rows, orig, basisf, pack_g, state_g, *brick_args)


def _perm_block_matrix(basis_dim: int):
    """[192*B, 192*B] 0/1 matrix for the within-lx block of the
    sh<->kernel layout map: src (lyz, c, b) -> dst (b, lyz*3 + c).
    The map is lx-independent (sh flat = lx*192B + lyz*3B + cB + b;
    kernel flat = b*1536 + lx*192 + lyz*3 + c), so one square matmul
    per lx block plus a mid-axis transpose implements the whole
    permutation on the MXU. Cached as numpy (a jnp constant created
    inside a trace would leak a tracer into later traces)."""
    key = ("blockmat", basis_dim)
    m = _PERM_CACHE.get(key)
    if m is None:
        B = basis_dim
        lyz = np.arange(64)[:, None, None]
        c = np.arange(3)[None, :, None]
        b = np.arange(B)[None, None, :]
        src = (lyz * 3 * B + c * B + b).reshape(-1)
        dst = (b * 192 + lyz * 3 + c).reshape(-1)
        m = np.zeros((192 * B, 192 * B), np.float32)
        m[src, dst] = 1.0
        _PERM_CACHE[key] = m
    return m


def sh_to_kernel_layout(sh_bricks: jnp.ndarray, basis_dim: int):
    """[nb, 512, 3*B] -> [nb, B, 8, 192]: (cell(lx,ly,lz), c, b) ->
    (b, lx, (ly, lz, c)). One 0/1 MXU matmul per lx block (exact: one
    unit entry per row/col) — the previous flat-lane jnp.take gather
    runs element-serial on TPU (measured ~10 us/brick; it was most of
    a 72 ms/step TV term at 512^3), and a 6-D transpose chain pads the
    tiny trailing dims ~16x in HBM."""
    nb = sh_bricks.shape[0]
    B = basis_dim
    x = sh_bricks.reshape(nb, 8, 192 * B).astype(jnp.float32)
    y = x @ jnp.asarray(_perm_block_matrix(B))     # [nb, lx, (b, 192)]
    return jnp.moveaxis(y.reshape(nb, 8, B, 192), 1, 2)


def active_chunk_bound(bg: BrickGrid, step_size: float = 0.5) -> int:
    """Static chunk count covering the longest chord through the active
    bricks' bounding box (host-side, once per topology)."""
    coords = np.asarray(bg.brick_coords)
    if len(coords) == 0:
        return 1
    span = (coords.max(0) - coords.min(0) + 2) * BRICK
    diag = float(np.linalg.norm(span.astype(np.float64)))
    return int(np.ceil(diag / (SC * step_size))) + 2


def render_tiles_pallas(
    bg: BrickGrid,
    rays: Rays,
    opts: GridRenderOptions = GridRenderOptions(),
    *,
    n_chunks: Optional[int] = None,
    use_occupancy: bool = False,
    return_depth: bool = False,
    kernel_arrays=None,
    compact_chunks: Optional[int] = None,
    wps: int = 1,
):
    """Fused Pallas forward render of [T, 128] coherent ray tiles.

    Semantics match ops/tile_render.render_tiles(steps_per_chunk=16)
    with the analytic window plan. sigma_thresh/stop_thresh are the
    GridRenderOptions defaults (compiled into the kernel).

    `kernel_arrays`: optional prebuilt (density_z, sh_z) bf16
    kernel-layout arrays (see `_kernel_arrays` / `build_kernel_arrays`)
    — skips the per-call full-grid relayout, which at large reso
    dominates a frame render. With prebuilt arrays the data fields of
    `bg` are never read, so callers may pass a geometry-only grid
    (masters shrunk to free HBM)."""
    if rays.origins.shape[1] not in (128, 256):
        raise ValueError("tile size must be 128 or 256 rays")
    if opts.color_mode not in ("bias", "sigmoid"):
        raise NotImplementedError(
            f"pallas march: unknown color mode {opts.color_mode!r}"
        )
    from nerf_projects_tpu.ops.tile_render import default_chunks

    if n_chunks:
        C = n_chunks
    elif use_occupancy:
        C = active_chunk_bound(bg, opts.step_size)
    else:
        C = default_chunks(bg, opts.step_size, SC)
    pack, geom = _pack_rays(bg, rays, opts, use_occupancy)
    wb, rows = _plan_windows(bg, geom, C)
    (orig, rows), C, dropped = _orig_with_base(
        wb, rows, bg.n_bricks, C, compact_chunks
    )
    if wps > 1:
        orig, rows, C = _pad_chunks(orig, rows, bg.n_bricks, wps)

    if kernel_arrays is None:
        density_z, sh_z = _kernel_arrays(bg)
    elif isinstance(kernel_arrays, (tuple, list)):
        density_z, sh_z = kernel_arrays
    else:  # single packed array [nb+1, B+1, 8, 192]
        density_z, sh_z = kernel_arrays, None
    basisf = eval_sh_bases(
        bg.basis_dim,
        _mean_viewdirs(rays),
    ).astype(jnp.float32)

    out = _march_call(density_z, sh_z, rows, orig, basisf, pack, C,
                      bg.basis_dim, opts.color_mode, wps=wps)
    world_len = geom[6]
    acc = out[:, 3]
    result = {
        "rgb": jnp.moveaxis(out[:, 0:3], 1, 2)
        + (1.0 - acc[..., None]) * opts.background_brightness,
        "acc": acc,
        "log_transmit": -out[:, 5],
        "sparsity_sum": out[:, 6],
        "window_miss": jnp.sum(out[:, 7]) / (out.shape[0] * out.shape[-1] * SC * C),
        # [T, 128] count of in-span samples that fell outside their
        # chunk's 16-voxel window (dropped). Rays with a nonzero count
        # rendered with missing geometry — eval paths can re-render
        # exactly those through volume_render_grid (exact fallback).
        "miss_per_ray": out[:, 7],
        "dropped_active_chunks": dropped,
    }
    if return_depth:
        result["depth"] = out[:, 4] * world_len
    return result


# ---------------------------------------------------------------------------
# Fused backward: MSE (+beta/sparsity) gradients to the brick arrays —
# the reference volume_render_fused (svox2.py:1072-1142,
# render_lerp_kernel_cuvol.cu:1070-1195): no autograd graph; the backward
# kernel re-marches with the running-suffix trick (the reference's
# `accum`) and emits per-(tile, chunk, corner) gradient blocks that XLA
# scatter-adds into the compact brick arrays.
#
# bwd pack rows reuse the fwd layout plus:
#   12-14: per-ray loss gradient g (2*(rgb_out-gt)/(3N))
#   15:    S_total = g . rgb_out (+ beta term) — suffix seed
# ---------------------------------------------------------------------------


def _make_bwd_kernel(basis_dim: int, sparsity_scale: float, r: int = R,
                     color_mode: str = "bias", packed_out: bool = False,
                     wps: int = 1, sentinel=None,
                     flat_state: bool = False):
    """Fetch-free backward: consumes the forward's per-sample
    (sigma_acc, rgb_acc) stream instead of re-fetching the 16 brick
    windows and re-marching — the gradient emission needs only ray
    geometry (hat weights) and those fields.

    packed_out: emit ONE gradient block per corner in the PACKED state
    layout [B+1, 8, 192] (density grad x3-interleaved in slot B) — one
    scatter target, matching pack_kernel_arrays.

    wps: chunks emitted per grid step (same contract as the
    forward's wps — sequential sub-windows, bit-identical to
    wps=1).

    flat_state: the flat-window variant (grid (W, 1) over active
    windows, tile-major; see _bwd_frame_group) — suffix state is
    seeded from a state input block on each tile's first window
    (prefetched `first` flag) and carried across the tile's
    consecutive windows by out-block revisiting, exactly as the flat
    forward does."""
    assert not (flat_state and wps != 1)

    def kernel(*refs):
        if flat_state:
            (_lt_ref, first_ref, rows_ref, orig_ref, basis_ref,
             pack_ref, samp_ref, state_in_ref) = refs[:8]
            rest = refs[8:]
        else:
            (rows_ref, orig_ref, basis_ref, pack_ref,
             samp_ref) = refs[:5]
            rest = refs[5:]
        state_ref = rest[0]       # (1, 8, 128): row 0 cum_tau, row 1 P
        if packed_out:
            gd_ref = None
            gsh_ref = rest[1]     # (1, wps, 8, B+1, 8, 192)
        else:
            gd_ref = rest[1]      # (1, wps, 8, 8, 64)
            gsh_ref = rest[2]     # (1, wps, 8, B, 8, 192) kernel layout
        t = pl.program_id(0)
        c = pl.program_id(1)

        if flat_state:
            @pl.when(first_ref[t] == 1)
            def _():
                state_ref[...] = state_in_ref[...]
        else:
            @pl.when(c == 0)
            def _():
                state_ref[...] = jnp.zeros(
                    state_ref.shape, state_ref.dtype
                )

        pack = pack_ref[0]
        og = pack[0:3]
        dg = pack[3:6]
        dt = pack[6:7]
        t0 = pack[7:8]
        t1 = pack[8:9]
        T0 = pack[9:10]
        step_world = pack[11:12]
        g_rows = pack[12:15]          # [3, 128]
        S_total = pack[15:16]         # [1, 128]

        A = SC * r

        def _bwd_window(i):
            cc = c if wps == 1 else c * wps + i
            step_idx = (
                orig_ref[t, cc, 3].astype(jnp.float32)
                + jax.lax.broadcasted_iota(jnp.int32, (SC, r), 0).astype(
                    jnp.float32
                )
            )
            tt = T0 + step_idx * dt
            valid = (tt >= t0) & (tt < t1)

            ox = orig_ref[t, cc, 0].astype(jnp.float32)
            oy = orig_ref[t, cc, 1].astype(jnp.float32)
            oz = orig_ref[t, cc, 2].astype(jnp.float32)
            lx = _lanes_flat(og[0:1] + tt * dg[0:1], SC, r) - ox
            ly = _lanes_flat(og[1:2] + tt * dg[1:2], SC, r) - oy
            lz = _lanes_flat(og[2:3] + tt * dg[2:3], SC, r) - oz
            # soft gate: must match the forward's hat-support fade
            in_win_f = (
                (lx > -1.0) & (lx < 16.0)
                & (ly > -1.0) & (ly < 16.0)
                & (lz > -1.0) & (lz < 16.0)
            ).astype(jnp.float32)
            valid_f = _lanes_flat(valid.astype(jnp.float32), SC, r)
            eff = valid_f * in_win_f

            iota16 = jax.lax.broadcasted_iota(jnp.int32, (16, A), 0).astype(
                jnp.float32
            )
            Ax = jnp.maximum(0.0, 1.0 - jnp.abs(lx - iota16)) * eff
            Ay = jnp.maximum(0.0, 1.0 - jnp.abs(ly - iota16))
            Az = jnp.maximum(0.0, 1.0 - jnp.abs(lz - iota16))

            # ---- per-sample fields from the forward pass (no recompute)
            samp = samp_ref[0, i]                        # [8, A]
            sigma_acc = samp[0:1]
            rgb_acc = samp[1:4]

            sig_pos = (sigma_acc > _SIGMA_THRESH).astype(jnp.float32)
            sigma = sigma_acc * sig_pos                   # [1, A]
            if color_mode == "sigmoid":
                rgb = 1.0 / (1.0 + jnp.exp(-rgb_acc))     # [3, A]
                rgb_gate = rgb * (1.0 - rgb)              # d sigmoid
            else:
                rgb_gate = (rgb_acc + 0.5 > 0.0).astype(jnp.float32)
                rgb = jnp.maximum(rgb_acc + 0.5, 0.0)     # [3, A]

            tau = _lanes_unflat(sigma, SC, r) * step_world   # [SC, R]
            r_iota = jax.lax.broadcasted_iota(jnp.int32, (SC, SC), 0)
            c_iota = jax.lax.broadcasted_iota(jnp.int32, (SC, SC), 1)
            Lstrict = (c_iota < r_iota).astype(jnp.float32)
            Lincl = (c_iota <= r_iota).astype(jnp.float32)
            prefix = state_ref[0, 0:1, :] + jax.lax.dot_general(
                Lstrict, tau,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            Tpref = jnp.exp(-prefix)
            alpha = 1.0 - jnp.exp(-tau)
            active_f = (Tpref > _STOP_THRESH).astype(jnp.float32)
            w = active_f * Tpref * alpha                  # [SC, R]

            # per-ray rows tiled over steps (lane a = s*R + r)
            gc = jnp.concatenate([g_rows] * SC, axis=1)   # [3, A]
            cdotg = jnp.sum(rgb * gc, axis=0, keepdims=True)   # [1, A]
            wc = _lanes_unflat(_lanes_flat(w, SC, r) * cdotg, SC, r)

            # suffix after sample i: S_total - inclusive prefix of w*(c.g)
            P_in = state_ref[0, 1:2, :] + jax.lax.dot_general(
                Lincl, wc,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [SC, R]
            S_tiled = jnp.broadcast_to(S_total, (SC, r))
            suffix = S_tiled - P_in

            # dL/dtau_i = T_i e^{-tau_i} (c_i . g) - suffix_i
            Te = Tpref * jnp.exp(-tau)
            gtau = Te * _lanes_unflat(cdotg, SC, r) - suffix
            gsig = _lanes_flat(gtau * step_world * active_f, SC, r) * sig_pos
            if sparsity_scale > 0:
                gsig = gsig + sparsity_scale * (
                    4.0 * sigma / (1.0 + 2.0 * sigma * sigma)
                ) * sig_pos

            # rgb gradient per sample, gated by the decode derivative
            # (+0.5-clamp indicator, or sigmoid' = rgb*(1-rgb))
            g_rgb = _lanes_flat(w, SC, r) * gc * rgb_gate  # [3, A]

            # ---- transposed trilerp: per-corner gradient blocks.
            # Factor the 4-way contraction sum_s Ax Ay Az g as
            # dot(Axg_ch[lx, s], Byz[(b,c), s]) per (corner, channel): the
            # y/z hat planes are shared by corner PAIRS and built once
            # (4 x [64, A]). Per channel the [8, 64] product is expanded
            # straight into the march's KERNEL LAYOUT lanes
            # ((ly*8+lz)*3+ch) by a 0/1 matmul, so the emitted SH blocks
            # need NO post-scatter permutation: the scatter target IS the
            # sh_z layout (kernel_layout_to_sh only runs for brick-layout
            # consumers).
            byz = []
            for dy in range(2):
                for dz in range(2):
                    Ayk = Ay[dy * 8 : dy * 8 + 8]
                    Azk = Az[dz * 8 : dz * 8 + 8]
                    byz.append(
                        (Ayk[:, None, :] * Azk[None, :, :])
                        .reshape(64, A).astype(jnp.bfloat16)
                    )
            # ONE x-side stack [64, A]: rows (dx, {r,g,b,sigma}, lx). The
            # per-(corner, channel) [8, A] x [A, 64] products then batch
            # into 4 per-(dy, dz) matmuls [64, A] x [A, 64] — the MXU
            # K-streams A once per OUTPUT TILE, so 32 narrow matmuls cost
            # ~8x more MXU time than 4 full-tile ones carrying the same
            # dot products (the round-3 bisect put these kernels at 61 ms
            # of the 85 ms step).
            axg_parts = []
            for dx in range(2):
                Axk = Ax[dx * 8 : dx * 8 + 8]
                for ch in range(3):
                    axg_parts.append(
                        (Axk * g_rgb[ch : ch + 1]).astype(jnp.bfloat16)
                    )
                axg_parts.append((Axk * gsig).astype(jnp.bfloat16))
            AXG = jnp.concatenate(axg_parts, axis=0)       # [64, A]
            # lane expansion: E_ch[lyz, lyz*3 + ch] = 1
            r64 = jax.lax.broadcasted_iota(jnp.int32, (64, 192), 0)
            c192 = jax.lax.broadcasted_iota(jnp.int32, (64, 192), 1)
            E3 = [
                (c192 == r64 * 3 + ch).astype(jnp.float32)
                for ch in range(3)
            ]
            for j in range(4):
                dy, dz = j >> 1, j & 1
                P = jax.lax.dot_general(
                    AXG, byz[j],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                          # [64, 64]
                for dx in range(2):
                    k = dx * 4 + dy * 2 + dz
                    base = dx * 32
                    Gd = P[base + 24 : base + 32]          # [8, 64]
                    if packed_out:
                        # slot B: density grad expanded x3 over (ly,lz,ch)
                        Gd192 = jnp.zeros((8, 192), jnp.float32)
                        for ch in range(3):
                            Gd192 = Gd192 + jax.lax.dot_general(
                                Gd, E3[ch],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                        gsh_ref[0, i, k, basis_dim] = Gd192.astype(
                            gsh_ref.dtype
                        )
                    else:
                        gd_ref[0, i, k] = Gd.astype(gd_ref.dtype)
                    Hk = jnp.zeros((8, 192), jnp.float32)
                    for ch in range(3):
                        Hk = Hk + jax.lax.dot_general(
                            P[base + ch * 8 : base + ch * 8 + 8], E3[ch],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )                                  # [8, 192]
                    for b in range(basis_dim):
                        gsh_ref[0, i, k, b] = (
                            Hk * basis_ref[t, b]
                        ).astype(gsh_ref.dtype)

            # carry updates
            state_ref[0, 0:1, :] += jnp.sum(active_f * tau, axis=0)[None]
            state_ref[0, 1:2, :] += jnp.sum(wc, axis=0)[None]

        if sentinel is None:
            for i in range(wps):
                _bwd_window(i)
        else:
            # all-sentinel windows: zero gradient and zero tau by
            # construction — skip the whole emission. The skipped
            # output-block slice MUST be zeroed (not left as garbage):
            # downstream the blocks meet 0/1 MASK MULTIPLIES (the
            # tile-reduce matmul, the dense step's cell-mask) where
            # 0 * NaN poisons the accumulator — scatter-row dropping
            # alone only protects scatter-add consumers. The zero
            # store is VPU-trivial; the block's HBM writeback happens
            # either way.
            for i in range(wps):
                cc = c if wps == 1 else c * wps + i
                act = rows_ref[t, cc, 0] != sentinel
                for k in range(1, 8):
                    act = act | (rows_ref[t, cc, k] != sentinel)
                pl.when(act)(functools.partial(_bwd_window, i))

                @pl.when(jnp.logical_not(act))
                def _(i=i):
                    if gd_ref is not None:
                        gd_ref[0, i] = jnp.zeros(
                            gd_ref.shape[2:], gd_ref.dtype
                        )
                    gsh_ref[0, i] = jnp.zeros(
                        gsh_ref.shape[2:], gsh_ref.dtype
                    )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "basis_dim", "sparsity_scale",
                     "color_mode", "grad_dtype", "packed_out", "wps",
                     "skip_empty", "n_bricks"),
)
def _bwd_call(samples, rows, orig, basisf, pack, n_chunks,
              basis_dim, sparsity_scale, color_mode="bias",
              grad_dtype=jnp.float32, packed_out=False, wps=1,
              skip_empty=False, n_bricks=None):
    """SMEM-sized tile grouping like _march_call. `samples` is the
    forward pass's per-(tile, chunk) field stream [T, C, 8, A].
    `n_chunks` must be a multiple of `wps` (grouping sized on
    prefetched entries, not grid steps — see _march_call)."""
    assert n_chunks % wps == 0
    T_full = pack.shape[0]
    tg, padn = _tile_groups(T_full, n_chunks)
    if padn:
        samples = jnp.concatenate(
            [samples,
             jnp.zeros((padn,) + samples.shape[1:], samples.dtype)]
        )
        rows = jnp.concatenate(
            [rows,
             jnp.full((padn,) + rows.shape[1:],
                      n_bricks if n_bricks is not None else 0,
                      rows.dtype)]
        )
        orig = jnp.concatenate(
            [orig, jnp.zeros((padn,) + orig.shape[1:], orig.dtype)]
        )
        basisf = jnp.concatenate(
            [basisf, jnp.zeros((padn,) + basisf.shape[1:], basisf.dtype)]
        )
        pack = jnp.concatenate(
            [pack, jnp.zeros((padn,) + pack.shape[1:], pack.dtype)]
        )

    def one_group(args):
        samp_g, rows_g, orig_g, basisf_g, pack_g = args
        return _bwd_group(
            samp_g, rows_g, orig_g, basisf_g, pack_g,
            n_chunks, basis_dim, sparsity_scale, color_mode,
            grad_dtype, packed_out, wps,
            (n_bricks if skip_empty else None),
        )

    outs = jax.lax.map(
        one_group,
        (_group(samples, tg), _group(rows, tg), _group(orig, tg),
         _group(basisf, tg), _group(pack, tg)),
    )
    if packed_out:
        state, gsh = outs
        return (
            state.reshape(-1, 8, pack.shape[-1])[:T_full],
            None,
            gsh.reshape((-1,) + gsh.shape[2:])[:T_full],
        )
    state, gd, gsh = outs
    return (
        state.reshape(-1, 8, pack.shape[-1])[:T_full],
        gd.reshape((-1,) + gd.shape[2:])[:T_full],
        gsh.reshape((-1,) + gsh.shape[2:])[:T_full],
    )


def _bwd_group(samples, rows, orig, basisf, pack, n_chunks,
               basis_dim, sparsity_scale, color_mode="bias",
               grad_dtype=jnp.float32, packed_out=False, wps=1,
               sentinel=None):
    T = pack.shape[0]
    C = n_chunks
    r = pack.shape[-1]
    A = SC * r

    if packed_out:
        grad_specs = (
            pl.BlockSpec(
                (1, wps, 8, basis_dim + 1, 8, 192),
                lambda t, c, rows, orig, basisf: (t, c, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        grad_shapes = (
            jax.ShapeDtypeStruct(
                (T, C, 8, basis_dim + 1, 8, 192), grad_dtype
            ),
        )
    else:
        grad_specs = (
            pl.BlockSpec(
                (1, wps, 8, 8, 64),
                lambda t, c, rows, orig, basisf: (t, c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, wps, 8, basis_dim, 8, 192),
                lambda t, c, rows, orig, basisf: (t, c, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        grad_shapes = (
            jax.ShapeDtypeStruct((T, C, 8, 8, 64), grad_dtype),
            jax.ShapeDtypeStruct(
                (T, C, 8, basis_dim, 8, 192), grad_dtype
            ),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T, C // wps),
        in_specs=[
            pl.BlockSpec(
                (1, PACK_ROWS, r),
                lambda t, c, rows, orig, basisf: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, wps, 8, A),
                lambda t, c, rows, orig, basisf: (t, c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 8, r),
                lambda t, c, rows, orig, basisf: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *grad_specs,
        ),
    )
    extra = {}
    if wps > 1:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    return pl.pallas_call(
        _make_bwd_kernel(basis_dim, sparsity_scale, r, color_mode,
                         packed_out=packed_out, wps=wps,
                         sentinel=sentinel),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T, 8, r), jnp.float32),
            *grad_shapes,
        ),
        interpret=INTERPRET,
        **extra,
    )(rows, orig, basisf, pack, samples)


def _bwd_frame_group(lt, first, rows, orig, basisf, pack_g, state_g,
                     samples, basis_dim, sparsity_scale,
                     color_mode="bias", grad_dtype=jnp.float32,
                     sentinel=None):
    """One flat window group of the fetch-free backward (the flat
    counterpart of _bwd_group; see fused_grad_blocks_flat in
    flat_train.py). The grid is (W, 1) over active windows in
    tile-major order; per-tile suffix state (cum_tau, P) is seeded
    from `state_g` on each tile's first window and carried by
    out-block revisiting, so a tile whose run crosses a group boundary
    resumes mid-march. Emits ONE packed gradient block per window
    [8, B+1, 8, 192] (packed_out layout only — the flat path exists
    for the packed touched train step).

      lt      [W]          int32  local state/pack slot per window
      first   [W]          int32  1 on each tile's first window here
      rows    [W, 1, 8]    int32  corner rows (sentinel = empty)
      orig    [W, 1, 4]    int32  window voxel origin + base step
      basisf  [W, B]       f32    SH basis of the window's tile
      pack_g  [S, 16, r]   f32    ray pack rows per local slot
                                  (rows 12-15 carry g / S_total)
      state_g [S, 8, r]    f32    suffix-state carry rows per slot
      samples [W, 1, 8, A] f32    forward per-sample field stream
    """
    W = lt.shape[0]
    S = pack_g.shape[0]
    r = pack_g.shape[-1]
    A = SC * r

    def local(nrows):
        return pl.BlockSpec(
            (1, nrows, r),
            lambda w, c, lt, first, rows, orig, basisf: (lt[w], 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(W, 1),
        in_specs=[
            local(pack_g.shape[1]),
            pl.BlockSpec(
                (1, 1, 8, A),
                lambda w, c, lt, first, rows, orig, basisf: (
                    w, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            local(8),
        ],
        out_specs=(
            local(8),
            pl.BlockSpec(
                (1, 1, 8, basis_dim + 1, 8, 192),
                lambda w, c, lt, first, rows, orig, basisf: (
                    w, 0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
    )
    return pl.pallas_call(
        _make_bwd_kernel(basis_dim, sparsity_scale, r, color_mode,
                         packed_out=True, sentinel=sentinel,
                         flat_state=True),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((S, 8, r), jnp.float32),
            jax.ShapeDtypeStruct(
                (W, 1, 8, basis_dim + 1, 8, 192), grad_dtype
            ),
        ),
        interpret=INTERPRET,
    )(lt, first, rows, orig, basisf, pack_g, samples, state_g)


# Layout converters are CONSTANT lane permutations (one gather with a
# precomputed index) rather than 6D reshape+transpose chains: TPU
# tiling pads tiny trailing dims (8, 8) to (8, 128), so the
# materialized transpose intermediates blow up 16x in HBM (observed:
# a 1.6 GB logical relayout allocating 24.9 GB).
_PERM_CACHE = {}


def _perm(name: str, basis_dim: int):
    # cached as NUMPY (a jnp constant created inside a trace would leak
    # a tracer into later traces)
    key = (name, basis_dim)
    p = _PERM_CACHE.get(key)
    if p is not None:
        return p
    B = basis_dim
    lx, ly, lz = np.meshgrid(
        np.arange(8), np.arange(8), np.arange(8), indexing="ij"
    )
    cell = (lx * 64 + ly * 8 + lz).reshape(-1)          # [512]
    out_idx = np.arange(512 * 3 * B).reshape(512, 3, B)
    if name == "grad24_to_sh":
        # in: [B, 24(lx*3+ch), 64(ly*8+lz)] flat; out: [cell, ch, b]
        src = np.empty((512, 3, B), np.int64)
        for c in range(3):
            for b in range(B):
                src[:, c, b] = (
                    b * (24 * 64)
                    + (lx.reshape(-1) * 3 + c) * 64
                    + (ly.reshape(-1) * 8 + lz.reshape(-1))
                )
        p = src.reshape(-1)
    elif name == "kernel_to_sh":
        # in: [B, lx, 192((ly*8+lz)*3+ch)] flat; out: [cell, ch, b]
        src = np.empty((512, 3, B), np.int64)
        for c in range(3):
            for b in range(B):
                src[:, c, b] = (
                    (b * 8 + lx.reshape(-1)) * 192
                    + (ly.reshape(-1) * 8 + lz.reshape(-1)) * 3
                    + c
                )
        p = src.reshape(-1)
    elif name == "sh_to_kernel":
        # in: [cell, ch, b] flat; out: [B, lx, (ly*8+lz)*3+ch]
        src = np.empty((B, 8, 192), np.int64)
        kpos = np.arange(192)
        lyz, ch = kpos // 3, kpos % 3
        for b in range(B):
            for x_ in range(8):
                src[b, x_, :] = (x_ * 64 + lyz) * (3 * B) + ch * B + b
        p = src.reshape(-1)
    else:
        raise ValueError(name)
    _PERM_CACHE[key] = p
    return p


def kernel_grad24_to_kernel_layout(g: jnp.ndarray, basis_dim: int):
    """[nb, B, 24(a,ch), 64(b,c)] -> [nb, B, 8, 192] directly (the
    composition of grad24_to_sh and sh_to_kernel as ONE gather — the
    two-step chain materializes an extra [nb, 13824] intermediate)."""
    key = ("grad24_to_kernel", basis_dim)
    p = _PERM_CACHE.get(key)
    if p is None:
        p = np.asarray(_perm("grad24_to_sh", basis_dim))[
            np.asarray(_perm("sh_to_kernel", basis_dim))
        ]
        _PERM_CACHE[key] = p
    nb = g.shape[0]
    flat = g.reshape(nb, basis_dim * 24 * 64)
    return jnp.take(flat, p, axis=1).reshape(nb, basis_dim, 8, 192)


def kernel_grad24_to_sh(g: jnp.ndarray, basis_dim: int):
    """Backward-kernel gradient layout [nb, B, 24(a,ch), 64(b,c)] ->
    master [nb, 512, 3*B] (cells lx-major, channels (ch, basis))."""
    nb = g.shape[0]
    flat = g.reshape(nb, basis_dim * 24 * 64)
    out = jnp.take(flat, _perm("grad24_to_sh", basis_dim), axis=1)
    return out.reshape(nb, 512, 3 * basis_dim)


def kernel_layout_to_sh(gsh_kernel: jnp.ndarray, basis_dim: int):
    """[nb, B, 8, 192] -> [nb, 512, 3*B] (inverse of sh_to_kernel_layout;
    same MXU-matmul construction — see _perm_block_matrix)."""
    nb = gsh_kernel.shape[0]
    B = basis_dim
    z = jnp.moveaxis(gsh_kernel, 1, 2).astype(jnp.float32)
    z = z.reshape(nb, 8, B * 192)
    x = z @ jnp.asarray(_perm_block_matrix(B)).T   # [nb, lx, lyz*3B+cB+b]
    return x.reshape(nb, 512, 3 * B)


def fused_grad_blocks(
    bg: BrickGrid,
    rays: Rays,
    rgb_gt: jnp.ndarray,
    opts: GridRenderOptions = GridRenderOptions(),
    *,
    beta_loss: float = 0.0,
    sparsity_loss: float = 0.0,
    n_chunks: Optional[int] = None,
    use_occupancy: bool = False,
    kernel_arrays=None,
    grad_dtype=jnp.float32,
    compact_chunks: Optional[int] = None,
    wps: int = 1,
    skip_empty: bool = False,
):
    """Fused render + gradient, stopping BEFORE the dense scatter:
    returns (rgb_out [T,128,3], gd_blocks [T,C,8,8,64],
    gsh_blocks [T,C,8,B,8,192] (the march's KERNEL layout — scatter
    targets sh_z-shaped accumulators directly; kernel_layout_to_sh
    converts for brick-layout consumers), rows [T,C,8] (nb =
    sentinel), aux).

    `kernel_arrays`: optional prebuilt (density_z, sh_z) bf16
    kernel-layout arrays with sentinel row — skips the per-step
    full-grid relayout (the sparse trainer maintains them
    incrementally).
    """
    if rays.origins.shape[1] not in (128, 256):
        raise ValueError("tile size must be 128 or 256 rays")
    if opts.color_mode not in ("bias", "sigmoid"):
        raise NotImplementedError(
            f"pallas march: unknown color mode {opts.color_mode!r}"
        )
    from nerf_projects_tpu.ops.tile_render import default_chunks

    if n_chunks:
        C = n_chunks
    elif use_occupancy:
        C = active_chunk_bound(bg, opts.step_size)
    else:
        C = default_chunks(bg, opts.step_size, SC)
    pack, geom = _pack_rays(bg, rays, opts, use_occupancy)
    wb, rows = _plan_windows(bg, geom, C)
    (orig, rows), C, dropped = _orig_with_base(
        wb, rows, bg.n_bricks, C, compact_chunks
    )
    if wps > 1:
        orig, rows, C = _pad_chunks(orig, rows, bg.n_bricks, wps)
    basisf = eval_sh_bases(bg.basis_dim, _mean_viewdirs(rays)).astype(
        jnp.float32
    )
    packed = False
    if kernel_arrays is None:
        density_z, sh_z = _kernel_arrays(bg)
    elif isinstance(kernel_arrays, (tuple, list)):
        density_z, sh_z = kernel_arrays
    else:  # single packed array -> packed fwd fetches + packed grads
        density_z, sh_z, packed = kernel_arrays, None, True

    # forward for rgb_out + the per-sample field stream the fetch-free
    # backward consumes
    fwd, samples = _march_call(density_z, sh_z, rows, orig, basisf,
                               pack, C, bg.basis_dim, opts.color_mode,
                               emit_samples=True, wps=wps,
                               skip_empty=skip_empty)
    acc = fwd[:, 3]
    rgb_out = (
        jnp.moveaxis(fwd[:, 0:3], 1, 2)
        + (1.0 - acc[..., None]) * opts.background_brightness
    )  # [T, 128, 3]

    T = pack.shape[0]
    n_rays = T * R
    g = 2.0 * (rgb_out - rgb_gt) / (3.0 * n_rays)      # [T, 128, 3]
    S_total = jnp.sum(g * rgb_out, axis=-1)            # [T, 128]
    if beta_loss > 0:
        log_T = -fwd[:, 5]
        T_fin = jnp.exp(log_T)
        S_total = S_total + (beta_loss / n_rays) * (
            1.0 - T_fin / (1.0 - T_fin + 1e-3)
        )

    pack = pack.at[:, 12:15].set(jnp.moveaxis(g, -1, 1))
    pack = pack.at[:, 15].set(S_total)

    state, gd_blocks, gsh_blocks = _bwd_call(
        samples, rows, orig, basisf, pack, C, bg.basis_dim,
        float(sparsity_loss), opts.color_mode, grad_dtype,
        packed_out=packed, wps=wps, skip_empty=skip_empty,
        n_bricks=bg.n_bricks,
    )

    aux = {
        "acc": acc,
        "log_transmit": -fwd[:, 5],
        "sparsity_sum": fwd[:, 6],
        "window_miss": jnp.sum(fwd[:, 7]) / (T * rays.origins.shape[1] * SC * C),
        "dropped_active_chunks": dropped,
    }
    return rgb_out, gd_blocks, gsh_blocks, rows, aux


def render_fused_tiles_pallas(
    bg: BrickGrid,
    rays: Rays,
    rgb_gt: jnp.ndarray,
    opts: GridRenderOptions = GridRenderOptions(),
    *,
    beta_loss: float = 0.0,
    sparsity_loss: float = 0.0,
    n_chunks: Optional[int] = None,
    use_occupancy: bool = False,
    grad_dtype=jnp.float32,
    compact_chunks: Optional[int] = None,
):
    """Fused render + gradient over [T, 128] tiles — the reference
    volume_render_fused: returns (rgb_out [T,128,3],
    grad_density_bricks [nb,512], grad_sh_bricks [nb,512,ch], aux dict).

    The MSE gradient 2*(rgb-gt)/(3N) is generated internally; beta and
    sparsity loss gradients are fused exactly as the CUDA kernel fuses
    them (beta scaled 1/N_rays; Cauchy sparsity per sample).
    """
    rgb_out, gd_blocks, gsh_blocks, rows, aux = fused_grad_blocks(
        bg, rays, rgb_gt, opts,
        beta_loss=beta_loss, sparsity_loss=sparsity_loss,
        n_chunks=n_chunks, use_occupancy=use_occupancy,
        grad_dtype=grad_dtype, compact_chunks=compact_chunks,
    )
    if gd_blocks is None:
        raise ValueError(
            "packed kernel_arrays: use train_step_tiles_packed, which "
            "scatters the packed gradient blocks directly"
        )
    # scatter-add per-corner blocks into the compact brick arrays
    flat_rows = rows.reshape(-1)                       # [T*C*8]
    nb = bg.n_bricks
    gd = jnp.zeros((nb + 1, 8, 64), jnp.float32).at[flat_rows].add(
        gd_blocks.reshape(-1, 8, 64).astype(jnp.float32)
    )[:nb]
    gsh_k = jnp.zeros(
        (nb + 1, bg.basis_dim, 8, 192), jnp.float32
    ).at[flat_rows].add(
        gsh_blocks.reshape(-1, bg.basis_dim, 8, 192).astype(jnp.float32)
    )[:nb]

    grad_density = gd.reshape(nb, 512)
    grad_sh = kernel_layout_to_sh(gsh_k, bg.basis_dim)
    return rgb_out, grad_density, grad_sh, aux
