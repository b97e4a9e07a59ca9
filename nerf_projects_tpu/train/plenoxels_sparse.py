"""Row-sparse Plenoxels training: O(touched bricks) per step.

The dense tile step (`PlenoxelsTrainer.train_step_tiles_pallas`) pays
three O(grid)-sized costs every step: the fp32->bf16 kernel-layout
relayout, the dense gradient scatter (zeros + add), and the full-array
RMSprop sweep. At the reference's post-upsample 512^3 those sweeps move
tens of GB of HBM per step. This module removes all three:

  * the bf16 kernel-layout arrays (`density_z`/`sh_z`) are maintained
    INCREMENTALLY — only rows touched this step are rewritten;
  * render + TV gradients stay in per-row block form
    (`fused_grad_blocks`, `tv_grad_brick_blocks`) and are segment-summed
    onto the step's unique touched rows — no dense gradient array ever
    exists;
  * RMSprop runs only on touched rows, with EXACT lazy decay
    compensation: a row untouched for D steps has zero gradient there,
    so the dense recursion rms <- b*rms degenerates to rms *= b^D —
    applied in closed form from a per-row `last_step` stamp. The result
    is bit-for-bit the dense optimizer semantics (reference
    optim_kernel.cu:20-27) at sparse cost.

Unsupported here (use the dense step): lambda_l2_sh and
lambda_tv_lumisphere — both touch every cell every step by definition.

Parity target: reference svox2/opt/opt.py:699-842 fused step; the CUDA
original is also sparse in exactly this sense (atomics into touched
cells only), but pairs it with a full-grid optimizer sweep
(svox2.py:1540-1557) that a TPU cannot afford at 512^3.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.ops.brick_grid import BrickGrid
from nerf_projects_tpu.ops.pallas.tile_march import (
    fused_grad_blocks,
    kernel_layout_to_sh,
    pack_kernel_arrays,
    sh_to_kernel_layout,
)
from nerf_projects_tpu.ops.tv_bricks import (
    sample_brick_window,
    tv_grad_brick_blocks,
)


class SparseBrickState(NamedTuple):
    """Trainable grid state in kernel layout, with a sentinel row at
    index nb (always zero in the z-arrays; marching reads it for empty
    bricks)."""

    density_k: jnp.ndarray   # f32 [nb+1, 8, 64] master
    sh_k: jnp.ndarray        # f32 [nb+1, B, 8, 192] master
    density_z: object        # bf16 kernel-input copy, or None to march
    sh_z: object             # directly on the f32 masters (saves the
                             # copies' HBM; bf16 windows measured no
                             # speedup — the march is latency-bound)
    rms_density: jnp.ndarray  # f32 [nb+1, 8, 64]
    rms_sh: jnp.ndarray       # f32 [nb+1, B, 8, 192]
    last_step: jnp.ndarray    # int32 [nb+1]

    @property
    def n_bricks(self) -> int:
        return self.density_k.shape[0] - 1

    @property
    def basis_dim(self) -> int:
        return self.sh_k.shape[1]


def _append_row(x):
    return jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)


def sparse_state_from_grid(bg: BrickGrid,
                           rms_dtype=jnp.float32,
                           shared_kernel_arrays: bool = False,
                           ) -> SparseBrickState:
    """Build the incremental state from a BrickGrid's fp32 masters.

    rms_dtype=bf16 halves the RMSprop accumulator (the HBM difference
    between fitting and not at 512^3 x SH9): the accumulator only feeds
    sqrt(rms)+eps in the denominator, so bf16's ~0.4% relative error is
    step-size noise."""
    nb, B = bg.n_bricks, bg.basis_dim
    dk = _append_row(
        bg.density_bricks.reshape(nb, 8, 64).astype(jnp.float32)
    )
    sk = _append_row(
        sh_to_kernel_layout(bg.sh_bricks.astype(jnp.float32), B)
    )
    return SparseBrickState(
        density_k=dk,
        sh_k=sk,
        density_z=None if shared_kernel_arrays else dk.astype(jnp.bfloat16),
        sh_z=None if shared_kernel_arrays else sk.astype(jnp.bfloat16),
        rms_density=jnp.zeros(dk.shape, rms_dtype),
        rms_sh=jnp.zeros(sk.shape, rms_dtype),
        last_step=jnp.full((nb + 1,), -1, jnp.int32),
    )


def pad_state_rows(st: SparseBrickState, multiple: int) -> SparseBrickState:
    """Pad every row-indexed array to a multiple of `multiple` rows so
    the state can be row-sharded over a device mesh. Padding rows sit
    AFTER the sentinel (index nb) and are never referenced: window rows
    are always < nb or == nb. grid_from_sparse_state slices by nb, so
    the padding round-trips away."""
    n = st.density_k.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return st

    def padz(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
        )

    return SparseBrickState(
        density_k=padz(st.density_k),
        sh_k=padz(st.sh_k),
        density_z=None if st.density_z is None else padz(st.density_z),
        sh_z=None if st.sh_z is None else padz(st.sh_z),
        rms_density=padz(st.rms_density),
        rms_sh=padz(st.rms_sh),
        last_step=jnp.concatenate(
            [st.last_step, jnp.full((pad,), -1, jnp.int32)]
        ),
    )


def grid_from_sparse_state(bg: BrickGrid, st: SparseBrickState) -> BrickGrid:
    """Write the trained masters back into (a copy of) `bg`."""
    from dataclasses import replace

    nb, B = bg.n_bricks, st.basis_dim
    density = st.density_k[:nb].reshape(nb, 512)
    sh = kernel_layout_to_sh(st.sh_k[:nb], B)
    return replace(bg, density_bricks=density, sh_bricks=sh)


def _mask_kernel_layouts(cell_mask_rows: jnp.ndarray, basis_dim: int):
    """cell_mask rows [K, 512] -> kernel-layout masks
    ([K, 8, 64] f32, [K, B, 8, 192] f32)."""
    k = cell_mask_rows.shape[0]
    m = cell_mask_rows.astype(jnp.float32)
    md = m.reshape(k, 8, 64)
    msh = jnp.broadcast_to(
        m.reshape(k, 1, 8, 8, 8, 1), (k, basis_dim, 8, 8, 8, 3)
    ).reshape(k, basis_dim, 8, 192)
    return md, msh


def _finalize_rms(trainer, optim, data, grad, rms, decay, lr, minval=None):
    """The dense `_optim` recursion with the closed-form b^D lazy decay
    folded in (exact: untouched steps have g == 0). In pervisit mode
    `decay` is per-coefficient (b where touched) and the first visit
    bootstraps rms to g^2 (optim_kernel.cu:21)."""
    if optim == "rmsprop":
        b = trainer.rms_beta
        rms_rec = decay * rms + (1.0 - b) * grad * grad
        # first-visit bootstrap rms=g^2 (optim_kernel.cu:21) applies in
        # BOTH modes — the reference's rmsprop_once always does it
        if getattr(trainer, "rms_pervisit", False):
            rms = jnp.where(
                grad == 0.0, rms,
                jnp.where(rms == 0.0, grad * grad, rms_rec),
            )
        else:
            rms = jnp.where(rms == 0.0, grad * grad, rms_rec)
        new = data - lr * grad / (jnp.sqrt(rms) + 1e-8)
    else:  # sgd
        new = data - lr * grad
    if minval is not None:
        new = jnp.maximum(new, minval)
    return new, rms


def train_step_tiles_sparse(
    trainer,
    bg: BrickGrid,
    st: SparseBrickState,
    rays: Rays,
    target: jnp.ndarray,
    step: jnp.ndarray,
    key: jax.Array,
    *,
    max_touched: Optional[int] = None,
    use_occupancy: bool = False,
    compact_chunks: Optional[int] = None,
    n_chunks: Optional[int] = None,
):
    """One row-sparse fused train step. `bg` supplies geometry only (may
    be `geometry_only`-slimmed); all data lives in `st`.

    `n_chunks`: static chunk count for the march. REQUIRED when `bg` is
    traced (e.g. under lax.scan with the grid as a scan-carried or jit
    argument) and use_occupancy is set: the occupancy bound is otherwise
    derived host-side from brick coords (active_chunk_bound), which
    cannot run on a tracer.

    `step` must be an int32 scalar (the global step counter).
    `max_touched`: static bound on unique touched bricks per step
    (default: exact — total contribution count, never overflows).
    Contributions beyond the bound are dropped and reported in
    stats["touched_overflow"].
    """
    if trainer.lambda_l2_sh > 0 or trainer.lambda_tv_lumisphere > 0:
        raise ValueError(
            "sparse step does not support lambda_l2_sh / "
            "lambda_tv_lumisphere (full-grid regularizers); use "
            "train_step_tiles_pallas"
        )
    nb, B = bg.n_bricks, st.basis_dim
    fstep = step.astype(jnp.float32)

    shared_z = st.density_z is None
    ka = (
        (st.density_k, st.sh_k) if shared_z
        else (st.density_z, st.sh_z)
    )
    rgb, gd_blocks, gsh_blocks, rows, aux = fused_grad_blocks(
        bg, rays, target, trainer.opts,
        beta_loss=trainer.lambda_beta,
        sparsity_loss=trainer.lambda_sparsity,
        use_occupancy=use_occupancy,
        kernel_arrays=ka,
        grad_dtype=trainer.grad_block_dtype,
        compact_chunks=compact_chunks,
        n_chunks=n_chunks,
    )
    mse = jnp.mean((rgb - target) ** 2)

    rows_r = rows.reshape(-1)                               # [M1]
    gd_flat = gd_blocks.reshape(-1, 8, 64).astype(jnp.float32)
    # the backward kernel emits SH blocks in the state's kernel layout
    # already — no O(M) permutation pass
    gsh_flat = gsh_blocks.reshape(-1, B, 8, 192).astype(jnp.float32)

    # ---- sampled TV in block form ------------------------------------
    k_tv, k_sh = jax.random.split(key)
    tv_parts = []

    def fetch_density(r):
        return st.density_k[r].reshape(-1, 512, 1)

    def fetch_sh(r):
        return kernel_layout_to_sh(st.sh_k[r], B)

    if trainer.lambda_tv > 0:
        w = max(int(trainer.tv_sparsity * nb), 1)
        srows = sample_brick_window(k_tv, nb, w)
        r4, v4 = tv_grad_brick_blocks(
            bg, fetch_density, srows,
            scale=trainer.lambda_tv, ignore_edge=False,
        )
        tv_parts.append(("d", r4, v4))
    if trainer.lambda_tv_sh > 0:
        w = max(int(trainer.tv_sh_sparsity * nb), 1)
        srows = sample_brick_window(k_sh, nb, w)
        r4, v4 = tv_grad_brick_blocks(
            bg, fetch_sh, srows,
            scale=trainer.lambda_tv_sh, ignore_edge=True,
        )
        tv_parts.append(("s", r4, v4))

    # combined row list (sentinel nb replaces "no row")
    all_rows = [rows_r]
    for _, r4, _v in tv_parts:
        all_rows.append(jnp.where(r4 < 0, nb, r4).astype(rows_r.dtype))
    rows_all = jnp.concatenate(all_rows)
    m_total = int(rows_all.shape[0])
    k_cap = max_touched if max_touched is not None else min(
        m_total, nb + 1
    )

    uniq = jnp.unique(rows_all, size=k_cap, fill_value=nb)
    pos_all = jnp.clip(
        jnp.searchsorted(uniq, rows_all), 0, k_cap - 1
    ).astype(jnp.int32)
    valid_all = uniq[pos_all] == rows_all
    overflow = 1.0 - jnp.mean(valid_all.astype(jnp.float32))

    # segment-sum the render blocks
    m1 = rows_r.shape[0]
    pos_r, ok_r = pos_all[:m1], valid_all[:m1]
    acc_d = jnp.zeros((k_cap, 8, 64), jnp.float32).at[pos_r].add(
        jnp.where(ok_r[:, None, None], gd_flat, 0.0)
    )
    acc_sh = jnp.zeros((k_cap, B, 8, 192), jnp.float32).at[pos_r].add(
        jnp.where(ok_r[:, None, None, None], gsh_flat, 0.0)
    )
    # + TV blocks (converted to kernel layout)
    off = m1
    for kind, r4, v4 in tv_parts:
        n4 = r4.shape[0]
        p, ok = pos_all[off : off + n4], valid_all[off : off + n4]
        off += n4
        if kind == "d":
            blk = v4[..., 0].reshape(n4, 8, 64)
            acc_d = acc_d.at[p].add(
                jnp.where(ok[:, None, None], blk, 0.0)
            )
        else:
            blk = sh_to_kernel_layout(v4, B)
            acc_sh = acc_sh.at[p].add(
                jnp.where(ok[:, None, None, None], blk, 0.0)
            )

    # ---- lazy-exact optimizer on the touched rows --------------------
    mask_rows = jnp.concatenate(
        [bg.cell_mask, jnp.zeros_like(bg.cell_mask[:1])]
    )[uniq]
    md, msh = _mask_kernel_layouts(mask_rows, B)
    acc_d = acc_d * md
    acc_sh = acc_sh * msh

    b = trainer.rms_beta
    if getattr(trainer, "rms_pervisit", False):
        # per-coefficient per-visit decay (see touched step / trainer)
        decay_d = jnp.where(acc_d != 0.0, b, 1.0)
        decay_s = jnp.where(acc_sh != 0.0, b, 1.0)
    else:
        delta = (step - st.last_step[uniq]).astype(jnp.float32)
        if (trainer.sigma_optim == "rmsprop"
                or trainer.sh_optim == "rmsprop"):
            decay = jnp.power(b, delta)
        else:
            decay = jnp.ones_like(delta)
        decay_d = decay[:, None, None]
        decay_s = decay[:, None, None, None]

    lr_sigma = trainer.lr_sigma_fn(fstep)
    lr_sh = trainer.lr_sh_fn(fstep)

    d_rows = st.density_k[uniq]
    new_d, rms_d = _finalize_rms(
        trainer, trainer.sigma_optim, d_rows, acc_d,
        st.rms_density[uniq].astype(jnp.float32),
        decay_d, lr_sigma,
        minval=trainer.density_minval,
    )
    new_d = new_d * md
    s_rows = st.sh_k[uniq]
    new_s, rms_s = _finalize_rms(
        trainer, trainer.sh_optim, s_rows, acc_sh,
        st.rms_sh[uniq].astype(jnp.float32),
        decay_s, lr_sh,
    )

    # ---- scatter back (unique indices; sentinel re-zeroed) -----------
    def put(arr, vals):
        return arr.at[uniq].set(vals).at[nb].set(0.0)

    new_st = SparseBrickState(
        density_k=put(st.density_k, new_d),
        sh_k=put(st.sh_k, new_s),
        density_z=(
            None if shared_z
            else put(st.density_z, new_d.astype(jnp.bfloat16))
        ),
        sh_z=(
            None if shared_z
            else put(st.sh_z, new_s.astype(jnp.bfloat16))
        ),
        rms_density=st.rms_density.at[uniq].set(
            rms_d.astype(st.rms_density.dtype)
        ),
        rms_sh=st.rms_sh.at[uniq].set(rms_s.astype(st.rms_sh.dtype)),
        last_step=st.last_step.at[uniq].set(step).at[nb].set(-1),
    )
    psnr = -10.0 * jnp.log(mse) / jnp.log(10.0)
    stats = {
        "loss": mse,
        "mse": mse,
        "psnr": psnr,
        "window_miss": aux["window_miss"],
        "touched_overflow": overflow,
    }
    return new_st, stats


def tile_segment_reduce(gp_blocks, rows, nb: int, k_tile: int):
    """Per-tile segment reduction of gradient blocks on the MXU.

    The march's window plan revisits bricks heavily WITHIN a tile
    (consecutive windows share 4 of their 8 corners), so reducing each
    tile's [C*8] corner-block stream onto its distinct bricks first
    shrinks the global scatter-add — the slowest per-block op of the
    step — by the revisit factor. The reduction itself is a 0/1
    selection matmul (batched [k_tile, C*8] @ [C*8, S] per tile), which
    the MXU does orders of magnitude faster per block than scatter-add:
    exact for bf16 blocks, and exact for f32 too (0/1 lhs; XLA's
    bf16x3 f32 matmul decomposition is lossless against a 0/1 operand).

    gp_blocks: [T, C, 8, ...block] (f32 or bf16)
    rows:      [T, C, 8] int32 corner brick rows (nb = sentinel)
    Returns (tile_rows [T, k_tile] int32 ascending per tile (nb =
    empty slot), tile_acc [T, k_tile, ...block] f32, dropped) where
    `dropped` counts per-tile distinct rows beyond k_tile (their
    blocks are lost — callers size k_tile with required_tile_rows and
    surface the count)."""
    T, C = rows.shape[0], rows.shape[1]
    M = C * 8
    r2 = rows.reshape(T, M)
    srt = jnp.sort(r2, axis=1)
    first = jnp.concatenate(
        [jnp.ones((T, 1), bool), srt[:, 1:] != srt[:, :-1]], axis=1
    ) & (srt != nb)
    pos = jnp.cumsum(first.astype(jnp.int32), axis=1) - first
    nuniq = pos[:, -1] + first[:, -1].astype(jnp.int32)
    dropped = jnp.sum(jnp.maximum(nuniq - k_tile, 0))
    slot_sorted = jnp.where(first & (pos < k_tile), pos, k_tile)
    tile_rows = jnp.full((T, k_tile + 1), nb, jnp.int32).at[
        jnp.arange(T)[:, None], slot_sorted
    ].set(srt)[:, :k_tile]                     # ascending (nb padded)

    ss = jax.vmap(jnp.searchsorted)(tile_rows, r2)
    ss = jnp.clip(ss, 0, k_tile - 1).astype(jnp.int32)
    valid = (
        jnp.take_along_axis(tile_rows, ss, axis=1) == r2
    ) & (r2 != nb)

    sel = (
        (ss[:, :, None] == jnp.arange(k_tile, dtype=jnp.int32)[None, None])
        & valid[:, :, None]
    )
    flat = gp_blocks.reshape(T, M, -1)
    sel = sel.astype(
        jnp.bfloat16 if flat.dtype == jnp.bfloat16 else jnp.float32
    )
    acc = jax.lax.dot_general(
        sel, flat,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                           # [T, k_tile, S]
    return (
        tile_rows,
        acc.reshape((T, k_tile) + gp_blocks.shape[3:]),
        dropped,
    )


def required_tile_rows(bg, rays, opts, *, use_occupancy: bool = False,
                       compact_chunks: Optional[int] = None,
                       multiple: int = 16) -> int:
    """Host-side helper: the max DISTINCT corner-brick count any tile's
    window plan references (rounded up to `multiple`), the k_tile bound
    for tile_segment_reduce. Run OUTSIDE jit."""
    import numpy as np

    from nerf_projects_tpu.ops.pallas.tile_march import (
        _orig_with_base,
        _pack_rays,
        _plan_windows,
        default_chunks_for,
    )

    C = compact_chunks
    full_C = (
        default_chunks_for(bg, opts)
    )
    pack, geom = _pack_rays(bg, rays, opts, use_occupancy)
    wb, rows = _plan_windows(bg, geom, full_C)
    (orig, rows), _, _ = _orig_with_base(
        wb, rows, bg.n_bricks, full_C, C
    )
    r2 = np.asarray(rows).reshape(rows.shape[0], -1)
    need = 1
    for t in range(r2.shape[0]):
        u = np.unique(r2[t])
        need = max(need, int((u != bg.n_bricks).sum()))
    return -(-need // multiple) * multiple


def required_touched_rows(bg, rays, opts, *, tv_rows: int = 0,
                          use_occupancy: bool = True,
                          multiple: int = 256) -> int:
    """Host-side exact unique-touched-brick count for this batch — the
    tight `max_touched` when the same rays are marched every step
    (bench) or a sizing probe otherwise. The march touches exactly the
    corner bricks of its active windows (every plan — (T, C) grids,
    compacted, flat — marches a subset of the full window plan, and
    sentinel windows never reach the scatter); sampled TV adds at most
    4 rows per sampled brick (the brick + 3 axis neighbors), which the
    caller passes via `tv_rows` = 4*(w_density + w_sh) since the
    sample window is drawn per step. Run OUTSIDE jit."""
    import numpy as np

    from nerf_projects_tpu.ops.pallas.tile_march import (
        _pack_rays,
        _plan_windows,
        active_chunk_bound,
    )

    nb = bg.n_bricks
    C = active_chunk_bound(bg, opts.step_size)
    _, geom = _pack_rays(bg, rays, opts, use_occupancy)
    _, rows = _plan_windows(bg, geom, C)
    r = np.asarray(rows)
    act = (r != nb).any(axis=-1)
    u = np.unique(r[act])
    need = int((u != nb).sum()) + int(tv_rows)
    return -(-need // multiple) * multiple


def pack_tv_blocks(tv_parts, B: int):
    """TV gradient blocks -> full PACKED-layout blocks ([n, B+1, 8,
    192]) + their rows, so they join the reduced render stream in one
    scatter instead of axis-1 slice scatters. tv_parts: list of
    ("d"|"s", rows [n], vals) as produced by tv_grad_brick_blocks
    (density vals [n, 512, 1], SH vals [n, 512, 3B])."""
    rows_list, blocks_list = [], []
    for kind, r4, v4 in tv_parts:
        n = r4.shape[0]
        blk = jnp.zeros((n, B + 1, 8, 192), jnp.float32)
        if kind == "d":
            blk = blk.at[:, B].set(
                jnp.repeat(v4[..., 0].reshape(n, 8, 64), 3, axis=-1)
            )
        else:
            blk = blk.at[:, :B].set(sh_to_kernel_layout(v4, B))
        rows_list.append(r4)
        blocks_list.append(blk)
    return rows_list, blocks_list


class PackedState(NamedTuple):
    """Fully-packed trainable state: ONE f32 array [nb+1, B+1, 8, 192]
    (SH slots 0..B-1 in kernel layout; density x3-interleaved in slot
    B — see pack_kernel_arrays) plus an rms accumulator of the same
    shape. The march fetches one block per window corner, the backward
    emits one gradient block per corner, the step does one scatter and
    one optimizer sweep.

    `last_step` (int32 [nb+1], -1 = never touched) exists for the
    TOUCHED-row step's lazy-exact RMSprop decay; the dense packed step
    carries it unchanged."""

    packed_k: jnp.ndarray
    rms: jnp.ndarray
    last_step: Optional[jnp.ndarray] = None

    @property
    def basis_dim(self) -> int:
        return self.packed_k.shape[1] - 1


def pad_packed_state_rows(st: PackedState, multiple: int) -> PackedState:
    """Pad the packed state's row axis to a multiple of `multiple` so
    it can be row-sharded over a device mesh (the PackedState twin of
    pad_state_rows). Padding rows sit after the sentinel (index nb)
    and are never referenced — window rows and touched slots are
    always <= nb, and grid_from_packed_state slices by the grid's nb."""
    n = st.packed_k.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return st

    def padz(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
        )

    return PackedState(
        packed_k=padz(st.packed_k),
        rms=padz(st.rms),
        last_step=None if st.last_step is None else jnp.concatenate(
            [st.last_step, jnp.full((pad,), -1, jnp.int32)]
        ),
    )


@functools.partial(jax.jit, static_argnums=2)
def _build_packed_masters(density_bricks, sh_bricks, B: int):
    """Packed-master build with bounded peak memory. Eagerly, the
    sh_to_kernel_layout -> _append_row -> pack_kernel_arrays chain
    materializes ~4 full-size copies of the SH data (3.4 GB each at
    512^3, which OOMed the 512^3 bench state build); the matmul
    layout converter adds its own full-size products. Here the rows
    stream through a lax.scan in fixed-size blocks written into the
    preallocated output with dynamic_update_slice (in-place under
    jit) — peak = input + output + one ~80 MB block."""
    nb = density_bricks.shape[0]
    out = jnp.zeros((nb + 1, B + 1, 8, 192), jnp.float32)
    blk = 4096
    n_full, rem = nb // blk, nb % blk

    def block_of(d, s, n):
        return pack_kernel_arrays(
            d.reshape(n, 8, 64), sh_to_kernel_layout(s, B)
        )

    if n_full:
        dz = density_bricks[: n_full * blk].reshape(n_full, blk, 512)
        sz = sh_bricks[: n_full * blk].reshape(
            n_full, blk, 512, 3 * B
        )

        def body(out, args):
            i, d, s = args
            return jax.lax.dynamic_update_slice(
                out, block_of(d, s, blk), (i * blk, 0, 0, 0)
            ), None

        out, _ = jax.lax.scan(
            body, out, (jnp.arange(n_full, dtype=jnp.int32), dz, sz)
        )
    if rem:
        # static-size tail block (dynamic_update_slice CLAMPS an
        # out-of-range start, so a padded last block would silently
        # overwrite earlier rows)
        out = jax.lax.dynamic_update_slice(
            out,
            block_of(density_bricks[n_full * blk:],
                     sh_bricks[n_full * blk:], rem),
            (n_full * blk, 0, 0, 0),
        )
    return out


def packed_state_from_grid(bg: BrickGrid,
                           rms_dtype=jnp.float32) -> PackedState:
    nb, B = bg.n_bricks, bg.basis_dim
    packed = _build_packed_masters(
        bg.density_bricks.astype(jnp.float32),
        bg.sh_bricks.astype(jnp.float32), B,
    )
    return PackedState(packed_k=packed,
                       rms=jnp.zeros(packed.shape, rms_dtype),
                       last_step=jnp.full((nb + 1,), -1, jnp.int32))


def grid_from_packed_state(bg: BrickGrid, st: PackedState) -> BrickGrid:
    from dataclasses import replace

    nb, B = bg.n_bricks, st.basis_dim
    sh = kernel_layout_to_sh(st.packed_k[:nb, :B], B)
    density = st.packed_k[:nb, B].reshape(nb, 8, 64, 3)[..., 0]
    return replace(bg, density_bricks=density.reshape(nb, 512),
                   sh_bricks=sh)


def train_step_tiles_packed(
    trainer,
    bg: BrickGrid,
    st: PackedState,
    rays: Rays,
    target: jnp.ndarray,
    step: jnp.ndarray,
    key: jax.Array,
    *,
    use_occupancy: bool = False,
    compact_chunks: Optional[int] = None,
    n_chunks: Optional[int] = None,
    wps: int = 1,
    skip_empty: bool = True,
):
    """Dense-update train step on the fully-PACKED state: exactly the
    train_step_tiles_pallas semantics (fused kernels + sampled TV +
    dense RMSprop/SGD) with the whole per-step data path in one layout:
    1 fetch per window corner forward, 1 gradient block per corner
    backward, 1 scatter, 1 optimizer sweep. Requires
    sigma_optim == sh_optim (both rmsprop by default)."""
    if trainer.lambda_l2_sh > 0 or trainer.lambda_tv_lumisphere > 0:
        raise ValueError(
            "packed step does not support lambda_l2_sh / "
            "lambda_tv_lumisphere; use train_step_tiles_pallas"
        )
    if trainer.sigma_optim != trainer.sh_optim:
        raise ValueError(
            "packed step requires sigma_optim == sh_optim"
        )
    nb, B = bg.n_bricks, st.basis_dim
    fstep = step.astype(jnp.float32)

    rgb, _gd, gp_blocks, rows, aux = fused_grad_blocks(
        bg, rays, target, trainer.opts,
        beta_loss=trainer.lambda_beta,
        sparsity_loss=trainer.lambda_sparsity,
        use_occupancy=use_occupancy,
        kernel_arrays=st.packed_k,
        grad_dtype=trainer.grad_block_dtype,
        compact_chunks=compact_chunks,
        n_chunks=n_chunks,
        wps=wps,
        skip_empty=skip_empty,
    )
    mse = jnp.mean((rgb - target) ** 2)

    acc = jnp.zeros(
        (nb + 1, B + 1, 8, 192), jnp.float32
    ).at[rows.reshape(-1)].add(
        gp_blocks.reshape(-1, B + 1, 8, 192).astype(jnp.float32)
    )

    # sampled TV in block form; joins as FULL packed blocks in one
    # row scatter (an axis-1-sliced scatter-add lowers element-serial
    # on TPU — see train_step_tiles_packed_touched)
    k_tv, k_sh = jax.random.split(key)
    tv_parts = []
    if trainer.lambda_tv > 0:
        w = max(int(trainer.tv_sparsity * nb), 1)
        srows = sample_brick_window(k_tv, nb, w)
        r4, v4 = tv_grad_brick_blocks(
            bg,
            lambda r: st.packed_k[r, B].reshape(
                -1, 8, 64, 3
            )[..., 0].reshape(-1, 512, 1),
            srows, scale=trainer.lambda_tv, ignore_edge=False,
        )
        tv_parts.append(("d", jnp.where(r4 < 0, nb, r4), v4))
    if trainer.lambda_tv_sh > 0:
        w = max(int(trainer.tv_sh_sparsity * nb), 1)
        srows = sample_brick_window(k_sh, nb, w)
        r4, v4 = tv_grad_brick_blocks(
            bg, lambda r: kernel_layout_to_sh(st.packed_k[r, :B], B),
            srows, scale=trainer.lambda_tv_sh, ignore_edge=True,
        )
        tv_parts.append(("s", jnp.where(r4 < 0, nb, r4), v4))
    tv_rows_l, tv_blocks_l = pack_tv_blocks(tv_parts, B)
    for r4, blk in zip(tv_rows_l, tv_blocks_l):
        acc = acc.at[r4].add(blk)

    # packed cell mask (same pattern for every slot)
    m192 = jnp.repeat(
        jnp.concatenate(
            [bg.cell_mask, jnp.zeros_like(bg.cell_mask[:1])]
        ).astype(jnp.float32).reshape(nb + 1, 8, 64),
        3, axis=-1,
    )[:, None]                                   # [nb+1, 1, 8, 192]

    # per-slot lr: SH slots get lr_sh, the density slot lr_sigma
    lr_sigma = trainer.lr_sigma_fn(fstep)
    lr_sh = trainer.lr_sh_fn(fstep)
    slot = jnp.arange(B + 1)
    lr_vec = jnp.where(slot == B, lr_sigma, lr_sh)[None, :, None, None]

    g = acc * m192
    if trainer.sigma_optim == "rmsprop":
        b = trainer.rms_beta
        rms_old = st.rms.astype(jnp.float32)
        rms_rec = b * rms_old + (1.0 - b) * g * g
        if getattr(trainer, "rms_pervisit", False):
            # per-visit decay + first-visit bootstrap (see the touched
            # step / optim_kernel.cu:16-25)
            rms = jnp.where(
                g == 0.0, rms_old,
                jnp.where(rms_old == 0.0, g * g, rms_rec),
            )
        else:
            rms = jnp.where(rms_old == 0.0, g * g, rms_rec)
        upd = lr_vec * g / (jnp.sqrt(rms) + 1e-8)
    else:
        rms = st.rms.astype(jnp.float32)
        upd = lr_vec * g
    new = st.packed_k - upd
    if trainer.density_minval > -1e8:
        new = jnp.where(
            slot[None, :, None, None] == B,
            jnp.maximum(new, trainer.density_minval), new,
        )
    new = new * m192

    psnr = -10.0 * jnp.log(mse) / jnp.log(10.0)
    return (
        PackedState(packed_k=new, rms=rms.astype(st.rms.dtype),
                    last_step=st.last_step),
        {"loss": mse, "mse": mse, "psnr": psnr,
         "window_miss": aux["window_miss"]},
    )


@functools.partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=("use_occupancy", "compact_chunks", "n_chunks",
                     "wps", "skip_empty"),
    donate_argnums=(2,),
)
def train_step_tiles_packed_jit(
    trainer, bg, st, rays, target, step, key, *,
    use_occupancy=False, compact_chunks=None, n_chunks=None, wps=1,
    skip_empty=True,
):
    return train_step_tiles_packed(
        trainer, bg, st, rays, target, step, key,
        use_occupancy=use_occupancy, compact_chunks=compact_chunks,
        n_chunks=n_chunks, wps=wps, skip_empty=skip_empty,
    )


def _dense_sweep(trainer, cell_mask, st, acc, flag, step, fstep):
    """Dense-sweep optimizer body (see train_step_tiles_packed_touched
    `dense_optim`): whole-state elementwise RMSprop/SGD from a dense
    [nb+1]-row gradient accumulator, with where(g == 0) keeping
    untouched elements bit-identical — exactly the per-visit-RMSprop
    semantics. Replaces the reference's always-dense fused optimizer
    sweep (svox2/svox2/csrc/optim_kernel.cu:20-27) at the same O(state)
    bandwidth cost."""
    nb = cell_mask.shape[0]
    B = st.basis_dim
    # mask fuses into the elementwise update (a broadcast repeat,
    # never materialized); sentinel row nb masks to zero
    cm = jnp.concatenate(
        [cell_mask, jnp.zeros_like(cell_mask[:1])]
    ).astype(jnp.float32)
    mp = jnp.repeat(cm.reshape(nb + 1, 8, 64), 3, axis=-1)[:, None]
    g = acc * mp

    lr_sigma = trainer.lr_sigma_fn(fstep)
    lr_sh = trainer.lr_sh_fn(fstep)
    slot_ax = jnp.arange(B + 1)
    lr_vec = jnp.where(
        slot_ax == B, lr_sigma, lr_sh
    )[None, :, None, None]
    pk = st.packed_k
    if trainer.sigma_optim == "rmsprop":
        b = trainer.rms_beta
        rms_old = st.rms.astype(jnp.float32)
        rms_new = jnp.where(
            g == 0.0, rms_old,
            jnp.where(rms_old == 0.0, g * g,
                      b * rms_old + (1.0 - b) * g * g),
        )
        upd = lr_vec * g / (jnp.sqrt(rms_new) + 1e-8)
        new_rms = rms_new.astype(st.rms.dtype)
    else:
        upd = lr_vec * g
        new_rms = st.rms
    new = pk - upd
    if trainer.density_minval > -1e8:
        new = jnp.where(
            slot_ax[None, :, None, None] == B,
            jnp.maximum(new, trainer.density_minval), new,
        )
    # untouched elements stay BIT-identical (per-visit semantics)
    new = jnp.where(g == 0.0, pk, new)
    new_last = jnp.where(
        flag == 1, step, st.last_step
    ).at[nb].set(-1)
    return PackedState(
        packed_k=new, rms=new_rms, last_step=new_last
    )


def dense_sweep_apply(trainer, bg, st, acc, flag, step):
    """Second half of the dense_optim="defer" two-program split: apply
    the dense-sweep optimizer to `st` from the accumulator + flag that
    train_step_tiles_packed_touched(dense_optim="defer") returned in
    stats. Bit-identical to the fused dense_optim=True step."""
    return _dense_sweep(
        trainer, bg.cell_mask, st, acc, flag, step,
        step.astype(jnp.float32),
    )


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2, 3))
def dense_sweep_apply_jit(trainer, bg, st, acc, flag, step):
    return dense_sweep_apply(trainer, bg, st, acc, flag, step)


def train_step_tiles_packed_touched(
    trainer,
    bg: BrickGrid,
    st: PackedState,
    rays: Rays,
    target: jnp.ndarray,
    step: jnp.ndarray,
    key: jax.Array,
    *,
    max_touched: int = 12288,
    use_occupancy: bool = False,
    compact_chunks: Optional[int] = None,
    n_chunks: Optional[int] = None,
    wps: int = 1,
    tile_rows: Optional[int] = None,
    skip_empty: bool = True,
    flat_windows: Optional[int] = None,
    dense_optim: bool = False,
):
    """Touched-row train step on the fully-packed state — the fast
    sparse path. Same math as `train_step_tiles_packed` (fused kernels
    + sampled TV + RMSprop/SGD, lazy-EXACT: an untouched row's update
    is identically zero and its rms decay is applied in closed form
    b^D on next touch), but the optimizer reads/writes ONLY the rows
    the step touched, so the dense modes' O(grid) sweep (HBM floor
    ~12 ms per 2 GB state pass at 256^3) does not exist.

    `wps`: windows marched/emitted per kernel grid step (amortizes the
    per-step sequencing floor; bit-identical results).
    `tile_rows`: when set, pre-reduce each tile's gradient blocks onto
    its distinct bricks with tile_segment_reduce (MXU 0/1 matmul)
    before the global scatter-add — the scatter stream shrinks by the
    within-tile revisit factor (consecutive windows share 4 of 8
    corners). Size with required_tile_rows; overflow is surfaced in
    stats["dropped_tile_rows"].
    `flat_windows`: when set, both kernels march the FLAT active-window
    plan (ops/pallas/flat_train.py) instead of the (T, C) grid — every
    tile pays only for its own active windows rather than the batch
    max (shell scenes: ~5x fewer marched windows). The value is the
    static active-window capacity (size with
    flat_train.required_windows; overflow windows drop, reported in
    stats["dropped_active_chunks"]). Occupancy clipping is always on;
    wps/tile_rows/compact_chunks do not apply.

    `dense_optim`: skip the touched-row compaction/gather machinery
    entirely — scatter the gradient blocks into a DENSE [nb+1]-row
    accumulator and sweep the whole state elementwise, with
    `where(g == 0, old, updated)` keeping untouched elements
    bit-identical (exactly the per-visit RMSprop semantics). The
    round-4 tail bisect measured the XLA K-row gather/scatter path at
    ~5.5 us PER ROW (it is DMA-issue serialized), so whenever a step
    touches more than ~1/4 of the rows the pure-bandwidth dense sweep
    (~5 HBM passes over the state) wins — shell scenes at reference
    batch sizes sit far past that. Requires rms_pervisit (or SGD):
    the beta^delta lazy decay needs per-row deltas.
    dense_optim="defer" splits the step into TWO programs: this one
    returns the dense accumulator + touched flag in stats
    ("dense_acc"/"touched_flag", state unchanged) and the caller
    dispatches dense_sweep_apply(_jit) to apply it — for scales where
    the fused step+sweep compile exceeds the remote-compile helper's
    limit (512^3, e95301e). Bit-identical to dense_optim=True.

    Touched rows are found WITHOUT sort: scatter a dense flag
    [nb+1], exclusive-cumsum for each touched row's compact slot, and
    scatter row ids into the [max_touched] slot list (ascending by
    construction). `max_touched` is a static bound on unique touched
    bricks; overflowing rows are dropped and reported in
    stats["touched_overflow"] (fraction of unique rows dropped).

    `step` must be an int32 scalar that equals the true global step
    (the lazy decay is keyed on it). Replaces the reference's
    always-dense RMSprop sweep (opt.py optim_density_step /
    svox2.cu rmsprop_step kernels) with the update locality its
    sparse-gradient structure implies.
    """
    if trainer.lambda_l2_sh > 0 or trainer.lambda_tv_lumisphere > 0:
        raise ValueError(
            "packed step does not support lambda_l2_sh / "
            "lambda_tv_lumisphere; use train_step_tiles_pallas"
        )
    if trainer.sigma_optim != trainer.sh_optim:
        raise ValueError(
            "packed step requires sigma_optim == sh_optim"
        )
    if st.last_step is None:
        raise ValueError(
            "touched step needs PackedState.last_step "
            "(packed_state_from_grid provides it)"
        )
    nb, B = bg.n_bricks, st.basis_dim
    K = int(max_touched)
    fstep = step.astype(jnp.float32)

    if flat_windows is not None:
        if tile_rows is not None:
            raise ValueError(
                "flat_windows: tile_rows pre-reduction does not apply "
                "(the flat stream has no per-tile block structure)"
            )
        from nerf_projects_tpu.ops.pallas.flat_train import (
            fused_grad_blocks_flat,
        )

        rgb, _gd, gp_blocks, rows, aux = fused_grad_blocks_flat(
            bg, rays, target, trainer.opts,
            kernel_arrays=st.packed_k,
            w_cap=flat_windows,
            beta_loss=trainer.lambda_beta,
            sparsity_loss=trainer.lambda_sparsity,
            grad_dtype=trainer.grad_block_dtype,
        )
    else:
        rgb, _gd, gp_blocks, rows, aux = fused_grad_blocks(
            bg, rays, target, trainer.opts,
            beta_loss=trainer.lambda_beta,
            sparsity_loss=trainer.lambda_sparsity,
            use_occupancy=use_occupancy,
            kernel_arrays=st.packed_k,
            grad_dtype=trainer.grad_block_dtype,
            compact_chunks=compact_chunks,
            n_chunks=n_chunks,
            wps=wps,
            skip_empty=skip_empty,
        )
    mse = jnp.mean((rgb - target) ** 2)

    # sampled TV FIRST so its rows join the touched flag
    k_tv, k_sh = jax.random.split(key)
    tv_parts = []
    if trainer.lambda_tv > 0:
        w = max(int(trainer.tv_sparsity * nb), 1)
        srows = sample_brick_window(k_tv, nb, w)
        r4, v4 = tv_grad_brick_blocks(
            bg,
            lambda r: st.packed_k[r, B].reshape(
                -1, 8, 64, 3
            )[..., 0].reshape(-1, 512, 1),
            srows, scale=trainer.lambda_tv, ignore_edge=False,
        )
        tv_parts.append(("d", jnp.where(r4 < 0, nb, r4), v4))
    if trainer.lambda_tv_sh > 0:
        w = max(int(trainer.tv_sh_sparsity * nb), 1)
        srows = sample_brick_window(k_sh, nb, w)
        r4, v4 = tv_grad_brick_blocks(
            bg, lambda r: kernel_layout_to_sh(st.packed_k[r, :B], B),
            srows, scale=trainer.lambda_tv_sh, ignore_edge=True,
        )
        tv_parts.append(("s", jnp.where(r4 < 0, nb, r4), v4))

    if dense_optim:
        if tile_rows is not None:
            raise ValueError(
                "dense_optim: tile_rows pre-reduction does not apply"
            )
        if (trainer.sigma_optim == "rmsprop"
                and not getattr(trainer, "rms_pervisit", False)):
            raise ValueError(
                "dense_optim requires rms_pervisit RMSprop (or SGD): "
                "the beta^delta lazy decay needs per-row deltas"
            )
        rows_r = rows.reshape(-1)
        acc = jnp.zeros(
            (nb + 1, B + 1, 8, 192), jnp.float32
        ).at[rows_r].add(
            gp_blocks.reshape(-1, B + 1, 8, 192).astype(jnp.float32)
        )
        tv_rows_l, tv_blocks_l = pack_tv_blocks(tv_parts, B)
        for r4, blk in zip(tv_rows_l, tv_blocks_l):
            acc = acc.at[r4].add(blk.astype(jnp.float32))
        flag = jnp.zeros((nb + 1,), jnp.int32).at[rows_r].set(1)
        for _, r4, _v in tv_parts:
            flag = flag.at[r4].set(1)

        psnr = -10.0 * jnp.log(mse) / jnp.log(10.0)
        stats = {
            "loss": mse, "mse": mse, "psnr": psnr,
            "window_miss": aux["window_miss"],
            "touched_overflow": jnp.zeros(()),
            "dropped_tile_rows": jnp.zeros((), jnp.int32),
            "dropped_active_chunks": aux["dropped_active_chunks"],
        }
        if dense_optim == "defer":
            # two-program split: return the dense gradient accumulator
            # + touched flag unapplied; the caller dispatches
            # dense_sweep_apply(_jit) as its OWN program. At 512^3 the
            # fused step+sweep compile crashes the axon remote compile
            # helper (HTTP 500, e95301e); each half compiles alone.
            # State flows through UNCHANGED.
            stats["dense_acc"] = acc
            stats["touched_flag"] = flag
            return st, stats
        new_st = _dense_sweep(
            trainer, bg.cell_mask, st, acc, flag, step, fstep
        )
        return new_st, stats

    dropped_tile = jnp.zeros((), jnp.int32)
    if tile_rows is not None:  # (non-dense path continues below)
        # MXU pre-reduction: each tile's blocks collapse onto its
        # distinct bricks; TV blocks join the reduced stream as full
        # packed blocks so ONE scatter covers everything
        trows, tacc, dropped_tile = tile_segment_reduce(
            gp_blocks, rows, nb, tile_rows
        )
        tv_rows, tv_blocks = pack_tv_blocks(tv_parts, B)
        rows_r = jnp.concatenate(
            [trows.reshape(-1), *tv_rows]
        )
        blocks_r = jnp.concatenate(
            [tacc.reshape(-1, B + 1, 8, 192), *tv_blocks]
        )
    else:
        rows_r = rows.reshape(-1)
        blocks_r = None

    # ---- touched-row compaction: flag -> cumsum slots (no sort) ----
    flag = jnp.zeros((nb + 1,), jnp.int32).at[rows_r].set(1)
    for _, r4, _v in tv_parts:
        flag = flag.at[r4].set(1)
    flag = flag.at[nb].set(0)
    pos = jnp.cumsum(flag) - flag                  # exclusive
    n_touched = pos[-1] + flag[-1]
    live = (flag == 1) & (pos < K)
    slot = jnp.where(live, pos, K)                 # dense row -> slot
    uniq_rows = jnp.full((K + 1,), nb, jnp.int32).at[
        jnp.where(live, pos, K)
    ].set(jnp.arange(nb + 1, dtype=jnp.int32))[:K]  # ascending
    overflow = jnp.maximum(n_touched - K, 0) / jnp.maximum(
        n_touched, 1
    )

    # ---- segment-sum all gradient blocks into the slot space -------
    if blocks_r is not None:
        acc = jnp.zeros(
            (K + 1, B + 1, 8, 192), jnp.float32
        ).at[slot[rows_r]].add(blocks_r)
    else:
        acc = jnp.zeros(
            (K + 1, B + 1, 8, 192), jnp.float32
        ).at[slot[rows_r]].add(
            gp_blocks.reshape(-1, B + 1, 8, 192).astype(jnp.float32)
        )
        # TV joins as FULL packed blocks in one row scatter: an
        # axis-1-sliced scatter-add (acc.at[slot, :B].add) lowers
        # element-serial on TPU — it measured ~70 ms/step at 512^3
        # (2452 TV rows) where this full-block scatter is ~1 ms
        tv_rows_l, tv_blocks_l = pack_tv_blocks(tv_parts, B)
        for r4, blk in zip(tv_rows_l, tv_blocks_l):
            acc = acc.at[slot[r4]].add(blk)
    acc = acc[:K]

    # ---- lazy-exact optimizer on the touched rows ------------------
    cm = jnp.concatenate(
        [bg.cell_mask, jnp.zeros_like(bg.cell_mask[:1])]
    )[uniq_rows].astype(jnp.float32)               # [K, 512]
    mp = jnp.repeat(cm.reshape(K, 8, 64), 3, axis=-1)[:, None]

    lr_sigma = trainer.lr_sigma_fn(fstep)
    lr_sh = trainer.lr_sh_fn(fstep)
    slot_ax = jnp.arange(B + 1)
    lr_vec = jnp.where(
        slot_ax == B, lr_sigma, lr_sh
    )[None, :, None, None]

    g = acc * mp
    pk_rows = st.packed_k[uniq_rows]
    if trainer.sigma_optim == "rmsprop":
        b = trainer.rms_beta
        rms_old = st.rms[uniq_rows].astype(jnp.float32)
        if getattr(trainer, "rms_pervisit", False):
            # per-visit decay, PER COEFFICIENT: rms decays only where
            # this step produced a gradient — the reference's sparse
            # indexer semantics (rmsprop_index_step_kernel updates only
            # touched indices; optim_kernel.cu:16-25). Row-level
            # beta^delta would still collapse the rms of a cell whose
            # brick is touched often but whose own gradient is rare.
            # First-visit bootstrap (optim_kernel.cu:21 `rms == 0 ?
            # SQR(grad) : lerp`): the first update is bounded by lr,
            # not lr/sqrt(1-beta).
            rms_rows = jnp.where(
                g == 0.0, rms_old,
                jnp.where(rms_old == 0.0, g * g,
                          b * rms_old + (1.0 - b) * g * g),
            )
        else:
            delta = (
                step - st.last_step[uniq_rows]
            ).astype(jnp.float32)
            decay = jnp.power(b, delta)[:, None, None, None]
            rms_rows = jnp.where(
                rms_old == 0.0, g * g,
                decay * rms_old + (1.0 - b) * g * g,
            )
        upd = lr_vec * g / (jnp.sqrt(rms_rows) + 1e-8)
    else:
        rms_rows = st.rms[uniq_rows].astype(jnp.float32)
        upd = lr_vec * g
    new = pk_rows - upd
    if trainer.density_minval > -1e8:
        new = jnp.where(
            slot_ax[None, :, None, None] == B,
            jnp.maximum(new, trainer.density_minval), new,
        )
    new = new * mp  # empty slots carry row nb -> stay exactly zero

    new_st = PackedState(
        packed_k=st.packed_k.at[uniq_rows].set(new),
        rms=st.rms.at[uniq_rows].set(rms_rows.astype(st.rms.dtype)),
        last_step=st.last_step.at[uniq_rows].set(step).at[nb].set(-1),
    )
    psnr = -10.0 * jnp.log(mse) / jnp.log(10.0)
    return new_st, {
        "loss": mse, "mse": mse, "psnr": psnr,
        "window_miss": aux["window_miss"],
        "touched_overflow": overflow,
        "dropped_tile_rows": dropped_tile,
        "dropped_active_chunks": aux["dropped_active_chunks"],
    }


@functools.partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=(
        "max_touched", "use_occupancy", "compact_chunks", "n_chunks",
        "wps", "tile_rows", "skip_empty", "flat_windows",
        "dense_optim",
    ),
    donate_argnums=(2,),
)
def train_step_tiles_packed_touched_jit(
    trainer, bg, st, rays, target, step, key, *,
    max_touched=12288, use_occupancy=False, compact_chunks=None,
    n_chunks=None, wps=1, tile_rows=None, skip_empty=True,
    flat_windows=None, dense_optim=False,
):
    return train_step_tiles_packed_touched(
        trainer, bg, st, rays, target, step, key,
        max_touched=max_touched, use_occupancy=use_occupancy,
        compact_chunks=compact_chunks, n_chunks=n_chunks,
        wps=wps, tile_rows=tile_rows, skip_empty=skip_empty,
        flat_windows=flat_windows, dense_optim=dense_optim,
    )


def train_step_tiles_dense_k(
    trainer,
    bg: BrickGrid,
    st: SparseBrickState,
    rays: Rays,
    target: jnp.ndarray,
    step: jnp.ndarray,
    key: jax.Array,
    *,
    use_occupancy: bool = False,
    compact_chunks: Optional[int] = None,
    n_chunks: Optional[int] = None,
):
    """Dense-update train step on KERNEL-LAYOUT state — the fast dense
    path. Same semantics as `PlenoxelsTrainer.train_step_tiles_pallas`
    (fused kernels + sampled TV + dense RMSprop over every cell), but
    the trainable masters live in the march's kernel layout, so the
    two O(grid) relayouts of the brick-layout step (bf16 kernel-array
    build before the march, gradient layout conversion after the
    scatter — 29 ms of the 107 ms step at 256^3/40 tiles) do not exist:
    the march reads the masters directly and the backward kernel's
    blocks scatter straight into state-shaped accumulators.

    `st` must have density_z/sh_z None (shared kernel arrays). Use
    sparse_state_from_grid(bg, shared_kernel_arrays=True) /
    grid_from_sparse_state for the boundary conversions; rms dtype
    follows the state. `step` is an int32/float scalar.
    """
    if trainer.lambda_l2_sh > 0 or trainer.lambda_tv_lumisphere > 0:
        raise ValueError(
            "kernel-layout step does not support lambda_l2_sh / "
            "lambda_tv_lumisphere; use train_step_tiles_pallas"
        )
    nb, B = bg.n_bricks, st.basis_dim
    fstep = step.astype(jnp.float32)

    rgb, gd_blocks, gsh_blocks, rows, aux = fused_grad_blocks(
        bg, rays, target, trainer.opts,
        beta_loss=trainer.lambda_beta,
        sparsity_loss=trainer.lambda_sparsity,
        use_occupancy=use_occupancy,
        kernel_arrays=(st.density_k, st.sh_k),
        grad_dtype=trainer.grad_block_dtype,
        compact_chunks=compact_chunks,
        n_chunks=n_chunks,
    )
    mse = jnp.mean((rgb - target) ** 2)

    flat_rows = rows.reshape(-1)
    acc_d = jnp.zeros((nb + 1, 8, 64), jnp.float32).at[flat_rows].add(
        gd_blocks.reshape(-1, 8, 64).astype(jnp.float32)
    )
    acc_sh = jnp.zeros(
        (nb + 1, B, 8, 192), jnp.float32
    ).at[flat_rows].add(
        gsh_blocks.reshape(-1, B, 8, 192).astype(jnp.float32)
    )

    # sampled TV in block form, scattered into the same accumulators
    k_tv, k_sh = jax.random.split(key)
    if trainer.lambda_tv > 0:
        w = max(int(trainer.tv_sparsity * nb), 1)
        srows = sample_brick_window(k_tv, nb, w)
        r4, v4 = tv_grad_brick_blocks(
            bg, lambda r: st.density_k[r].reshape(-1, 512, 1), srows,
            scale=trainer.lambda_tv, ignore_edge=False,
        )
        r4 = jnp.where(r4 < 0, nb, r4)
        acc_d = acc_d.at[r4].add(v4[..., 0].reshape(-1, 8, 64))
    if trainer.lambda_tv_sh > 0:
        w = max(int(trainer.tv_sh_sparsity * nb), 1)
        srows = sample_brick_window(k_sh, nb, w)
        r4, v4 = tv_grad_brick_blocks(
            bg, lambda r: kernel_layout_to_sh(st.sh_k[r], B), srows,
            scale=trainer.lambda_tv_sh, ignore_edge=True,
        )
        r4 = jnp.where(r4 < 0, nb, r4)
        acc_sh = acc_sh.at[r4].add(sh_to_kernel_layout(v4, B))

    # cell mask in kernel layout (fused into the update sweeps)
    md = bg.cell_mask.astype(jnp.float32).reshape(nb, 8, 64)
    md = jnp.concatenate([md, jnp.zeros_like(md[:1])])
    msh = jnp.concatenate(
        [bg.cell_mask, jnp.zeros_like(bg.cell_mask[:1])]
    ).astype(jnp.float32).reshape(nb + 1, 1, 8, 8, 8, 1)
    msh = jnp.broadcast_to(
        msh, (nb + 1, B, 8, 8, 8, 3)
    ).reshape(nb + 1, B, 8, 192)

    lr_sigma = trainer.lr_sigma_fn(fstep)
    lr_sh = trainer.lr_sh_fn(fstep)
    new_d, rms_d = _finalize_rms(
        trainer, trainer.sigma_optim, st.density_k, acc_d * md,
        st.rms_density.astype(jnp.float32), trainer.rms_beta,
        lr_sigma, minval=trainer.density_minval,
    )
    new_d = new_d * md
    new_s, rms_s = _finalize_rms(
        trainer, trainer.sh_optim, st.sh_k, acc_sh * msh,
        st.rms_sh.astype(jnp.float32), trainer.rms_beta, lr_sh,
    )
    new_s = new_s * msh

    new_st = SparseBrickState(
        density_k=new_d,
        sh_k=new_s,
        density_z=None,
        sh_z=None,
        rms_density=rms_d.astype(st.rms_density.dtype),
        rms_sh=rms_s.astype(st.rms_sh.dtype),
        last_step=st.last_step,
    )
    psnr = -10.0 * jnp.log(mse) / jnp.log(10.0)
    return new_st, {
        "loss": mse, "mse": mse, "psnr": psnr,
        "window_miss": aux["window_miss"],
    }


@functools.partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=("use_occupancy", "compact_chunks", "n_chunks"),
    donate_argnums=(2,),
)
def train_step_tiles_dense_k_jit(
    trainer, bg, st, rays, target, step, key, *,
    use_occupancy=False, compact_chunks=None, n_chunks=None,
):
    return train_step_tiles_dense_k(
        trainer, bg, st, rays, target, step, key,
        use_occupancy=use_occupancy, compact_chunks=compact_chunks,
        n_chunks=n_chunks,
    )


@functools.partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=(
        "max_touched", "use_occupancy", "compact_chunks", "n_chunks",
    ),
    donate_argnums=(2,),
)
def train_step_tiles_sparse_jit(
    trainer, bg, st, rays, target, step, key, *,
    max_touched=None, use_occupancy=False, compact_chunks=None,
    n_chunks=None,
):
    return train_step_tiles_sparse(
        trainer, bg, st, rays, target, step, key,
        max_touched=max_touched, use_occupancy=use_occupancy,
        compact_chunks=compact_chunks, n_chunks=n_chunks,
    )
