"""Train-step throughput on a 512^3 SHELL grid (the real-scene regime:
surface-topology occupancy at the reference's post-upsample resolution,
where O(grid) per-step costs bite — reference opt.py:855-887 trains its
standard config through exactly this scale).

Lead variant: the touched-row packed step (ONE f32 packed master
3.8 GB + bf16 rms 1.9 GB; the march reads the packed masters directly,
the optimizer touches only this step's rows) with UNROLL steps fused
into one jitted chain. A lax.scan over the 5.7 GB carry double-buffers
it (HLO temp 11 GB -> OOM at this scale); an unrolled chain is pure
dataflow, so donation aliases the state straight through. Host-side
the chains are dispatched asynchronously with ONE trailing readback
(the axon relay's ~20 ms dispatch cost overlaps device execution).

RUN_LEGACY=1 adds the historical comparison variants (multi-array
sparse state, dense-update packed scan).
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench as B
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.ops.pallas.tile_march import sh_to_kernel_layout
from nerf_projects_tpu.train import plenoxels_sparse as ps
from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

RESO = int(os.environ.get("RESO", 512))
TILES = int(os.environ.get("TILES", 64))  # 8192-ray ship batch (t128 also fits; see README)
MAX_TOUCHED = int(os.environ.get("MAX_TOUCHED", 8192))
# UNROLL=1: the 5.7 GB state cannot afford the extra aliasing copies
# XLA materializes across a longer chain (unroll-4 measured
# RESOURCE_EXHAUSTED); async dispatch + donation already overlaps the
# ~20 ms relay dispatch with device execution
UNROLL = int(os.environ.get("UNROLL", 1))
WPS = int(os.environ.get("WPS", 4))
TRED = int(os.environ.get("TRED", 1))

from dataclasses import replace

# build at bf16 (the fp32 full-sphere intermediate OOMs at 512^3),
# upcast the small filtered shell to f32 for training
_bg16 = B._shell_setup(RESO, dtype=jnp.bfloat16)
bg = replace(
    _bg16,
    density_bricks=_bg16.density_bricks.astype(jnp.float32),
    sh_bricks=_bg16.sh_bricks.astype(jnp.float32),
)
del _bg16
print(json.dumps({"nb": int(bg.n_bricks)}), flush=True)
rays = B._tile_rays(jax.random.PRNGKey(2), TILES)
target = jnp.full(rays.origins.shape[:2] + (3,), 0.4)
opts = GridRenderOptions(step_size=0.5)
# NOTV=1: both TV terms off; NOTV=2: SH TV off (density TV on)
NOTV = int(os.environ.get("NOTV", 0))
trainer = PlenoxelsTrainer(
    opts, n_iters=128_000,
    lambda_tv=0.0 if NOTV == 1 else 1e-5,
    lambda_tv_sh=0.0 if NOTV else 1e-3,
    bf16_grad_blocks=True,
)


def slope(fn, lo=2, hi=8):
    fn(lo); fn(hi)
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); fn(lo); t1 = time.perf_counter()
        fn(hi); t2 = time.perf_counter()
        s_ = ((t2 - t1) - (t1 - t0)) / (hi - lo)
        if s_ > 0:
            best = s_ if best is None else min(best, s_)
    return best


from nerf_projects_tpu.ops.pallas.tile_march import (
    geometry_only,
    required_chunks,
)

geom = geometry_only(bg)
CK = required_chunks(geom, rays, opts, use_occupancy=True)
nb, B_ = bg.n_bricks, bg.basis_dim
# FLAT=1: flat active-window plan (no batch-max chunk padding) —
# the exact window count for the fixed bench rays
FLAT = int(os.environ.get("FLAT", 1))
flat_w = 0
if FLAT:
    from nerf_projects_tpu.ops.pallas.flat_train import (
        required_windows,
    )

    flat_w = required_windows(geom, rays, opts)
    # exact touched-row bound: the K-sized step buffers (grad
    # accumulator + gathered masters/rms, ~60 KB/row at B=9) scale
    # linearly with K — the oversized 8192 default OOMs the flat
    # path at 512^3
    if not os.environ.get("MAX_TOUCHED"):
        tv_w = max(int(trainer.tv_sparsity * nb), 1) + max(
            int(trainer.tv_sh_sparsity * nb), 1)
        MAX_TOUCHED = ps.required_touched_rows(
            geom, rays, opts, tv_rows=4 * tv_w)
        print(json.dumps({"max_touched_exact": MAX_TOUCHED}),
              flush=True)
k_tile = (
    ps.required_tile_rows(geom, rays, opts, use_occupancy=True,
                          compact_chunks=CK)
    if TRED and not flat_w else None
)
print(json.dumps({"compact_chunks": CK, "tile_rows": k_tile,
                  "flat_windows": flat_w}), flush=True)

# ---- touched-row packed step, unrolled chain (the ship mode) --------
try:
    # fused low-peak build (the eager relayout chain OOMed at 512^3)
    st_t = ps.packed_state_from_grid(bg, rms_dtype=jnp.bfloat16)
    bg = replace(
        bg,
        density_bricks=jnp.zeros((nb, 1), jnp.float32),
        sh_bricks=jnp.zeros((nb, 1, 1), jnp.float32),
    )

    def one_step(st, i, key):
        if flat_w:
            return ps.train_step_tiles_packed_touched(
                trainer, geom, st, rays, target, i, key,
                max_touched=MAX_TOUCHED, flat_windows=flat_w)
        return ps.train_step_tiles_packed_touched(
            trainer, geom, st, rays, target, i, key,
            max_touched=MAX_TOUCHED, compact_chunks=CK,
            use_occupancy=True, wps=WPS, tile_rows=k_tile)

    # SCAN=1: fold the step chain into ONE device program
    # (lax.scan carry = donated state; no per-step relay dispatch —
    # r3l measured a ~20 ms/step dispatch floor on the axon tunnel)
    SCAN = int(os.environ.get("SCAN", 0))

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def chain(u, st, i0, key):
        if SCAN:
            def body(st, j):
                st, stats = one_step(
                    st, i0 + j, jax.random.fold_in(key, j))
                return st, (stats["mse"],
                            stats["touched_overflow"]
                            + stats["dropped_tile_rows"].astype(
                                jnp.float32))
            st, (mses, ovfs) = jax.lax.scan(
                body, st, jnp.arange(u, dtype=jnp.int32))
            return st, mses[-1], jnp.max(ovfs)
        ovf = jnp.zeros(())
        stats = None
        for j in range(u):
            st, stats = one_step(
                st, i0 + jnp.int32(j), jax.random.fold_in(key, j))
            ovf = jnp.maximum(
                ovf,
                stats["touched_overflow"]
                + stats["dropped_tile_rows"].astype(jnp.float32),
            )
        return st, stats["mse"], ovf

    sht = {"st": st_t, "i": 0}
    del st_t
    ovf_seen = {"max": 0.0}

    def run_touched(k):
        st = sht["st"]
        mse = ovf = None
        for i in range(k):
            st, mse, ovf = chain(
                UNROLL, st, jnp.int32(sht["i"]),
                jax.random.PRNGKey(sht["i"]))
            sht["i"] += UNROLL
        ovf_seen["max"] = max(ovf_seen["max"], float(ovf))
        _ = float(mse)
        sht["st"] = st

    ms_chain = slope(run_touched) * 1e3
    ms = ms_chain / UNROLL
    print(json.dumps({
        "variant": "touched_unroll", "ms": round(ms, 2),
        "rays_per_s": round(TILES * 128 / ms * 1e3),
        "tiles": TILES, "max_touched": MAX_TOUCHED, "unroll": UNROLL,
        "wps": WPS, "tile_rows": k_tile,
        "overflow": round(ovf_seen["max"], 5)}), flush=True)
    del sht
except Exception as exc:
    print(json.dumps({"variant": "touched_unroll",
                      "error": f"{type(exc).__name__}: {exc}"[:300]}),
          flush=True)

if os.environ.get("RUN_LEGACY", "") != "1":
    sys.exit(0)

# ---- legacy comparison variants (historical; OOM-prone at 512^3) ----
jax.clear_caches()

try:
    st0 = ps.SparseBrickState(
        density_k=jnp.zeros((nb + 1, 8, 64), jnp.float32),
        sh_k=jnp.zeros((nb + 1, B_, 8, 192), jnp.float32),
        density_z=None,
        sh_z=None,
        rms_density=jnp.zeros((nb + 1, 8, 64), jnp.bfloat16),
        rms_sh=jnp.zeros((nb + 1, B_, 8, 192), jnp.bfloat16),
        last_step=jnp.full((nb + 1,), -1, jnp.int32),
    )
    sh = {"st": st0}
    del st0

    def run_sparse(k):
        st = sh["st"]
        stats = None
        for i in range(k):
            st, stats = ps.train_step_tiles_sparse_jit(
                trainer, geom, st, rays, target,
                jnp.asarray(i, jnp.int32), jax.random.PRNGKey(i),
                compact_chunks=CK, max_touched=MAX_TOUCHED)
        _ = float(stats["mse"])
        sh["st"] = st

    ms = slope(run_sparse) * 1e3
    print(json.dumps({"variant": "sparse_compact", "ms": round(ms, 2),
                      "rays_per_s": round(TILES * 128 / ms * 1e3),
                      "tiles": TILES,
                      "note": "multi-array state, per-step dispatch"}),
          flush=True)
    del sh
except Exception as exc:
    print(json.dumps({"variant": "sparse_compact",
                      "error": f"{type(exc).__name__}: {exc}"[:300]}),
          flush=True)
