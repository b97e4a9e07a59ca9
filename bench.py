"""Benchmark suite: per-chip throughput of every method family.

Workloads (one JSON line each; the driver records them all):
  1. nerf_train        — flagship hierarchical NeRF train step
                         (ship config: 1024 rays, 96+192, 8x256, bf16,
                         fused Pallas MLP). Baseline: the reference's
                         executed-notebook ~6,800 rays/s (BASELINE.md).
  2. plenoxels_train   — fused Pallas tile-march train step (256^3
                         sphere grid, 40x128=5120 rays ~ reference batch
                         5000, RMSprop + sampled TV). No recorded
                         reference throughput exists in the repo
                         (vs_baseline null; anchor note included).
  3. grid_render_fps   — 800x800 frame through the Pallas march at
                         512^3 (the reference's post-upsample reso).
  4. nerf_sh_train     — NeRF-SH trainer step (1024 rays, 64+128,
                         trunk-fused). Reference logged rays/sec only as
                         unstored TB scalars (vs_baseline null).

Timing: slope fit between two scan lengths, one float() readback each —
the only trustworthy methodology through the axon relay (the backend's
block_until_ready returns early; NOTES_ROUND1.md).

Harness (default full run): TWO PASSES over all workloads — pass 1
emits a provisional row for EVERY metric in BENCH_CHEAP mode
(~1-3 min each, "provisional": true), pass 2 re-runs in value order
with the remaining budget emitting precise rows that supersede them.
An external kill at any point costs precision, never coverage. All
rows are also appended to measurements/bench_out.jsonl (BENCH_SINK).

Env: BENCH_WORKLOADS=comma,list to subset (explicit subsets run
single-pass precise); BENCH_TWO_PASS=0 to disable pass 1;
BENCH_TOTAL_BUDGET_SECS (default 1500) global wall budget.
"""
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_NERF_RAYS_PER_S = 6800.0  # reference ship config (BASELINE.md)

# persistent compile cache: XLA graph compiles through the axon remote
# helper take minutes; cached reruns return in seconds. NOT under
# pytest: the cache holds executables compiled by the remote helper
# (a different machine — its AOT results load with machine-feature
# mismatch warnings), and the CPU test suite segfaulted once inside
# backend_compile_and_load after test_graft's bench import enabled the
# cache for the rest of the in-process session.
try:
    if "pytest" not in sys.modules:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

# BENCH_SMOKE=1: tiny shapes + Pallas interpret mode — validates the
# workload wiring on CPU (numbers meaningless).
SMOKE = os.environ.get("BENCH_SMOKE", "") == "1"

# BENCH_CHEAP=1: pass-1 "provisional" mode — real shapes and kernels
# but minimal step counts/repeats, so EVERY workload emits a usable
# number in ~1-3 min. The two-pass harness (see main) runs all
# workloads cheap first, then refines in value order: a driver kill at
# any point costs precision, never coverage (VERDICT r4 item 1 — three
# consecutive rounds died at rc=124 with workloads still queued).
CHEAP = os.environ.get("BENCH_CHEAP", "") == "1"

# Every emitted metric line is also appended to BENCH_SINK (default
# measurements/bench_out.jsonl, repo-committed by the end-of-round
# driver commit) — a second channel in case the driver's stdout tail
# truncates older lines.
_SINK = os.environ.get(
    "BENCH_SINK",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "measurements", "bench_out.jsonl"),
)

N_RAND = 256 if SMOKE else int(os.environ.get("BENCH_NERF_BATCH", 1024))
N_SAMPLES = 8 if SMOKE else 96
N_IMPORTANCE = 16 if SMOKE else 192

if SMOKE:
    import nerf_projects_tpu.ops.pallas.fused_mlp as _fm
    import nerf_projects_tpu.ops.pallas.fused_sh_mlp as _fsh
    import nerf_projects_tpu.ops.pallas.fused_train as _ftr
    import nerf_projects_tpu.ops.pallas.tile_march as _tm

    jax.config.update("jax_platforms", "cpu")
    _tm.INTERPRET = True
    _fm.INTERPRET = True
    _fsh.INTERPRET = True
    _ftr.INTERPRET = True


def emit(metric, value, unit, vs_baseline=None, **extra):
    rec = {
        "metric": metric,
        "value": round(float(value), 2),
        "unit": unit,
        "vs_baseline": (
            round(float(vs_baseline), 2) if vs_baseline is not None else None
        ),
    }
    if CHEAP:
        # pass-1 row: minimal-repeat timing; a later precise row for the
        # same metric supersedes it
        rec["provisional"] = True
    rec.update(extra)
    line = json.dumps(rec)
    print(line, flush=True)
    _sink_write(line)


def _sink_write(line):
    if not _SINK:
        return
    try:
        os.makedirs(os.path.dirname(_SINK), exist_ok=True)
        with open(_SINK, "a") as f:
            f.write(line + "\n")
    except OSError:
        pass


def slope_timed(run, lo=10, hi=60, repeats=3):
    """run(k) executes k steps ending in a host readback."""
    if SMOKE:
        lo, hi, repeats = 1, 2, 1
    elif CHEAP:
        # keep lo/hi (the scan lengths are STATIC program parameters):
        # cheap runs then compile the SAME programs as the precise
        # pass, so pass 1 and pass 2 share compile-cache entries. The
        # first two-pass hardware run proved the alternative wrong —
        # reduced lo/hi meant every pass-1 workload compiled cold
        # through the axon relay and timed out at its cap
        # (measurements/r5/bench_full_r5.log pass1 rows).
        repeats = 1
    run(lo)
    run(hi)
    slopes = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(lo)
        t1 = time.perf_counter()
        run(hi)
        t2 = time.perf_counter()
        s = ((t2 - t1) - (t1 - t0)) / (hi - lo)
        if s > 0:
            slopes.append(s)
    return min(slopes)


# ---------------------------------------------------------------------------
def bench_nerf_train():
    from nerf_projects_tpu.data.synthetic import make_dataset
    from nerf_projects_tpu.models.pipeline import NeRFRenderConfig
    from nerf_projects_tpu.train.nerf_trainer import NeRFTrainer

    cfg = NeRFRenderConfig(
        num_coarse_samples=N_SAMPLES,
        num_fine_samples=N_IMPORTANCE,
        multires=10,
        multires_views=4,
        use_viewdirs=True,
        white_bkgd=True,
        perturb=True,
        raw_noise_std=0.0,
        # sort-free hierarchical resample (order-statistics uniforms +
        # merge; distribution-identical, kills the [N, 288] sort from
        # the mega step's XLA glue). Hardware A/B: the merge LOSES 9%
        # (63.7k vs 69.5-70.1k rays/s, reproducible) — the rank-count
        # merge's searchsorted glue costs more than XLA's sort at this
        # shape, so the sort ships. BENCH_NERF_MERGE=1 opts in.
        resample_sorted=os.environ.get("BENCH_NERF_MERGE", "0") == "1",
    )
    trainer = NeRFTrainer(
        cfg, depth=8, width=256, near=2.0, far=6.0,
        compute_dtype=jnp.bfloat16, use_fused_mlp=True,
        use_mega=os.environ.get("BENCH_NO_MEGA", "") != "1",
        mega_rc=int(os.environ.get("BENCH_MEGA_RC", 8)),
        mega_rf=int(os.environ.get("BENCH_MEGA_RF", 4)),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    ds = make_dataset(n_views=2, image_size=128)
    pool_rays, pool_rgb = ds["rays"], ds["pixels"]

    holder = {"state": state}

    def make_run(bs):
        def run(k):
            st, stats = trainer.scan_steps(
                holder["state"], pool_rays, pool_rgb, k, batch_size=bs
            )
            _ = float(stats["loss"][-1])
            holder["state"] = st
        return run

    # primary: the reference's ship batch (1024); secondary: the
    # per-chip peak at batch 2048 (fixed step costs amortize; 4096
    # measured slower)
    per_step = slope_timed(make_run(N_RAND))
    rays = N_RAND / per_step
    emit(
        "nerf_train_rays_per_sec_per_chip", rays, "rays/s",
        vs_baseline=rays / BASELINE_NERF_RAYS_PER_S, batch=N_RAND,
    )
    if not SMOKE and not CHEAP and N_RAND == 1024:
        per_step2 = slope_timed(make_run(2048))
        rays2 = 2048 / per_step2
        emit(
            "nerf_train_rays_per_sec_peak", rays2, "rays/s",
            vs_baseline=rays2 / BASELINE_NERF_RAYS_PER_S, batch=2048,
        )


# ---------------------------------------------------------------------------
def _plenoxels_setup(reso, dtype=jnp.float32):
    from dataclasses import replace

    from nerf_projects_tpu.ops.brick_grid import create_brick_grid

    # direct on-device construction: SparseGrid.create at 512^3 builds
    # multi-GB host arrays and times out through the TPU relay.
    # dtype=bf16 for render-only workloads: fp32 masters at 512^3 peak
    # ~16 GB during random init (HBM edge); bf16 halves it.
    bg = create_brick_grid(reso, basis_dim=9, use_sphere_bound=True,
                           init_density=0.0, data_dtype=dtype)
    dens = (
        jax.random.uniform(
            jax.random.PRNGKey(0), bg.density_bricks.shape, dtype
        ) * 2.0 * bg.cell_mask
    ).astype(dtype)
    bg = replace(bg, density_bricks=dens)
    del dens
    sh = (
        jax.random.normal(
            jax.random.PRNGKey(1), bg.sh_bricks.shape, dtype
        ) * 0.2 * bg.cell_mask[..., None]
    ).astype(dtype)
    return replace(bg, sh_bricks=sh)


def _tile_rays(key, n_tiles, radius=3.0, focal_px=800.0, tile_shape=(8, 16)):
    from nerf_projects_tpu.core.rays import Rays

    ks = jax.random.split(key, 2)
    u = jax.random.normal(ks[0], (n_tiles, 3))
    cam = radius * u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    fwd = -cam / radius
    up = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (n_tiles, 1))
    right = jnp.cross(fwd, up)
    right = right / jnp.maximum(
        jnp.linalg.norm(right, axis=-1, keepdims=True), 1e-6
    )
    up2 = jnp.cross(right, fwd)
    ii, jj = jnp.meshgrid(
        jnp.arange(float(tile_shape[0])),
        jnp.arange(float(tile_shape[1])),
        indexing="ij",
    )
    base = jax.random.uniform(ks[1], (n_tiles, 2), minval=-300, maxval=300)
    px = base[:, 0:1] + jj.reshape(-1)[None]
    py = base[:, 1:2] + ii.reshape(-1)[None]
    d = (
        fwd[:, None, :]
        + (px / focal_px)[..., None] * right[:, None, :]
        + (py / focal_px)[..., None] * up2[:, None, :]
    )
    dn = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam[:, None, :], dn.shape)
    return Rays(o, dn, dn)


def bench_plenoxels_train(reso=256, tiles=40, shell=False):
    """Plenoxels train step, slope-fit over scan-wrapped steps.

    Two scene regimes, two metrics:
      dense (default)          — every brick active, ~half the grid
        touched per 5120-ray step: the worst case. Dense-update
        `packed` wins here (hardware A/B: packed 81.6k > brick 63.9k
        > sparse 63.5k > touched 59.9k rays/s — O(touched) degenerates
        to O(grid) plus gather overhead when touched ~ grid/2).
      shell (plenoxels_train_shell) — surface-topology occupancy, the
        real-scene regime (reference scenes train like this): a step
        touches a few thousand rows, where the touched-row step's
        O(touched) optimizer pays.

    BENCH_PLEN_STEP overrides the per-regime default (brick / packed /
    sparse / touched — all parity-tested in tests/test_sparse_step.py).
    """
    if SMOKE:
        reso, tiles = 32, 2
    from nerf_projects_tpu.ops.grid import GridRenderOptions
    from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

    import functools

    mode = os.environ.get(
        "BENCH_PLEN_STEP", "touched" if shell else "packed"
    )
    bg = _shell_setup(reso, dtype=jnp.float32) if shell \
        else _plenoxels_setup(reso)
    trainer = PlenoxelsTrainer(
        GridRenderOptions(step_size=0.5), n_iters=128_000,
        lambda_tv=1e-5, lambda_tv_sh=1e-3,
        # per-visit rms = the ship semantics (the reference's sparse
        # indexer, optim_kernel.cu:16-25; CLI default since round 3)
        rms_pervisit=True,
        # bf16_grad_blocks measured +6% in a same-process A/B but the
        # delta does not reproduce above cross-process relay jitter;
        # keep the reference-faithful f32 accumulation as the default
    )
    rays = _tile_rays(jax.random.PRNGKey(2), tiles)
    target = jnp.full(rays.origins.shape[:2] + (3,), 0.4)

    # scan-wrapped steps: per-dispatch host cost (~15-30 ms through the
    # relay) would otherwise swamp the step time
    if mode == "brick":
        rms = trainer.init_rms_bricks(bg)

        @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
        def scan_steps(k, st, key):
            def body(carry, i):
                b, r = carry
                b, r, stats = trainer.train_step_tiles_pallas(
                    b, r, rays, target, i,
                    jax.random.fold_in(key, i.astype(jnp.int32)),
                )
                return (b, r), stats["mse"]

            return jax.lax.scan(
                body, st, jnp.arange(k, dtype=jnp.float32)
            )

        holder = {"st": (bg, rms)}
    else:
        from nerf_projects_tpu.ops.pallas.tile_march import (
            required_chunks,
        )
        from nerf_projects_tpu.train import plenoxels_sparse as ps

        geom = bg
        # exact per-batch chunk bound — a no-op on the dense scene
        # (all 56 planned chunks active) but the big lever on the
        # shell, where most planned chunks cross empty space
        ck = required_chunks(
            bg, rays, GridRenderOptions(step_size=0.5),
            use_occupancy=shell,
        )
        print(json.dumps({"compact_chunks": ck}), flush=True)
        # BENCH_PLEN_RMS=bf16: halve the rms accumulator's share of the
        # O(grid) optimizer sweep's HBM traffic (the dense-mode floor);
        # the steps read/write rms through f32 casts either way
        rms_dt = (
            jnp.bfloat16
            if os.environ.get("BENCH_PLEN_RMS", "") == "bf16"
            else jnp.float32
        )
        if mode == "packed":
            st0 = ps.packed_state_from_grid(bg, rms_dtype=rms_dt)
            wps_d = int(os.environ.get("BENCH_PLEN_WPS", 4))

            def step(st, i, key):
                return ps.train_step_tiles_packed(
                    trainer, geom, st, rays, target, i, key,
                    compact_chunks=ck, wps=wps_d,
                )
        elif mode == "touched":
            st0 = ps.packed_state_from_grid(bg, rms_dtype=rms_dt)

            # exact touched-row bound for the fixed bench batch
            # (marched corner bricks + worst-case sampled-TV rows) —
            # the K-sized step buffers (grad accumulator, gathered
            # masters/rms) scale linearly with it
            tv_w = max(int(trainer.tv_sparsity * bg.n_bricks), 1) + max(
                int(trainer.tv_sh_sparsity * bg.n_bricks), 1
            )
            k_exact = ps.required_touched_rows(
                bg, rays, GridRenderOptions(step_size=0.5),
                tv_rows=4 * tv_w, use_occupancy=shell,
            )
            k_cap = int(os.environ.get("BENCH_PLEN_TOUCHED", k_exact))
            print(json.dumps(
                {"max_touched": k_cap, "exact_bound": k_exact}
            ), flush=True)
            # ship config: multi-window kernel steps (wps) + MXU
            # per-tile block pre-reduction before the global
            # scatter-add; both bit-parity-tested vs the plain step
            # (tests/test_sparse_step.py). BENCH_PLEN_WPS=1 /
            # BENCH_PLEN_TRED=0 fall back. BENCH_PLEN_FLAT=1 marches
            # the FLAT active-window plan instead (no batch-max
            # padding; parity-tested) — the bench rays are fixed so
            # required_windows is exact.
            # flat ships for the shell scene: hardware A/B measured
            # flat 29.1 ms vs wps4+tred 58.6 ms at the exact touched
            # bound (bisect r3s/r3t); the dense scene keeps the padded
            # plan (every window active -> flat buys nothing).
            flat_w = 0
            if int(os.environ.get("BENCH_PLEN_FLAT", 1 if shell else 0)):
                from nerf_projects_tpu.ops.pallas.flat_train import (
                    required_windows,
                )

                flat_w = required_windows(
                    bg, rays, GridRenderOptions(step_size=0.5)
                )
                print(json.dumps({"flat_windows": flat_w}),
                      flush=True)
            wps = int(os.environ.get("BENCH_PLEN_WPS", 4))
            if not flat_w and int(os.environ.get("BENCH_PLEN_TRED", 1)):
                k_tile = ps.required_tile_rows(
                    bg, rays, GridRenderOptions(step_size=0.5),
                    use_occupancy=shell, compact_chunks=ck,
                )
                print(json.dumps({"tile_rows": k_tile}), flush=True)
            else:
                k_tile = None

            # dense-sweep optimizer (round-4 tail bisect: the XLA
            # K-row gather/scatter path costs ~5.5 us PER ROW; the
            # dense where(g==0) sweep is pure bandwidth and exact
            # under per-visit rms). BENCH_PLEN_DOPT=0 falls back.
            dopt = bool(int(os.environ.get(
                "BENCH_PLEN_DOPT", 1 if shell else 0
            )))
            if dopt:
                mode = mode + "+dense_optim"

            def step(st, i, key):
                if flat_w:
                    return ps.train_step_tiles_packed_touched(
                        trainer, geom, st, rays, target, i, key,
                        max_touched=k_cap, flat_windows=flat_w,
                        dense_optim=dopt,
                    )
                return ps.train_step_tiles_packed_touched(
                    trainer, geom, st, rays, target, i, key,
                    max_touched=k_cap, compact_chunks=ck,
                    wps=wps, tile_rows=k_tile,
                )
        else:
            st0 = ps.sparse_state_from_grid(
                bg, shared_kernel_arrays=True
            )

            def step(st, i, key):
                return ps.train_step_tiles_sparse(
                    trainer, geom, st, rays, target, i, key,
                    max_touched=None, compact_chunks=ck,
                )

        @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
        def scan_steps(k, st, key):
            def body(st, i):
                st, stats = step(
                    st, i, jax.random.fold_in(key, i)
                )
                return st, (
                    stats["mse"],
                    stats.get("touched_overflow", jnp.zeros(()))
                    + stats.get(
                        "dropped_tile_rows", jnp.zeros((), jnp.int32)
                    ).astype(jnp.float32),
                )

            return jax.lax.scan(
                body, st, jnp.arange(k, dtype=jnp.int32)
            )

        holder = {"st": st0}

    overflow = {"max": 0.0}

    def run(k):
        st, out = scan_steps(k, holder["st"], jax.random.PRNGKey(k))
        if isinstance(out, tuple):
            mses, ovf = out
            overflow["max"] = max(overflow["max"], float(ovf.max()))
        else:
            mses = out
        _ = float(mses[-1])
        holder["st"] = st

    per_step = slope_timed(run, lo=5, hi=25)
    n_rays = tiles * 128
    emit(
        "plenoxels_train_rays_per_sec" + ("_shell" if shell else ""),
        n_rays / per_step, "rays/s",
        vs_baseline=None, reso=reso, step_mode=mode,
        touched_overflow=round(overflow["max"], 5),
        baseline_note=(
            "surface-topology scene (the regime reference scenes "
            "train in); " if shell else "dense worst-case scene; "
        ) + "no recorded reference throughput in repo; reference "
        "trains a scene (128k steps x 5k rays) in tens of minutes on "
        "a desktop GPU (~400-800k rays/s implied)",
    )


def bench_plenoxels_train_shell(reso=256, tiles=40):
    bench_plenoxels_train(reso, tiles, shell=True)


# ---------------------------------------------------------------------------
def _plenoxels_setup_render(reso):
    """Render-only setup: geometry-only grid + kernel-layout arrays
    generated DIRECTLY (random data is random in any layout). At 512^3
    the master-array + relayout path peaked ~2x the kernel arrays'
    size and hit RESOURCE_EXHAUSTED in the driver bench; here the peak
    is a single 3.9 GB bf16 allocation (mask fused into the RNG)."""
    import functools

    from nerf_projects_tpu.ops.brick_grid import create_brick_grid

    bg = create_brick_grid(reso, basis_dim=9, use_sphere_bound=True,
                           alloc_data=False)
    ka = jax.block_until_ready(_gen_z(bg.cell_mask))
    return bg, ka


@functools.partial(jax.jit, static_argnames=("opaque_sigma",))
def _gen_z(mask, opaque_sigma=None):
    """Masked random PACKED kernel array [nb+1, 10, 8, 192] (SH slots
    0..8, density x3-interleaved in slot 9; see pack_kernel_arrays) —
    mask fused into the RNG so the peak is one allocation.

    opaque_sigma=S: density ~ U[S/2, 3S/2] on active cells — the
    trained-field regime (solid interiors, rays saturate a few samples
    past a surface; sigma*step ~ O(1)). Default: U[0, 2] (translucent
    fog, nothing ever saturates — the worst case for early stop)."""
    nb = mask.shape[0]
    md = mask.reshape(nb, 8, 64)
    dz = jax.random.uniform(
        jax.random.PRNGKey(0), (nb, 8, 64), jnp.bfloat16
    ) * 2.0
    if opaque_sigma is not None:
        dz = dz * (opaque_sigma / 2.0) + (opaque_sigma / 2.0)
    dz = (dz * md).astype(jnp.bfloat16)
    d192 = jnp.repeat(dz, 3, axis=-1)[:, None]
    # kernel layout [nb, B, lx, (ly,lz,ch)=192]
    msh = mask.reshape(nb, 1, 8, 8, 8, 1)
    sz = (
        jax.random.normal(
            jax.random.PRNGKey(1), (nb, 9, 8, 8, 8, 3), jnp.bfloat16
        ) * 0.2 * msh
    ).reshape(nb, 9, 8, 192).astype(jnp.bfloat16)
    packed = jnp.concatenate([sz, d192], axis=1)
    return jnp.concatenate([packed, jnp.zeros_like(packed[:1])])


def _frame_fps_common(metric, bg, ka, reso, frame, note, caps=()):
    """Whole-frame FPS through the single-dispatch frame renderer
    (ops/pallas/frame_march.py): flat active-window plan + in-kernel
    all-rays-saturated early stop — the TPU answer to the reference's
    real-time octree renderer (svox render_persp `fast` mode,
    octree/nerf/utils.py:448-499). Timing: ASYNC host dispatch of k
    frames with ONE scalar readback at the end (the chip executes
    dispatches in order, so the final readback syncs them all),
    slope-fit between two k — amortizes the ~40 ms relay round trip
    without wrapping the renderer in lax.map (a device-side frame
    loop reproducibly crashes the remote compile helper)."""
    import jax.tree_util as tu

    from nerf_projects_tpu.core.rays import camera_rays_opencv
    from nerf_projects_tpu.ops.grid import GridRenderOptions
    from nerf_projects_tpu.ops.pallas.frame_march import (
        render_frame_pallas,
    )
    from nerf_projects_tpu.ops.pallas.tile_march import (
        default_chunks_for,
    )
    from nerf_projects_tpu.ops.tile_render import tiles_from_image_rays

    opts = GridRenderOptions(step_size=0.5)
    H, W = frame
    # 16x32-px tiles (r=512): the round-4 floor probe measured the
    # march cost as ~6 us per WINDOW INSTANCE invariant to wps/fetch
    # count, so bigger tiles (fewer instances at the same coverage)
    # are the lever — r512 measured 112 ms vs r256's 134 at 512^3
    th, tw = (8, 16) if SMOKE else (16, 32)
    B_dim = bg.basis_dim
    # r=256 tiles need the (density_z, sh_z) TUPLE fetch (packed-fetch
    # Mosaic ICE — see render_frame_pallas docstring)
    katup = (
        jax.block_until_ready(ka[:, B_dim, :, ::3]),
        jax.block_until_ready(ka[:, :B_dim]),
    )
    C = default_chunks_for(bg, opts)

    def frame_tiles(i):
        pose = np.eye(4, dtype=np.float32)
        ang = 0.15 * i
        pose[0, 3] = 2.4 * np.sin(ang)
        pose[2, 3] = -2.4 * np.cos(ang)
        r0 = camera_rays_opencv(
            H, W, float(H), float(H), H / 2.0, W / 2.0,
            jnp.asarray(pose),
        )
        return tiles_from_image_rays(
            tu.tree_map(lambda x: x.reshape(-1, 3), r0), H, W, th, tw
        )

    frames = [frame_tiles(i) for i in range(2 if SMOKE else 4)]

    def measure(cap):
        @jax.jit
        def one(b, dz, sz, rays):
            out = render_frame_pallas(
                b, rays, opts, kernel_arrays=(dz, sz), n_chunks=C,
                use_occupancy=False, max_windows=cap,
            )
            return out["rgb"][0, 0, 0]

        def run(k):
            outs = [
                one(bg, katup[0], katup[1], frames[i % len(frames)])
                for i in range(k)
            ]
            _ = float(sum(float(o) for o in outs[-1:]))

        ks = (1, 2) if SMOKE else ((2, 6) if CHEAP else (4, 12))
        run(ks[0]); run(ks[1])
        best = None
        for _ in range(1 if (SMOKE or CHEAP) else 3):
            t0 = time.perf_counter()
            run(ks[0])
            t1 = time.perf_counter()
            run(ks[1])
            t2 = time.perf_counter()
            sl = ((t2 - t1) - (t1 - t0)) / (ks[1] - ks[0])
            if sl > 0:
                best = sl if best is None else min(best, sl)
        if best is None:  # degenerate smoke timing; report big batch
            best = (t2 - t1) / ks[1]
        return best

    best = measure(None)
    emit(
        metric, 1.0 / best, "frames/s",
        vs_baseline=None, reso=reso,
        sec_per_frame=round(best, 4),
        baseline_note=note,
    )
    if CHEAP:
        caps = ()  # cap rows are precise-pass only
    for suffix, cap, cap_note in caps:
        b2 = measure(cap)
        emit(
            metric + suffix, 1.0 / b2, "frames/s",
            vs_baseline=None, reso=reso,
            sec_per_frame=round(b2, 4),
            baseline_note=cap_note,
        )


def bench_grid_render_fps(reso=512, frame=(800, 800)):
    if SMOKE:
        reso, frame = 32, (48, 48)
    bg, ka = _plenoxels_setup_render(reso)
    _frame_fps_common(
        "grid_render_fps_800", bg, ka, reso, frame,
        "dense random grid; single-dispatch whole-frame renderer with "
        "in-kernel early stop; reference real-time octree renderer "
        "targets interactive rates, no recorded FPS in repo",
    )


# ---------------------------------------------------------------------------
def bench_nerf_sh_train():
    from nerf_projects_tpu.models.nerf_sh import NeRFSHModel
    from nerf_projects_tpu.train.nerf_sh_trainer import NeRFSHTrainer

    model = NeRFSHModel(
        sh_deg=2,
        num_coarse_samples=8 if SMOKE else 64,
        num_fine_samples=16 if SMOKE else 128,
        near=2.0,
        far=6.0,
        white_bkgd=True,
        use_fused_trunk=True,
    )
    trainer = NeRFSHTrainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    d = jax.random.normal(jax.random.PRNGKey(1), (N_RAND, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    from nerf_projects_tpu.core.rays import Rays

    rays = Rays(jnp.zeros((N_RAND, 3)), d, d)
    target = jnp.full((N_RAND, 3), 0.4)

    import functools

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def scan_steps(k, s):
        def body(s, _):
            s, stats = trainer.train_step(s, rays, target)
            return s, stats["loss"]

        return jax.lax.scan(body, s, None, length=k)

    holder = {"state": state}

    def run(k):
        s, losses = scan_steps(k, holder["state"])
        _ = float(losses[-1])
        holder["state"] = s

    per_step = slope_timed(run, lo=5, hi=25)
    emit(
        "nerf_sh_train_rays_per_sec", N_RAND / per_step, "rays/s",
        vs_baseline=None,
        baseline_note="reference logged rays/sec only as unstored "
        "TensorBoard scalars",
        config_note="sh_deg=2 fused-trunk config (the SH/SG heads do "
        "not feed viewdirs through the trunk); a use_viewdirs=True "
        "plain-NeRF config runs the unfused flax trunk instead "
        "(models/nerf_sh.py::_fused_trunk_ok)",
    )
    if SMOKE or CHEAP:
        return
    # secondary row: the use_viewdirs=True config (the reference's
    # non-SH jaxnerf mode, plenoctree/nerf_sh/nerf/models.py:216) runs
    # the UNFUSED flax trunk — the fused-trunk scope boundary made
    # measurable (VERDICT r3 task 8 / r4 task 10)
    model_vd = NeRFSHModel(
        sh_deg=-1, use_viewdirs=True,
        num_coarse_samples=64, num_fine_samples=128,
        near=2.0, far=6.0, white_bkgd=True,
    )
    trainer_vd = NeRFSHTrainer(model_vd)
    holder2 = {"state": trainer_vd.init_state(jax.random.PRNGKey(0))}

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def scan_steps_vd(k, s):
        def body(s, _):
            s, stats = trainer_vd.train_step(s, rays, target)
            return s, stats["loss"]

        return jax.lax.scan(body, s, None, length=k)

    def run_vd(k):
        s, losses = scan_steps_vd(k, holder2["state"])
        _ = float(losses[-1])
        holder2["state"] = s

    per_step_vd = slope_timed(run_vd, lo=5, hi=25)
    emit(
        "nerf_sh_train_rays_per_sec_viewdirs", N_RAND / per_step_vd,
        "rays/s", vs_baseline=None,
        config_note="use_viewdirs=True plain-NeRF config: viewdirs "
        "feed the condition branch, so the trunk runs UNFUSED flax "
        "(fused-trunk scope note)",
    )


def _shell_select(bg, reso, r_lo, r_hi):
    """Keep only the spherical-SHELL bricks of `bg` (row reindex)."""
    from dataclasses import replace

    links = np.asarray(bg.brick_links)
    coords = np.argwhere(links >= 0)
    centers = (coords * 8.0 + 4.0) / reso * 2.0 - 1.0
    rad = np.linalg.norm(centers, axis=1)
    keep = (rad >= r_lo) & (rad <= r_hi)
    if not keep.any():  # tiny smoke grids: band may be empty
        keep[:] = True
    old_rows = links[coords[:, 0], coords[:, 1], coords[:, 2]]
    new_links = np.full_like(links, -1)
    new_rows = np.cumsum(keep) - 1
    kept = coords[keep]
    new_links[kept[:, 0], kept[:, 1], kept[:, 2]] = new_rows[keep]
    sel = jnp.asarray(old_rows[keep])
    return replace(
        bg,
        brick_links=jnp.asarray(new_links),
        density_bricks=bg.density_bricks[sel],
        sh_bricks=bg.sh_bricks[sel],
        cell_mask=bg.cell_mask[sel],
        brick_coords=bg.brick_coords[sel],
    )


def _shell_setup(reso, dtype=jnp.bfloat16, r_lo=0.85, r_hi=1.02):
    """Shell scene WITH data arrays (training workloads; the render
    workloads use _shell_setup_render's geometry-only variant)."""
    return _shell_select(_plenoxels_setup(reso, dtype), reso, r_lo, r_hi)


def _shell_setup_render(reso, r_lo=0.85, r_hi=1.02):
    """Surface-like scene: only a spherical SHELL of bricks is active —
    representative of trained radiance fields (density on surfaces),
    where chunk compaction pays. Geometry-only + direct kernel arrays
    (see _plenoxels_setup_render)."""
    from nerf_projects_tpu.ops.brick_grid import create_brick_grid

    bg = create_brick_grid(reso, basis_dim=9, use_sphere_bound=True,
                           alloc_data=False)
    bg = _shell_select(bg, reso, r_lo, r_hi)
    ka = jax.block_until_ready(
        _gen_z(bg.cell_mask, opaque_sigma=1000.0)
    )
    return bg, ka


def bench_grid_render_fps_shell(reso=512, frame=(800, 800)):
    """Render FPS on the surface-like shell scene — the octree/
    real-scene rendering regime (trained fields put density on
    surfaces, where the flat window plan + early stop pay most)."""
    if SMOKE:
        reso, frame = 32, (48, 48)
    bg, ka = _shell_setup_render(reso)
    _frame_fps_common(
        "grid_render_fps_800_shell", bg, ka, reso, frame,
        "surface-topology scene in the trained-field opacity regime "
        "(sigma*step ~ O(1) inside surfaces); whole real frames in "
        "ONE jitted program — flat window plan + analytic occlusion "
        "cull (provably-zero windows dropped before their fetches) + "
        "in-kernel early stop; the real-scene rendering regime",
        # cap "fast mode" rows REMOVED (VERDICT r4 task 6): two
        # independent channels (driver BENCH_r04 8.16 vs 8.24 exact;
        # round-5 long bench 8.17 vs 8.23 exact,
        # measurements/r5/bench_long.log) both measure the per-tile
        # window cap at parity-or-slower with the exact render on the
        # shipped shell scene — the flat window plan + analytic
        # occlusion cull already drop nearly everything a cap would,
        # so the cap only adds plan work. The reference-`fast`-analog
        # max_windows knob itself stays (ops/pallas/frame_march.py),
        # for scenes where occlusion culling can't bound the span.
        caps=(),
    )


# ---------------------------------------------------------------------------
def bench_plenoxels_train_sparse512():
    """512^3 sparse training — the reference's standard post-upsample
    scale (svox2/opt/opt.py:855-887 trains its final phase at 512^3).

    Ship config (scripts/bench_sparse_512.py): spherical-shell
    occupancy, ONE packed f32 master + bf16 rms state, flat
    active-window plan (exact window count for the fixed bench rays),
    exact touched-row bound, per-step donation. Steps are dispatched
    asynchronously in a chain with ONE trailing readback (the chip
    executes dispatches in order), slope-fit over chain length — the
    FPS benches' timing path, amortizing the ~20 ms axon relay
    dispatch that dominated the per-step loop (NOTES_ROUND3 r3u).
    """
    from dataclasses import replace

    reso = 32 if SMOKE else 512
    tiles = 2 if SMOKE else int(os.environ.get("BENCH_512_TILES", 128))
    from nerf_projects_tpu.ops.grid import GridRenderOptions
    from nerf_projects_tpu.ops.pallas.flat_train import required_windows
    from nerf_projects_tpu.ops.pallas.tile_march import geometry_only
    from nerf_projects_tpu.train import plenoxels_sparse as ps
    from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

    # build at bf16 (the fp32 full-sphere intermediate OOMs at 512^3),
    # upcast the small filtered shell to f32 for training
    _bg16 = _shell_setup(reso, dtype=jnp.bfloat16)
    bg = replace(
        _bg16,
        density_bricks=_bg16.density_bricks.astype(jnp.float32),
        sh_bricks=_bg16.sh_bricks.astype(jnp.float32),
    )
    del _bg16
    opts = GridRenderOptions(step_size=0.5)
    trainer = PlenoxelsTrainer(
        opts, n_iters=128_000, lambda_tv=1e-5, lambda_tv_sh=1e-3,
        bf16_grad_blocks=True, rms_pervisit=True,
    )
    # dense-sweep optimizer (see bench_plenoxels_train): at 512^3 the
    # K-row machinery costs ~5.5 us/row; the dense sweep is ~5 HBM
    # passes over the shell state. The FUSED step+sweep program's
    # compile crashes the axon remote compile helper at 512^3 (HTTP
    # 500, deterministic, 2026-08-20; fine at 256^3), so the default
    # here is the two-program DEFER split (mode 2): the step returns a
    # dense grad accumulator, and dense_sweep_apply runs as its own
    # program in the same async dispatch chain — each compiled body
    # stays under the helper's limit. BENCH_512_DOPT: 0=off (K-row
    # touched optimizer), 1=fused single program (A/B against the
    # helper), 2=defer split.
    dopt512 = int(os.environ.get("BENCH_512_DOPT", 2))
    rays = _tile_rays(jax.random.PRNGKey(2), tiles)
    target = jnp.full(rays.origins.shape[:2] + (3,), 0.4)
    geom = geometry_only(bg)
    flat_w = required_windows(geom, rays, opts)
    tv_w = max(int(trainer.tv_sparsity * bg.n_bricks), 1) + max(
        int(trainer.tv_sh_sparsity * bg.n_bricks), 1
    )
    k_exact = ps.required_touched_rows(geom, rays, opts, tv_rows=4 * tv_w)
    print(json.dumps({"flat_windows": flat_w, "max_touched": k_exact}),
          flush=True)
    st0 = ps.packed_state_from_grid(bg, rms_dtype=jnp.bfloat16)
    bg = replace(
        bg,
        density_bricks=jnp.zeros((bg.n_bricks, 1), jnp.float32),
        sh_bricks=jnp.zeros((bg.n_bricks, 1, 1), jnp.float32),
    )

    if dopt512 == 2:
        # defer split: program A (kernels + dense grad accumulator,
        # state read-only) then program B (dense sweep, state + acc
        # donated) — dispatched back-to-back in the async chain
        @jax.jit
        def step_a(st, i, key):
            _, stats = ps.train_step_tiles_packed_touched(
                trainer, geom, st, rays, target, i, key,
                max_touched=k_exact, flat_windows=flat_w,
                dense_optim="defer",
            )
            return (stats["dense_acc"], stats["touched_flag"],
                    stats["mse"], stats["dropped_active_chunks"])

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step_b(st, acc, flag, i):
            return ps.dense_sweep_apply(
                trainer, geom, st, acc, flag, i
            )

        def step(st, i, key):
            acc, flag, mse, dropped = step_a(st, i, key)
            st = step_b(st, acc, flag, i)
            return st, mse, dropped.astype(jnp.float32)
    else:
        @functools.partial(jax.jit, donate_argnums=0)
        def step(st, i, key):
            st, stats = ps.train_step_tiles_packed_touched(
                trainer, geom, st, rays, target, i, key,
                max_touched=k_exact, flat_windows=flat_w,
                dense_optim=bool(dopt512),
            )
            return st, stats["mse"], (
                stats["touched_overflow"]
                + stats["dropped_tile_rows"].astype(jnp.float32)
            )

    holder = {"st": st0, "i": 0}
    del st0
    overflow = {"max": 0.0}

    def run(k):
        # async chain: k dispatches, one readback
        st = holder["st"]
        mse = ovf = None
        for _ in range(k):
            st, mse, ovf = step(
                st, jnp.int32(holder["i"]), jax.random.PRNGKey(holder["i"])
            )
            holder["i"] += 1
        overflow["max"] = max(overflow["max"], float(ovf))
        _ = float(mse)
        holder["st"] = st

    per_step = slope_timed(run, lo=3, hi=12)
    emit(
        "plenoxels_train_rays_per_sec_512", tiles * 128 / per_step,
        "rays/s", vs_baseline=None, reso=reso,
        step_mode="touched_flat"
        + {0: "", 1: "+dense_optim", 2: "+dense_optim_defer"}.get(
            dopt512, ""
        ),
        tiles=tiles, touched_overflow=round(overflow["max"], 5),
        baseline_note="512^3 shell scene, the reference's standard "
        "post-upsample training scale (svox2/opt/opt.py:855-887); no "
        "recorded reference throughput in repo",
    )


# value order: round-4 flagships first, the long-proven NeRF rows and
# the dense worst-case render last — a budget kill loses the least
# information (VERDICT r3 item 1c)
WORKLOADS = {
    "plenoxels_train_shell": bench_plenoxels_train_shell,
    "grid_render_fps_shell": bench_grid_render_fps_shell,
    "plenoxels_train_sparse512": bench_plenoxels_train_sparse512,
    "plenoxels_train": bench_plenoxels_train,
    "nerf_sh_train": bench_nerf_sh_train,
    "nerf_train": bench_nerf_train,
    "grid_render_fps": bench_grid_render_fps,
}


def _run_in_process(names):
    for name in names:
        try:
            WORKLOADS[name]()
        except Exception as exc:  # report, keep benching the rest
            print(
                json.dumps({"metric": name, "error": f"{type(exc).__name__}: {exc}"[:400]}),
                flush=True,
            )


def _run_workload_streamed(name, deadline, cheap=False):
    """One workload subprocess, stdout+stderr STREAMED line-by-line —
    metric lines are re-printed the moment they appear, so a driver
    kill loses at most the in-flight workload (VERDICT r3 item 1b:
    round 3's capture_output buffering lost 4 finished metrics to a
    timeout kill). Killed at `deadline` (absolute time.time())."""
    import subprocess
    import sys
    import threading
    from collections import deque

    script = os.path.abspath(__file__)
    env = dict(os.environ, BENCH_WORKLOADS=name, BENCH_IN_PROCESS="1",
               BENCH_CHEAP="1" if cheap else "")
    proc = subprocess.Popen(
        [sys.executable, script], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, bufsize=1,
    )
    state = {"emitted": 0, "init_fail": False, "error_line": ""}
    tail = deque(maxlen=6)

    def reader():
        for line in proc.stdout:
            line = line.rstrip("\n")
            if line.strip():
                tail.append(line.strip())
            s = line.strip()
            if s.startswith("{") and '"metric"' in s:
                if '"error"' in s:
                    # workload-level failure row: hold it back — the
                    # caller may retry (axon remote-compile 500s and
                    # backend-init failures are transient); only the
                    # final attempt's row gets recorded
                    state["error_line"] = s
                else:
                    print(s, flush=True)
                    state["emitted"] += 1
            if ("Unable to initialize backend" in line
                    or "remote_compile: HTTP 5" in line):
                state["init_fail"] = True

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    timed_out = False
    try:
        rc = proc.wait(timeout=max(1.0, deadline - time.time()))
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        rc, timed_out = -9, True
    th.join(timeout=15)
    return (rc, timed_out, state["emitted"], state["init_fail"],
            state["error_line"], list(tail))


def _emit_harness_row(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    _sink_write(line)


def _run_pass(names, pass_end, cheap, retry_state, wl_cap, reserve,
              min_useful, tag):
    """Run `names` sequentially, each in its own subprocess, inside the
    [now, pass_end] window. Per-workload deadline reserves room for the
    queue behind it but guarantees the front a fair share."""
    init_retries = retry_state["init_retries"]
    retry_sleep = retry_state["retry_sleep"]
    for idx, name in enumerate(names):
        n_behind = len(names) - idx - 1
        remaining = pass_end - time.time()
        # the queue is value-ordered: while at least min_useful remains,
        # the FRONT workload always runs (with at least min_useful) —
        # skipping the front to save time for the ones behind it would
        # starve exactly the rows that matter most
        avail = min(wl_cap, max(
            remaining / (n_behind + 1),
            remaining - reserve * n_behind,
            min_useful,
        ))
        if remaining < min_useful:
            _emit_harness_row({
                "metric": name,
                "error": f"skipped ({tag}): bench budget exhausted "
                         f"({remaining:.0f}s left, {n_behind} queued)",
            })
            continue
        deadline = time.time() + avail
        for attempt in range(init_retries + 1):
            rc, timed_out, emitted, init_fail, error_line, tail = (
                _run_workload_streamed(name, deadline, cheap=cheap)
            )
            can_retry = (
                init_fail and not emitted and attempt < init_retries
                and retry_state["sleep_left"] >= retry_sleep
                and deadline - time.time() > retry_sleep + min_useful
            )
            if not can_retry:
                break
            retry_state["sleep_left"] -= retry_sleep
            time.sleep(retry_sleep)
        # a held-back error row is recorded whenever the final attempt
        # produced one — even if earlier metric rows emitted, a partial
        # failure must not read as full success (ADVICE r4 medium)
        if error_line:
            _emit_harness_row(json.loads(error_line))
        elif not emitted:
            msg = "workload timed out" if timed_out else " | ".join(
                tail[-4:]
            ) or f"exit {rc} with no output"
            _emit_harness_row({"metric": name, "error": msg[:400],
                               "pass": tag})


# BENCH_FAKE_SPEC: harness self-test hook (tests/test_bench_harness.py).
# "name=behavior:secs,..." replaces WORKLOADS with synthetic workloads
# so the two-pass scheduling / streaming / retry / error paths can be
# exercised on CPU with no TPU and no kernels. Behaviors:
#   ok      — sleep secs, emit one metric row
#   partial — emit one good row, then a workload error row (the
#             ADVICE-r4-medium case: partial failure must be recorded)
#   raise   — sleep secs, raise (exercises the error-row hold-back)
#   slow    — sleep secs, emit (meant to be killed by the deadline)
_FAKE_SPEC = os.environ.get("BENCH_FAKE_SPEC", "")
if _FAKE_SPEC:
    def _mk_fake(fname, behavior, secs):
        def fake():
            time.sleep(secs)
            if behavior == "raise":
                raise RuntimeError("fake workload failure")
            if behavior == "partial":
                emit(fname, 1.0, "unit")
                print(json.dumps({"metric": fname + "_tail",
                                  "error": "fake partial failure"}),
                      flush=True)
                return
            emit(fname, 1.0, "unit")
        return fake

    WORKLOADS = {}
    for item in _FAKE_SPEC.split(","):
        fname, _, rest = item.partition("=")
        behavior, _, secs = rest.partition(":")
        WORKLOADS[fname] = _mk_fake(fname, behavior,
                                    float(secs or 0))


# pass-1 order: never-driver-recorded metrics first (NeRF-SH has zero
# records in four rounds — VERDICT r4 item 3), then the flagships
PASS1_ORDER = [
    "nerf_sh_train",
    "plenoxels_train_shell",
    "grid_render_fps_shell",
    "plenoxels_train_sparse512",
    "plenoxels_train",
    "nerf_train",
    "grid_render_fps",
]


def main():
    sel = os.environ.get("BENCH_WORKLOADS", "")
    names = [n.strip() for n in sel.split(",") if n.strip()]
    explicit = bool(names)
    names = names or list(WORKLOADS)
    if len(names) == 1 or os.environ.get("BENCH_IN_PROCESS", "") == "1":
        _run_in_process(names)
        return

    # fresh sink per harness run (appends within the run)
    if _SINK:
        try:
            if os.path.exists(_SINK):
                os.remove(_SINK)
        except OSError:
            pass

    # One subprocess per workload: full HBM + jit-cache isolation. The
    # 512^3 workloads run at the HBM edge; in round 2 a single
    # RESOURCE_EXHAUSTED in one workload erased the records of three
    # (VERDICT r2 item 1). Sequential subprocesses also serialize TPU
    # clients, which the axon relay requires.
    #
    # GLOBAL wall-clock budget, default 1500 s — three rounds of rc=124
    # prove the driver's external deadline is shorter than 2700 s plus
    # startup; the internal skip path must fire first (VERDICT r4
    # item 1). TWO PASSES: pass 1 runs EVERY workload in BENCH_CHEAP
    # mode (provisional rows, ~1-3 min each), pass 2 re-runs in value
    # order with the remaining budget, emitting precise rows that
    # supersede the provisional ones. A kill at any point costs
    # precision, never coverage.
    budget = float(os.environ.get("BENCH_TOTAL_BUDGET_SECS", 1500))
    wl_cap = float(os.environ.get("BENCH_WORKLOAD_TIMEOUT", 3600))
    reserve = float(os.environ.get("BENCH_RESERVE_SECS", 210))
    min_useful = float(os.environ.get("BENCH_MIN_USEFUL_SECS", 90))
    t0 = time.time()
    hard_end = t0 + budget

    # the axon tunnel goes UNAVAILABLE for stretches; a workload that
    # dies at backend INIT carries no information about the code —
    # retry it, but cap TOTAL retry sleep across the whole run
    retry_state = {
        "init_retries": int(os.environ.get("BENCH_INIT_RETRIES", 2)),
        "retry_sleep": float(os.environ.get("BENCH_INIT_RETRY_SECS", 60)),
        "sleep_left": float(os.environ.get("BENCH_INIT_RETRY_TOTAL", 240)),
    }

    two_pass = (not explicit
                and os.environ.get("BENCH_TWO_PASS", "1") == "1")
    if two_pass:
        p1_names = ([n for n in PASS1_ORDER if n in WORKLOADS]
                    if not _FAKE_SPEC else list(WORKLOADS))
        p1_end = t0 + budget * float(
            os.environ.get("BENCH_PASS1_FRAC", 0.55)
        )
        p1_cap = float(os.environ.get("BENCH_CHEAP_CAP", 270))
        _run_pass(p1_names, p1_end, cheap=True,
                  retry_state=retry_state, wl_cap=p1_cap,
                  reserve=75, min_useful=50, tag="pass1")

    _run_pass(names, hard_end, cheap=False, retry_state=retry_state,
              wl_cap=wl_cap, reserve=reserve, min_useful=min_useful,
              tag="pass2" if two_pass else "single")


if __name__ == "__main__":
    main()
