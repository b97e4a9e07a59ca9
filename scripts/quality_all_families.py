"""Hardware quality check for the Plenoxels and NeRF-SH families on the
hermetic synthetic scene (the vanilla-NeRF result lives in
quality_check_tpu.py: 31.2 dB held-out on TPU v5e).

Each family trains on 15 views and scores held-out view 0
(PSNR / SSIM). Select with argv[1] in {plenoxels, nerf_sh, all}.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# persistent compile cache (shared with bench.py): a restarted quality
# attempt must not pay the minutes-long 512^3 remote recompiles again
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

import jax.numpy as jnp
import jax.tree_util as tu
import numpy as np

from nerf_projects_tpu.core.rays import Rays, camera_rays
from nerf_projects_tpu.data.synthetic import make_dataset
from nerf_projects_tpu.obs.metrics import compute_metrics

WHICH = sys.argv[1] if len(sys.argv) > 1 else "all"
PLENOXEL_STEPS = int(os.environ.get("QUALITY_PLENOXEL_STEPS", 4000))
PLENOXEL_RESO = int(os.environ.get("QUALITY_PLENOXEL_RESO", 128))
PLENOXEL_LR_SIGMA = float(os.environ.get("QUALITY_LR_SIGMA", 3e1))
PLENOXEL_LR_SH = float(os.environ.get("QUALITY_LR_SH", 1e-2))
PLENOXEL_TILES = int(os.environ.get("QUALITY_TILES", 40))
PLENOXEL_TV_SCALE = float(os.environ.get("QUALITY_TV_SCALE", 1.0))
# reference-style progressive upsample (opt.py:855-887): comma-
# separated step fractions, one per doubling; the run starts at
# RESO / 2^n_stages and doubles at each fraction. "0.4" reproduces the
# single RESO/2 -> RESO stage; "0.25,0.55" trains RESO/4 -> RESO/2 at
# 25% -> RESO at 55% (the reference's 128 -> 256 -> 512 ladder shape).
# Empty / "0" = no upsample.
_ups_raw = os.environ.get("QUALITY_UPSAMPLE_AT", "0")
PLENOXEL_UPSAMPLE_FRACS = sorted(
    f for f in (float(t) for t in _ups_raw.split(",") if t.strip())
    if f > 0
)
PLENOXEL_UPSAMPLE_AT = (
    PLENOXEL_UPSAMPLE_FRACS[-1] if PLENOXEL_UPSAMPLE_FRACS else 0.0
)
# default 0: the reference's synthetic config has NO sparsity loss
# (opt.py --lambda_sparsity default 0.0; syn.json sets only TV). Under
# RMSprop's scale-invariant updates even 1e-7 erodes all occluded
# density at ~lr per visit (it is the only gradient an occluded voxel
# receives) — the round-3 dynamics probe measured the object's density
# p90 dissolving 39 -> 0 over 1800 steps with it on.
PLENOXEL_SPARSITY = float(os.environ.get("QUALITY_SPARSITY", 0.0))
PLENOXEL_INIT_SIGMA = float(os.environ.get("QUALITY_INIT_SIGMA", 0.1))
# unique-touched-brick bound for the touched-row step; raise for
# 512^3 runs (overflowing rows drop their update and are reported)
PLENOXEL_MAX_TOUCHED = int(os.environ.get("QUALITY_MAX_TOUCHED", 12288))
# QUALITY_FLAT=1: train through the flat active-window plan (w_cap
# probe-sized with 50% headroom per topology; overflow logged)
PLENOXEL_FLAT = int(os.environ.get("QUALITY_FLAT", 0))
# per-visit RMSprop decay (rms persists between touches) — the
# reference's EFFECTIVE dynamics under its global ray shuffle; the
# literal beta^delta lazy decay collapses rms to (1-b)g^2 under
# coherent-tile sampling and every visit becomes a 4.47*lr*sign(g)
# yank (see PlenoxelsTrainer.rms_pervisit)
PLENOXEL_RMS_PERVISIT = int(os.environ.get("QUALITY_RMS_PERVISIT", 1))
# dense-sweep optimizer (exact under per-visit rms; round-4
# plenoxels_sparse.train_step_tiles_packed_touched dense_optim).
# 0=off (K-row touched optimizer), 1=fused single program (crashes the
# remote compile helper at 512^3), 2=two-program defer split (works at
# every reso; bit-identical semantics)
PLENOXEL_DENSE_OPTIM = int(os.environ.get("QUALITY_DENSE_OPTIM", 0))
# held-out eval every N steps (0 = only at the end); convergence curve
EVAL_EVERY = int(os.environ.get("QUALITY_EVAL_EVERY", 0))
# directory for held-out/GT/error pngs + the trained grid npz
SAVE_DIR = os.environ.get("QUALITY_SAVE", "")
# in-phase safety-checkpoint cadence (0 = phase boundaries only)
CKPT_EVERY = int(os.environ.get("QUALITY_CKPT_EVERY", 0))
# "tiles" (coherent 8x16 tile batches through the Pallas touched step)
# or "cell" (globally-shuffled random-ray batches through the dense
# per-sample-gather step — the reference's sampling statistics,
# opt.py:395-400 global ray shuffle)
STEP_MODE = os.environ.get("QUALITY_STEP_MODE", "tiles")
CELL_BATCH = int(os.environ.get("QUALITY_CELL_BATCH", 5120))
# lr-decay horizon in steps (0 = the run length). The reference trains
# 128k steps against a 250k-step decay schedule (opt.py defaults), so
# it ends at lr_sigma ~1.1, never the final 5e-2; a fully-decayed
# schedule starves late training. ~2x the run length matches.
PLENOXEL_DECAY = int(os.environ.get("QUALITY_DECAY_STEPS", 0))
# lr_sigma warm-up ramp (x0.01 -> x1 over this many steps). The
# reference's synthetic config keeps the 15000-step default against a
# 200k run (syn.json + opt.py:100); running with delay 0 at lr 30 makes
# density overshoot +-250 in the first 100 steps and the relu'd march
# (sigma <= thresh -> sample skipped, zero gradient) permanently kills
# the overshot-negative crust -> the wispy-ghost 18-19 dB fixed point
# the round-3 dynamics probe measured.
PLENOXEL_DELAY = int(os.environ.get("QUALITY_DELAY_STEPS", -1))
SH_CHUNKS = int(os.environ.get("QUALITY_SH_CHUNKS", 6))
H = W = int(os.environ.get("QUALITY_IMG", 96))
N_VIEWS = int(os.environ.get("QUALITY_VIEWS", 16))
# focal scales with resolution (angular geometry identical to the
# 96^2/f=80 scenes the NeRF families are scored on). make_dataset's
# fixed default of 80 left the object a ~54 px dot at 800^2 — random
# train tiles all missed it (flat probe 0, psnr inf on background)
# and held-out PSNR was background-dominated.
FOCAL = float(os.environ.get("QUALITY_FOCAL", 80.0 * H / 96.0))


def dataset():
    ds = make_dataset(
        n_views=N_VIEWS, image_size=H, focal=FOCAL, seed=3
    )
    return ds


def held_out_rays(ds):
    return camera_rays(H, W, ds["intrinsics"], jnp.asarray(ds["poses"][0]))


def quality_plenoxels(ds):
    """Tile-based Pallas training at 128^3 with the published-config
    loss set (TV + sparsity), progressive from 64^3."""
    from dataclasses import replace

    from nerf_projects_tpu.models.sparse_grid import SparseGrid
    from nerf_projects_tpu.ops.brick_grid import from_sparse_grid
    from nerf_projects_tpu.ops.grid import GridRenderOptions
    from nerf_projects_tpu.ops.tile_render import (
        render_image_tiles,
        tiles_from_image_rays,
        untile_image,
    )
    from nerf_projects_tpu.ops.pallas.tile_march import render_tiles_pallas
    from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

    # train pool excludes view 0; coherent 8x16 tiles
    images = ds["images"][1:]
    rays_all = tu.tree_map(
        lambda x: x.reshape(N_VIEWS, H * W, 3)[1:], ds["rays"]
    )
    pixels = ds["pixels"].reshape(N_VIEWS, H * W, 3)[1:]

    # jitted draw (rays/pixels as ARGS, not closures: closed-over
    # device arrays become jaxpr constants the remote compile helper
    # serializes) — eager per-step gathers cost ~8 relay round trips
    # (~0.4 s/step), 5x the train step itself
    stride = int(os.environ.get("QUALITY_TILE_STRIDE", 1))

    @functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
    def _draw(key, r_all, pix, n_tiles, th, tw, s):
        kv, ky, kx = jax.random.split(key, 3)
        v = jax.random.randint(kv, (n_tiles,), 0, N_VIEWS - 1)
        # stride s > 1: the 8x16 tile is a LATTICE over an
        # (s*th)x(s*tw) footprint — still window-coherent for the
        # marching kernels, but each tile's gradient averages a 16x
        # wider image region (de-biases the per-visit gradient that
        # coherent pencils produce)
        y0 = jax.random.randint(
            ky, (n_tiles,), 0, H - (th - 1) * s)
        x0 = jax.random.randint(
            kx, (n_tiles,), 0, W - (tw - 1) * s)
        dy, dx = jnp.meshgrid(jnp.arange(th), jnp.arange(tw), indexing="ij")
        flat = (y0[:, None] + s * dy.reshape(-1)[None]) * W + (
            x0[:, None] + s * dx.reshape(-1)[None]
        )
        r = tu.tree_map(lambda a: a[v[:, None], flat], r_all)
        return r, pix[v[:, None], flat]

    def draw(key, n_tiles=40, th=8, tw=16):
        return _draw(key, rays_all, pixels, n_tiles, th, tw, stride)

    # {step: target reso} ladder: the k-th fraction doubles to
    # RESO / 2^(n_stages-1-k); the run starts at RESO / 2^n_stages
    upsample_plan = {
        int(PLENOXEL_STEPS * f): PLENOXEL_RESO
        >> (len(PLENOXEL_UPSAMPLE_FRACS) - 1 - k)
        for k, f in enumerate(PLENOXEL_UPSAMPLE_FRACS)
    }
    reso0 = PLENOXEL_RESO >> len(PLENOXEL_UPSAMPLE_FRACS)
    g = SparseGrid.create(
        reso0, basis_dim=9, radius=1.3, use_sphere_bound=True,
        init_density=PLENOXEL_INIT_SIGMA,
    )
    bg = from_sparse_grid(g)
    opts = GridRenderOptions(step_size=0.5)
    trainer = PlenoxelsTrainer(
        opts, n_iters=PLENOXEL_DECAY or PLENOXEL_STEPS,
        lr_sigma=PLENOXEL_LR_SIGMA,
        lr_sigma_delay_steps=(
            PLENOXEL_DELAY if PLENOXEL_DELAY >= 0
            else int(0.075 * PLENOXEL_STEPS)),
        lr_sh=PLENOXEL_LR_SH, lambda_tv=1e-5 * PLENOXEL_TV_SCALE,
        lambda_tv_sh=1e-3 * PLENOXEL_TV_SCALE,
        lambda_sparsity=PLENOXEL_SPARSITY,
        rms_pervisit=bool(PLENOXEL_RMS_PERVISIT),
    )
    from nerf_projects_tpu.train import plenoxels_sparse as ps

    def flat_cap_for(bg_):
        if not PLENOXEL_FLAT:
            return None
        from nerf_projects_tpu.ops.pallas.flat_train import (
            required_windows,
        )

        pr, _ = draw(jax.random.PRNGKey(7), n_tiles=PLENOXEL_TILES)
        w = required_windows(bg_, pr, opts)
        cap = max(64, -(-(w * 3 // 2) // 64) * 64)
        print(f"flat w_cap {cap} (probe {w})", flush=True)
        return cap

    # phase-boundary resume: the rms state is rebuilt fresh at every
    # upsample boundary anyway, so resuming from a phase-end grid
    # checkpoint is EXACTLY equivalent to the uninterrupted run. On
    # QUALITY_RESUME=1, load the latest phase_*.npz in SAVE_DIR and
    # restart the loop at its recorded step (the upsample_plan entry AT
    # that step then fires immediately, replaying the resample).
    start_step = 0
    if SAVE_DIR and int(os.environ.get("QUALITY_RESUME", "0")):
        import glob as _glob

        cands = sorted(_glob.glob(f"{SAVE_DIR}/phase_*.npz"))
        if cands:
            path = cands[-1]
            start_step = int(path.rsplit("_", 1)[1].split(".")[0])
            g = SparseGrid.load(path)
            bg = from_sparse_grid(g)
            print(f"resumed from {path} at step {start_step} "
                  f"(reso {g.reso[0]})", flush=True)

    pst = ps.packed_state_from_grid(bg)
    flat_cap = flat_cap_for(bg)

    def eval_held_out(bg_, tag=""):
        from nerf_projects_tpu.ops.tile_render import (
            render_image_tiles_pallas_exact,
        )

        img0, est = render_image_tiles_pallas_exact(
            bg_, held_out_rays(ds), H, W, opts)
        m0 = compute_metrics(img0, ds["images"][0])
        if tag:
            print(f"plenoxels held-out[{tag}]:", json.dumps(
                {k: round(float(v), 3) for k, v in m0.items()}
                | {"fallback_rays": est["fallback_rays"]}),
                flush=True)
        return img0, m0

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(start_step, PLENOXEL_STEPS):
        if EVAL_EVERY and i and i % EVAL_EVERY == 0:
            eval_held_out(ps.grid_from_packed_state(bg, pst),
                          tag=f"step {i}")
        if i in upsample_plan:
            from nerf_projects_tpu.models.grid_lifecycle import resample
            from nerf_projects_tpu.ops.brick_grid import to_sparse_grid

            reso_next = upsample_plan[i]

            def _hbm(tag):
                try:
                    s = jax.local_devices()[0].memory_stats()
                    print(f"hbm[{tag}]: in_use "
                          f"{s.get('bytes_in_use', 0) / 1e9:.2f} GB peak "
                          f"{s.get('peak_bytes_in_use', 0) / 1e9:.2f} GB",
                          flush=True)
                except Exception:
                    pass

            _hbm("pre-upsample")
            bg = ps.grid_from_packed_state(bg, pst)
            pst = None
            # phase-boundary held-out eval: records what each
            # resolution phase adds (VERDICT r3 weak #6 evidence)
            eval_held_out(bg, tag=f"end of {bg.reso[0]}^3 phase @ {i}")
            if SAVE_DIR:
                # phase-end checkpoint (resume point: QUALITY_RESUME=1)
                try:
                    from nerf_projects_tpu.ops.brick_grid import (
                        to_sparse_grid as _tsg_ck,
                    )

                    os.makedirs(SAVE_DIR, exist_ok=True)
                    _tsg_ck(bg).save(f"{SAVE_DIR}/phase_{i:06d}.npz")
                    print(f"phase ckpt -> {SAVE_DIR}/phase_{i:06d}.npz",
                          flush=True)
                except Exception as exc:
                    print("phase ckpt failed:", repr(exc)[:120],
                          flush=True)
            g2 = resample(
                to_sparse_grid(bg),
                (reso_next,) * 3,
                sigma_thresh=0.5, dilate=2,
            )
            bg = from_sparse_grid(g2)
            del g2
            # drop old-shape executables + donated-buffer aliases before
            # the new-shape step compiles (512^3 runs OOMed here)
            jax.clear_caches()
            _hbm("post-resample")
            pst = ps.packed_state_from_grid(bg)
            flat_cap = flat_cap_for(bg)
            _hbm("post-state")
            print(f"upsampled to {reso_next}^3: "
                  f"{bg.n_bricks} bricks", flush=True)
        if (SAVE_DIR and CKPT_EVERY and i and i % CKPT_EVERY == 0
                and i not in upsample_plan):
            # in-phase safety checkpoint. Resuming from one is
            # APPROXIMATE (the rms second-moment state restarts), unlike
            # the exactly-equivalent phase-boundary points; it bounds
            # the loss from a killed run to CKPT_EVERY steps.
            try:
                from nerf_projects_tpu.ops.brick_grid import (
                    to_sparse_grid as _tsg_p,
                )

                _tsg_p(ps.grid_from_packed_state(bg, pst)).save(
                    f"{SAVE_DIR}/phase_{i:06d}.npz")
                print(f"safety ckpt @ {i}", flush=True)
            except Exception as exc:
                print("safety ckpt failed:", repr(exc)[:120], flush=True)
        key, kd, kt = jax.random.split(key, 3)
        rays, target = draw(kd, n_tiles=PLENOXEL_TILES)
        # touched-row step: O(touched) optimizer, lazy-exact RMSprop
        # (parity-tested vs the dense packed step)
        dopt = {0: False, 1: True, 2: "defer"}[PLENOXEL_DENSE_OPTIM]
        step_i = jnp.asarray(i, jnp.int32)
        pst, st = ps.train_step_tiles_packed_touched_jit(
            trainer, bg, pst, rays, target,
            step_i, kt,
            max_touched=PLENOXEL_MAX_TOUCHED,
            flat_windows=flat_cap,
            dense_optim=dopt,
        )
        if dopt == "defer":
            pst = ps.dense_sweep_apply_jit(
                trainer, bg, pst, st.pop("dense_acc"),
                st.pop("touched_flag"), step_i,
            )
        if i % 500 == 0:
            print(f"plenoxels step {i}: train psnr "
                  f"{float(st['psnr']):.2f} miss "
                  f"{float(st.get('window_miss', -1)):.4f} ovf "
                  f"{float(st.get('touched_overflow', 0)):.4f}",
                  flush=True)
    bg = ps.grid_from_packed_state(bg, pst)
    dt = time.time() - t0

    # held-out render through the Pallas path (8x16 tiles)
    img, m = eval_held_out(bg)
    flat = tu.tree_map(
        lambda x: x.reshape(-1, 3), held_out_rays(ds)
    )
    print("plenoxels held-out:", json.dumps(
        {k: round(float(v), 3) for k, v in m.items()}
        | {"train_minutes": round(dt / 60, 1)}), flush=True)
    if SAVE_DIR:
        os.makedirs(SAVE_DIR, exist_ok=True)
        try:
            import imageio.v2 as imageio

            gt = np.asarray(ds["images"][0])
            ren = np.asarray(jnp.clip(img, 0, 1))
            err = np.abs(ren - gt).max(-1)
            imageio.imwrite(f"{SAVE_DIR}/heldout.png",
                            (ren * 255).astype(np.uint8))
            imageio.imwrite(f"{SAVE_DIR}/gt.png",
                            (np.clip(gt, 0, 1) * 255).astype(np.uint8))
            imageio.imwrite(f"{SAVE_DIR}/err.png",
                            (np.clip(err * 4, 0, 1) * 255).astype(
                                np.uint8))
        except Exception as exc:
            print("png save failed:", repr(exc)[:120], flush=True)
        try:
            from nerf_projects_tpu.ops.brick_grid import (
                to_sparse_grid as _tsg0,
            )

            _tsg0(bg).save(f"{SAVE_DIR}/trained_grid.npz")
            print(f"saved grid -> {SAVE_DIR}/trained_grid.npz",
                  flush=True)
        except Exception as exc:
            print("grid save failed:", repr(exc)[:120], flush=True)

    # exact-path eval (per-sample gathers, no tile window): separates
    # trained-grid quality from tile-render window artifacts. One retry:
    # the axon remote compile helper 500s transiently.
    for _attempt in range(2):
      try:
        from nerf_projects_tpu.ops.grid import volume_render_grid

        from nerf_projects_tpu.ops.brick_grid import to_sparse_grid as _tsg

        g_out = _tsg(bg)
        outs = []
        # samples/ray scale with reso; the padded per-sample gather
        # OOMs HBM at 512^3 with the 256^3-sized chunk (r5 crash)
        chunk = 2048 if max(g_out.reso) <= 256 else 256
        n = flat.origins.shape[0]
        ex = jax.jit(lambda gg, r: volume_render_grid(gg, r, opts)["rgb"])
        for i in range(0, n, chunk):
            sl = tu.tree_map(lambda x: x[i : i + chunk], flat)
            pad = chunk - sl.origins.shape[0]
            if pad:
                sl = tu.tree_map(
                    lambda x: jnp.pad(x, ((0, pad), (0, 0)),
                                      mode="edge"), sl)
            o = ex(g_out, sl)
            outs.append(o[: chunk - pad] if pad else o)
        img_ex = jnp.concatenate(outs, 0).reshape(H, W, 3)
        m_ex = compute_metrics(img_ex, ds["images"][0])
        print("plenoxels held-out (exact path):", json.dumps(
            {k: round(float(v), 3) for k, v in m_ex.items()}),
            flush=True)
        break
      except Exception as exc:
        print("exact-path eval failed:", repr(exc)[:200], flush=True)
    return m


def quality_plenoxels_cell(ds):
    """Dense per-sample-gather step with GLOBALLY-SHUFFLED random-ray
    batches — the reference's sampling statistics (opt.py:395-400).
    Discriminator for the coherent-tile quality gap: identical losses,
    lrs, and schedule to the tile path; only the sampling pattern and
    the render/grad path differ."""
    from nerf_projects_tpu.models.sparse_grid import SparseGrid
    from nerf_projects_tpu.ops.grid import (
        GridRenderOptions,
        volume_render_grid,
    )
    from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

    rays_all = tu.tree_map(
        lambda x: x.reshape(N_VIEWS, H * W, 3)[1:].reshape(-1, 3),
        ds["rays"],
    )
    pixels = ds["pixels"].reshape(N_VIEWS, H * W, 3)[1:].reshape(-1, 3)
    n_pool = pixels.shape[0]

    @functools.partial(jax.jit, static_argnums=(3,))
    def draw(key, r_all, pix, bs):
        idx = jax.random.randint(key, (bs,), 0, n_pool)
        return tu.tree_map(lambda a: a[idx], r_all), pix[idx]

    upsample_step = (
        int(PLENOXEL_STEPS * PLENOXEL_UPSAMPLE_AT)
        if PLENOXEL_UPSAMPLE_AT > 0 else None
    )
    reso0 = PLENOXEL_RESO // 2 if upsample_step else PLENOXEL_RESO
    g = SparseGrid.create(
        reso0, basis_dim=9, radius=1.3, use_sphere_bound=True,
        init_density=PLENOXEL_INIT_SIGMA,
    )
    opts = GridRenderOptions(step_size=0.5)
    trainer = PlenoxelsTrainer(
        opts, n_iters=PLENOXEL_DECAY or PLENOXEL_STEPS,
        lr_sigma=PLENOXEL_LR_SIGMA,
        lr_sigma_delay_steps=(
            PLENOXEL_DELAY if PLENOXEL_DELAY >= 0
            else int(0.075 * PLENOXEL_STEPS)),
        lr_sh=PLENOXEL_LR_SH, lambda_tv=1e-5 * PLENOXEL_TV_SCALE,
        lambda_tv_sh=1e-3 * PLENOXEL_TV_SCALE,
        lambda_sparsity=PLENOXEL_SPARSITY,
    )
    rms = trainer.init_rms(g)

    def eval_exact(g_, tag=""):
        flat0 = tu.tree_map(
            lambda x: x.reshape(-1, 3), held_out_rays(ds))
        ex = jax.jit(
            lambda gg, r: volume_render_grid(gg, r, opts)["rgb"])
        outs, chunk = [], 2048
        n = flat0.origins.shape[0]
        for i in range(0, n, chunk):
            sl = tu.tree_map(lambda x: x[i : i + chunk], flat0)
            pad = chunk - sl.origins.shape[0]
            if pad:
                sl = tu.tree_map(
                    lambda x: jnp.pad(x, ((0, pad), (0, 0)),
                                      mode="edge"), sl)
            o = ex(g_, sl)
            outs.append(o[: chunk - pad] if pad else o)
        img0 = jnp.concatenate(outs, 0).reshape(H, W, 3)
        m0 = compute_metrics(img0, ds["images"][0])
        if tag:
            print(f"plenoxels-cell held-out[{tag}]:", json.dumps(
                {k: round(float(v), 3) for k, v in m0.items()}),
                flush=True)
        return img0, m0

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(PLENOXEL_STEPS):
        if upsample_step is not None and i == upsample_step:
            from nerf_projects_tpu.models.grid_lifecycle import resample

            del rms
            jax.clear_caches()
            g = resample(
                g, (PLENOXEL_RESO,) * 3, sigma_thresh=0.5, dilate=2,
            )
            rms = trainer.init_rms(g)
            print(f"upsampled to {PLENOXEL_RESO}^3: cap {g.capacity}",
                  flush=True)
        if EVAL_EVERY and i and i % EVAL_EVERY == 0:
            eval_exact(g, tag=f"step {i}")
        key, kd, kt = jax.random.split(key, 3)
        rays, target = draw(kd, rays_all, pixels, CELL_BATCH)
        g, rms, st = trainer.train_step(
            g, rms, rays, target, jnp.asarray(i, jnp.float32), kt)
        if i % 500 == 0:
            print(f"plenoxels-cell step {i}: train psnr "
                  f"{float(st['psnr']):.2f}", flush=True)
    dt = time.time() - t0
    img, m = eval_exact(g)
    print("plenoxels-cell held-out:", json.dumps(
        {k: round(float(v), 3) for k, v in m.items()}
        | {"train_minutes": round(dt / 60, 1)}), flush=True)
    if SAVE_DIR:
        os.makedirs(SAVE_DIR, exist_ok=True)
        try:
            import imageio.v2 as imageio

            ren = np.asarray(jnp.clip(img, 0, 1))
            imageio.imwrite(f"{SAVE_DIR}/heldout_cell.png",
                            (ren * 255).astype(np.uint8))
        except Exception as exc:
            print("png save failed:", repr(exc)[:120], flush=True)
        try:
            g.save(f"{SAVE_DIR}/trained_grid_cell.npz")
        except Exception as exc:
            print("grid save failed:", repr(exc)[:120], flush=True)
    return m


def quality_nerf_sh(ds):
    from nerf_projects_tpu.models.nerf_sh import NeRFSHModel
    from nerf_projects_tpu.train.nerf_sh_trainer import NeRFSHTrainer

    model = NeRFSHModel(
        sh_deg=2,
        num_coarse_samples=64,
        num_fine_samples=128,
        near=2.0,
        far=6.0,
        white_bkgd=True,
        use_fused_trunk=True,
    )
    trainer = NeRFSHTrainer(model, lr_delay_steps=500, max_steps=20000)
    state = trainer.init_state(jax.random.PRNGKey(0))

    view_rays = tu.tree_map(
        lambda x: x.reshape(N_VIEWS, -1, 3)[1:], ds["rays"]
    )
    view_rgb = ds["pixels"].reshape(N_VIEWS, -1, 3)[1:]
    ys, xs = np.meshgrid(np.arange(H // 4, 3 * H // 4),
                         np.arange(W // 4, 3 * W // 4), indexing="ij")
    crop = (ys * W + xs).reshape(-1)
    crop_rays = tu.tree_map(
        lambda x: x[:, crop].reshape(-1, 3), view_rays
    )
    crop_rgb = view_rgb[:, crop].reshape(-1, 3)
    full_rays = tu.tree_map(lambda x: x.reshape(-1, 3), view_rays)
    full_rgb = view_rgb.reshape(-1, 3)

    key = jax.random.PRNGKey(1)
    t0 = time.time()

    def batches(rays_pool, rgb_pool, n_steps, bs=1024):
        nonlocal state, key
        n = rgb_pool.shape[0]
        stats = None
        for i in range(n_steps):
            key, k = jax.random.split(key)
            idx = jax.random.randint(k, (bs,), 0, n)
            r = tu.tree_map(lambda a: a[idx], rays_pool)
            state, stats = trainer.train_step(state, r, rgb_pool[idx])
        return stats

    stats = batches(crop_rays, crop_rgb, 500)
    print(f"nerf_sh precrop end psnr {float(stats['psnr']):.2f}",
          flush=True)
    for chunk in range(SH_CHUNKS):
        stats = batches(full_rays, full_rgb, 1000)
        print(f"nerf_sh step {(chunk + 1) * 1000 + 500}: "
              f"{float(stats['psnr']):.2f}", flush=True)
    dt = time.time() - t0

    rays0 = held_out_rays(ds)
    flat = tu.tree_map(lambda x: x.reshape(-1, 3), rays0)
    outs = []
    chunk = 4608
    n = flat.origins.shape[0]
    for i in range(0, n, chunk):
        sl = tu.tree_map(lambda x: x[i : i + chunk], flat)
        pad = chunk - sl.origins.shape[0]
        if pad:
            sl = tu.tree_map(
                lambda x: jnp.pad(x, ((0, pad), (0, 0)), mode="edge"), sl
            )
        out = trainer.render_eval(state.params, sl)
        rgb = out["rgb"]
        outs.append(rgb[: chunk - pad] if pad else rgb)
    img = jnp.concatenate(outs).reshape(H, W, 3)
    m = compute_metrics(img, ds["images"][0])
    print("nerf_sh held-out:", json.dumps(
        {k: round(float(v), 3) for k, v in m.items()}
        | {"train_minutes": round(dt / 60, 1)}), flush=True)
    return m


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    ds = dataset()
    if WHICH in ("plenoxels", "all"):
        if STEP_MODE == "cell":
            quality_plenoxels_cell(ds)
        else:
            quality_plenoxels(ds)
    if WHICH in ("nerf_sh", "all"):
        quality_nerf_sh(ds)
