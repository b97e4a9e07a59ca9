"""Plenoxels optimization CLI — the svox2/opt/opt.py equivalent.

Parity target: reference svox2/opt/opt.py —
  * the argument groups (general / optimization / losses / logging) with
    the reference names and defaults (:42-273), plus JSON config merge;
  * grid init: z-order layout, sphere bound, init_sigma (:311-327);
  * epoch loop (:395-898): shuffled ray batches, fused render+grad+
    RMSprop steps, TV regularization, periodic eval with PSNR + memory
    telemetry + optional MCQ/FDR, progressive `reso` upsampling schedule
    with tv_early_only, checkpoint save, final time_mins.txt.

The fused CUDA path of the reference is the jitted train_step of
PlenoxelsTrainer (render -> MSE grad -> TV grad -> RMSprop in one XLA
program). Topology events (resample) re-jit between epochs.
"""
from __future__ import annotations

import argparse
import ast
import json
import os
import time
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.core.rays import camera_rays_opencv
from nerf_projects_tpu.data.base import load_scene
from nerf_projects_tpu.models.grid_lifecycle import resample
from nerf_projects_tpu.models.sparse_grid import SparseGrid
from nerf_projects_tpu.obs.advanced_metrics import compute_fdr, compute_mcq
from nerf_projects_tpu.obs.json_logger import MetricsLogger
from nerf_projects_tpu.obs.memory_tracker import MemoryTracker
from nerf_projects_tpu.obs.metrics import compute_metrics
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer
from nerf_projects_tpu.utils.config import maybe_merge_config_file, save_args_snapshot


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Plenoxels optimization (TPU)")
    g = parser.add_argument_group("general")
    g.add_argument("data_dir", type=str, nargs="?", default=None)
    g.add_argument("--train_dir", "-t", type=str, default="ckpt")
    g.add_argument("--config", "-c", type=str, default=None)
    g.add_argument("--reso", type=str,
                   default="[[256, 256, 256], [512, 512, 512]]",
                   help="list of grid resolution steps (python literal)")
    g.add_argument("--upsamp_every", type=int, default=3 * 12800)
    g.add_argument("--init_iters", type=int, default=0)
    g.add_argument("--upsample_density_add", type=float, default=0.0)
    g.add_argument("--sh_dim", type=int, default=9)
    g.add_argument("--scene_radius", type=float, default=1.5)
    g = parser.add_argument_group("optimization")
    g.add_argument("--n_iters", type=int, default=10 * 12800)
    g.add_argument("--batch_size", type=int, default=5000)
    g.add_argument("--sigma_optim", choices=["sgd", "rmsprop"], default="rmsprop")
    g.add_argument("--lr_sigma", type=float, default=3e1)
    g.add_argument("--lr_sigma_final", type=float, default=5e-2)
    g.add_argument(
        "--lr_sigma_decay_steps", type=int, default=-1,
        help="-1 (default): scale the reference's 250000/128000 "
        "decay-horizon ratio to n_iters (exactly 250000 at the "
        "default n_iters=128000). The reference trains against a "
        "LONGER horizon than the run (opt.py:100 defaults), ending at "
        "lr_sigma ~1, never the fully-decayed 5e-2 — a horizon equal "
        "to a short run starves late training (round-3 quality "
        "root-cause #4).")
    g.add_argument(
        "--lr_sigma_delay_steps", type=int, default=-1,
        help="-1 (default): scale the reference's 15000/128000 "
        "warm-up ratio to n_iters. Running delay=0 at lr_sigma 30 "
        "overshoots density +-250 in ~100 steps and the relu'd march "
        "permanently kills the negative crust (round-3 quality "
        "root-cause #2).")
    g.add_argument("--lr_sigma_delay_mult", type=float, default=1e-2)
    g.add_argument("--sh_optim", choices=["sgd", "rmsprop"], default="rmsprop")
    g.add_argument("--lr_sh", type=float, default=1e-2)
    g.add_argument("--lr_sh_final", type=float, default=5e-6)
    g.add_argument("--lr_sh_decay_steps", type=int, default=-1,
                   help="-1: scale with n_iters (see lr_sigma_decay_steps)")
    g.add_argument("--rms_beta", type=float, default=0.95)
    g.add_argument(
        "--rms_pervisit", type=int, default=1,
        help="RMSprop second-moment decays once per TOUCH instead of "
        "the reference-literal once per global step (beta^delta lazy). "
        "The literal semantics degenerate under coherent-tile sampling "
        "(rms collapses between bursts -> sign-sized updates); "
        "per-visit matches the reference's effective dynamics under "
        "its global ray shuffle. Applies to the touched/sparse steps.")
    g.add_argument("--print_every", type=int, default=20)
    g.add_argument("--save_every", type=int, default=5)
    g.add_argument("--eval_every", type=int, default=1)
    g.add_argument("--init_sigma", type=float, default=0.1)
    g = parser.add_argument_group("losses")
    g.add_argument("--lambda_tv", type=float, default=1e-5)
    g.add_argument("--tv_sparsity", type=float, default=0.01)
    g.add_argument("--lambda_tv_sh", type=float, default=1e-3)
    g.add_argument("--tv_sh_sparsity", type=float, default=0.01)
    g.add_argument("--lambda_tv_lumisphere", type=float, default=0.0)
    g.add_argument("--tv_lumisphere_sparsity", type=float, default=0.01)
    g.add_argument("--tv_lumisphere_dir_factor", type=float, default=0.0)
    g.add_argument("--lambda_l2_sh", type=float, default=0.0)
    g.add_argument("--lambda_sparsity", type=float, default=0.0,
                   help="SNeRG/PlenOctrees ray sparsity loss weight")
    g.add_argument("--lambda_beta", type=float, default=0.0,
                   help="neural-volumes beta distribution loss weight")
    g.add_argument("--tv_early_only", type=int, default=1,
                   help="disable TV after the first upsample")
    g.add_argument("--density_thresh", type=float, default=5.0)
    g.add_argument("--weight_thresh", type=float, default=0.0005 * 512)
    g.add_argument("--max_grid_elements", type=int, default=44_000_000)
    g.add_argument("--thresh_type", choices=["weight", "sigma"], default="weight")
    g = parser.add_argument_group("rendering")
    g.add_argument("--step_mode",
                   choices=["cell", "tiles", "sparse", "touched",
                            "flat"],
                   default="cell",
                   help="cell: per-ray XLA step (reference-exact); "
                   "tiles: fused Pallas tile-march step on a BrickGrid; "
                   "sparse: row-sparse tile step (O(touched bricks), "
                   "for large grids); touched: fully-packed state with "
                   "the O(touched)-row lazy-exact optimizer (the fast "
                   "path); flat: touched step over the flat "
                   "active-window plan (surface scenes: tiles pay only "
                   "for their own active windows)")
    g.add_argument("--max_touched", type=int, default=16384,
                   help="touched/flat modes: static bound on unique "
                   "touched bricks per step (overflow drops updates "
                   "and is reported)")
    g.add_argument("--dense_optim", type=int, default=-1,
                   help="touched/flat modes: dense-sweep optimizer "
                   "(no K-row gather/scatter; exact under per-visit "
                   "rms or SGD). -1 = auto (on when eligible)")
    g.add_argument("--bf16_grad_blocks", action="store_true", default=False,
                   help="bf16 backward-kernel gradient blocks (halves "
                   "grad emission HBM traffic; fp32 accumulation)")
    g.add_argument("--use_occupancy", action="store_true", default=False,
                   help="restrict tile-march chunk count to the active "
                   "brick bound")
    g.add_argument("--tile_shape", type=str, default="8,16",
                   help="tile rows,cols for tile/sparse step modes "
                   "(rows*cols must be 128 or 256)")
    g.add_argument("--step_size", type=float, default=0.5)
    g.add_argument("--sigma_thresh", type=float, default=1e-8)
    g.add_argument("--stop_thresh", type=float, default=1e-7)
    g.add_argument("--background_brightness", type=float, default=1.0)
    g = parser.add_argument_group("logging")
    g.add_argument("--log_mse_image", action="store_true", default=False)
    g.add_argument("--log_depth_map", action="store_true", default=False)
    g.add_argument("--log_advanced_metrics", action="store_true", default=False)
    g.add_argument("--log_fdr", action="store_true", default=False)
    g.add_argument("--log_floater_viz", action="store_true", default=False,
                   help="log floater slices/overlays to TensorBoard")
    g.add_argument("--floater_viz_slices", type=int, default=3)
    g.add_argument("--fdr_density_threshold", type=float, default=0.01)
    g.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax profiler trace (XLA kernel "
                        "timeline) of a few post-compile train steps "
                        "into this directory")
    g.add_argument("--profile_steps", type=int, default=5,
                   help="steps to include in the profiler trace")
    return parser


def _to_opencv_pose(c2w: np.ndarray, scene) -> np.ndarray:
    """Convert an OpenGL-convention c2w (-z forward, +y up — how our
    loaders store poses) to OpenCV (+z forward, +y down), the convention
    the Plenoxels path renders with (svox2 nerf_dataset.py applies the
    same diag(1,-1,-1) flip to blender poses)."""
    if scene.meta.get("convention", "opengl") == "opencv":
        return np.asarray(c2w)
    out = np.asarray(c2w, np.float64).copy()
    out[:3, 1] *= -1.0
    out[:3, 2] *= -1.0
    return out.astype(np.float32)


def build_ray_pool_opencv(scene):
    """Rays for every pixel of every train view, OpenCV convention
    (dataset_base.py:37-76)."""
    fx = float(scene.intrinsics[0, 0])
    fy = float(scene.intrinsics[1, 1])
    cx = float(scene.intrinsics[0, 2])
    cy = float(scene.intrinsics[1, 2])
    all_rays, all_rgb = [], []
    for v in range(scene.images.shape[0]):
        rays = camera_rays_opencv(
            scene.height, scene.width, fx, fy, cx, cy,
            jnp.asarray(_to_opencv_pose(scene.poses[v], scene)),
        )
        all_rays.append(jax.tree_util.tree_map(lambda x: x.reshape(-1, 3), rays))
        all_rgb.append(jnp.asarray(scene.images[v].reshape(-1, 3)))
    pool = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *all_rays)
    return pool, jnp.concatenate(all_rgb)


def eval_step(trainer, grid, scene, max_views=2, chunk=4096):
    """Test-view PSNR (opt.py eval_step, without TB image dumps)."""
    psnrs = []
    fx = float(scene.intrinsics[0, 0])
    fy = float(scene.intrinsics[1, 1])
    cx = float(scene.intrinsics[0, 2])
    cy = float(scene.intrinsics[1, 2])
    for v in range(min(scene.images.shape[0], max_views)):
        rays = camera_rays_opencv(
            scene.height, scene.width, fx, fy, cx, cy,
            jnp.asarray(_to_opencv_pose(scene.poses[v], scene)),
        )
        flat = jax.tree_util.tree_map(lambda x: x.reshape(-1, 3), rays)
        n = flat.origins.shape[0]
        outs = []
        for i in range(0, n, chunk):
            sl = jax.tree_util.tree_map(lambda x: x[i : i + chunk], flat)
            pad = chunk - sl.origins.shape[0]
            if pad:
                sl = jax.tree_util.tree_map(
                    lambda x: jnp.pad(x, ((0, pad), (0, 0)), mode="edge"), sl
                )
            rgb = trainer.render_step(grid, sl)["rgb"]
            outs.append(rgb[: chunk - pad] if pad else rgb)
        img = jnp.concatenate(outs).reshape(scene.height, scene.width, 3)
        m = compute_metrics(img, scene.images[v])
        psnrs.append(m["psnr"])
    return float(np.mean(psnrs))


def resolve_schedule(args):
    """Fill the -1 schedule sentinels from n_iters using the
    reference's ratios (opt.py:100 defaults against its 128000-step
    run): delay 15000/128000, decay horizon 250000/128000. At the
    default n_iters these reproduce the reference's absolute values;
    at a shorter run they keep the DYNAMICS (warm-up fraction +
    never-fully-decayed horizon) that the round-3 quality root-cause
    analysis showed are load-bearing."""
    if args.lr_sigma_decay_steps < 0:
        args.lr_sigma_decay_steps = max(1, round(args.n_iters * 250000 / 128000))
    if args.lr_sh_decay_steps < 0:
        args.lr_sh_decay_steps = max(1, round(args.n_iters * 250000 / 128000))
    if args.lr_sigma_delay_steps < 0:
        args.lr_sigma_delay_steps = round(args.n_iters * 15000 / 128000)
    return args


def run(args, *, scene=None, test_scene=None, max_iters=None):
    args = resolve_schedule(args)
    if scene is None:
        scene = load_scene(args.data_dir, "train")
        try:
            test_scene = load_scene(args.data_dir, "test")
        except Exception:
            test_scene = scene
    os.makedirs(args.train_dir, exist_ok=True)
    save_args_snapshot(args, args.train_dir)

    reso_schedule = ast.literal_eval(args.reso)
    reso_idx = 0
    grid = SparseGrid.create(
        tuple(reso_schedule[0]),
        basis_dim=args.sh_dim,
        radius=args.scene_radius,
        use_sphere_bound=True,
        use_z_order=True,
        init_density=args.init_sigma,
    )
    opts = GridRenderOptions(
        step_size=args.step_size,
        sigma_thresh=args.sigma_thresh,
        stop_thresh=args.stop_thresh,
        background_brightness=args.background_brightness,
    )

    def make_trainer(tv_on=True):
        return PlenoxelsTrainer(
            opts,
            n_iters=args.lr_sigma_decay_steps,
            lr_sigma=args.lr_sigma,
            lr_sigma_final=args.lr_sigma_final,
            lr_sigma_delay_steps=args.lr_sigma_delay_steps,
            lr_sigma_delay_mult=args.lr_sigma_delay_mult,
            lr_sh=args.lr_sh,
            lr_sh_final=args.lr_sh_final,
            lambda_tv=args.lambda_tv if tv_on else 0.0,
            tv_sparsity=args.tv_sparsity,
            lambda_tv_sh=args.lambda_tv_sh if tv_on else 0.0,
            tv_sh_sparsity=args.tv_sh_sparsity,
            lambda_beta=args.lambda_beta,
            lambda_sparsity=args.lambda_sparsity,
            lambda_l2_sh=args.lambda_l2_sh,
            lambda_tv_lumisphere=args.lambda_tv_lumisphere if tv_on else 0.0,
            tv_lumisphere_sparsity=args.tv_lumisphere_sparsity,
            tv_lumisphere_dir_factor=args.tv_lumisphere_dir_factor,
            sigma_optim=args.sigma_optim,
            sh_optim=args.sh_optim,
            rms_beta=args.rms_beta,
            rms_pervisit=bool(args.rms_pervisit),
            bf16_grad_blocks=args.bf16_grad_blocks,
            use_occupancy=args.use_occupancy,
        )

    trainer = make_trainer(True)
    rms = trainer.init_rms(grid)

    pool, pixels = build_ray_pool_opencv(scene)
    n_pool = pixels.shape[0]

    @jax.jit
    def draw(key):
        idx = jax.random.randint(key, (args.batch_size,), 0, n_pool)
        return jax.tree_util.tree_map(lambda x: x[idx], pool), pixels[idx]

    # ---- tile/sparse step modes: brick-grid state + coherent-tile draws
    tile_mode = args.step_mode in ("tiles", "sparse", "touched", "flat")
    bg = sst = rms_b = None
    if tile_mode:
        from nerf_projects_tpu.ops.brick_grid import (
            from_sparse_grid,
            to_sparse_grid,
        )
        from nerf_projects_tpu.train import plenoxels_sparse as ps

        th, tw = (int(x) for x in args.tile_shape.split(","))
        if th * tw not in (128, 256):
            raise SystemExit("--tile_shape rows*cols must be 128 or 256")
        V = scene.images.shape[0]
        H, Wd = scene.height, scene.width
        pool_v = jax.tree_util.tree_map(
            lambda x: x.reshape(V, H * Wd, 3), pool
        )
        pix_v = pixels.reshape(V, H * Wd, 3)
        n_t = max(args.batch_size // (th * tw), 1)

        @jax.jit
        def draw_tiles(key):
            kv, ky, kx = jax.random.split(key, 3)
            v = jax.random.randint(kv, (n_t,), 0, V)
            y0 = jax.random.randint(ky, (n_t,), 0, H - th + 1)
            x0 = jax.random.randint(kx, (n_t,), 0, Wd - tw + 1)
            dy, dx = jnp.meshgrid(
                jnp.arange(th), jnp.arange(tw), indexing="ij"
            )
            flat = (y0[:, None] + dy.reshape(-1)[None]) * Wd + (
                x0[:, None] + dx.reshape(-1)[None]
            )
            r = jax.tree_util.tree_map(
                lambda a: a[v[:, None], flat], pool_v
            )
            return r, pix_v[v[:, None], flat]

        flat_cap = {"w": 0}
        # dense-sweep optimizer (-1 auto): on for touched/flat under
        # per-visit rms or SGD — the K-row gather/scatter machinery
        # costs ~5.5 us/row on TPU (round-4 tail bisect) while the
        # dense where(g==0) sweep is pure bandwidth over the state
        dense_optim = bool(
            args.dense_optim if args.dense_optim >= 0
            else (
                args.step_mode in ("touched", "flat")
                and (bool(args.rms_pervisit)
                     or args.sigma_optim == "sgd")
            )
        )

        def build_tile_state(g):
            nonlocal bg, sst, rms_b
            bg = from_sparse_grid(g)
            if args.step_mode == "sparse":
                sst = ps.sparse_state_from_grid(bg)
            elif args.step_mode in ("touched", "flat"):
                sst = ps.packed_state_from_grid(bg)
                if args.step_mode == "flat":
                    # size the static window capacity from a probe
                    # batch (+50% headroom, 64-aligned); re-sized on
                    # every topology change (upsample). Overflow is
                    # surfaced in stats and logged.
                    from nerf_projects_tpu.ops.pallas.flat_train import (
                        required_windows,
                    )

                    pr, _ = draw_tiles(jax.random.PRNGKey(7))
                    w = required_windows(bg, pr, trainer.opts)
                    flat_cap["w"] = max(64, -(-(w * 3 // 2) // 64) * 64)
            else:
                rms_b = trainer.init_rms_bricks(bg)

        def materialize_grid():
            if args.step_mode == "sparse":
                return to_sparse_grid(ps.grid_from_sparse_state(bg, sst))
            if args.step_mode in ("touched", "flat"):
                return to_sparse_grid(ps.grid_from_packed_state(bg, sst))
            return to_sparse_grid(bg)

        build_tile_state(grid)

    logger = MetricsLogger(args.train_dir)
    tracker = MemoryTracker()
    from nerf_projects_tpu.obs.tb import SummaryWriter

    tb = SummaryWriter(os.path.join(args.train_dir, "tb"))
    t_start = time.time()
    key = jax.random.PRNGKey(20200823)
    n_iters = max_iters if max_iters is not None else args.n_iters

    cameras = [
        (scene.poses[v], scene.intrinsics, scene.height, scene.width)
        for v in range(scene.images.shape[0])
    ]
    upsampled = False
    # kernel-level attribution via jax profiler traces (SURVEY §5: the
    # TPU equivalent of the reference's nvprof capture). Steps 1-2 are
    # compile; trace the steady state after them.
    from nerf_projects_tpu.utils.timing import profiler_trace

    prof = None
    prof_window = (3, 3 + args.profile_steps) if args.profile_dir else None
    for step in range(1, n_iters + 1):
        if prof_window and step == prof_window[0]:
            prof = profiler_trace(args.profile_dir)
            prof.__enter__()
        if prof is not None and (
            step == prof_window[1] or step == n_iters
        ):
            prof.__exit__(None, None, None)
            prof = None
        key, sub, k_tv = jax.random.split(key, 3)
        if args.step_mode == "cell":
            rays, target = draw(sub)
            grid, rms, stats = trainer.train_step(
                grid, rms, rays, target, jnp.asarray(step, jnp.float32),
                k_tv,
            )
        elif args.step_mode == "tiles":
            rays, target = draw_tiles(sub)
            bg, rms_b, stats = trainer.train_step_tiles_pallas(
                bg, rms_b, rays, target, jnp.asarray(step, jnp.float32),
                k_tv,
            )
        elif args.step_mode in ("touched", "flat"):
            rays, target = draw_tiles(sub)
            sst, stats = ps.train_step_tiles_packed_touched_jit(
                trainer, bg, sst, rays, target,
                jnp.asarray(step, jnp.int32), k_tv,
                max_touched=args.max_touched,
                use_occupancy=args.use_occupancy,
                flat_windows=flat_cap["w"] or None,
                dense_optim=dense_optim,
            )
        else:  # sparse
            rays, target = draw_tiles(sub)
            sst, stats = ps.train_step_tiles_sparse_jit(
                trainer, bg, sst, rays, target,
                jnp.asarray(step, jnp.int32), k_tv,
                use_occupancy=args.use_occupancy,
            )
        if step % args.print_every == 0:
            tb.scalar("train/mse", stats["mse"], step)
            tb.scalar("train/psnr", stats["psnr"], step)
            snap = tracker.capture_snapshot(step)
            logger.log_training_step(
                step,
                {k: float(v) for k, v in stats.items()},
                float(trainer.lr_sigma_fn(step)),
                memory_metrics=tracker.get_memory_metrics(snap),
            )
        # progressive upsampling (opt.py:855-887)
        if (
            step % args.upsamp_every == 0
            and reso_idx + 1 < len(reso_schedule)
        ):
            reso_idx += 1
            kwargs = dict(dilate=2, max_elements=args.max_grid_elements)
            if args.thresh_type == "weight":
                kwargs.update(cameras=cameras,
                              weight_thresh=args.weight_thresh / 512)
            else:
                kwargs.update(sigma_thresh=args.density_thresh)
            if tile_mode:
                grid = materialize_grid()
            grid = resample(grid, tuple(reso_schedule[reso_idx]), **kwargs)
            if args.upsample_density_add:
                grid = replace(
                    grid,
                    density_data=grid.density_data + args.upsample_density_add,
                )
            upsampled = True
            if args.tv_early_only:
                trainer = make_trainer(tv_on=False)
            rms = trainer.init_rms(grid)
            if tile_mode:
                build_tile_state(grid)
    if prof is not None:  # window extended past n_iters
        prof.__exit__(None, None, None)
    # final eval + save (opt.py:889-898)
    if tile_mode:
        grid = materialize_grid()
    psnr = eval_step(trainer, grid, test_scene or scene)
    if args.log_floater_viz:
        from nerf_projects_tpu.obs.floater_viz import log_floater_visualizations

        ts = test_scene or scene
        cams = [
            (
                _to_opencv_pose(ts.poses[v], ts), np.asarray(ts.intrinsics),
                ts.height, ts.width,
            )
            for v in range(min(2, ts.images.shape[0]))
        ]
        log_floater_visualizations(
            tb, grid, n_iters, cameras=cams,
            gt_images=[np.asarray(ts.images[v]) for v in range(len(cams))],
            threshold=args.fdr_density_threshold,
            n_slices=args.floater_viz_slices,
        )
    grid.save(os.path.join(args.train_dir, "ckpt.npz"))
    mins = (time.time() - t_start) / 60.0
    with open(os.path.join(args.train_dir, "time_mins.txt"), "w") as f:
        f.write(f"{mins:.4f}\n")
    with open(os.path.join(args.train_dir, "test_psnr.txt"), "w") as f:
        f.write(f"{psnr:.4f}\n")
    result = {"psnr": psnr, "time_mins": mins, "capacity": grid.capacity}
    if args.log_advanced_metrics or args.log_fdr:
        mem = tracker.get_memory_metrics()
        result.update(compute_mcq(psnr, mem["device_peak_memory_gb"] * 1024))
        result.update(compute_fdr(grid, threshold=0.01, min_object_size=100))
    logger.log_evaluation_step(n_iters, {"psnr": psnr})
    return grid, trainer, result


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    args = maybe_merge_config_file(args)
    _, _, result = run(args)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
