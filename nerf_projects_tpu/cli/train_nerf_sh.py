"""NeRF-SH training CLI — the `python -m nerf_sh.train` equivalent.

Parity target: reference plenoctree/nerf_sh/train.py:134-382 `main`:
flag/YAML config, dataset ray pools, jitted train step (DP-sharded over
the device mesh instead of pmap), periodic logging (rays/sec, JSON
metrics, memory snapshots), checkpointing, and periodic test-image render
with PSNR/SSIM.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.cli.nerf_sh_flags import NeRFSHFlags, build_model
from nerf_projects_tpu.core.rays import camera_rays
from nerf_projects_tpu.data.base import load_scene
from nerf_projects_tpu.obs.json_logger import MetricsLogger
from nerf_projects_tpu.obs.memory_tracker import MemoryTracker
from nerf_projects_tpu.obs.metrics import compute_metrics
from nerf_projects_tpu.train.nerf_sh_trainer import NeRFSHTrainer
from nerf_projects_tpu.utils.config import check_flags, update_flags


def build_ray_pool(scene):
    all_rays, all_rgb = [], []
    for v in range(scene.images.shape[0]):
        rays = camera_rays(
            scene.height, scene.width, scene.intrinsics,
            jnp.asarray(scene.poses[v]), pixel_center=0.5,
        )
        all_rays.append(jax.tree_util.tree_map(lambda x: x.reshape(-1, 3), rays))
        all_rgb.append(jnp.asarray(scene.images[v].reshape(-1, 3)))
    pool = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *all_rays)
    return pool, jnp.concatenate(all_rgb)


def render_image_sh(trainer, params, scene, view: int, chunk: int = 8192):
    rays = camera_rays(
        scene.height, scene.width, scene.intrinsics,
        jnp.asarray(scene.poses[view]), pixel_center=0.5,
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
        out = trainer.render_eval(params, sl)["rgb"]
        outs.append(out[: chunk - pad] if pad else out)
    return jnp.concatenate(outs).reshape(scene.height, scene.width, 3)


def train_main(flags: NeRFSHFlags, *, scene=None, test_scene=None,
               max_steps=None, seed: int = 20200823):
    if flags.config:
        update_flags(flags, flags.config)
    check_flags(flags, require_data=scene is None,
                n_devices=jax.local_device_count())
    if scene is None:
        kwargs = {}
        if flags.dataset == "blender":
            kwargs = dict(white_bkgd=flags.white_bkgd)
        elif flags.dataset == "llff":
            kwargs = dict(factor=flags.factor, spherify=flags.spherify,
                          llffhold=flags.llffhold)
        scene = load_scene(flags.data_dir, "train", **kwargs)
        try:
            test_scene = load_scene(flags.data_dir, "test", **kwargs)
        except Exception:
            test_scene = scene

    os.makedirs(flags.train_dir, exist_ok=True)
    # Persist the resolved flags so downstream tools (eval, octree
    # extraction) reconstruct the exact same model architecture.
    with open(os.path.join(flags.train_dir, "flags.json"), "w") as f:
        json.dump(dataclasses.asdict(flags), f, indent=2)
    model = build_model(flags)
    trainer = NeRFSHTrainer(
        model,
        lr_init=flags.lr_init,
        lr_final=flags.lr_final,
        max_steps=flags.max_steps,
        lr_delay_steps=flags.lr_delay_steps,
        lr_delay_mult=flags.lr_delay_mult,
        sparsity_weight=flags.sparsity_weight,
        sparsity_length=flags.sparsity_length,
        sparsity_npoints=flags.sparsity_npoints,
        sparsity_radius=flags.sparsity_radius,
        weight_decay_mult=flags.weight_decay_mult,
        randomized=flags.randomized,
    )
    state = trainer.init_state(jax.random.PRNGKey(seed))

    # resume
    ckpt = os.path.join(flags.train_dir, "checkpoint.msgpack")
    if os.path.exists(ckpt):
        from flax import serialization

        with open(ckpt, "rb") as f:
            state = serialization.from_bytes(state, f.read())

    pool, pixels = build_ray_pool(scene)
    n_pool = pixels.shape[0]

    @jax.jit
    def draw(key):
        idx = jax.random.randint(key, (flags.batch_size,), 0, n_pool)
        return jax.tree_util.tree_map(lambda x: x[idx], pool), pixels[idx]

    logger = MetricsLogger(flags.train_dir, clean_existing=int(state.step) == 0)
    tracker = MemoryTracker()
    timings_path = os.path.join(flags.train_dir, "timings.txt")

    n_steps = max_steps if max_steps is not None else flags.max_steps
    key = jax.random.PRNGKey(seed + 1)
    last_t = time.time()
    start = int(state.step)
    from nerf_projects_tpu.utils.timing import profiler_trace

    prof = None
    prof_open = start + 2 if flags.profile_dir else None  # post-compile
    for i in range(start, n_steps):
        if prof_open is not None and i == prof_open:
            prof = profiler_trace(flags.profile_dir)
            prof.__enter__()
        if prof is not None and i >= prof_open + flags.profile_steps:
            prof.__exit__(None, None, None)
            prof = None
        key, sub = jax.random.split(key)
        rays, target = draw(sub)
        state, stats = trainer.train_step(state, rays, target)
        step = i + 1
        if step % flags.print_every == 0:
            now = time.time()
            rays_per_s = flags.batch_size * flags.print_every / max(now - last_t, 1e-9)
            last_t = now
            logger.log_training_step(
                step,
                {k: float(v) for k, v in stats.items()},
                float(trainer.schedule(step)),
                timing_info={
                    "rays_per_sec": rays_per_s,
                    "steps_per_sec": flags.print_every / max(now - last_t + 1e-9, 1e-9),
                },
                memory_metrics=tracker.get_memory_metrics(
                    tracker.capture_snapshot(step)
                ),
            )
            with open(timings_path, "a") as f:
                from datetime import datetime

                f.write(f"{step} {datetime.now().isoformat()}\n")
        if step % flags.save_every == 0 or step == n_steps:
            from flax import serialization

            with open(ckpt, "wb") as f:
                f.write(serialization.to_bytes(state))
        if flags.render_every > 0 and step % flags.render_every == 0 and test_scene is not None:
            img = render_image_sh(trainer, state.params, test_scene, 0,
                                  chunk=flags.chunk)
            m = compute_metrics(img, test_scene.images[0])
            logger.log_evaluation_step(step, m)
    if prof is not None:
        prof.__exit__(None, None, None)
    return trainer, state, scene, test_scene


def main(argv=None):
    p = argparse.ArgumentParser(description="Train NeRF-SH (TPU)")
    for f in dataclasses.fields(NeRFSHFlags):
        name = f.name
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(f"--{name}", type=lambda s: s.lower() in ("1", "true"),
                           default=f.default)
        else:
            typ = type(f.default) if f.default is not None else str
            p.add_argument(f"--{name}", type=typ, default=f.default)
    p.add_argument("--smoke_steps", type=int, default=None)
    ns = p.parse_args(argv)
    flags = NeRFSHFlags(**{f.name: getattr(ns, f.name)
                           for f in dataclasses.fields(NeRFSHFlags)})
    train_main(flags, max_steps=ns.smoke_steps)


if __name__ == "__main__":
    main()
