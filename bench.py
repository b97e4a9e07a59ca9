"""Benchmark: training-step throughput of the flagship hierarchical NeRF.

Measures steady-state rays/sec of the jitted coarse+fine train step at the
reference's headline workload (BASELINE.md row 1: ship 800^2, N_rand=1024,
N_samples=96, N_importance=192, 8x256 MLP with viewdirs -> ~6,800 rays/s on
the reference CUDA GPU). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import time

import jax
import jax.numpy as jnp

from nerf_projects_tpu.data.synthetic import make_dataset
from nerf_projects_tpu.models.pipeline import NeRFRenderConfig
from nerf_projects_tpu.train.nerf_trainer import NeRFTrainer

BASELINE_RAYS_PER_S = 6800.0  # reference ship config (BASELINE.md)

N_RAND = 1024
N_SAMPLES = 96
N_IMPORTANCE = 192


def main():
    cfg = NeRFRenderConfig(
        num_coarse_samples=N_SAMPLES,
        num_fine_samples=N_IMPORTANCE,
        multires=10,
        multires_views=4,
        use_viewdirs=True,
        white_bkgd=True,
        perturb=True,
        raw_noise_std=0.0,
    )
    trainer = NeRFTrainer(
        cfg,
        depth=8,
        width=256,
        near=2.0,
        far=6.0,
        compute_dtype=jnp.bfloat16,
        use_fused_mlp=True,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))

    # Small on-device ray pool; batches drawn by on-device indexing, as in
    # real training (no per-step host->device traffic).
    ds = make_dataset(n_views=2, image_size=128)
    pool_rays, pool_rgb = ds["rays"], ds["pixels"]
    n_pool = pool_rgb.shape[0]

    @jax.jit
    def draw(key):
        idx = jax.random.randint(key, (N_RAND,), 0, n_pool)
        rays = jax.tree_util.tree_map(lambda x: x[idx], pool_rays)
        return rays, pool_rgb[idx]

    # Warmup: compile + 3 steps.
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, sub = jax.random.split(key)
        rays, target = draw(sub)
        state, stats = trainer.train_step(state, rays, target)
    jax.block_until_ready(stats)

    n_steps = 50
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        rays, target = draw(sub)
        state, stats = trainer.train_step(state, rays, target)
    jax.block_until_ready(stats)
    dt = time.perf_counter() - t0

    rays_per_s = N_RAND * n_steps / dt
    print(
        json.dumps(
            {
                "metric": "nerf_train_rays_per_sec_per_chip",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
