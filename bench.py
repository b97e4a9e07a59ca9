"""Benchmark: training-step throughput of the flagship hierarchical NeRF.

Measures steady-state rays/sec of the on-device training loop
(lax.scan over train steps, ray batches drawn from a device-resident
pool — zero host involvement per step) at the reference's headline
workload (BASELINE.md row 1: ship 800^2, N_rand=1024, N_samples=96,
N_importance=192, 8x256 MLP with viewdirs -> ~6,800 rays/s on the
reference CUDA GPU).

Per-step time is slope-fitted between two scan lengths with a forced
host readback after each, which removes both the one-time dispatch
latency and any unreliable async-timing effects of tunneled TPU
backends. Prints ONE JSON line:
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

    ds = make_dataset(n_views=2, image_size=128)
    pool_rays, pool_rgb = ds["rays"], ds["pixels"]

    def run(state, k):
        state, stats = trainer.scan_steps(
            state, pool_rays, pool_rgb, k, batch_size=N_RAND
        )
        # force a true device sync via host readback
        _ = float(stats["loss"][-1])
        return state

    # warmup/compile both scan lengths
    k_lo, k_hi = 10, 60
    state = run(state, k_lo)
    state = run(state, k_hi)

    t0 = time.perf_counter()
    state = run(state, k_lo)
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    state = run(state, k_hi)
    t_hi = time.perf_counter() - t0
    # repeat for stability, keep the min of the slopes
    slopes = [(t_hi - t_lo) / (k_hi - k_lo)]
    for _ in range(2):
        t0 = time.perf_counter()
        state = run(state, k_lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        state = run(state, k_hi)
        t_hi = time.perf_counter() - t0
        slopes.append((t_hi - t_lo) / (k_hi - k_lo))
    per_step = min(s for s in slopes if s > 0)

    rays_per_s = N_RAND / per_step
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
