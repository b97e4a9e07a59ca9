"""End-to-end quality check on real hardware: train the flagship
hierarchical NeRF (96+192, 8x256, bf16 + fused Pallas MLP) on the
hermetic synthetic scene with a precrop warmup, then score a held-out
view. Round-1 result on TPU v5e: held-out 31.2 dB PSNR / 0.988 SSIM
after 6.5k steps (~2.5 min of device time).

Note: the precrop warmup phase is ESSENTIAL — uniform pixel sampling on
a mostly-white scene collapses into a saturated all-white fog (the
failure mode the reference's precrop_iters exists to prevent; see
NOTES_ROUND1.md).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from nerf_projects_tpu.data.synthetic import make_dataset
from nerf_projects_tpu.models.pipeline import NeRFRenderConfig
from nerf_projects_tpu.train.nerf_trainer import NeRFTrainer
from nerf_projects_tpu.core.rays import camera_rays
from nerf_projects_tpu.obs.metrics import compute_metrics
import jax.tree_util as tu

cfg = NeRFRenderConfig(num_coarse_samples=96, num_fine_samples=192, multires=10,
                       multires_views=4, use_viewdirs=True, white_bkgd=True, perturb=True)
ds = make_dataset(n_views=16, image_size=96, seed=3)
H = W = 96
view_rays = tu.tree_map(lambda x: x.reshape(16, -1, 3)[1:], ds["rays"])  # [15, HW, 3]
view_rgb = ds["pixels"].reshape(16, -1, 3)[1:]
# central 50% crop ids (the reference precrop)
ys, xs = np.meshgrid(np.arange(24, 72), np.arange(24, 72), indexing="ij")
crop = (ys * W + xs).reshape(-1)
crop_rays = tu.tree_map(lambda x: x[:, crop].reshape(-1, 3), view_rays)
crop_rgb = view_rgb[:, crop].reshape(-1, 3)
full_rays = tu.tree_map(lambda x: x.reshape(-1, 3), view_rays)
full_rgb = view_rgb.reshape(-1, 3)

tr = NeRFTrainer(cfg, depth=8, width=256, compute_dtype=jnp.bfloat16, use_fused_mlp=True)
state = tr.init_state(jax.random.PRNGKey(0))
# phase 1: precrop
state, stats = tr.scan_steps(state, crop_rays, crop_rgb, 500, batch_size=1024)
print("precrop end psnr:", round(float(stats["psnr"][-1]), 2), flush=True)
# phase 2: full
for chunk in range(6):
    state, stats = tr.scan_steps(state, full_rays, full_rgb, 1000, batch_size=1024)
    print(f"step {int(state.step)}: {float(stats['psnr'][-1]):.2f}", flush=True)
rays = camera_rays(H, W, ds["intrinsics"], jnp.asarray(ds["poses"][0]))
out = tr.render_image(state.params, rays, chunk=4608)
m = compute_metrics(out["rgb"], ds["images"][0])
print("held-out:", json.dumps({k: round(v, 3) for k, v in m.items()}), flush=True)
