"""Training-dynamics probe for the Plenoxels tile path: short runs that
log grid-state statistics (density percentiles, SH magnitude) and a
FIXED-batch train PSNR every N steps. Discriminates failure classes the
end-metric can't: density-not-growing vs oscillation vs TV suppression
vs renderer artifacts.

Usage: python scripts/diag_train_dynamics.py
Env: DYN_IMG (default 512), DYN_RESO (128), DYN_STEPS (600),
DYN_LOG_EVERY (100), DYN_TV_SCALE (1.0), DYN_TILES (40),
DYN_LR_SIGMA/DYN_LR_SH, DYN_PERVISIT (1), DYN_STRIDE (1).
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.tree_util as tu
import numpy as np

from nerf_projects_tpu.core.rays import camera_rays
from nerf_projects_tpu.data.synthetic import make_dataset
from nerf_projects_tpu.models.sparse_grid import SparseGrid
from nerf_projects_tpu.ops.brick_grid import from_sparse_grid
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.train import plenoxels_sparse as ps
from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

H = int(os.environ.get("DYN_IMG", 512))
RESO = int(os.environ.get("DYN_RESO", 128))
STEPS = int(os.environ.get("DYN_STEPS", 600))
LOG_EVERY = int(os.environ.get("DYN_LOG_EVERY", 100))
TV_SCALE = float(os.environ.get("DYN_TV_SCALE", 1.0))
TILES = int(os.environ.get("DYN_TILES", 40))
LR_SIGMA = float(os.environ.get("DYN_LR_SIGMA", 3e1))
LR_SH = float(os.environ.get("DYN_LR_SH", 1e-2))
PERVISIT = int(os.environ.get("DYN_PERVISIT", 1))
STRIDE = int(os.environ.get("DYN_STRIDE", 1))
# reference syn.json schedule shape: delay ramp (x0.01 -> x1) over the
# first 7.5% of steps, decay horizon 1.25x the run
DELAY = int(os.environ.get("DYN_DELAY_STEPS", 0))
DECAY = int(os.environ.get("DYN_DECAY_STEPS", 0))
# default 0: the reference's synthetic config has NO sparsity loss
# (opt.py --lambda_sparsity default 0.0; syn.json sets only TV). Any
# nonzero value erodes occluded density at full lr under RMSprop's
# scale-invariant updates (the only gradient an occluded voxel gets is
# the consistent sparsity down-push).
SPARSITY = float(os.environ.get("DYN_SPARSITY", 0.0))
N_VIEWS = 16


def main():
    print("devices:", jax.devices(), flush=True)
    print(json.dumps({
        "H": H, "reso": RESO, "steps": STEPS, "tv": TV_SCALE,
        "tiles": TILES, "lr_sigma": LR_SIGMA, "lr_sh": LR_SH,
        "pervisit": PERVISIT, "stride": STRIDE,
        "delay": DELAY, "decay": DECAY, "sparsity": SPARSITY,
    }), flush=True)
    ds = make_dataset(
        n_views=N_VIEWS, image_size=H, focal=80.0 * H / 96.0, seed=3)
    rays_all = tu.tree_map(
        lambda x: x.reshape(N_VIEWS, H * H, 3)[1:], ds["rays"])
    pixels = ds["pixels"].reshape(N_VIEWS, H * H, 3)[1:]

    @functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
    def _draw(key, r_all, pix, n_tiles, th, tw, s):
        kv, ky, kx = jax.random.split(key, 3)
        v = jax.random.randint(kv, (n_tiles,), 0, N_VIEWS - 1)
        y0 = jax.random.randint(ky, (n_tiles,), 0, H - (th - 1) * s)
        x0 = jax.random.randint(kx, (n_tiles,), 0, H - (tw - 1) * s)
        dy, dx = jnp.meshgrid(
            jnp.arange(th), jnp.arange(tw), indexing="ij")
        flat = (y0[:, None] + s * dy.reshape(-1)[None]) * H + (
            x0[:, None] + s * dx.reshape(-1)[None])
        r = tu.tree_map(lambda a: a[v[:, None], flat], r_all)
        return r, pix[v[:, None], flat]

    g = SparseGrid.create(
        RESO, basis_dim=9, radius=1.3, use_sphere_bound=True,
        init_density=0.1,
    )
    bg = from_sparse_grid(g)
    opts = GridRenderOptions(step_size=0.5)
    trainer = PlenoxelsTrainer(
        opts, n_iters=DECAY or STEPS, lr_sigma=LR_SIGMA,
        lr_sigma_delay_steps=DELAY, lr_sh=LR_SH,
        lambda_tv=1e-5 * TV_SCALE, lambda_tv_sh=1e-3 * TV_SCALE,
        lambda_sparsity=SPARSITY,
        rms_pervisit=bool(PERVISIT),
    )
    pst = ps.packed_state_from_grid(bg)
    probe_rays, probe_px = _draw(
        jax.random.PRNGKey(99), rays_all, pixels, TILES, 8, 16, STRIDE)

    @jax.jit
    def probe_psnr(bg_):
        from nerf_projects_tpu.ops.pallas.tile_march import (
            render_tiles_pallas,
        )

        rgb = render_tiles_pallas(bg_, probe_rays, opts)["rgb"]
        mse = jnp.mean((rgb - probe_px) ** 2)
        return -10.0 * jnp.log(mse) / jnp.log(10.0)

    @jax.jit
    def state_stats(bg_):
        # packed layout: slot B is x3-interleaved density
        from nerf_projects_tpu.train.plenoxels_sparse import (
            kernel_layout_to_sh,
        )

        d = bg_.density_bricks
        s = bg_.sh_bricks
        qs = jnp.percentile(
            d.reshape(-1), jnp.asarray([50.0, 90.0, 99.0, 99.9]))
        return qs, jnp.max(d), jnp.max(jnp.abs(s)), jnp.mean(jnp.abs(s))

    key = jax.random.PRNGKey(0)
    for i in range(STEPS):
        if i % LOG_EVERY == 0:
            bg_now = ps.grid_from_packed_state(bg, pst)
            qs, dmax, shmax, shmean = state_stats(bg_now)
            pp = probe_psnr(bg_now)
            print(json.dumps({
                "step": i,
                "probe_psnr": round(float(pp), 2),
                "density_p": [round(float(x), 2) for x in qs],
                "density_max": round(float(dmax), 2),
                "sh_absmax": round(float(shmax), 4),
                "sh_absmean": round(float(shmean), 5),
            }), flush=True)
        key, kd, kt = jax.random.split(key, 3)
        rays, target = _draw(kd, rays_all, pixels, TILES, 8, 16, STRIDE)
        pst, st = ps.train_step_tiles_packed_touched_jit(
            trainer, bg, pst, rays, target,
            jnp.asarray(i, jnp.int32), kt,
            max_touched=12288,
        )
    bg_now = ps.grid_from_packed_state(bg, pst)
    qs, dmax, shmax, shmean = state_stats(bg_now)
    pp = probe_psnr(bg_now)
    print(json.dumps({
        "step": STEPS,
        "probe_psnr": round(float(pp), 2),
        "density_p": [round(float(x), 2) for x in qs],
        "density_max": round(float(dmax), 2),
        "sh_absmax": round(float(shmax), 4),
        "sh_absmean": round(float(shmean), 5),
    }), flush=True)


if __name__ == "__main__":
    main()
