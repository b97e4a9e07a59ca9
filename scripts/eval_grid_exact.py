"""Offline eval of a saved SparseGrid npz on the hermetic scene's
held-out view 0: tile-path and per-sample exact-path renders, PSNR/SSIM
for both, optional pngs. Runs standalone so a compile-helper failure in
a long training process can't lose the eval — rerun this on the npz.

Usage: python scripts/eval_grid_exact.py <grid.npz> [out_dir]
Env: EVAL_IMG (default 512), EVAL_VIEWS (default 16; view 0 scored),
EVAL_FOCAL (default 80*H/96), EVAL_TILE=0 to skip the tile path.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.tree_util as tu
import numpy as np

from nerf_projects_tpu.core.rays import camera_rays
from nerf_projects_tpu.data.synthetic import make_dataset
from nerf_projects_tpu.models.sparse_grid import SparseGrid
from nerf_projects_tpu.obs.metrics import compute_metrics
from nerf_projects_tpu.ops.grid import GridRenderOptions, volume_render_grid

H = int(os.environ.get("EVAL_IMG", 512))
N_VIEWS = int(os.environ.get("EVAL_VIEWS", 16))
FOCAL = float(os.environ.get("EVAL_FOCAL", 80.0 * H / 96.0))
DO_TILE = int(os.environ.get("EVAL_TILE", 1))


def main():
    path = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else ""
    print("devices:", jax.devices(), flush=True)
    g = SparseGrid.load(path)
    print(f"grid: reso {g.reso} cap {g.capacity}", flush=True)
    ds = make_dataset(n_views=N_VIEWS, image_size=H, focal=FOCAL, seed=3)
    gt = ds["images"][0]
    opts = GridRenderOptions(step_size=0.5)
    rays = camera_rays(H, H, ds["intrinsics"], jnp.asarray(ds["poses"][0]))
    flat = tu.tree_map(lambda x: x.reshape(-1, 3), rays)

    imgs = {}
    if DO_TILE:
        from nerf_projects_tpu.ops.brick_grid import from_sparse_grid
        from nerf_projects_tpu.ops.pallas.tile_march import render_tiles_pallas
        from nerf_projects_tpu.ops.tile_render import (
            tiles_from_image_rays,
            untile_image,
        )

        bg = from_sparse_grid(g)
        tiles = tiles_from_image_rays(flat, H, H, 8, 16)
        parts = []
        for i in range(0, tiles.origins.shape[0], 512):
            sl = tu.tree_map(lambda x: x[i : i + 512], tiles)
            parts.append(render_tiles_pallas(bg, sl, opts)["rgb"])
        imgs["tile"] = untile_image(jnp.concatenate(parts, 0), H, H, 8, 16)
        del bg

    ex = jax.jit(lambda gg, r: volume_render_grid(gg, r, opts)["rgb"])
    outs = []
    chunk = int(os.environ.get("EVAL_CHUNK", 2048))
    n = flat.origins.shape[0]
    for i in range(0, n, chunk):
        sl = tu.tree_map(lambda x: x[i : i + chunk], flat)
        pad = chunk - sl.origins.shape[0]
        if pad:
            sl = tu.tree_map(
                lambda x: jnp.pad(x, ((0, pad), (0, 0)), mode="edge"), sl)
        o = ex(g, sl)
        outs.append(o[: chunk - pad] if pad else o)
    imgs["exact"] = jnp.concatenate(outs, 0).reshape(H, H, 3)

    for name, img in imgs.items():
        m = compute_metrics(img, gt)
        print(f"heldout[{name}]:", json.dumps(
            {k: round(float(v), 3) for k, v in m.items()}), flush=True)
    if "tile" in imgs:
        d = float(jnp.abs(imgs["tile"] - imgs["exact"]).max())
        print(f"tile_vs_exact_max: {d:.4f}", flush=True)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        import imageio.v2 as imageio

        for name, img in imgs.items():
            arr = np.asarray(jnp.clip(img, 0, 1) * 255).astype(np.uint8)
            imageio.imwrite(f"{out_dir}/eval_{name}.png", arr)
        err = np.abs(
            np.asarray(imgs["exact"]) - np.asarray(gt)).max(-1)
        imageio.imwrite(f"{out_dir}/eval_err.png",
                        (np.clip(err * 4, 0, 1) * 255).astype(np.uint8))


if __name__ == "__main__":
    main()
