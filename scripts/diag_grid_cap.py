"""Representation-cap diagnostic for the Plenoxels quality gap.

Rasterizes the analytic sphere scene DIRECTLY into a SparseGrid
(box-filtered density via stratified supersampling, flat SH DC color)
and renders the held-out view — no training involved. The resulting
PSNR is (approximately) the representation + renderer ceiling at each
(grid reso, image size): if the direct fit renders >=30 dB where the
trained grid got 19 dB, the gap is optimization; if the direct fit is
also ~19 dB, the gap is the grid/renderer itself.

Usage: python scripts/diag_grid_cap.py [reso,reso,...] [H,H,...]
Env: DIAG_SS (supersamples per axis, default 4), DIAG_SAVE (png dir),
DIAG_EXACT=1 (also render through the per-sample exact path and report
tile-vs-exact deltas — separates renderer artifacts from grid limits).
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
from nerf_projects_tpu.data.synthetic import default_scene, make_dataset
from nerf_projects_tpu.models.sparse_grid import SparseGrid
from nerf_projects_tpu.obs.metrics import compute_metrics
from nerf_projects_tpu.ops.sh import SH_C0

RESOS = [int(r) for r in (sys.argv[1] if len(sys.argv) > 1 else "256").split(",")]
SIZES = [int(h) for h in (sys.argv[2] if len(sys.argv) > 2 else "96,512").split(",")]
SS = int(os.environ.get("DIAG_SS", 4))
SAVE = os.environ.get("DIAG_SAVE", "")
EXACT = int(os.environ.get("DIAG_EXACT", 0))


def rasterize(scene, reso: int) -> SparseGrid:
    """Box-filtered analytic fields at the grid's lattice points."""
    g = SparseGrid.create(reso, basis_dim=9, radius=1.3,
                          use_sphere_bound=True)
    # active lattice coords [cap, 3] from links
    links = np.asarray(g.links)
    act = np.argwhere(links >= 0)
    rows = links[act[:, 0], act[:, 1], act[:, 2]]
    coords = np.zeros((g.capacity, 3), np.float32)
    coords[rows] = act.astype(np.float32)

    # stratified SS^3 offsets within the voxel cube centered on the
    # lattice point (trilerp sample location), in grid units
    o = (np.arange(SS) + 0.5) / SS - 0.5
    ox, oy, oz = np.meshgrid(o, o, o, indexing="ij")
    offs = np.stack([ox, oy, oz], -1).reshape(-1, 3).astype(np.float32)

    centers = jnp.asarray(scene.centers, jnp.float32)
    radii = jnp.asarray(scene.radii, jnp.float32)
    colors = jnp.asarray(scene.colors, jnp.float32)

    @jax.jit
    def fields(c_chunk):
        # c_chunk [B, 3] lattice coords -> (sigma [B], rgb [B, 3])
        gpts = c_chunk[:, None, :] + offs[None]          # [B, S^3, 3]
        pts = g.grid_to_world(gpts)
        d2 = jnp.sum((pts[..., None, :] - centers) ** 2, -1)  # [B,S,NS]
        inside = (d2 < radii**2).any(-1)
        frac = inside.mean(-1)                            # [B]
        sigma = scene.density * frac
        # color at the lattice point: nearest sphere center
        p0 = g.grid_to_world(c_chunk)
        d20 = jnp.sum((p0[:, None, :] - centers) ** 2, -1)
        idx = jnp.argmin(d20 / radii**2, -1)
        return sigma, colors[idx]

    dens = np.zeros((g.capacity, 1), np.float32)
    sh = np.zeros((g.capacity, 27), np.float32)
    B = 1 << 20
    for i in range(0, g.capacity, B):
        sl = jnp.asarray(coords[i:i + B])
        s, c = fields(sl)
        dens[i:i + B, 0] = np.asarray(s)
        # flat color: DC coeff = (c - 0.5)/C0 per channel, interleaved
        # sh_data layout [cap, 3*basis_dim] = rgb-major (r0..r8 g0.. b0..)
        dc = (np.asarray(c) - 0.5) / SH_C0
        sh[i:i + B, 0] = dc[:, 0]
        sh[i:i + B, 9] = dc[:, 1]
        sh[i:i + B, 18] = dc[:, 2]
    from dataclasses import replace

    return replace(g, density_data=jnp.asarray(dens), sh_data=jnp.asarray(sh))


def render_view(bg, kernel_arrays, H, focal, pose, opts):
    from nerf_projects_tpu.ops.tile_render import (
        tiles_from_image_rays,
        untile_image,
    )
    from nerf_projects_tpu.ops.pallas.tile_march import render_tiles_pallas

    K = np.array([[focal, 0, H / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    rays = camera_rays(H, H, K, jnp.asarray(pose))
    flat = tu.tree_map(lambda x: x.reshape(-1, 3), rays)
    tiles = tiles_from_image_rays(flat, H, H, 8, 16)
    parts, miss = [], 0.0
    for i in range(0, tiles.origins.shape[0], 512):
        sl = tu.tree_map(lambda x: x[i:i + 512], tiles)
        out = render_tiles_pallas(bg, sl, opts,
                                  kernel_arrays=kernel_arrays)
        parts.append(out["rgb"])
        miss += float(out["window_miss"]) * sl.origins.shape[0]
    miss /= tiles.origins.shape[0]
    return untile_image(jnp.concatenate(parts, 0), H, H, 8, 16), miss


def render_view_exact(g, H, focal, pose, opts):
    import jax.tree_util as tu

    from nerf_projects_tpu.ops.grid import volume_render_grid

    K = np.array([[focal, 0, H / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    rays = camera_rays(H, H, K, jnp.asarray(pose))
    flat = tu.tree_map(lambda x: x.reshape(-1, 3), rays)
    ex = jax.jit(lambda gg, r: volume_render_grid(gg, r, opts)["rgb"])
    outs = []
    chunk = 2048
    n = flat.origins.shape[0]
    for i in range(0, n, chunk):
        sl = tu.tree_map(lambda x: x[i : i + chunk], flat)
        pad = chunk - sl.origins.shape[0]
        if pad:
            sl = tu.tree_map(
                lambda x: jnp.pad(x, ((0, pad), (0, 0)), mode="edge"), sl)
        o = ex(g, sl)
        outs.append(o[: chunk - pad] if pad else o)
    return jnp.concatenate(outs, 0).reshape(H, H, 3)


def main():
    from nerf_projects_tpu.ops.grid import GridRenderOptions

    print("devices:", jax.devices(), flush=True)
    scene = default_scene()
    opts = GridRenderOptions(step_size=0.5)
    from dataclasses import replace as _replace

    from nerf_projects_tpu.ops.brick_grid import from_sparse_grid
    from nerf_projects_tpu.ops.pallas.tile_march import (
        _kernel_arrays,
        geometry_only,
    )

    for reso in RESOS:
        g = rasterize(scene, reso)
        print(f"rasterized {reso}^3: cap {g.capacity}", flush=True)
        # ONE brick conversion + bf16 kernel relayout per reso; at 512^3
        # per-view rebuilds held 3 full-grid copies at once and OOMed.
        bg = from_sparse_grid(g)
        ka = _kernel_arrays(bg)
        if reso >= 512 and not EXACT:
            g = _replace(g, density_data=jnp.zeros((1, 1)),
                         sh_data=jnp.zeros((1, g.sh_data.shape[1])))
            bg = geometry_only(bg)
        for H in SIZES:
            focal = 80.0 * H / 96.0
            ds = make_dataset(n_views=1, image_size=H, focal=focal, seed=3)
            img, miss = render_view(bg, ka, H, focal, ds["poses"][0], opts)
            m = compute_metrics(img, ds["images"][0])
            print("diag:", json.dumps(
                {"reso": reso, "H": H}
                | {k: round(float(v), 3) for k, v in m.items()}
                | {"window_miss": round(miss, 5)}),
                flush=True)
            if EXACT:
                img_ex = render_view_exact(g, H, focal, ds["poses"][0],
                                           opts)
                m_ex = compute_metrics(img_ex, ds["images"][0])
                delta = np.asarray(
                    jnp.abs(img - img_ex).max(-1))
                bad = np.argwhere(delta > 0.2)
                print("diag_exact:", json.dumps(
                    {"reso": reso, "H": H}
                    | {k: round(float(v), 3) for k, v in m_ex.items()}
                    | {"tile_vs_exact_max": round(float(delta.max()), 4),
                       "tile_vs_exact_bad_px": int(len(bad))}),
                    flush=True)
                if len(bad):
                    ys, xs = bad[:, 0], bad[:, 1]
                    print(f"  bad px rows {ys.min()}..{ys.max()} "
                          f"cols {sorted(set(xs.tolist()))[:24]}",
                          flush=True)
                if SAVE:
                    os.makedirs(SAVE, exist_ok=True)
                    import imageio.v2 as imageio

                    arr = np.asarray(
                        jnp.clip(img_ex, 0, 1) * 255).astype(np.uint8)
                    imageio.imwrite(
                        f"{SAVE}/fit_exact_r{reso}_h{H}.png", arr)
            if SAVE:
                os.makedirs(SAVE, exist_ok=True)
                import imageio.v2 as imageio

                arr = np.asarray(jnp.clip(img, 0, 1) * 255).astype(np.uint8)
                gt = np.asarray(
                    jnp.clip(ds["images"][0], 0, 1) * 255).astype(np.uint8)
                imageio.imwrite(f"{SAVE}/fit_r{reso}_h{H}.png", arr)
                imageio.imwrite(f"{SAVE}/gt_h{H}.png", gt)


if __name__ == "__main__":
    main()
