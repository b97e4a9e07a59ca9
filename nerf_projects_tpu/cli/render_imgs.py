"""Plenoxels test-set renderer / metrics CLI.

Parity target: reference svox2/opt/render_imgs.py (test-set
PSNR/SSIM(/LPIPS), `--timing` FPS mode, saved renders) and
calc_metrics.py (metrics from saved renders + optional advanced metrics
from the checkpoint).
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.cli.train_plenoxels import _to_opencv_pose
from nerf_projects_tpu.core.rays import camera_rays_opencv
from nerf_projects_tpu.data.base import load_scene
from nerf_projects_tpu.models.sparse_grid import SparseGrid
from nerf_projects_tpu.obs.metrics import compute_metrics, to8b
from nerf_projects_tpu.ops.grid import GridRenderOptions, volume_render_grid


def render_grid_image(grid, scene, view, opts, chunk=16384, *,
                      occupancy=None, color_top_k=None, dense_density=None):
    fx, fy = float(scene.intrinsics[0, 0]), float(scene.intrinsics[1, 1])
    cx, cy = float(scene.intrinsics[0, 2]), float(scene.intrinsics[1, 2])
    rays = camera_rays_opencv(
        scene.height, scene.width, fx, fy, cx, cy,
        jnp.asarray(_to_opencv_pose(scene.poses[view], scene)),
    )
    flat = jax.tree_util.tree_map(lambda x: x.reshape(-1, 3), rays)
    n = flat.origins.shape[0]
    render = jax.jit(
        lambda r: volume_render_grid(
            grid, r, opts,
            occupancy=occupancy,
            active_steps=256 if occupancy is not None else None,
            color_top_k=color_top_k,
            dense_density=dense_density,
        )["rgb"]
    )
    outs = []
    for i in range(0, n, chunk):
        sl = jax.tree_util.tree_map(lambda x: x[i : i + chunk], flat)
        pad = chunk - sl.origins.shape[0]
        if pad:
            sl = jax.tree_util.tree_map(
                lambda x: jnp.pad(x, ((0, pad), (0, 0)), mode="edge"), sl
            )
        rgb = render(sl)
        outs.append(rgb[: chunk - pad] if pad else rgb)
    return jnp.concatenate(outs).reshape(scene.height, scene.width, 3)


@functools.lru_cache(maxsize=4)
def _frame_render_jit(opts, n_chunks, max_windows):
    from nerf_projects_tpu.ops.pallas.frame_march import (
        render_frame_pallas,
    )

    @jax.jit
    def run(bg, tiles, ka):
        return render_frame_pallas(
            bg, tiles, opts, kernel_arrays=ka, n_chunks=n_chunks,
            use_occupancy=False, max_windows=max_windows,
        )

    return run


def render_grid_image_frame(bg, ka, scene, view, opts, n_chunks,
                            max_windows=None):
    """Whole-frame single-dispatch renderer (the real-time path:
    analytic occlusion cull + in-kernel early stop; the reference's
    svox render_persp `fast`-mode analogue, octree/nerf/utils.py:448).
    `max_windows` caps marched windows per tile front-to-back (the
    approximate fast mode)."""
    import jax.tree_util as tu

    from nerf_projects_tpu.ops.tile_render import (
        tiles_from_image_rays,
        untile_image,
    )

    fx, fy = float(scene.intrinsics[0, 0]), float(scene.intrinsics[1, 1])
    cx, cy = float(scene.intrinsics[0, 2]), float(scene.intrinsics[1, 2])
    Hp = -(-scene.height // 8) * 8
    Wp = -(-scene.width // 16) * 16
    rays = camera_rays_opencv(
        Hp, Wp, fx, fy, cx, cy,
        jnp.asarray(_to_opencv_pose(scene.poses[view], scene)),
    )
    flat = tu.tree_map(lambda x: x.reshape(-1, 3), rays)
    tiles = tiles_from_image_rays(flat, Hp, Wp, 8, 16)
    out = _frame_render_jit(opts, n_chunks, max_windows)(bg, tiles, ka)
    img = untile_image(out["rgb"], Hp, Wp, 8, 16)
    return img[: scene.height, : scene.width]


def render_grid_image_tiles(bg, ka, ck, scene, view, opts,
                            exact_fallback_grid=None):
    """Brick/tile Pallas renderer (the real-time path): prebuilt kernel
    arrays + exact empty-chunk compaction."""
    import jax.tree_util as tu

    from nerf_projects_tpu.ops.pallas.tile_march import (
        _bucket_render_jit,
    )
    from nerf_projects_tpu.ops.tile_render import (
        tiles_from_image_rays,
        untile_image,
    )

    fx, fy = float(scene.intrinsics[0, 0]), float(scene.intrinsics[1, 1])
    cx, cy = float(scene.intrinsics[0, 2]), float(scene.intrinsics[1, 2])
    Hp = -(-scene.height // 8) * 8
    Wp = -(-scene.width // 16) * 16
    rays = camera_rays_opencv(
        Hp, Wp, fx, fy, cx, cy,
        jnp.asarray(_to_opencv_pose(scene.poses[view], scene)),
    )
    flat = tu.tree_map(lambda x: x.reshape(-1, 3), rays)
    tiles = tiles_from_image_rays(flat, Hp, Wp, 8, 16)
    # one cached jitted call with the scene-level compacted bound
    # (span-bucketing exists but its per-bucket dispatch overhead only
    # pays off on much larger tile batches; see NOTES_ROUND2.md)
    out = _bucket_render_jit(opts, ck, False, False, True)(
        bg, tiles, ka
    )
    img = untile_image(out["rgb"], Hp, Wp, 8, 16)
    if exact_fallback_grid is not None:
        # re-render window-missed rays through the exact per-sample
        # path (miss_per_ray counts in-span samples the 16-voxel
        # window dropped — grazing tiles at high reso)
        import numpy as _np

        from nerf_projects_tpu.ops.grid import volume_render_grid

        miss = untile_image(
            out["miss_per_ray"][..., None], Hp, Wp, 8, 16)[..., 0]
        bad = _np.asarray(miss > 0).reshape(-1)
        idx = _np.nonzero(bad)[0]
        if len(idx):
            ex = jax.jit(lambda gg, r: volume_render_grid(
                gg, r, opts)["rgb"])
            CH = 2048
            fixed = []
            for i in range(0, len(idx), CH):
                ii = idx[i : i + CH]
                pad = CH - len(ii)
                ii_p = (_np.concatenate([ii, _np.full(pad, ii[-1])])
                        if pad else ii)
                sl = tu.tree_map(
                    lambda x: x.reshape(-1, 3)[jnp.asarray(ii_p)], rays)
                o = ex(exact_fallback_grid, sl)
                fixed.append(o[: len(ii)] if pad else o)
            img = img.reshape(-1, 3).at[jnp.asarray(idx)].set(
                jnp.concatenate(fixed, 0)).reshape(Hp, Wp, 3)
    return img[: scene.height, : scene.width]


def main(argv=None):
    p = argparse.ArgumentParser(description="Render/evaluate a Plenoxels grid")
    p.add_argument("ckpt", type=str, help="grid npz checkpoint")
    p.add_argument("data_dir", type=str)
    p.add_argument("--split", default="test")
    p.add_argument("--out_dir", default=None)
    p.add_argument("--step_size", type=float, default=0.5)
    p.add_argument("--timing", action="store_true",
                   help="FPS benchmark mode (no metrics/saving)")
    p.add_argument("--frame", action="store_true",
                   help="whole-frame single-dispatch renderer "
                   "(analytic occlusion cull + in-kernel early stop; "
                   "the real-time path)")
    p.add_argument("--max_windows", type=int, default=None,
                   help="--frame: cap marched windows per tile "
                   "front-to-back (approximate fast mode, like the "
                   "reference renderer's fast=True)")
    p.add_argument("--chunk", type=int, default=16384)
    p.add_argument("--n_images", type=int, default=0, help="0 = all")
    p.add_argument("--exact", action="store_true",
                   help="disable the fast eval path (occupancy interval "
                        "restriction + top-K color + dense density cache)")
    p.add_argument("--color_top_k", type=int, default=48)
    p.add_argument("--no_fallback", action="store_true",
                   help="--tiles metrics: skip the exact re-render of "
                        "window-missed rays")
    p.add_argument("--tiles", action="store_true",
                   help="render through the brick/tile Pallas march "
                        "(prebuilt kernel arrays + exact chunk "
                        "compaction) — the real-time path")
    args = p.parse_args(argv)

    grid = SparseGrid.load(args.ckpt)
    scene = load_scene(args.data_dir, args.split)
    opts = GridRenderOptions(step_size=args.step_size)
    fast = {}
    if not args.exact:
        import jax.numpy as _jnp

        from nerf_projects_tpu.ops.grid import make_render_cache
        from nerf_projects_tpu.ops.grid_accel import build_occupancy

        fast = dict(
            occupancy=build_occupancy(grid, factor=8, sigma_thresh=opts.sigma_thresh),
            color_top_k=args.color_top_k,
            dense_density=make_render_cache(grid, dtype=_jnp.bfloat16),
        )
    n = scene.images.shape[0] if not args.n_images else min(
        args.n_images, scene.images.shape[0]
    )

    if args.frame:
        from nerf_projects_tpu.ops.brick_grid import from_sparse_grid
        from nerf_projects_tpu.ops.pallas.tile_march import (
            build_packed_kernel_arrays,
            default_chunks_for,
            geometry_only,
        )

        bg = from_sparse_grid(grid)
        ka = build_packed_kernel_arrays(bg)
        n_chunks = default_chunks_for(bg, opts)
        bg = geometry_only(bg)

        def render_view(v):
            return render_grid_image_frame(
                bg, ka, scene, v, opts, n_chunks,
                max_windows=args.max_windows,
            )
    elif args.tiles:
        import jax.tree_util as tu

        from nerf_projects_tpu.ops.brick_grid import from_sparse_grid
        from nerf_projects_tpu.ops.pallas.tile_march import (
            build_kernel_arrays,
            geometry_only,
            required_chunks,
        )
        from nerf_projects_tpu.ops.tile_render import tiles_from_image_rays

        bg = from_sparse_grid(grid)
        ka = build_kernel_arrays(bg)
        fx, fy = float(scene.intrinsics[0, 0]), float(scene.intrinsics[1, 1])
        cx, cy = float(scene.intrinsics[0, 2]), float(scene.intrinsics[1, 2])
        Hp = -(-scene.height // 8) * 8
        Wp = -(-scene.width // 16) * 16
        def _view_tiles(v):
            rv = camera_rays_opencv(
                Hp, Wp, fx, fy, cx, cy,
                jnp.asarray(_to_opencv_pose(scene.poses[v], scene)),
            )
            return tiles_from_image_rays(
                tu.tree_map(lambda x: x.reshape(-1, 3), rv), Hp, Wp, 8, 16,
            )

        # chunk bound must cover EVERY rendered pose: a view whose tiles
        # cross more active chunks than view 0 would otherwise have its
        # farthest chunks silently dropped by _compact_chunks
        ck = max(required_chunks(bg, _view_tiles(v), opts)
                 for v in range(n))
        bg = geometry_only(bg)
        # metrics runs get the exact fallback for window-missed rays;
        # --timing measures the pure fast path
        fb = None if (args.timing or args.no_fallback) else grid

        def render_view(v):
            return render_grid_image_tiles(
                bg, ka, ck, scene, v, opts, exact_fallback_grid=fb)
    else:
        def render_view(v):
            return render_grid_image(grid, scene, v, opts, args.chunk,
                                     **fast)

    if args.timing:
        # warmup/compile
        render_view(0).block_until_ready()
        t0 = time.time()
        for v in range(n):
            img = render_view(v)
        # forced host sync (block_until_ready is unreliable on tunneled TPUs)
        _ = float(img.sum())
        dt = time.time() - t0
        print(json.dumps({"fps": n / dt, "sec_per_image": dt / n}))
        return

    results = []
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
    for v in range(n):
        img = render_view(v)
        results.append(compute_metrics(img, scene.images[v]))
        if args.out_dir:
            import imageio.v2 as imageio

            imageio.imwrite(
                os.path.join(args.out_dir, f"{v:04d}.png"),
                to8b(np.asarray(img)),
            )
    mean = {k: float(np.mean([r[k] for r in results])) for k in results[0]}
    if args.out_dir:
        with open(os.path.join(args.out_dir, "metrics.json"), "w") as f:
            json.dump({"mean": mean, "per_image": results}, f, indent=2)
    print(json.dumps(mean))


if __name__ == "__main__":
    main()
