"""Render-path video CLI.

Parity target: reference plenoctree/nerf_sh/gen_video.py and
svox2/opt/render_imgs_circle.py: render a spherical/spiral pose path from
a checkpoint (NeRF-SH model, Plenoxels grid, or PlenOctree npz) to frames
+ an animation.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from nerf_projects_tpu.core.rays import spherical_pose_path
from nerf_projects_tpu.pipeline.video import render_video


def main(argv=None):
    p = argparse.ArgumentParser(description="Render a pose-path video")
    p.add_argument("ckpt", help="grid npz / octree npz / NeRF-SH train_dir")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--kind", choices=["grid", "octree", "nerf_sh"], required=True)
    p.add_argument("--n_poses", type=int, default=40)
    p.add_argument("--radius", type=float, default=4.0)
    p.add_argument("--elevation", type=float, default=-30.0)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--focal", type=float, default=0.0, help="0 = width*1.1")
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--step_size", type=float, default=0.5)
    p.add_argument("--chunk", type=int, default=16384)
    args = p.parse_args(argv)

    H, W = args.height, args.width
    focal = args.focal or W * 1.1
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    poses = spherical_pose_path(args.n_poses, args.elevation, args.radius)

    if args.kind == "grid":
        from nerf_projects_tpu.cli.render_imgs import render_grid_image
        from nerf_projects_tpu.data.base import SceneData
        from nerf_projects_tpu.models.sparse_grid import SparseGrid
        from nerf_projects_tpu.ops.grid import GridRenderOptions

        grid = SparseGrid.load(args.ckpt)
        opts = GridRenderOptions(step_size=args.step_size)

        def render(pose):
            sc = SceneData(
                images=np.zeros((1, H, W, 3), np.float32),
                poses=np.asarray([pose]), intrinsics=K, near=0.1, far=10.0,
            )
            return np.asarray(render_grid_image(grid, sc, 0, opts, args.chunk))

    elif args.kind == "octree":
        from nerf_projects_tpu.models.octree import PlenOctree
        from nerf_projects_tpu.ops.octree_render import (
            OctreeRenderOptions,
            render_image_octree,
        )

        tree = PlenOctree.load(args.ckpt)
        opts = OctreeRenderOptions(step_size=1e-3)

        def render(pose):
            return np.asarray(
                render_image_octree(tree, H, W, K, pose, opts, args.chunk)
            )

    else:  # nerf_sh
        from nerf_projects_tpu.cli.octree_tools import _load_model
        from nerf_projects_tpu.cli.train_nerf_sh import render_image_sh
        from nerf_projects_tpu.data.base import SceneData
        from nerf_projects_tpu.train.nerf_sh_trainer import NeRFSHTrainer

        ns = argparse.Namespace(train_dir=args.ckpt, data_dir=None, config=None)
        flags, model, params = _load_model(ns)
        trainer = NeRFSHTrainer(model, randomized=False)

        def render(pose):
            sc = SceneData(
                images=np.zeros((1, H, W, 3), np.float32),
                poses=np.asarray([pose]), intrinsics=K,
                near=flags.near, far=flags.far,
            )
            return np.asarray(
                render_image_sh(trainer, params, sc, 0, chunk=args.chunk)
            )

    frames, anim = render_video(
        render, poses, args.out_dir, fps=args.fps, basename="render"
    )
    print(anim)


if __name__ == "__main__":
    main()
