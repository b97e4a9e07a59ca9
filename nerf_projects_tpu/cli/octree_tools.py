"""PlenOctree pipeline CLI: extract / optimize / evaluate / compress.

Front end over pipeline.{extraction,optimization,compression} mirroring
the reference CLIs (octree/extraction.py, octree/optimization.py,
octree/evaluation.py, octree/compression.py, octree/compressed_evaluation.py)
and their flag names (octree/nerf/utils.py:44-220). Consumes NeRF-SH
checkpoints produced by cli.train_nerf_sh.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np


def _load_model(flags_path_args):
    from flax import serialization

    from nerf_projects_tpu.cli.nerf_sh_flags import NeRFSHFlags, build_model
    from nerf_projects_tpu.train.nerf_sh_trainer import NeRFSHTrainer
    from nerf_projects_tpu.utils.config import update_flags

    flags = NeRFSHFlags(
        train_dir=flags_path_args.train_dir, data_dir=flags_path_args.data_dir
    )
    # Restore the architecture flags saved at training time (flags.json),
    # then apply any explicit config overlay.
    import dataclasses as _dc

    saved = os.path.join(flags.train_dir, "flags.json")
    if os.path.exists(saved):
        with open(saved) as f:
            data = json.load(f)
        keep = {"train_dir", "data_dir", "config"}
        for field in _dc.fields(flags):
            if field.name not in keep and field.name in data:
                setattr(flags, field.name, data[field.name])
    if flags_path_args.config:
        update_flags(flags, flags_path_args.config)
    model = build_model(flags)
    trainer = NeRFSHTrainer(model, randomized=False)
    state = trainer.init_state(jax.random.PRNGKey(0))
    with open(os.path.join(flags.train_dir, "checkpoint.msgpack"), "rb") as f:
        state = serialization.from_bytes(state, f.read())
    return flags, model, state.params


def cmd_extract(args):
    from nerf_projects_tpu.pipeline.extraction import auto_scale, extract_octree

    flags, model, params = _load_model(args)

    @jax.jit
    def eval_fn(pts):
        return model.apply(params, pts, method=model.eval_points_raw)

    center, radius = (0.0, 0.0, 0.0), (args.radius,) * 3
    if args.autoscale:
        center, radius = auto_scale(
            eval_fn, center, radius,
            init_grid_depth=args.init_grid_depth,
            scale_alpha_thresh=args.scale_alpha_thresh,
            chunk=args.chunk,
        )
        radius = tuple(r * args.scale_margin for r in radius)
    data_dim = 3 * (flags.sh_deg + 1) ** 2 + 1 if flags.sh_deg >= 0 else 4
    dataset = None
    if args.masking_mode == "weight":
        from nerf_projects_tpu.data.base import load_scene

        dataset = load_scene(flags.data_dir, "train")
    tree = extract_octree(
        eval_fn,
        center=tuple(center),
        radius=tuple(radius),
        data_dim=data_dim,
        init_grid_depth=args.init_grid_depth,
        alpha_thresh=args.alpha_thresh,
        samples_per_cell=args.samples_per_cell,
        masking_mode=args.masking_mode,
        weight_thresh=args.weight_thresh,
        dataset=dataset,
        renderer_step_size=args.renderer_step_size,
        chunk=args.chunk,
    )
    tree.save(args.output)
    print(json.dumps({"nodes": tree.n_nodes, "leaves": tree.n_leaves,
                      "output": args.output}))


def cmd_optimize(args):
    from nerf_projects_tpu.data.base import load_scene
    from nerf_projects_tpu.models.octree import PlenOctree
    from nerf_projects_tpu.ops.octree_render import OctreeRenderOptions
    from nerf_projects_tpu.pipeline.optimization import OctreeFinetuner

    tree = PlenOctree.load(args.input)
    train = load_scene(args.data_dir, "train")
    try:
        val = load_scene(args.data_dir, "val")
    except Exception:
        val = train
    ft = OctreeFinetuner(
        OctreeRenderOptions(step_size=args.renderer_step_size),
        optimizer=args.sgd and "sgd" or "adam",
        lr=args.lr,
        chunk=args.chunk,
    )
    tree2 = ft.finetune(
        tree, train, val,
        n_epochs=args.num_epochs,
        val_interval=args.val_interval,
    )
    tree2.save(args.output or args.input)
    psnr = ft.eval_psnr(tree2, val)
    print(json.dumps({"psnr": psnr}))


def cmd_evaluate(args):
    from nerf_projects_tpu.data.base import load_scene
    from nerf_projects_tpu.models.octree import PlenOctree
    from nerf_projects_tpu.obs.json_logger import MetricsLogger
    from nerf_projects_tpu.obs.metrics import compute_metrics
    from nerf_projects_tpu.ops.octree_render import (
        OctreeRenderOptions,
        render_image_octree,
    )

    tree = PlenOctree.load(args.input)
    scene = load_scene(args.data_dir, "test")
    opts = OctreeRenderOptions(step_size=args.renderer_step_size)
    fast_render = None
    if getattr(args, "fast", False):
        # bake to a grid and use the fast grid path (occupancy + top-K +
        # dense density cache) — ~10x faster per image on TPU.
        import jax.numpy as jnp

        from nerf_projects_tpu.cli.render_imgs import render_grid_image
        from nerf_projects_tpu.models.grid_lifecycle import octree_to_grid
        from nerf_projects_tpu.ops.grid import (
            GridRenderOptions,
            make_render_cache,
        )
        from nerf_projects_tpu.ops.grid_accel import build_occupancy

        baked = octree_to_grid(tree, sigma_thresh=opts.sigma_thresh)
        gopts = GridRenderOptions(
            step_size=0.5, sigma_thresh=opts.sigma_thresh,
            color_mode="sigmoid",
        )
        occ = build_occupancy(baked, factor=8, sigma_thresh=opts.sigma_thresh)
        cache = make_render_cache(baked, dtype=jnp.bfloat16)
        # scene wrapper uses OpenGL poses; render via grid image helper
        from nerf_projects_tpu.cli.train_plenoxels import _to_opencv_pose  # noqa: F401

        def fast_render(v):
            return render_grid_image(
                baked, scene, v, gopts, args.chunk,
                occupancy=occ, color_top_k=48, dense_density=cache,
            )

    results = []
    import time

    t0 = time.time()
    for v in range(scene.images.shape[0]):
        if fast_render is not None:
            img = fast_render(v)
        else:
            img = render_image_octree(
                tree, scene.height, scene.width, scene.intrinsics,
                scene.poses[v], opts, chunk=args.chunk,
            )
        results.append(compute_metrics(img, scene.images[v]))
    elapsed = time.time() - t0
    mean = {k: float(np.mean([r[k] for r in results])) for k in results[0]}
    fps = len(results) / max(elapsed, 1e-9)
    out = {"mean": mean, "per_image": results, "fps": fps}
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=2)
    if args.train_dir:
        MetricsLogger(args.train_dir, clean_existing=False).log_octree_evaluation(
            0, mean, {"fps": fps}
        )
    print(json.dumps({"psnr": mean["psnr"], "fps": fps}))


def cmd_compress(args):
    from nerf_projects_tpu.models.octree import PlenOctree
    from nerf_projects_tpu.pipeline.compression import compress_octree

    tree = PlenOctree.load(args.input)
    stats = compress_octree(
        tree, args.output,
        n_colors=args.n_colors,
        sigma_thresh=args.sigma_thresh,
        retain=args.retain,
    )
    print(json.dumps(stats))


def cmd_compressed_eval(args):
    from nerf_projects_tpu.pipeline.compression import load_compressed_octree

    tree = load_compressed_octree(args.input)
    # reuse cmd_evaluate body by writing the tree to a temp npz? simpler:
    import tempfile

    tmp = tempfile.mktemp(suffix=".npz")
    tree.save(tmp)
    args.input = tmp
    cmd_evaluate(args)


def main(argv=None):
    p = argparse.ArgumentParser(description="PlenOctree tools (TPU)")
    sub = p.add_subparsers(dest="command", required=True)

    pe = sub.add_parser("extract")
    pe.add_argument("--train_dir", required=True)
    pe.add_argument("--data_dir", default=None)
    pe.add_argument("--config", default=None)
    pe.add_argument("--output", required=True)
    pe.add_argument("--radius", type=float, default=1.5)
    pe.add_argument("--autoscale", action="store_true")
    pe.add_argument("--scale_alpha_thresh", type=float, default=0.01)
    pe.add_argument("--scale_margin", type=float, default=1.05)
    pe.add_argument("--init_grid_depth", type=int, default=8)
    pe.add_argument("--alpha_thresh", type=float, default=0.01)
    pe.add_argument("--samples_per_cell", type=int, default=8)
    pe.add_argument("--masking_mode", choices=["sigma", "weight"], default="sigma")
    pe.add_argument("--weight_thresh", type=float, default=1e-4)
    pe.add_argument("--renderer_step_size", type=float, default=1e-3)
    pe.add_argument("--chunk", type=int, default=65536)
    pe.set_defaults(fn=cmd_extract)

    po = sub.add_parser("optimize")
    po.add_argument("--input", required=True)
    po.add_argument("--output", default=None)
    po.add_argument("--data_dir", required=True)
    po.add_argument("--lr", type=float, default=1e7)
    po.add_argument("--sgd", action="store_true", default=True)
    po.add_argument("--num_epochs", type=int, default=80)
    po.add_argument("--val_interval", type=int, default=2)
    po.add_argument("--renderer_step_size", type=float, default=1e-3)
    po.add_argument("--chunk", type=int, default=8192)
    po.set_defaults(fn=cmd_optimize)

    pv = sub.add_parser("evaluate")
    pv.add_argument("--input", required=True)
    pv.add_argument("--data_dir", required=True)
    pv.add_argument("--train_dir", default=None)
    pv.add_argument("--output", default=None)
    pv.add_argument("--renderer_step_size", type=float, default=1e-3)
    pv.add_argument("--chunk", type=int, default=16384)
    pv.add_argument("--fast", action="store_true",
                    help="bake to a grid and use the fast TPU render path")
    pv.set_defaults(fn=cmd_evaluate)

    pc = sub.add_parser("compress")
    pc.add_argument("--input", required=True)
    pc.add_argument("--output", required=True)
    pc.add_argument("--n_colors", type=int, default=65536)
    pc.add_argument("--sigma_thresh", type=float, default=1.0)
    pc.add_argument("--retain", type=int, default=1)
    pc.set_defaults(fn=cmd_compress)

    pce = sub.add_parser("compressed_eval")
    pce.add_argument("--input", required=True)
    pce.add_argument("--data_dir", required=True)
    pce.add_argument("--train_dir", default=None)
    pce.add_argument("--output", default=None)
    pce.add_argument("--renderer_step_size", type=float, default=1e-3)
    pce.add_argument("--chunk", type=int, default=16384)
    pce.set_defaults(fn=cmd_compressed_eval)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
