"""Mesh-extraction CLI (reference plenoctree/nerf_sh/gen_mesh.py)."""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser(description="Extract an isosurface OBJ")
    p.add_argument("ckpt", help="NeRF-SH train_dir or Plenoxels grid npz")
    p.add_argument("--out", required=True)
    p.add_argument("--kind", choices=["nerf_sh", "grid"], default="nerf_sh")
    p.add_argument("--reso", type=int, default=256)
    p.add_argument("--radius", type=float, default=1.5)
    p.add_argument("--iso", type=float, default=25.0)
    p.add_argument("--chunk", type=int, default=65536)
    args = p.parse_args(argv)

    from nerf_projects_tpu.pipeline.mesh import extract_mesh_from_field, save_obj

    if args.kind == "nerf_sh":
        from nerf_projects_tpu.cli.octree_tools import _load_model

        ns = argparse.Namespace(train_dir=args.ckpt, data_dir=None, config=None)
        flags, model, params = _load_model(ns)

        @jax.jit
        def sigma_fn(pts):
            _, s = model.apply(params, pts, method=model.eval_points_raw)
            return jnp.maximum(s[:, 0], 0.0)

    else:
        from nerf_projects_tpu.models.sparse_grid import SparseGrid
        from nerf_projects_tpu.ops.grid import sample_grid

        grid = SparseGrid.load(args.ckpt)

        @jax.jit
        def sigma_fn(pts):
            d, _ = sample_grid(grid, pts, want_colors=False)
            return jnp.maximum(d[:, 0], 0.0)

    verts, tris = extract_mesh_from_field(
        sigma_fn, reso=args.reso, radius=args.radius, iso=args.iso,
        chunk=args.chunk,
    )
    save_obj(args.out, verts, tris)
    print(f"{args.out}: {len(verts)} vertices, {len(tris)} triangles")


if __name__ == "__main__":
    main()
