"""Compile-only bisect of the sparse-512 scan compile crash.

Uses geometry-only grids + ShapeDtypeStruct state so nothing large
touches HBM; compiles go through the chipless AOT helper.
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench as B
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.ops.pallas.tile_march import (
    geometry_only,
    required_chunks,
)
from nerf_projects_tpu.train import plenoxels_sparse as ps
from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

RESO = int(os.environ.get("RESO", 512))
TILES = int(os.environ.get("TILES", 8))
ONLY = [s for s in os.environ.get("REPRO_ONLY", "").split(",") if s]


def main():
    from nerf_projects_tpu.ops.brick_grid import create_brick_grid

    bg = create_brick_grid(RESO, basis_dim=9, use_sphere_bound=True,
                           alloc_data=False)
    bg = B._shell_select(bg, RESO, 0.85, 1.02)
    geom = geometry_only(bg)
    rays = B._tile_rays(jax.random.PRNGKey(2), TILES)
    target = jnp.full(rays.origins.shape[:2] + (3,), 0.4)
    opts = GridRenderOptions(step_size=0.5)
    trainer = PlenoxelsTrainer(opts, n_iters=128_000, lambda_tv=1e-5,
                               lambda_tv_sh=1e-3, bf16_grad_blocks=True)
    CK = required_chunks(geom, rays, opts)
    from nerf_projects_tpu.ops.pallas.tile_march import (
        active_chunk_bound,
    )

    CN = active_chunk_bound(geom, opts.step_size)
    nb, Bd = bg.n_bricks, bg.basis_dim
    print(json.dumps({"nb": int(nb), "CK": CK, "CN": CN}), flush=True)

    def sds(shape, dt=jnp.float32):
        return jax.ShapeDtypeStruct(shape, dt)

    st_s = ps.SparseBrickState(
        density_k=sds((nb + 1, 8, 64)),
        sh_k=sds((nb + 1, Bd, 8, 192)),
        density_z=None, sh_z=None,
        rms_density=sds((nb + 1, 8, 64), jnp.bfloat16),
        rms_sh=sds((nb + 1, Bd, 8, 192), jnp.bfloat16),
        last_step=sds((nb + 1,), jnp.int32),
    )
    st_p = ps.PackedState(
        packed_k=sds((nb + 1, Bd + 1, 8, 192)),
        rms=sds((nb + 1, Bd + 1, 8, 192), jnp.bfloat16),
    )

    def case(name, fn, *args):
        if ONLY and name not in ONLY:
            return
        try:
            jax.jit(fn, static_argnums=0).lower(*args).compile()
            print(json.dumps({"case": name, "ok": True}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": name, "ok": False,
                              "err": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)

    def one_step(_k, st, key):
        return ps.train_step_tiles_sparse(
            trainer, geom, st, rays, target,
            jnp.asarray(0, jnp.int32), key,
            compact_chunks=CK, max_touched=4096)

    def scan_steps(k, st, key):
        def body(st, i):
            st, stats = ps.train_step_tiles_sparse(
                trainer, geom, st, rays, target, i,
                jax.random.fold_in(key, i),
                compact_chunks=CK, max_touched=4096)
            return st, stats["mse"]
        return jax.lax.scan(body, st, jnp.arange(k, dtype=jnp.int32))

    def scan_packed(k, st, key):
        def body(st, i):
            st, stats = ps.train_step_tiles_packed(
                trainer, geom, st, rays, target, i,
                jax.random.fold_in(key, i),
                compact_chunks=CK, use_occupancy=True)
            return st, stats["mse"]
        return jax.lax.scan(body, st, jnp.arange(k, dtype=jnp.int32))

    def scan_steps_arg(k, g, st, key):
        # geom as a jit ARG (closure device constants stall/crash the
        # remote compile helper — see memory: axon-tpu-measurement)
        def body(st, i):
            st, stats = ps.train_step_tiles_sparse(
                trainer, g, st, rays, target, i,
                jax.random.fold_in(key, i),
                compact_chunks=CK, max_touched=4096)
            return st, stats["mse"]
        return jax.lax.scan(body, st, jnp.arange(k, dtype=jnp.int32))

    def scan_packed_arg(k, g, st, key):
        # n_chunks is the host-precomputed occupancy bound: with g
        # traced, active_chunk_bound cannot run inside the scan
        def body(st, i):
            st, stats = ps.train_step_tiles_packed(
                trainer, g, st, rays, target, i,
                jax.random.fold_in(key, i),
                compact_chunks=CK, use_occupancy=True, n_chunks=CN)
            return st, stats["mse"]
        return jax.lax.scan(body, st, jnp.arange(k, dtype=jnp.int32))

    geom_sds = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), geom)

    key = sds((2,), jnp.uint32)
    case("one_step", one_step, 1, st_s, jax.random.PRNGKey(0))
    case("scan2", scan_steps, 2, st_s, jax.random.PRNGKey(0))
    case("scan4", scan_steps, 4, st_s, jax.random.PRNGKey(0))
    case("scan16", scan_steps, 16, st_s, jax.random.PRNGKey(0))
    case("scan4_arg", scan_steps_arg, 4, geom_sds, st_s,
         jax.random.PRNGKey(0))
    case("scan16_arg", scan_steps_arg, 16, geom_sds, st_s,
         jax.random.PRNGKey(0))
    case("packed_scan4", scan_packed, 4, st_p, jax.random.PRNGKey(0))
    case("packed_scan4_arg", scan_packed_arg, 4, geom_sds, st_p,
         jax.random.PRNGKey(0))


if __name__ == "__main__":
    main()
