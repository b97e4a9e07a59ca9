"""Compile-only bisect of the 512^3 dense-sweep optimizer variants.

AOT-compiles (ShapeDtypeStruct args, chipless helper) the fused
dense_optim step, the defer split halves, and scan-wrapped composites —
maps exactly where the remote-compile helper's HTTP-500 limit sits and
whether a device-side step loop is available at 512^3 (it would delete
the per-step dispatch cost entirely).
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# persistent compile cache (shared with bench.py): restart attempts and
# the round-5 measurement queue skip minutes-long remote recompiles
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass
import jax.numpy as jnp

import bench as B
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.ops.pallas.flat_train import required_windows
from nerf_projects_tpu.train import plenoxels_sparse as ps
from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

RESO = int(os.environ.get("RESO", 512))
TILES = int(os.environ.get("TILES", 128))
ONLY = [s for s in os.environ.get("REPRO_ONLY", "").split(",") if s]


def main():
    from nerf_projects_tpu.ops.brick_grid import create_brick_grid
    from nerf_projects_tpu.ops.pallas.tile_march import geometry_only

    bg = create_brick_grid(RESO, basis_dim=9, use_sphere_bound=True,
                           alloc_data=False)
    bg = B._shell_select(bg, RESO, 0.85, 1.02)
    geom = geometry_only(bg)
    rays = B._tile_rays(jax.random.PRNGKey(2), TILES)
    target = jnp.full(rays.origins.shape[:2] + (3,), 0.4)
    opts = GridRenderOptions(step_size=0.5)
    trainer = PlenoxelsTrainer(
        opts, n_iters=128_000, lambda_tv=1e-5, lambda_tv_sh=1e-3,
        bf16_grad_blocks=True, rms_pervisit=True,
    )
    flat_w = required_windows(geom, rays, opts)
    tv_w = max(int(trainer.tv_sparsity * bg.n_bricks), 1) + max(
        int(trainer.tv_sh_sparsity * bg.n_bricks), 1
    )
    k_exact = ps.required_touched_rows(geom, rays, opts, tv_rows=4 * tv_w)
    nb, Bd = bg.n_bricks, bg.basis_dim
    print(json.dumps({"nb": int(nb), "flat_w": flat_w,
                      "k_exact": k_exact}), flush=True)

    def sds(shape, dt=jnp.float32):
        return jax.ShapeDtypeStruct(shape, dt)

    st_p = ps.PackedState(
        packed_k=sds((nb + 1, Bd + 1, 8, 192)),
        rms=sds((nb + 1, Bd + 1, 8, 192), jnp.bfloat16),
        last_step=sds((nb + 1,), jnp.int32),
    )
    acc_s = sds((nb + 1, Bd + 1, 8, 192))
    flag_s = sds((nb + 1,), jnp.int32)
    key_s = sds((2,), jnp.uint32)
    i_s = sds((), jnp.int32)

    def case(name, fn, *args, static=(0,)):
        if ONLY and name not in ONLY:
            return
        try:
            jax.jit(fn, static_argnums=static).lower(*args).compile()
            print(json.dumps({"case": name, "ok": True}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": name, "ok": False,
                              "err": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)

    def fused_step(_k, st, i, key):
        st, stats = ps.train_step_tiles_packed_touched(
            trainer, geom, st, rays, target, i, key,
            max_touched=k_exact, flat_windows=flat_w, dense_optim=True)
        return st, stats["mse"]

    def defer_a(_k, st, i, key):
        _, stats = ps.train_step_tiles_packed_touched(
            trainer, geom, st, rays, target, i, key,
            max_touched=k_exact, flat_windows=flat_w,
            dense_optim="defer")
        return stats["dense_acc"], stats["touched_flag"], stats["mse"]

    def defer_b(_k, st, acc, flag, i):
        return ps.dense_sweep_apply(trainer, geom, st, acc, flag, i)

    def scan_defer(k, st, key):
        def body(st, i):
            _, stats = ps.train_step_tiles_packed_touched(
                trainer, geom, st, rays, target, i,
                jax.random.fold_in(key, i),
                max_touched=k_exact, flat_windows=flat_w,
                dense_optim="defer")
            st = ps.dense_sweep_apply(
                trainer, geom, st, stats["dense_acc"],
                stats["touched_flag"], i)
            return st, stats["mse"]
        return jax.lax.scan(body, st, jnp.arange(k, dtype=jnp.int32))

    def scan_fused(k, st, key):
        def body(st, i):
            st, stats = ps.train_step_tiles_packed_touched(
                trainer, geom, st, rays, target, i,
                jax.random.fold_in(key, i),
                max_touched=k_exact, flat_windows=flat_w,
                dense_optim=True)
            return st, stats["mse"]
        return jax.lax.scan(body, st, jnp.arange(k, dtype=jnp.int32))

    def scan_krow(k, st, key):
        def body(st, i):
            st, stats = ps.train_step_tiles_packed_touched(
                trainer, geom, st, rays, target, i,
                jax.random.fold_in(key, i),
                max_touched=k_exact, flat_windows=flat_w)
            return st, stats["mse"]
        return jax.lax.scan(body, st, jnp.arange(k, dtype=jnp.int32))

    case("fused_step", fused_step, 1, st_p, i_s, key_s)
    case("defer_a", defer_a, 1, st_p, i_s, key_s)
    case("defer_b", defer_b, 1, st_p, acc_s, flag_s, i_s)
    case("scan4_defer", scan_defer, 4, st_p, jax.random.PRNGKey(0))
    case("scan4_fused", scan_fused, 4, st_p, jax.random.PRNGKey(0))
    case("scan4_krow", scan_krow, 4, st_p, jax.random.PRNGKey(0))


if __name__ == "__main__":
    main()
