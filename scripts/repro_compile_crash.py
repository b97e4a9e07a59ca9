"""Bisect the remote-compile-helper exit-1 crash (AOT, no chip).

Compiles the whole-frame renderer (and cut-down variants) at varying
scales via jit(...).lower(...).compile() with ShapeDtypeStruct args —
no HBM use, safe to run while another process owns the chip.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.tree_util as tu

from nerf_projects_tpu.core.rays import Rays

ONLY = [s for s in os.environ.get("REPRO_ONLY", "").split(",") if s]


def main():
    import bench as B
    from nerf_projects_tpu.ops.brick_grid import create_brick_grid
    from nerf_projects_tpu.ops.grid import GridRenderOptions
    from nerf_projects_tpu.ops.pallas import frame_march as fm
    from nerf_projects_tpu.ops.pallas.tile_march import default_chunks_for

    opts = GridRenderOptions(step_size=0.5)

    def setup(reso):
        bg = create_brick_grid(reso, basis_dim=9, use_sphere_bound=True,
                               alloc_data=False)
        bg = B._shell_select(bg, reso, 0.85, 1.02)
        return bg

    def case(name, reso, H, group=768, mode="full", n_chunks=None,
             r=128):
        if ONLY and name not in ONLY:
            return
        try:
            bg = setup(reso)
            C = n_chunks or default_chunks_for(bg, opts)
            T = (H * H) // r
            s3 = jax.ShapeDtypeStruct((T, r, 3), jnp.float32)
            rays = Rays(s3, s3, s3)
            ka = jax.ShapeDtypeStruct(
                (bg.n_bricks + 1, 10, 8, 192), jnp.bfloat16)

            if mode == "plan":
                def fn(bg_, rr, ka_):
                    return fm.render_frame_pallas(
                        bg_, rr, opts, kernel_arrays=ka_, n_chunks=C,
                        use_occupancy=False)["n_windows"]
            elif mode == "one_group":
                def fn(bg_, rr, ka_):
                    out = fm.render_frame_pallas(
                        bg_, rr, opts, kernel_arrays=ka_, n_chunks=C,
                        use_occupancy=False, group=group)
                    return out["rgb"]
            else:
                def fn(bg_, rr, ka_):
                    out = fm.render_frame_pallas(
                        bg_, rr, opts, kernel_arrays=ka_, n_chunks=C,
                        use_occupancy=False, group=group)
                    return out["rgb"]

            jax.jit(fn).lower(bg, rays, ka).compile()
            print(json.dumps({"case": name, "ok": True, "C": C, "T": T}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "case": name, "ok": False, "C": locals().get("C"),
                "err": f"{type(e).__name__}: {e}"[:200]}), flush=True)

    case("r512_h800", 512, 800)
    case("r512_h400", 512, 400)
    case("r256_h800", 256, 800)
    case("r256_h400", 256, 400)
    case("r128_h256", 128, 256)
    case("r512_h800_plan", 512, 800, mode="plan")
    case("r512_h800_g256", 512, 800, group=256)
    case("r512_h800_c64", 512, 800, n_chunks=64)
    case("r512_h400_c32", 512, 400, n_chunks=32)


if __name__ == "__main__":
    main()


def edge():
    """Find the max flat-group size that compiles (and r=256 variant)."""
    import bench as B
    from nerf_projects_tpu.ops.brick_grid import create_brick_grid
    from nerf_projects_tpu.ops.grid import GridRenderOptions
    from nerf_projects_tpu.ops.pallas import frame_march as fm

    opts = GridRenderOptions(step_size=0.5)
    bg = create_brick_grid(128, basis_dim=9, use_sphere_bound=True,
                           alloc_data=False)
    for r in (128, 256):
        for g in (704, 640, 576, 512, 384):
            try:
                T = (256 * 256) // r
                s3 = jax.ShapeDtypeStruct((T, r, 3), jnp.float32)
                rays = Rays(s3, s3, s3)
                ka = jax.ShapeDtypeStruct(
                    (bg.n_bricks + 1, 10, 8, 192), jnp.bfloat16)

                def fn(bg_, rr, ka_):
                    return fm.render_frame_pallas(
                        bg_, rr, opts, kernel_arrays=ka_, n_chunks=28,
                        use_occupancy=False, group=g)["rgb"]

                jax.jit(fn).lower(bg, rays, ka).compile()
                print(json.dumps({"edge": [r, g], "ok": True}), flush=True)
                break
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"edge": [r, g], "ok": False,
                                  "err": str(e)[:100]}), flush=True)


if os.environ.get("REPRO_EDGE"):
    edge()
