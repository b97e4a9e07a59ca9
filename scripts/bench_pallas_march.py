"""TPU benchmark for the Pallas tile-march kernel (fwd render).

Workloads:
  * training shape: 40 tiles x 128 rays
  * frame shape: 800x800-equivalent tile batch sweep -> FPS
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.ops.pallas.tile_march import render_tiles_pallas

RESO = int(sys.argv[1]) if len(sys.argv) > 1 else 256
TILES = int(sys.argv[2]) if len(sys.argv) > 2 else 40
USE_OCC = "occ" in sys.argv[3:]
R_TILE = 256 if "r256" in sys.argv[3:] else 128


def main():
    sys.path.insert(0, "scripts")
    from bench_tile_render import make_bg, make_tile_rays, slope_time
    import bench_tile_render as btr

    btr.RESO = RESO
    bg = make_bg()
    opts = GridRenderOptions(step_size=0.5)
    rays_pool = make_tile_rays(jax.random.PRNGKey(2), TILES)
    if R_TILE == 256:
        # fold pairs of 128-ray tiles into 256-ray tiles (coherence is
        # weaker but adequate for a throughput probe)
        import jax.tree_util as tu
        rays_pool = tu.tree_map(
            lambda x: x.reshape(TILES // 2, 256, 3), rays_pool)

    def build(n):
        def f():
            def body(carry, i):
                from nerf_projects_tpu.core.rays import Rays

                r = Rays(rays_pool.origins + i * 1e-6,
                         rays_pool.directions, rays_pool.viewdirs)
                out = render_tiles_pallas(bg, r, opts,
                                          use_occupancy=USE_OCC)
                return carry + jnp.sum(out["rgb"]), None

            s, _ = jax.lax.scan(body, 0.0, jnp.arange(n, dtype=jnp.float32))
            return s
        return f

    cache = {}

    def go(n):
        if n not in cache:
            cache[n] = jax.jit(build(n))
        return float(cache[n]())

    t0 = time.time()
    sec = slope_time(go)
    print(f"(compile+measure took {time.time()-t0:.0f}s)", flush=True)
    n_rays = TILES * 128
    print(json.dumps({
        "metric": "pallas_march_fwd", "occ": USE_OCC, "ms": sec * 1e3,
        "rays_per_s": n_rays / sec, "reso": RESO, "tiles": TILES,
        "frame_800_ms": 640_000 / (n_rays / sec) * 1e3,
    }), flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
