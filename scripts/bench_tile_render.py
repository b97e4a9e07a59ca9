"""TPU benchmark: lockstep tile renderer vs the round-1 gather path.

Measures (slope-fit between two scan lengths, one float() readback each —
the only trustworthy timing through the axon relay, NOTES_ROUND1.md):
  1. tile density+SH forward render, training shape (40 tiles x 128 rays)
  2. tile fwd+bwd (grads to brick arrays)
  3. full-frame render at 800^2 equivalent (tile batches)
Prints JSON lines.
"""
import json
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.models.sparse_grid import SparseGrid
from nerf_projects_tpu.ops.brick_grid import from_sparse_grid
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.ops.tile_render import render_tiles

RESO = int(sys.argv[1]) if len(sys.argv) > 1 else 256
TILES = 40
R = 128


def make_bg():
    rng = np.random.default_rng(0)
    g = SparseGrid.create(RESO, basis_dim=9, use_sphere_bound=True,
                          init_density=0.0)
    print(f"capacity {g.capacity}", flush=True)
    bg = from_sparse_grid(g)
    # fill with random data so nothing is trivially zero
    dens = jax.random.uniform(jax.random.PRNGKey(0),
                              bg.density_bricks.shape) * 2.0
    sh = jax.random.normal(jax.random.PRNGKey(1), bg.sh_bricks.shape) * 0.2
    from dataclasses import replace
    return replace(bg, density_bricks=dens, sh_bricks=sh)


def make_tile_rays(key, n_tiles):
    """Random coherent 16x8 pixel tiles from random cameras at radius 3."""
    ks = jax.random.split(key, 4)
    # camera position on sphere
    u = jax.random.normal(ks[0], (n_tiles, 3))
    cam = 3.0 * u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    fwd = -cam / 3.0
    up = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (n_tiles, 1))
    right = jnp.cross(fwd, up)
    right = right / jnp.maximum(jnp.linalg.norm(right, -1, keepdims=True), 1e-6)
    up2 = jnp.cross(right, fwd)
    # pixel offsets for a 16x8 tile at ~800 focal
    ii, jj = jnp.meshgrid(jnp.arange(8.0), jnp.arange(16.0), indexing="ij")
    base = jax.random.uniform(ks[1], (n_tiles, 2), minval=-300, maxval=300)
    px = base[:, 0:1] + jj.reshape(-1)[None]
    py = base[:, 1:2] + ii.reshape(-1)[None]
    d = (
        fwd[:, None, :]
        + (px / 800.0)[..., None] * right[:, None, :]
        + (py / 800.0)[..., None] * up2[:, None, :]
    )
    dn = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam[:, None, :], dn.shape)
    return Rays(o, dn, dn)


def slope_time(fn, n_lo=4, n_hi=16):
    """fn(n) runs the workload n times and returns a scalar; returns
    seconds per run via slope fit (both scan lengths pre-compiled)."""
    fn(n_lo)  # compile + warm both lengths
    fn(n_hi)
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(n_lo)
        t1 = time.perf_counter()
        fn(n_hi)
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n_hi - n_lo))
    return min(s for s in slopes if s > 0)


def main():
    bg = make_bg()
    opts = GridRenderOptions(step_size=0.5)
    rays_pool = make_tile_rays(jax.random.PRNGKey(2), TILES)

    @jax.jit
    def fwd_n(n):
        def body(carry, i):
            r = Rays(
                rays_pool.origins + i * 1e-6,
                rays_pool.directions,
                rays_pool.viewdirs,
            )
            out = render_tiles(bg, r, opts)
            return carry + jnp.sum(out["rgb"]), None

        s, _ = jax.lax.scan(body, 0.0, jnp.arange(n, dtype=jnp.float32))
        return s

    def run_fwd(n):
        return float(fwd_n(jnp.asarray(n)))

    # scan length must be static for jit-by-arg; use closure per n
    import functools

    def runner(build):
        cache = {}

        def go(n):
            if n not in cache:
                cache[n] = jax.jit(build(n))
            return float(cache[n]())

        return go

    def build_fwd(n):
        def f():
            def body(carry, i):
                r = Rays(rays_pool.origins + i * 1e-6,
                         rays_pool.directions, rays_pool.viewdirs)
                out = render_tiles(bg, r, opts)
                return carry + jnp.sum(out["rgb"]), None
            s, _ = jax.lax.scan(body, 0.0,
                                jnp.arange(n, dtype=jnp.float32))
            return s
        return f

    sec = slope_time(runner(build_fwd))
    rays_per_s = TILES * R / sec
    print(json.dumps({"metric": "tile_render_fwd", "ms": sec * 1e3,
                      "rays_per_s": rays_per_s, "reso": RESO}), flush=True)

    target = jnp.full((TILES, R, 3), 0.3)

    def build_step(n):
        def f():
            def loss_fn(dens, sh, r):
                from dataclasses import replace
                b = replace(bg, density_bricks=dens, sh_bricks=sh)
                out = render_tiles(b, r, opts)
                return jnp.mean((out["rgb"] - target) ** 2)

            def body(carry, i):
                r = Rays(rays_pool.origins + i * 1e-6,
                         rays_pool.directions, rays_pool.viewdirs)
                l, g = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                    bg.density_bricks, bg.sh_bricks, r)
                return carry + l + jnp.sum(g[0][0, :1]), None

            s, _ = jax.lax.scan(body, 0.0, jnp.arange(n, dtype=jnp.float32))
            return s
        return f

    sec = slope_time(runner(build_step))
    print(json.dumps({"metric": "tile_render_fwd_bwd", "ms": sec * 1e3,
                      "rays_per_s": TILES * R / sec, "reso": RESO}),
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
