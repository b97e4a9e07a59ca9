"""Isolate the wps>1 march/bwd kernel compile on hardware (full error).

Compiles (no run) each piece at the bench shell shape:
  fwd1/fwd2/fwd4   — forward march, wps 1/2/4, packed fetches + samples
  bwd1/bwd2/bwd4   — fetch-free backward, packed grads, wps 1/2/4
  tred             — tile_segment_reduce alone
  step4            — the full touched step, wps=4 + tile reduce
Env: RESO, TILES, ONLY (comma list).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench as B
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.ops.pallas import tile_march as tm
from nerf_projects_tpu.train import plenoxels_sparse as ps

RESO = int(os.environ.get("RESO", 256))
TILES = int(os.environ.get("TILES", 40))
ONLY = [s for s in os.environ.get("ONLY", "").split(",") if s]

opts = GridRenderOptions(step_size=0.5)
bg = B._shell_setup(RESO, dtype=jnp.float32)
rays = B._tile_rays(jax.random.PRNGKey(2), TILES)
target = jnp.full(rays.origins.shape[:2] + (3,), 0.4)
ck = tm.required_chunks(bg, rays, opts, use_occupancy=True)
st = ps.packed_state_from_grid(bg)
print(json.dumps({"nb": int(bg.n_bricks), "ck": ck}), flush=True)

pack, geom = tm._pack_rays(bg, rays, opts, True)
wb, rows = tm._plan_windows(bg, geom, ck)
(orig, rows), C, _ = tm._orig_with_base(wb, rows, bg.n_bricks, ck, None)
basisf = jnp.zeros((TILES, bg.basis_dim), jnp.float32).at[:, 0].set(1.0)


def try_compile(name, fn, *args):
    if ONLY and name not in ONLY:
        return
    try:
        jax.jit(fn).lower(*args).compile()
        print(json.dumps({"case": name, "ok": True}), flush=True)
    except Exception as exc:
        print(json.dumps({"case": name, "ok": False,
                          "err": f"{type(exc).__name__}: {exc}"[-6000:]}),
              flush=True)


for w in (1, 2, 4):
    o2, r2, C2 = tm._pad_chunks(orig, rows, bg.n_bricks, w)

    def fwd(pk, r3, o3, bf, pk_rays, w=w, C2=C2):
        return tm._march_call(pk, None, r3, o3, bf, pk_rays, C2,
                              bg.basis_dim, "bias", emit_samples=True,
                              wps=w)

    try_compile(f"fwd{w}", fwd, st.packed_k, r2, o2, basisf, pack)

    samples_shape = (TILES, C2, 8, 16 * 128)
    samples = jnp.zeros(samples_shape, jnp.float32)

    def bwd(smp, r3, o3, bf, pk_rays, w=w, C2=C2):
        return tm._bwd_call(smp, r3, o3, bf, pk_rays, C2, bg.basis_dim,
                            0.0, "bias", jnp.float32, packed_out=True,
                            wps=w, skip_empty=True,
                            n_bricks=bg.n_bricks)

    try_compile(f"bwd{w}", bwd, samples, r2, o2, basisf, pack)

kt = ps.required_tile_rows(bg, rays, opts, use_occupancy=True,
                           compact_chunks=ck)
print(json.dumps({"tile_rows": kt}), flush=True)
gp = jnp.zeros((TILES, C, 8, bg.basis_dim + 1, 8, 192), jnp.float32)


def tred(gpb, r3):
    return ps.tile_segment_reduce(gpb, r3, bg.n_bricks, kt)


try_compile("tred", tred, gp, rows)


from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

trainer = PlenoxelsTrainer(opts, n_iters=128_000, lambda_tv=1e-5,
                           lambda_tv_sh=1e-3)


def step4(stt, r3, t3, i, key):
    return ps.train_step_tiles_packed_touched(
        trainer, bg, stt, r3, t3, i, key,
        max_touched=6144, compact_chunks=ck, use_occupancy=True,
        wps=4, tile_rows=kt)


try_compile("step4", step4, st, rays, target,
            jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0))
