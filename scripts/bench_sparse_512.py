"""Dense vs row-sparse train step on a 512^3 SHELL grid (the real-scene
regime: surface-topology occupancy, where O(grid) per-step costs bite).
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import jax, jax.numpy as jnp
import bench as B
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.ops.pallas.tile_march import sh_to_kernel_layout
from nerf_projects_tpu.train import plenoxels_sparse as ps
from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

RESO = int(os.environ.get("RESO", 512))
TILES = int(os.environ.get("TILES", 8))
MAX_TOUCHED = int(os.environ.get("MAX_TOUCHED", 4096))

from dataclasses import replace

# build at bf16 (the fp32 full-sphere intermediate OOMs at 512^3),
# upcast the small filtered shell to f32 for training
_bg16 = B._shell_setup(RESO, dtype=jnp.bfloat16)
bg = replace(
    _bg16,
    density_bricks=_bg16.density_bricks.astype(jnp.float32),
    sh_bricks=_bg16.sh_bricks.astype(jnp.float32),
)
del _bg16
print(json.dumps({"nb": int(bg.n_bricks)}), flush=True)
rays = B._tile_rays(jax.random.PRNGKey(2), TILES)
target = jnp.full(rays.origins.shape[:2] + (3,), 0.4)
opts = GridRenderOptions(step_size=0.5)
trainer = PlenoxelsTrainer(opts, n_iters=128_000, lambda_tv=1e-5,
                           lambda_tv_sh=1e-3, bf16_grad_blocks=True)

def slope(fn, lo=4, hi=16):
    fn(lo); fn(hi)
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); fn(lo); t1 = time.perf_counter()
        fn(hi); t2 = time.perf_counter()
        s_ = ((t2 - t1) - (t1 - t0)) / (hi - lo)
        if s_ > 0:
            best = s_ if best is None else min(best, s_)
    return best

# dense
@functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
def scan_dense(k, b, r, key):
    def body(carry, i):
        b, r = carry
        b, r, st = trainer.train_step_tiles_pallas(
            b, r, rays, target, i, jax.random.fold_in(key, i.astype(jnp.int32)))
        return (b, r), st["mse"]
    (b, r), mses = jax.lax.scan(body, (b, r), jnp.arange(k, dtype=jnp.float32))
    return b, r, mses

bg_d = jax.tree_util.tree_map(jnp.copy, bg)
holder = {"b": bg_d, "r": trainer.init_rms_bricks(bg_d)}
def run_dense(k):
    b, r, mses = scan_dense(k, holder["b"], holder["r"], jax.random.PRNGKey(k))
    _ = float(mses[-1]); holder["b"], holder["r"] = b, r
try:
    if os.environ.get("SKIP_DENSE", "") == "1":
        raise MemoryError("skipped (recorded OOM: 20.1G > 15.75G hbm)")
    ms = slope(run_dense) * 1e3
    print(json.dumps({"variant": "dense", "ms": round(ms, 2),
                      "rays_per_s": round(TILES * 128 / ms * 1e3)}),
          flush=True)
except Exception as exc:
    # the O(grid) dense step does not FIT at 512^3 — the sparse step's
    # reason to exist
    print(json.dumps({"variant": "dense",
                      "error": f"{type(exc).__name__}: {exc}"[:200]}),
          flush=True)
del holder, bg_d

# sparse (compacted chunks: the shell is where it pays). The sparse
# state owns the data; keep only GEOMETRY alive beyond it.
from nerf_projects_tpu.ops.pallas.tile_march import (
    geometry_only,
    required_chunks,
)
geom = geometry_only(bg)
CK = required_chunks(geom, rays, opts)
nb, B = bg.n_bricks, bg.basis_dim
print(json.dumps({"compact_chunks": CK}), flush=True)

# ---- touched-row packed step (the ship mode): ONE f32 packed array
# (3.8 GB at 512^3 shell) + bf16 rms (1.9 GB); the march reads the
# packed masters directly and the optimizer touches only this step's
# rows — the smallest-footprint AND fastest path at this scale.
try:
    st_t = ps.PackedState(
        packed_k=ps.pack_kernel_arrays(
            jnp.zeros((nb + 1, 8, 64), jnp.float32).at[:nb].set(
                bg.density_bricks.reshape(nb, 8, 64)
            ),
            jnp.zeros((nb + 1, B, 8, 192), jnp.float32).at[:nb].set(
                sh_to_kernel_layout(bg.sh_bricks, B)
            ),
        ),
        rms=jnp.zeros((nb + 1, B + 1, 8, 192), jnp.bfloat16),
        last_step=jnp.full((nb + 1,), -1, jnp.int32),
    )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def scan_touched(k, st, key):
        def body(st, i):
            st, stats = ps.train_step_tiles_packed_touched(
                trainer, geom, st, rays, target, i,
                jax.random.fold_in(key, i),
                max_touched=MAX_TOUCHED, compact_chunks=CK)
            return st, (stats["mse"], stats["touched_overflow"])

        return jax.lax.scan(body, st, jnp.arange(k, dtype=jnp.int32))

    sht = {"st": st_t}
    del st_t
    ovf = {"max": 0.0}

    def run_touched(k):
        st, (mses, o) = scan_touched(
            k, sht["st"], jax.random.PRNGKey(k))
        ovf["max"] = max(ovf["max"], float(o.max()))
        _ = float(mses[-1])
        sht["st"] = st

    ms = slope(run_touched) * 1e3
    print(json.dumps({"variant": "touched_scan", "ms": round(ms, 2),
                      "rays_per_s": round(TILES * 128 / ms * 1e3),
                      "tiles": TILES, "max_touched": MAX_TOUCHED,
                      "overflow": round(ovf["max"], 5)}), flush=True)
    del sht
except Exception as exc:
    print(json.dumps({"variant": "touched_scan",
                      "error": f"{type(exc).__name__}: {exc}"[:300]}),
          flush=True)

# build the state FIELD BY FIELD with explicit free points — the
# monolithic build holds master+kernel+bf16 copies concurrently
# (17.7 G > 15.75 G at this scale)
from dataclasses import replace as _rep

from nerf_projects_tpu.ops.pallas.tile_march import sh_to_kernel_layout

nb, B = bg.n_bricks, bg.basis_dim

@functools.partial(jax.jit, donate_argnums=0)
def build_sh_k(master):
    out = jnp.zeros((nb + 1, B, 8, 192), jnp.float32)
    return out.at[:nb].set(sh_to_kernel_layout(master, B))

sk = build_sh_k(bg.sh_bricks)
bg = _rep(bg, sh_bricks=jnp.zeros((nb, 1, 1), jnp.float32))
dk = jnp.zeros((nb + 1, 8, 64), jnp.float32).at[:nb].set(
    bg.density_bricks.reshape(nb, 8, 64)
)
bg = _rep(bg, density_bricks=jnp.zeros((nb, 1), jnp.float32))
# alias the f32 masters as the kernel arrays: bf16 windows measured
# no speedup (march is latency- not bandwidth-bound) and the separate
# copies are exactly the HBM gap at this scale
st0 = ps.SparseBrickState(
    density_k=dk,
    sh_k=sk,
    density_z=None,
    sh_z=None,
    rms_density=jnp.zeros(dk.shape, jnp.bfloat16),
    rms_sh=jnp.zeros(sk.shape, jnp.bfloat16),
    last_step=jnp.full((nb + 1,), -1, jnp.int32),
)
del dk, sk
sh = {"st": st0}
del bg, st0

# python-loop with donation (a scanned 9 GB carry double-buffers and
# OOMs); per-dispatch host cost ~20 ms rides on each step — this is an
# upper bound on step time
def run_sparse(k):
    st = sh["st"]
    stats = None
    for i in range(k):
        st, stats = ps.train_step_tiles_sparse_jit(
            trainer, geom, st, rays, target,
            jnp.asarray(i, jnp.int32), jax.random.PRNGKey(i),
            compact_chunks=CK, max_touched=MAX_TOUCHED)
    _ = float(stats["mse"])
    sh["st"] = st

ms = slope(run_sparse) * 1e3
print(json.dumps({"variant": "sparse_compact", "ms": round(ms, 2),
                  "rays_per_s": round(TILES * 128 / ms * 1e3),
                  "tiles": TILES, "max_touched": MAX_TOUCHED,
                  "note": "incl ~20ms/step dispatch overhead"}),
      flush=True)

# ---- scanned multi-step: folds the ~20 ms/step dispatch into ONE
# call. The scan carry is the full state; XLA aliases the carry
# in-place when the dataflow allows (the .at[uniq].set updates do) —
# re-measured here since the earlier monolithic state build OOMed.
@functools.partial(
    jax.jit, static_argnums=0, donate_argnums=1,
)
def scan_sparse(k, st, key):
    def body(st, i):
        st, stats = ps.train_step_tiles_sparse(
            trainer, geom, st, rays, target, i,
            jax.random.fold_in(key, i),
            compact_chunks=CK, max_touched=MAX_TOUCHED)
        return st, stats["mse"]

    return jax.lax.scan(body, st, jnp.arange(k, dtype=jnp.int32))


def run_sparse_scan(k):
    st, mses = scan_sparse(k, sh["st"], jax.random.PRNGKey(k))
    _ = float(mses[-1])
    sh["st"] = st


try:
    ms = slope(run_sparse_scan) * 1e3
    print(json.dumps({"variant": "sparse_scan", "ms": round(ms, 2),
                      "rays_per_s": round(TILES * 128 / ms * 1e3),
                      "tiles": TILES}), flush=True)
except Exception as exc:
    print(json.dumps({"variant": "sparse_scan",
                      "error": f"{type(exc).__name__}: {exc}"[:200]}),
          flush=True)
del sh

# ---- fully-packed dense-update step at 512^3: O(grid) optimizer is
# ~4 GB x 5 HBM passes (~25 ms) — affordable; state (packed f32 3.8 GB
# + rms bf16 1.9 GB) fits, march reads the packed masters directly and
# a scan carries it without the sparse state's aliasing blowup.
try:
    st_p = ps.PackedState(
        packed_k=jnp.zeros((nb + 1, B + 1, 8, 192), jnp.float32),
        rms=jnp.zeros((nb + 1, B + 1, 8, 192), jnp.bfloat16),
    )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def scan_packed(k, st, key):
        def body(st, i):
            st, stats = ps.train_step_tiles_packed(
                trainer, geom, st, rays, target, i,
                jax.random.fold_in(key, i),
                compact_chunks=CK, use_occupancy=True)
            return st, stats["mse"]

        return jax.lax.scan(body, st, jnp.arange(k, dtype=jnp.int32))

    shp = {"st": st_p}
    del st_p

    def run_packed(k):
        st, mses = scan_packed(k, shp["st"], jax.random.PRNGKey(k))
        _ = float(mses[-1])
        shp["st"] = st

    ms = slope(run_packed) * 1e3
    print(json.dumps({"variant": "packed_scan", "ms": round(ms, 2),
                      "rays_per_s": round(TILES * 128 / ms * 1e3),
                      "tiles": TILES, "rms": "bf16"}), flush=True)
except Exception as exc:
    print(json.dumps({"variant": "packed_scan",
                      "error": f"{type(exc).__name__}: {exc}"[:300]}),
          flush=True)
