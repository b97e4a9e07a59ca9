"""Slope-time the fine mega kernel at several R (ray-major layout)."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from nerf_projects_tpu.models.nerf import NeRFMLP
from nerf_projects_tpu.ops.pallas.fused_mlp import pack_params
from nerf_projects_tpu.ops.pallas.fused_train import fused_train_level, pack_level_inputs

N_RAYS, S = 1024, 288
model = NeRFMLP(depth=8, width=256, use_viewdirs=True)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 63)), jnp.zeros((1, 27)))
packed = pack_params(params)
d = jax.random.normal(jax.random.PRNGKey(1), (N_RAYS, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
z = jnp.linspace(2.0, 6.0, S)[None, :].repeat(N_RAYS, 0)
pts = z[..., None] * d[:, None, :]
target = jnp.full((N_RAYS, 3), 0.3)

def slope(fn, lo=10, hi=40):
    fn(lo); fn(hi)
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); fn(lo); t1 = time.perf_counter()
        fn(hi); t2 = time.perf_counter()
        s_ = ((t2 - t1) - (t1 - t0)) / (hi - lo)
        if s_ > 0:
            best = s_ if best is None else min(best, s_)
    return best

for Rv in (2, 4, 8):
    x, v = pack_level_inputs(pts, d, z, d, target, S, Rv)
    cache = {}
    def run(n, Rv=Rv, x=x, v=v):
        if n not in cache:
            def f(n=n):
                def body(acc, i):
                    rgb, a, w, g = fused_train_level(
                        packed, x + i * 1e-9, v, S=S, R=Rv,
                        n_rays_total=N_RAYS, bkgd=1.0, want_weights=False)
                    return acc + rgb.sum() + g.w0.sum(), None
                out, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n, dtype=jnp.float32))
                return out
            cache[n] = jax.jit(f)
        return float(cache[n]())
    ms = slope(run) * 1e3
    print(json.dumps({"R": Rv, "ms": round(ms, 3)}), flush=True)
