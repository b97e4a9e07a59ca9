"""Attribute the unexplained ~5-6 ms in the single-level NeRF train step
(NOTES_ROUND1.md:37-39) by timing surgically modified variants of the
step on the TPU. All slope-fitted (axon methodology).

Workload: 1024 rays x 288 samples, 8x256 fused-MLP, bf16 — the bench
single-level shape that measured 16.7 ms vs ~10.5 ms of accounted parts.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.models.nerf import NeRFMLP
from nerf_projects_tpu.models.pipeline import NeRFRenderConfig, render_rays
from nerf_projects_tpu.ops.pallas.fused_mlp import fused_apply, pack_params
from nerf_projects_tpu.ops.posenc import posenc

N_RAYS = 1024
N_SAMPLES = 288


def slope(fn, lo=10, hi=60):
    fn(lo); fn(hi)
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); fn(lo); t1 = time.perf_counter()
        fn(hi); t2 = time.perf_counter()
        s = ((t2 - t1) - (t1 - t0)) / (hi - lo)
        if s > 0:
            best = s if best is None else min(best, s)
    return best


def scan_runner(build):
    cache = {}

    def go(n):
        if n not in cache:
            cache[n] = jax.jit(build(n))
        return float(cache[n]())

    return go


def main():
    key = jax.random.PRNGKey(0)
    cfg = NeRFRenderConfig(
        num_coarse_samples=N_SAMPLES, num_fine_samples=0,
        multires=10, multires_views=4, use_viewdirs=True,
        white_bkgd=True, perturb=True,
    )
    model = NeRFMLP(depth=8, width=256, use_viewdirs=True,
                    compute_dtype=jnp.bfloat16)
    pe = jnp.zeros((1, 63)); ve = jnp.zeros((1, 27))
    params = model.init(key, pe, ve)
    packed0 = pack_params(params)

    d = jax.random.normal(key, (N_RAYS, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(jnp.zeros((N_RAYS, 3)), d, d)
    target = jnp.full((N_RAYS, 3), 0.3)
    tx = optax.adam(5e-4)
    opt0 = tx.init(params)

    def apply_fn(p, x, v):
        return fused_apply(pack_params(p), x, v)

    results = {}

    def report(name, sec):
        results[name] = sec * 1e3
        print(json.dumps({"variant": name, "ms": sec * 1e3}), flush=True)

    # ---- a. full single-level step (loss -> grad -> adam)
    def build_full(n):
        def f():
            def body(carry, i):
                p, o = carry

                def loss_fn(p):
                    out = render_rays(None, p, None, apply_fn, rays,
                                      2.0, 6.0, cfg, randomized=False)
                    return jnp.mean((out["rgb"] - target) ** 2)

                l, g = jax.value_and_grad(loss_fn)(p)
                up, o = tx.update(g, o)
                p = optax.apply_updates(p, up)
                return (p, o), l

            (p, o), ls = jax.lax.scan(body, (params, opt0),
                                      jnp.arange(n, dtype=jnp.float32))
            return ls[-1]
        return f

    report("full_step", slope(scan_runner(build_full)))

    # ---- b. no adam (raw SGD add)
    def build_sgd(n):
        def f():
            def body(p, i):
                def loss_fn(p):
                    out = render_rays(None, p, None, apply_fn, rays,
                                      2.0, 6.0, cfg, randomized=False)
                    return jnp.mean((out["rgb"] - target) ** 2)

                l, g = jax.value_and_grad(loss_fn)(p)
                p = jax.tree_util.tree_map(lambda a, b: a - 5e-4 * b, p, g)
                return p, l

            p, ls = jax.lax.scan(body, params,
                                 jnp.arange(n, dtype=jnp.float32))
            return ls[-1]
        return f

    report("no_adam", slope(scan_runner(build_sgd)))

    # ---- c. grad of raw-sum (skip compositing/sampling in bwd path)
    pts = jnp.linspace(2.0, 6.0, N_SAMPLES)[None, :, None] * d[:, None, :]
    pts_flat = pts.reshape(-1, 3)
    pts_enc = posenc(pts_flat, 10)
    views_enc = posenc(
        jnp.repeat(d, N_SAMPLES, axis=0), 4
    )

    def build_rawsum(n):
        def f():
            def body(p, i):
                def loss_fn(p):
                    raw = apply_fn(p, pts_enc, views_enc)
                    return jnp.mean(raw ** 2)

                l, g = jax.value_and_grad(loss_fn)(p)
                p = jax.tree_util.tree_map(lambda a, b: a - 5e-4 * b, p, g)
                return p, l

            p, ls = jax.lax.scan(body, params,
                                 jnp.arange(n, dtype=jnp.float32))
            return ls[-1]
        return f

    report("mlp_grad_only(precomputed_enc)", slope(scan_runner(build_rawsum)))

    # ---- d. + posenc inside grad (positions fixed)
    def build_enc_inside(n):
        def f():
            def body(p, i):
                def loss_fn(p):
                    x = posenc(pts_flat + i * 1e-9, 10)
                    v = posenc(jnp.repeat(d, N_SAMPLES, axis=0), 4)
                    raw = apply_fn(p, x, v)
                    return jnp.mean(raw ** 2)

                l, g = jax.value_and_grad(loss_fn)(p)
                p = jax.tree_util.tree_map(lambda a, b: a - 5e-4 * b, p, g)
                return p, l

            p, ls = jax.lax.scan(body, params,
                                 jnp.arange(n, dtype=jnp.float32))
            return ls[-1]
        return f

    report("mlp_grad+posenc", slope(scan_runner(build_enc_inside)))

    # ---- e. full forward only (no grad)
    def build_fwd(n):
        def f():
            def body(carry, i):
                out = render_rays(None, params, None, apply_fn, rays,
                                  2.0, 6.0, cfg, randomized=False)
                return carry + jnp.mean(out["rgb"]), None

            s, _ = jax.lax.scan(body, 0.0, jnp.arange(n, dtype=jnp.float32))
            return s
        return f

    report("forward_only", slope(scan_runner(build_fwd)))

    # ---- f. full grad but stop_gradient after raw (bwd = compositing only)
    def build_stopgrad(n):
        def f():
            def body(p, i):
                def loss_fn(p):
                    def apply_sg(pp, x, v):
                        return jax.lax.stop_gradient(apply_fn(pp, x, v)) + \
                            0.0 * jnp.sum(pp["params"]["trunk_0"]["kernel"])
                    out = render_rays(None, p, None, apply_sg, rays,
                                      2.0, 6.0, cfg, randomized=False)
                    return jnp.mean((out["rgb"] - target) ** 2)

                l, g = jax.value_and_grad(loss_fn)(p)
                p = jax.tree_util.tree_map(lambda a, b: a - 5e-4 * b, p, g)
                return p, l

            p, ls = jax.lax.scan(body, params,
                                 jnp.arange(n, dtype=jnp.float32))
            return ls[-1]
        return f

    report("fwd+compositing_bwd_only", slope(scan_runner(build_stopgrad)))

    # ---- g. raw fused kernel (in-kernel posenc) fwd+bwd on fixed points
    from nerf_projects_tpu.ops.pallas.fused_mlp import fused_apply_raw

    d_rep = jnp.repeat(d, N_SAMPLES, axis=0)

    def build_raw(n):
        def f():
            def body(p, i):
                def loss_fn(p):
                    raw = fused_apply_raw(
                        pack_params(p), pts_flat + i * 1e-9, d_rep
                    )
                    return jnp.mean(raw ** 2)

                l, g = jax.value_and_grad(loss_fn)(p)
                p = jax.tree_util.tree_map(lambda a, b: a - 5e-4 * b, p, g)
                return p, l

            p, ls = jax.lax.scan(body, params,
                                 jnp.arange(n, dtype=jnp.float32))
            return ls[-1]
        return f

    report("mlp_grad_raw(in-kernel posenc)", slope(scan_runner(build_raw)))

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
