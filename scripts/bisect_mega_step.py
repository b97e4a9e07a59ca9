"""Attribute the mega-kernel hierarchical NeRF train step on TPU.

Variants (1024 rays, 96+192, 8x256 bf16 — the bench shape):
  full         — trainer scan_steps with use_mega (the bench number)
  coarse_only  — coarse mega kernel (S=96, R=8, weights out) in a scan
  fine_only    — fine mega kernel (S=288, R=2) in a scan
  xla_side     — sampling + posenc + pack + pdf + sort, kernels stubbed
  no_adam      — mega grads, tree-SGD update instead of optax.adam
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

N_RAYS = 1024


def slope(fn, lo=10, hi=40):
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
    from nerf_projects_tpu.core.rays import Rays
    from nerf_projects_tpu.models.pipeline import NeRFRenderConfig
    from nerf_projects_tpu.ops.pallas.fused_mlp import pack_params
    from nerf_projects_tpu.ops.pallas.fused_train import (
        fused_train_level,
        pack_level_inputs,
    )
    from nerf_projects_tpu.train.nerf_trainer import NeRFTrainer

    cfg = NeRFRenderConfig(
        num_coarse_samples=96, num_fine_samples=192, multires=10,
        multires_views=4, use_viewdirs=True, white_bkgd=True,
        perturb=True,
    )
    trainer = NeRFTrainer(
        cfg, depth=8, width=256, near=2.0, far=6.0,
        compute_dtype=jnp.bfloat16, use_fused_mlp=True, use_mega=True,
    )
    assert trainer.use_mega
    state0 = trainer.init_state(jax.random.PRNGKey(0))
    d = jax.random.normal(jax.random.PRNGKey(1), (N_RAYS, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(jnp.zeros((N_RAYS, 3)), d, d)
    target = jnp.full((N_RAYS, 3), 0.3)

    results = {}

    def report(name, sec):
        results[name] = round(sec * 1e3, 3)
        print(json.dumps({"variant": name, "ms": round(sec * 1e3, 3)}),
              flush=True)

    # ---- full (state carried through scan, like bench scan_steps)
    def build_full(n):
        def f():
            def body(st, _):
                st, stats = trainer.train_step_inline(st, rays, target)
                return st, stats["loss"]

            st, losses = jax.lax.scan(body, state0, None, length=n)
            return losses[-1]
        return f

    # train_step is jitted+donating; reuse its internals via a plain fn
    def train_step_inline(st, rays_, target_):
        key, sub = jax.random.split(st.key)
        (loss, mse), grads = trainer._value_and_grad(
            st.params, sub, rays_, target_
        )
        updates, opt_state = trainer.tx.update(grads, st.opt_state)
        params = optax.apply_updates(st.params, updates)
        from nerf_projects_tpu.train.nerf_trainer import TrainState

        return TrainState(st.step + 1, params, opt_state, key), {
            "loss": loss
        }

    trainer.train_step_inline = train_step_inline
    report("full", slope(scan_runner(build_full)))

    # ---- no_adam
    def build_sgd(n):
        def f():
            def body(carry, _):
                params, key = carry
                key, sub = jax.random.split(key)
                (loss, mse), grads = trainer._value_and_grad(
                    params, sub, rays, target
                )
                params = jax.tree_util.tree_map(
                    lambda a, g: a - 5e-4 * g, params, grads
                )
                return (params, key), loss

            (p, k), losses = jax.lax.scan(
                body, (state0.params, jax.random.PRNGKey(3)), None,
                length=n,
            )
            return losses[-1]
        return f

    report("no_adam", slope(scan_runner(build_sgd)))

    # ---- single kernels on fixed inputs
    packed = pack_params(state0.params[0])
    z96 = jnp.linspace(2.0, 6.0, 96)[None, :].repeat(N_RAYS, 0)
    pts96 = jnp.zeros((N_RAYS, 3))[:, None, :] + z96[..., None] * d[:, None, :]
    x96, v96 = pack_level_inputs(pts96, d, z96, d, target, 96, 8)
    z288 = jnp.linspace(2.0, 6.0, 288)[None, :].repeat(N_RAYS, 0)
    pts288 = jnp.zeros((N_RAYS, 3))[:, None, :] + z288[..., None] * d[:, None, :]
    x288, v288 = pack_level_inputs(pts288, d, z288, d, target, 288, 4)

    def kernel_scan(x, v, S, R, want_w):
        def build(n):
            def f():
                def body(acc, i):
                    rgb, acc_r, w, g = fused_train_level(
                        packed, x + i * 1e-9, v, S=S, R=R,
                        n_rays_total=N_RAYS, bkgd=1.0,
                        want_weights=want_w,
                    )
                    return acc + rgb.sum() + g.w0.sum(), None

                a, _ = jax.lax.scan(
                    body, jnp.zeros(()),
                    jnp.arange(n, dtype=jnp.float32),
                )
                return a
            return f
        return build

    report("coarse_kernel", slope(
        scan_runner(kernel_scan(x96, v96, 96, 8, True))))
    report("fine_kernel", slope(
        scan_runner(kernel_scan(x288, v288, 288, 4, False))))

    # ---- XLA side only: full sampling/posenc/pack both levels, kernels
    # replaced by a cheap reduction of the packed inputs
    from nerf_projects_tpu.ops.sampling import (
        cast_rays,
        piecewise_constant_pdf,
        stratified_sample,
    )

    def build_xla(n):
        def f():
            def body(acc, i):
                key = jax.random.fold_in(jax.random.PRNGKey(0),
                                         i.astype(jnp.int32))
                key, ks = jax.random.split(key)
                z = stratified_sample(ks, 96, 2.0, 6.0, (N_RAYS,),
                                      lindisp=False, randomized=True)
                pts = cast_rays(z, rays.origins, rays.directions)
                x, v = pack_level_inputs(pts, d, z, d, target, 96, 8)
                w_fake = jnp.abs(x[:, 0]).reshape(N_RAYS, 96)
                key, kp = jax.random.split(key)
                zm = 0.5 * (z[..., 1:] + z[..., :-1])
                zs = piecewise_constant_pdf(
                    kp, zm, w_fake[..., 1:-1], 192, randomized=True,
                    mode="nerf",
                )
                zc = jnp.sort(jnp.concatenate([z, zs], -1), -1)
                ptsf = cast_rays(zc, rays.origins, rays.directions)
                xf, vf = pack_level_inputs(ptsf, d, zc, d, target,
                                           288, 4)
                return acc + x.sum() + xf.sum() + v.sum() + vf.sum(), None

            a, _ = jax.lax.scan(
                body, jnp.zeros(()), jnp.arange(n, dtype=jnp.float32)
            )
            return a
        return f

    report("xla_side", slope(scan_runner(build_xla)))

    # ---- glue splits
    def build_glue(include):
        def bf(n):
            def f():
                def body(acc, i):
                    key = jax.random.fold_in(jax.random.PRNGKey(0),
                                             i.astype(jnp.int32))
                    key, ks = jax.random.split(key)
                    z = stratified_sample(ks, 96, 2.0, 6.0, (N_RAYS,),
                                          lindisp=False, randomized=True)
                    acc = acc + z.sum()
                    if "pack_c" in include:
                        pts = cast_rays(z, rays.origins, rays.directions)
                        x, v = pack_level_inputs(pts, d, z, d, target,
                                                 96, 8)
                        acc = acc + x.sum() + v.sum()
                    if "pdf" in include:
                        key, kp = jax.random.split(key)
                        zm = 0.5 * (z[..., 1:] + z[..., :-1])
                        zs = piecewise_constant_pdf(
                            kp, zm, z[..., 1:-1] * 0 + 1.0, 192,
                            randomized=True, mode="nerf")
                        acc = acc + zs.sum()
                        if "sort" in include:
                            zc = jnp.sort(
                                jnp.concatenate([z, zs], -1), -1)
                            acc = acc + zc.sum()
                            if "pack_f" in include:
                                ptsf = cast_rays(zc, rays.origins,
                                                 rays.directions)
                                xf, vf = pack_level_inputs(
                                    ptsf, d, zc, d, target, 288, 4)
                                acc = acc + xf.sum() + vf.sum()
                    return acc, None

                a, _ = jax.lax.scan(
                    body, jnp.zeros(()),
                    jnp.arange(n, dtype=jnp.float32))
                return a
            return f
        return bf

    report("glue_pack_c_only", slope(scan_runner(build_glue({"pack_c"}))))
    report("glue_pdf_sort", slope(scan_runner(
        build_glue({"pdf", "sort"}))))
    report("glue_pack_f", slope(scan_runner(
        build_glue({"pdf", "sort", "pack_f"}))))

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
