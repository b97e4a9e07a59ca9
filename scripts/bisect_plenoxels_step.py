"""Attribute plenoxels train_step_tiles_pallas time on TPU (slope-fit).

Variants (256^3, 40x128-ray tiles, the bench shape):
  full         — the whole step (render+bwd kernels, TV, RMSprop)
  fwd_kernel   — forward march kernel only
  fused_kernels— fused fwd+bwd call (render_fused_tiles_pallas) only
  no_tv        — full step with both TV lambdas zero
  optim_only   — RMSprop over precomputed grads (no kernels)
  scatter_only — the grad scatter-add + layout conversion alone
"""
import json
import os
import sys
import time

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

RESO = int(os.environ.get("BISECT_RESO", 256))
TILES = int(os.environ.get("BISECT_TILES", 40))


def slope(fn, lo=4, hi=16):
    fn(lo); fn(hi)
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); fn(lo); t1 = time.perf_counter()
        fn(hi); t2 = time.perf_counter()
        s = ((t2 - t1) - (t1 - t0)) / (hi - lo)
        if s > 0:
            best = s if best is None else min(best, s)
    return best


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as B

    bg = B._plenoxels_setup(RESO)
    rays = B._tile_rays(jax.random.PRNGKey(2), TILES)
    target = jnp.full(rays.origins.shape[:2] + (3,), 0.4)

    from nerf_projects_tpu.ops.grid import GridRenderOptions
    from nerf_projects_tpu.ops.pallas.tile_march import (
        render_fused_tiles_pallas,
        render_tiles_pallas,
    )
    from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

    opts = GridRenderOptions(step_size=0.5)
    results = {}
    only = [s for s in os.environ.get("BISECT_ONLY", "").split(",") if s]

    def report(name, thunk):
        """thunk() -> run callable; lazy so BISECT_ONLY skips setup."""
        if only and name not in only:
            return
        try:
            sec = slope(thunk())
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)
            return
        results[name] = round(sec * 1e3, 2)
        print(json.dumps({"variant": name, "ms": round(sec * 1e3, 3)}),
              flush=True)

    # --- full step
    def make_trainer(**kw):
        base = dict(n_iters=128_000, lambda_tv=1e-5, lambda_tv_sh=1e-3)
        base.update(kw)
        return PlenoxelsTrainer(opts, **base)

    def step_runner(trainer):
        # the step DONATES its inputs; give each runner its own copies
        my_bg = jax.tree_util.tree_map(jnp.copy, bg)
        rms = trainer.init_rms_bricks(my_bg)
        holder = {"bg": my_bg, "rms": rms}

        def run(k):
            b, r = holder["bg"], holder["rms"]
            st = None
            for i in range(k):
                b, r, st = trainer.train_step_tiles_pallas(
                    b, r, rays, target, jnp.asarray(float(i)),
                    jax.random.PRNGKey(i))
            _ = float(st["mse"])
            holder["bg"], holder["rms"] = b, r
        return run

    def sparse_runner(trainer, use_occupancy=False):
        import functools

        from nerf_projects_tpu.train import plenoxels_sparse as ps

        geom = jax.tree_util.tree_map(jnp.copy, bg)
        holder = {"st": ps.sparse_state_from_grid(bg)}

        @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
        def scan_steps(k, st, key):
            def body(st, i):
                st, stats = ps.train_step_tiles_sparse(
                    trainer, geom, st, rays, target,
                    i, jax.random.fold_in(key, i),
                    use_occupancy=use_occupancy)
                return st, stats["mse"]

            return jax.lax.scan(body, st, jnp.arange(k, dtype=jnp.int32))

        def run(k):
            st, mses = scan_steps(k, holder["st"], jax.random.PRNGKey(k))
            _ = float(mses[-1])
            holder["st"] = st
        return run

    report("full", lambda: step_runner(make_trainer()))
    report("full_bf16g", lambda: step_runner(
        make_trainer(bf16_grad_blocks=True)))
    report("sparse", lambda: sparse_runner(make_trainer()))
    report("sparse_bf16g", lambda: sparse_runner(
        make_trainer(bf16_grad_blocks=True)))
    report("sparse_occ", lambda: sparse_runner(make_trainer(),
                                             use_occupancy=True))
    report("no_tv", lambda: step_runner(
        make_trainer(lambda_tv=0.0, lambda_tv_sh=0.0)))
    report("sgd_optim", lambda: step_runner(
        make_trainer(sigma_optim="sgd", sh_optim="sgd")))

    # --- kernel-layout dense step (no per-step relayouts)
    def dense_k_runner(trainer, my_bg=None, compact=None, use_occ=False):
        import functools

        from nerf_projects_tpu.train import plenoxels_sparse as ps

        geom = my_bg if my_bg is not None else bg
        my_rays, my_target = (
            (rays, target) if my_bg is None else
            (B._tile_rays(jax.random.PRNGKey(2), TILES),
             jnp.full((TILES, 128, 3), 0.4))
        )
        holder = {"st": ps.sparse_state_from_grid(
            geom, shared_kernel_arrays=True)}

        @functools.partial(jax.jit, static_argnums=(0, 3, 4),
                           donate_argnums=1)
        def scan_steps(k, st, key, ck, occ):
            def body(st, i):
                st, stats = ps.train_step_tiles_dense_k(
                    trainer, geom, st, my_rays, my_target,
                    i, jax.random.fold_in(key, i),
                    compact_chunks=ck, use_occupancy=occ)
                return st, stats["mse"]

            return jax.lax.scan(body, st,
                                jnp.arange(k, dtype=jnp.int32))

        def run(k):
            st, mses = scan_steps(k, holder["st"],
                                  jax.random.PRNGKey(k), compact,
                                  use_occ)
            _ = float(mses[-1])
            holder["st"] = st
        return run

    report("dense_k", lambda: dense_k_runner(make_trainer()))
    report("dense_k_bf16g", lambda: dense_k_runner(
        make_trainer(bf16_grad_blocks=True)))

    # --- fully-packed step (1 fetch + 1 grad block per corner)
    def packed_runner(trainer, my_bg=None, compact=None, use_occ=False):
        import functools

        from nerf_projects_tpu.train import plenoxels_sparse as ps

        geom = my_bg if my_bg is not None else bg
        my_rays, my_target = (
            (rays, target) if my_bg is None else
            (B._tile_rays(jax.random.PRNGKey(2), TILES),
             jnp.full((TILES, 128, 3), 0.4))
        )
        holder = {"st": ps.packed_state_from_grid(geom)}

        @functools.partial(jax.jit, static_argnums=(0, 3, 4),
                           donate_argnums=1)
        def scan_steps(k, st, key, ck, occ):
            def body(st, i):
                st, stats = ps.train_step_tiles_packed(
                    trainer, geom, st, my_rays, my_target,
                    i, jax.random.fold_in(key, i),
                    compact_chunks=ck, use_occupancy=occ)
                return st, stats["mse"]

            return jax.lax.scan(body, st,
                                jnp.arange(k, dtype=jnp.int32))

        def run(k):
            st, mses = scan_steps(k, holder["st"],
                                  jax.random.PRNGKey(k), compact,
                                  use_occ)
            _ = float(mses[-1])
            holder["st"] = st
        return run

    report("packed", lambda: packed_runner(make_trainer()))
    report("packed_bf16g", lambda: packed_runner(
        make_trainer(bf16_grad_blocks=True)))
    # in-context tail attribution: the isolated parts (pk_kernels /
    # pk_scatter / pk_optim) do not add up to `packed` — these localise
    # the residual (sampled-TV layout gathers vs optimizer in situ)
    report("packed_no_tv", lambda: packed_runner(
        make_trainer(lambda_tv=0.0, lambda_tv_sh=0.0)))
    report("packed_no_shtv", lambda: packed_runner(
        make_trainer(lambda_tv_sh=0.0)))
    report("packed_sgd", lambda: packed_runner(
        make_trainer(sigma_optim="sgd", sh_optim="sgd")))

    def shell_packed(**kw):
        from nerf_projects_tpu.ops.pallas.tile_march import (
            required_chunks,
        )

        sb = B._shell_setup(RESO, dtype=jnp.float32)
        srays = B._tile_rays(jax.random.PRNGKey(2), TILES)
        ck = required_chunks(sb, srays, opts, use_occupancy=True)
        print(json.dumps({"shell_nb": int(sb.n_bricks),
                          "shell_ck": ck}), flush=True)
        return packed_runner(make_trainer(**kw), my_bg=sb,
                             compact=ck, use_occ=True)

    report("packed_shell", lambda: shell_packed())
    report("packed_shell_bf16g", lambda: shell_packed(
        bf16_grad_blocks=True))

    # --- touched-row step on the shell scene (the ship bench mode) ---
    def touched_runner(trainer, my_bg=None, compact=None, use_occ=False,
                       k_cap=6144, wps=1, tile_rows=0, flat=0, dopt=0):
        import functools

        from nerf_projects_tpu.train import plenoxels_sparse as ps

        geom = my_bg if my_bg is not None else bg
        my_rays, my_target = (
            (rays, target) if my_bg is None else
            (B._tile_rays(jax.random.PRNGKey(2), TILES),
             jnp.full((TILES, 128, 3), 0.4))
        )
        holder = {"st": ps.packed_state_from_grid(geom)}

        @functools.partial(jax.jit,
                           static_argnums=(0, 3, 4, 5, 6, 7, 8, 9),
                           donate_argnums=1)
        def scan_steps(k, st, key, ck, occ, cap, w, tr, fl, do):
            def body(st, i):
                st, stats = ps.train_step_tiles_packed_touched(
                    trainer, geom, st, my_rays, my_target,
                    i, jax.random.fold_in(key, i),
                    max_touched=cap, compact_chunks=ck,
                    use_occupancy=occ, wps=w,
                    tile_rows=tr if tr else None,
                    flat_windows=fl if fl else None,
                    dense_optim=bool(do))
                return st, stats["mse"]

            return jax.lax.scan(body, st,
                                jnp.arange(k, dtype=jnp.int32))

        def run(k):
            st, mses = scan_steps(k, holder["st"],
                                  jax.random.PRNGKey(k), compact,
                                  use_occ, k_cap, wps, tile_rows,
                                  flat, dopt)
            _ = float(mses[-1])
            holder["st"] = st
        return run

    def shell_touched(k_cap=6144, wps=1, tile_rows=0, flat=0, dopt=0,
                      **kw):
        from nerf_projects_tpu.ops.pallas.tile_march import (
            required_chunks,
        )

        sb = B._shell_setup(RESO, dtype=jnp.float32)
        srays = B._tile_rays(jax.random.PRNGKey(2), TILES)
        ck = required_chunks(sb, srays, opts, use_occupancy=True)
        if tile_rows:
            from nerf_projects_tpu.train.plenoxels_sparse import (
                required_tile_rows,
            )

            tile_rows = required_tile_rows(
                sb, srays, opts, use_occupancy=True,
                compact_chunks=ck)
            print(json.dumps({"shell_tile_rows": tile_rows}),
                  flush=True)
        if flat:
            from nerf_projects_tpu.ops.pallas.flat_train import (
                required_windows,
            )

            flat = required_windows(sb, srays, opts)
            print(json.dumps({"shell_flat_windows": flat}),
                  flush=True)
        if dopt:
            kw.setdefault("rms_pervisit", True)
        return touched_runner(make_trainer(**kw), my_bg=sb,
                              compact=ck, use_occ=True, k_cap=k_cap,
                              wps=wps, tile_rows=tile_rows, flat=flat,
                              dopt=dopt)

    report("touched_shell", lambda: shell_touched())
    report("touched_shell_bf16g", lambda: shell_touched(
        bf16_grad_blocks=True))
    report("touched_shell_no_tv", lambda: shell_touched(
        lambda_tv=0.0, lambda_tv_sh=0.0))
    report("touched_shell_no_shtv", lambda: shell_touched(
        lambda_tv_sh=0.0))
    report("touched_shell_k2048", lambda: shell_touched(k_cap=2048))
    report("touched_shell_wps4", lambda: shell_touched(wps=4))
    report("touched_shell_wps4_bf16g", lambda: shell_touched(
        wps=4, bf16_grad_blocks=True))
    report("touched_shell_tred", lambda: shell_touched(tile_rows=1))
    report("touched_shell_full", lambda: shell_touched(
        wps=4, bf16_grad_blocks=True, tile_rows=1, k_cap=4096))
    report("touched_shell_wps8", lambda: shell_touched(wps=8))
    report("touched_shell_full8", lambda: shell_touched(
        wps=8, bf16_grad_blocks=True, tile_rows=1, k_cap=4096))
    # bench ship config exactly (wps4 + tred, f32 grad blocks)
    report("touched_shell_ship", lambda: shell_touched(
        wps=4, tile_rows=1))
    # flat active-window plan (no sentinel padding marched at all)
    report("touched_shell_flat", lambda: shell_touched(flat=1))
    report("touched_shell_flat_bf16g", lambda: shell_touched(
        flat=1, bf16_grad_blocks=True))
    # flat-step attribution: full - no_tv = TV; kernels = plan+march
    # floor; full - kernels - TV = scatter + touched optimizer
    report("touched_shell_flat_no_tv", lambda: shell_touched(
        flat=1, lambda_tv=0.0, lambda_tv_sh=0.0))
    report("touched_shell_flat_k2048", lambda: shell_touched(
        flat=1, k_cap=2048))

    def shell_flat_kexact(**kw):
        from nerf_projects_tpu.train.plenoxels_sparse import (
            required_touched_rows,
        )

        sb = B._shell_setup(RESO, dtype=jnp.float32)
        srays = B._tile_rays(jax.random.PRNGKey(2), TILES)
        tr = make_trainer(**kw)
        tv_w = max(int(tr.tv_sparsity * sb.n_bricks), 1) + max(
            int(tr.tv_sh_sparsity * sb.n_bricks), 1)
        k = required_touched_rows(sb, srays, opts, tv_rows=4 * tv_w)
        print(json.dumps({"k_exact": k}), flush=True)
        return shell_touched(flat=1, k_cap=k, **kw)

    report("touched_shell_flat_kexact", lambda: shell_flat_kexact())
    report("touched_shell_flat_kexact_no_tv", lambda: shell_flat_kexact(
        lambda_tv=0.0, lambda_tv_sh=0.0))
    # dense-sweep optimizer (round-4): no K-row machinery at all
    report("touched_shell_flat_dopt", lambda: shell_touched(
        flat=1, dopt=1))
    report("touched_shell_flat_dopt_pv", lambda: shell_touched(
        flat=1, rms_pervisit=True))

    def flat_kernels(grad_dtype=jnp.float32):
        """fused_grad_blocks_flat alone (plan + both marches), no
        scatter/TV/optimizer — the flat kernel floor."""
        import functools

        from nerf_projects_tpu.ops.pallas.flat_train import (
            fused_grad_blocks_flat,
            required_windows,
        )
        from nerf_projects_tpu.train import plenoxels_sparse as ps

        sb = B._shell_setup(RESO, dtype=jnp.float32)
        srays = B._tile_rays(jax.random.PRNGKey(2), TILES)
        starget = jnp.full((TILES, 128, 3), 0.4)
        fl = required_windows(sb, srays, opts)
        st = ps.packed_state_from_grid(sb)

        @functools.partial(jax.jit, static_argnums=(0,))
        def scan_k(k, pk):
            def body(c, i):
                rgb, _gd, gp, rows, aux = fused_grad_blocks_flat(
                    sb, srays, starget, opts,
                    kernel_arrays=pk, w_cap=fl,
                    grad_dtype=grad_dtype,
                )
                return c + jnp.mean(rgb) + gp.reshape(-1)[0], None

            out, _ = jax.lax.scan(
                body, jnp.zeros(()), jnp.arange(k, dtype=jnp.int32)
            )
            return out

        def run(k):
            _ = float(scan_k(k, st.packed_k))
        return run

    report("flat_kernels", lambda: flat_kernels())
    report("flat_kernels_bf16g", lambda: flat_kernels(
        grad_dtype=jnp.bfloat16))

    def flat_stage(stage, grad_dtype=jnp.float32):
        """Intra-flat attribution: plan / fwd (no emit) / fwd+emit /
        bwd alone. Ray origins are perturbed by the loop index so XLA
        cannot hoist the pure-jnp plan out of the scan (the pallas
        twin `flat_kernels_pert` checks the perturbation itself is
        free)."""
        import functools

        from nerf_projects_tpu.core.rays import Rays
        from nerf_projects_tpu.ops.pallas.flat_train import (
            _flat_plan,
            fused_grad_blocks_flat,
            required_windows,
        )
        from nerf_projects_tpu.ops.pallas.tile_march import (
            SC,
            _bwd_frame_group,
            _march_frame_group,
        )
        from nerf_projects_tpu.train import plenoxels_sparse as ps

        sb = B._shell_setup(RESO, dtype=jnp.float32)
        srays = B._tile_rays(jax.random.PRNGKey(2), TILES)
        starget = jnp.full((TILES, 128, 3), 0.4)
        fl = required_windows(sb, srays, opts)
        st = ps.packed_state_from_grid(sb)
        nb, Bd = sb.n_bricks, sb.basis_dim
        T, r = srays.origins.shape[:2]
        A = SC * r

        def perturbed(i):
            return Rays(
                srays.origins + (i.astype(jnp.float32) * 1e-12),
                srays.directions, srays.viewdirs,
            )

        def plan(rays_i):
            return _flat_plan(sb, rays_i, opts, fl, min(640, fl))

        if stage == "bwd":
            # constant plan + samples precomputed outside the scan;
            # only the bwd group call (+ its gathers) scans
            (tw, first, rows_f, orig_f, basis_f, pack, geom, n_act,
             Wp) = jax.jit(plan)(srays)
            out_g, samp = _march_frame_group(
                st.packed_k, None, jnp.cumsum(first) - 1, first,
                rows_f, orig_f, basis_f,
                jnp.concatenate([pack, jnp.zeros_like(pack[:1])])[
                    jnp.full((Wp,), T, jnp.int32).at[
                        jnp.cumsum(first) - 1].set(tw)],
                jnp.zeros((T + 1, 8, r), jnp.float32)[
                    jnp.full((Wp,), T, jnp.int32).at[
                        jnp.cumsum(first) - 1].set(tw)],
                Bd, "bias", emit_samples=True, sentinel=nb,
            )
            pack2 = jnp.asarray(pack)

            @functools.partial(jax.jit, static_argnums=(0,))
            def scan_k(k, pk):
                def body(c, i):
                    lt = jnp.cumsum(first) - 1
                    tiles_g = jnp.full((Wp,), T, jnp.int32).at[
                        lt].set(tw)
                    p2 = jnp.concatenate(
                        [pack2 + i.astype(jnp.float32) * 1e-12,
                         jnp.zeros_like(pack2[:1])])
                    _, grads = _bwd_frame_group(
                        lt, first, rows_f, orig_f, basis_f,
                        p2[tiles_g],
                        jnp.zeros((T + 1, 8, r), jnp.float32)[
                            tiles_g],
                        samp, Bd, 0.0, "bias", grad_dtype,
                        sentinel=nb,
                    )
                    return c + grads.reshape(-1)[0], None

                out, _ = jax.lax.scan(
                    body, jnp.zeros(()),
                    jnp.arange(k, dtype=jnp.int32))
                return out

            def run(k):
                _ = float(scan_k(k, st.packed_k))
            return run

        @functools.partial(jax.jit, static_argnums=(0,))
        def scan_k(k, pk):
            def body(c, i):
                if stage in ("pack", "pack_noocc", "windows"):
                    # plan internals: ray pack (with/without the
                    # occupancy t-span shrink) and the window plan
                    from nerf_projects_tpu.ops.pallas.tile_march import (
                        _pack_rays,
                        _plan_windows,
                        active_chunk_bound,
                    )

                    C = active_chunk_bound(sb, opts.step_size)
                    pk2, geom = _pack_rays(
                        sb, perturbed(i), opts, stage != "pack_noocc")
                    if stage == "windows":
                        wb, rows = _plan_windows(sb, geom, C)
                        return c + jnp.sum(rows) + jnp.sum(pk2), None
                    return c + jnp.sum(pk2), None
                (tw, first, rows_f, orig_f, basis_f, pack, geom,
                 n_act, Wp) = plan(perturbed(i))
                if stage == "plan":
                    return c + jnp.sum(tw) + jnp.sum(rows_f), None
                lt = jnp.cumsum(first) - 1
                tiles_g = jnp.full((Wp,), T, jnp.int32).at[lt].set(tw)
                pack_g = jnp.concatenate(
                    [pack, jnp.zeros_like(pack[:1])])[tiles_g]
                state_g = jnp.zeros((T + 1, 8, r), jnp.float32)[
                    tiles_g]
                out = _march_frame_group(
                    pk, None, lt, first, rows_f, orig_f, basis_f,
                    pack_g, state_g, Bd, "bias",
                    emit_samples=(stage == "fwd_emit"), sentinel=nb,
                )
                if stage == "fwd_emit":
                    out_g, samp = out
                    return c + jnp.mean(out_g) + samp.reshape(-1)[0], \
                        None
                return c + jnp.mean(out), None

            out, _ = jax.lax.scan(
                body, jnp.zeros(()), jnp.arange(k, dtype=jnp.int32))
            return out

        def run(k):
            _ = float(scan_k(k, st.packed_k))
        return run

    def flat_kernels_pert():
        """flat_kernels with the same index perturbation — if this
        matches flat_kernels, hoisting is not polluting the stage
        variants."""
        import functools

        from nerf_projects_tpu.core.rays import Rays
        from nerf_projects_tpu.ops.pallas.flat_train import (
            fused_grad_blocks_flat,
            required_windows,
        )
        from nerf_projects_tpu.train import plenoxels_sparse as ps

        sb = B._shell_setup(RESO, dtype=jnp.float32)
        srays = B._tile_rays(jax.random.PRNGKey(2), TILES)
        starget = jnp.full((TILES, 128, 3), 0.4)
        fl = required_windows(sb, srays, opts)
        st = ps.packed_state_from_grid(sb)

        @functools.partial(jax.jit, static_argnums=(0,))
        def scan_k(k, pk):
            def body(c, i):
                rays_i = Rays(
                    srays.origins + i.astype(jnp.float32) * 1e-12,
                    srays.directions, srays.viewdirs)
                rgb, _gd, gp, rows, aux = fused_grad_blocks_flat(
                    sb, rays_i, starget, opts,
                    kernel_arrays=pk, w_cap=fl,
                )
                return c + jnp.mean(rgb) + gp.reshape(-1)[0], None

            out, _ = jax.lax.scan(
                body, jnp.zeros(()), jnp.arange(k, dtype=jnp.int32)
            )
            return out

        def run(k):
            _ = float(scan_k(k, st.packed_k))
        return run

    report("flat_kernels_pert", lambda: flat_kernels_pert())

    # --- touched-tail attribution (the 8.6 ms between the 4.24 ms
    # kernel floor and the 12.8 ms full step): compaction / segment
    # sum / optimizer, each on PRECOMPUTED flat grad blocks ----------
    def flat_tail_stage(stage):
        import functools

        from nerf_projects_tpu.ops.pallas.flat_train import (
            fused_grad_blocks_flat,
            required_windows,
        )
        from nerf_projects_tpu.train import plenoxels_sparse as ps
        from nerf_projects_tpu.train.plenoxels_trainer import (
            PlenoxelsTrainer,
        )

        sb = B._shell_setup(RESO, dtype=jnp.float32)
        srays = B._tile_rays(jax.random.PRNGKey(2), TILES)
        starget = jnp.full((TILES, 128, 3), 0.4)
        fl = required_windows(sb, srays, opts)
        tr = PlenoxelsTrainer(opts, n_iters=128_000,
                              lambda_tv=1e-5, lambda_tv_sh=1e-3)
        tv_w = max(int(tr.tv_sparsity * sb.n_bricks), 1) + max(
            int(tr.tv_sh_sparsity * sb.n_bricks), 1)
        K = ps.required_touched_rows(sb, srays, opts, tv_rows=4 * tv_w)
        st = ps.packed_state_from_grid(sb)
        nb, Bd = sb.n_bricks, sb.basis_dim
        _, _gd, gp_blocks, rows, _aux = jax.block_until_ready(
            jax.jit(
                lambda pk: fused_grad_blocks_flat(
                    sb, srays, starget, opts, kernel_arrays=pk,
                    w_cap=fl)
            )(st.packed_k)
        )
        print(json.dumps({"tail_K": K, "tail_Wp": int(rows.shape[0]),
                          "tail_nb": int(nb)}), flush=True)
        rows_r = rows.reshape(-1)
        flag = jnp.zeros((nb + 1,), jnp.int32).at[rows_r].set(1)
        flag = flag.at[nb].set(0)
        pos = jnp.cumsum(flag) - flag
        live = (flag == 1) & (pos < K)
        slot = jnp.where(live, pos, K)
        uniq = jnp.full((K + 1,), nb, jnp.int32).at[
            jnp.where(live, pos, K)
        ].set(jnp.arange(nb + 1, dtype=jnp.int32))[:K]
        slot, uniq = jax.block_until_ready((slot, uniq))
        acc0 = jax.block_until_ready(
            jnp.zeros((K + 1, Bd + 1, 8, 192), jnp.float32).at[
                slot[rows_r]
            ].add(gp_blocks.reshape(-1, Bd + 1, 8, 192))
        )[:K]

        if stage == "compact":
            @functools.partial(jax.jit, static_argnums=0)
            def scan_k(k, rws):
                def body(c, i):
                    rr = jnp.where(rws == nb, nb, (rws + i) % nb)
                    fg = jnp.zeros((nb + 1,), jnp.int32).at[rr].set(1)
                    fg = fg.at[nb].set(0)
                    p = jnp.cumsum(fg) - fg
                    lv = (fg == 1) & (p < K)
                    u = jnp.full((K + 1,), nb, jnp.int32).at[
                        jnp.where(lv, p, K)
                    ].set(jnp.arange(nb + 1, dtype=jnp.int32))[:K]
                    return c + u[0].astype(jnp.float32), None
                out, _ = jax.lax.scan(
                    body, jnp.zeros(()), jnp.arange(k, dtype=jnp.int32))
                return out

            def run(k):
                _ = float(scan_k(k, rows_r))
            return run

        if stage == "segsum":
            @functools.partial(jax.jit, static_argnums=0)
            def scan_k(k, gp, sl):
                def body(c, i):
                    a = jnp.zeros(
                        (K + 1, Bd + 1, 8, 192), jnp.float32
                    ).at[sl].add(
                        gp.reshape(-1, Bd + 1, 8, 192) + i * 1e-12
                    )
                    return c + a.reshape(-1)[0], None
                out, _ = jax.lax.scan(
                    body, jnp.zeros(()), jnp.arange(k, dtype=jnp.int32))
                return out

            sl = jax.block_until_ready(slot[rows_r])

            def run(k):
                _ = float(scan_k(k, gp_blocks, sl))
            return run

        if stage == "optim":
            cmf = jnp.concatenate(
                [sb.cell_mask, jnp.zeros_like(sb.cell_mask[:1])]
            )

            @functools.partial(jax.jit, static_argnums=0,
                               donate_argnums=1)
            def scan_k(k, pk_rms, a, u):
                def body(carry, i):
                    pk, rms = carry
                    g = a + i * 1e-12
                    cm = cmf[u].astype(jnp.float32)
                    mp = jnp.repeat(
                        cm.reshape(K, 8, 64), 3, axis=-1)[:, None]
                    g = g * mp
                    pk_rows = pk[u]
                    rms_old = rms[u].astype(jnp.float32)
                    b = 0.95
                    rms_rows = jnp.where(
                        g == 0.0, rms_old,
                        jnp.where(rms_old == 0.0, g * g,
                                  b * rms_old + (1 - b) * g * g))
                    upd = 0.01 * g / (jnp.sqrt(rms_rows) + 1e-8)
                    new = (pk_rows - upd) * mp
                    return (pk.at[u].set(new),
                            rms.at[u].set(rms_rows)), new.reshape(-1)[0]
                (pk, rms), outs = jax.lax.scan(
                    body, pk_rms, jnp.arange(k, dtype=jnp.int32))
                return (pk, rms), outs

            holder = {"c": (st.packed_k, jnp.zeros_like(st.packed_k))}

            def run(k):
                c, outs = scan_k(k, holder["c"], acc0, uniq)
                _ = float(outs[-1])
                holder["c"] = c
            return run
        raise ValueError(stage)

    report("flat_tail_compact", lambda: flat_tail_stage("compact"))
    report("flat_tail_segsum", lambda: flat_tail_stage("segsum"))
    report("flat_tail_optim", lambda: flat_tail_stage("optim"))

    report("flat_plan_only", lambda: flat_stage("plan"))
    report("flat_fwd_noemit", lambda: flat_stage("fwd"))
    report("flat_fwd_emit", lambda: flat_stage("fwd_emit"))
    report("flat_bwd_only", lambda: flat_stage("bwd"))
    report("flat_pack_only", lambda: flat_stage("pack"))
    report("flat_pack_noocc", lambda: flat_stage("pack_noocc"))
    report("flat_windows_only", lambda: flat_stage("windows"))

    # --- shell kernel floor: fused fwd+bwd call alone -------------
    def shell_kernels(wps=1, grad_dtype=jnp.float32):
        import functools

        from nerf_projects_tpu.ops.pallas.tile_march import (
            fused_grad_blocks,
            required_chunks,
        )
        from nerf_projects_tpu.train import plenoxels_sparse as ps

        sb = B._shell_setup(RESO, dtype=jnp.float32)
        srays = B._tile_rays(jax.random.PRNGKey(2), TILES)
        starget = jnp.full((TILES, 128, 3), 0.4)
        ck = required_chunks(sb, srays, opts, use_occupancy=True)
        st = ps.packed_state_from_grid(sb)

        @functools.partial(jax.jit, static_argnums=(0,))
        def scan_k(k, pk):
            def body(c, i):
                rgb, _gd, gp, rows, aux = fused_grad_blocks(
                    sb, srays, starget, opts,
                    use_occupancy=True, kernel_arrays=pk,
                    grad_dtype=grad_dtype, compact_chunks=ck,
                    wps=wps, skip_empty=True,
                )
                return c + jnp.mean(rgb) + gp.reshape(-1)[0], None

            out, _ = jax.lax.scan(
                body, jnp.zeros(()), jnp.arange(k, dtype=jnp.int32)
            )
            return out

        def run(k):
            _ = float(scan_k(k, st.packed_k))
        return run

    report("shell_kernels", lambda: shell_kernels())
    report("shell_kernels_wps4", lambda: shell_kernels(wps=4))
    report("shell_kernels_wps8", lambda: shell_kernels(wps=8))

    def shell_dense_k(**kw):
        from nerf_projects_tpu.ops.pallas.tile_march import (
            required_chunks,
        )

        sb = B._shell_setup(RESO, dtype=jnp.float32)
        srays = B._tile_rays(jax.random.PRNGKey(2), TILES)
        ck = required_chunks(sb, srays, opts, use_occupancy=True)
        print(json.dumps({"shell_nb": int(sb.n_bricks),
                          "shell_ck": ck}), flush=True)
        return dense_k_runner(make_trainer(**kw), my_bg=sb,
                              compact=ck, use_occ=True)

    report("dense_k_shell", lambda: shell_dense_k())
    report("dense_k_shell_bf16g", lambda: shell_dense_k(
        bf16_grad_blocks=True))

    # --- forward only (bg as ARG: a closed-over grid becomes a jit
    # constant that the remote compile helper serializes -> stalls)
    fwd = jax.jit(lambda b, r: render_tiles_pallas(b, r, opts)["rgb"])

    def run_fwd(k):
        out = None
        for i in range(k):
            out = fwd(bg, rays._replace(origins=rays.origins + i * 1e-6))
        _ = float(out.sum())

    report("fwd_kernel", lambda: run_fwd)

    # --- fused fwd+bwd (kernels + scatter, no TV/optim)
    fused = jax.jit(lambda b, r: render_fused_tiles_pallas(
        b, r, target, opts))

    def run_fused(k):
        out = None
        for i in range(k):
            out = fused(bg,
                        rays._replace(origins=rays.origins + i * 1e-6))
        _ = float(out[0].sum())

    report("fused_kernels+scatter", lambda: run_fused)

    # --- backward-tail attribution: kernels vs scatter vs relayout
    tail_names = {"kernel_arrays_build", "bwd_kernel_only",
                  "scatter_relayout_only", "gsh_scatter_only",
                  "fwd_march_only", "fwd_march_constrows"}
    if only and not (set(only) & tail_names):
        tail_on = False
    else:
        tail_on = True
    from nerf_projects_tpu.ops.pallas.tile_march import (
        _bwd_call,
        _kernel_arrays,
        _march_call,
        _orig_with_base,
        _pack_rays,
        _plan_windows,
        fused_grad_blocks,
        kernel_layout_to_sh,
    )
    from nerf_projects_tpu.ops.tile_render import default_chunks

    C = default_chunks(bg, opts.step_size, 16)

    @jax.jit
    def plan(b, r):
        pack, geom = _pack_rays(b, r, opts, False)
        wb, rows = _plan_windows(b, geom, C)
        (orig, rows), _, _ = _orig_with_base(wb, rows, b.n_bricks, C, None)
        return pack, orig, rows

    if tail_on:
        pack, orig, rows = jax.block_until_ready(plan(bg, rays))
    basisf = jnp.zeros((TILES, bg.basis_dim), jnp.float32).at[:, 0].set(1.0)

    from dataclasses import replace as _drep

    ka_t = jax.jit(lambda b: _kernel_arrays(b))

    def run_ka(k):
        s = None
        for i in range(k):
            o = ka_t(_drep(
                bg, density_bricks=bg.density_bricks + i * 1e-9))
            s = o[0]
        _ = float(s.sum())

    report("kernel_arrays_build", lambda: run_ka)

    if tail_on:
        density_z, sh_z = jax.block_until_ready(_kernel_arrays(bg))

        fwd_samp = jax.jit(
            lambda dz, sz, rws, org, bsf, pck: _march_call(
                dz, sz, rws, org, bsf, pck, C, bg.basis_dim, "bias",
                emit_samples=True))
        _, samples = jax.block_until_ready(
            fwd_samp(density_z, sh_z, rows, orig, basisf, pack))

        # fetch-cost diagnostic: fwd march with ALL corner rows == 0 —
        # Mosaic skips a block refetch when its index is unchanged from
        # the previous grid step, so constant rows measure the no-DMA
        # per-step floor (sequencing + VPU). fwd_march minus this =
        # the corner-DMA cost per step.
        fwd_plain = jax.jit(
            lambda dz, sz, rws, org, bsf, pck: _march_call(
                dz, sz, rws, org, bsf, pck, C, bg.basis_dim,
                "bias")[0])

        def run_fwd_plain(k):
            out = None
            for i in range(k):
                out = fwd_plain(density_z, sh_z, rows, orig, basisf,
                                pack.at[:, 12].add(i * 1e-9))
            _ = float(out.sum())

        report("fwd_march_only", lambda: run_fwd_plain)

        rows0 = jnp.zeros_like(rows)

        def run_fwd_const(k):
            out = None
            for i in range(k):
                out = fwd_plain(density_z, sh_z, rows0, orig, basisf,
                                pack.at[:, 12].add(i * 1e-9))
            _ = float(out.sum())

        report("fwd_march_constrows", lambda: run_fwd_const)

        bwdk = jax.jit(lambda smp, rws, org, bsf, pck: _bwd_call(
            smp, rws, org, bsf, pck, C, bg.basis_dim, 0.0, "bias",
            jnp.float32))

        def run_bwdk(k):
            out = None
            for i in range(k):
                out = bwdk(samples, rows, orig, basisf,
                           pack.at[:, 12].add(i * 1e-9))
            _ = float(out[0].sum())

        report("bwd_kernel_only", lambda: run_bwdk)

        state, gdb, gshb = jax.block_until_ready(
            bwdk(samples, rows, orig, basisf, pack))

    @jax.jit
    def scatter_relayout(gd_blocks, gsh_blocks, rws):
        flat_rows = rws.reshape(-1)
        nb = bg.n_bricks
        gd = jnp.zeros((nb + 1, 8, 64), jnp.float32).at[flat_rows].add(
            gd_blocks.reshape(-1, 8, 64)
        )[:nb]
        gsh_k = jnp.zeros(
            (nb + 1, bg.basis_dim, 8, 192), jnp.float32
        ).at[flat_rows].add(
            gsh_blocks.reshape(-1, bg.basis_dim, 8, 192)
        )[:nb]
        return gd.reshape(nb, 512), kernel_layout_to_sh(
            gsh_k, bg.basis_dim)

    def run_scat(k):
        out = None
        for i in range(k):
            out = scatter_relayout(gdb, gshb.at[0, 0, 0, 0, 0, 0].add(
                i * 1e-9), rows)
        _ = float(out[0].sum())

    report("scatter_relayout_only", lambda: run_scat)

    @jax.jit
    def scatter_only(gsh_blocks, rws):
        flat_rows = rws.reshape(-1)
        nb = bg.n_bricks
        return jnp.zeros(
            (nb + 1, bg.basis_dim, 8, 192), jnp.float32
        ).at[flat_rows].add(
            gsh_blocks.reshape(-1, bg.basis_dim, 8, 192)
        )[:nb].sum()

    def run_scat2(k):
        out = None
        for i in range(k):
            out = scatter_only(gshb.at[0, 0, 0, 0, 0, 0].add(i * 1e-9),
                               rows)
        _ = float(out)

    report("gsh_scatter_only", lambda: run_scat2)

    # --- optimizer only (dense RMSprop over brick arrays)
    trainer = make_trainer()

    @jax.jit
    def optim_only(b, rms, gd, gsh, i):
        lr_sigma = trainer.lr_sigma_fn(i)
        lr_sh = trainer.lr_sh_fn(i)
        nd, rd = trainer._optim("rmsprop", b.density_bricks, gd,
                                rms.rms_density, lr_sigma)
        ns, rs = trainer._optim("rmsprop", b.sh_bricks, gsh, rms.rms_sh,
                                lr_sh)
        return nd.sum() + ns.sum() + rd.sum() + rs.sum()

    rms = trainer.init_rms_bricks(bg)
    gd = jnp.zeros_like(bg.density_bricks)
    gsh = jnp.zeros_like(bg.sh_bricks)

    def run_optim(k):
        s = None
        for i in range(k):
            s = optim_only(bg, rms, gd, gsh, jnp.asarray(float(i)))
        _ = float(s)

    report("optim_only", lambda: run_optim)

    # ---- 256-ray tiles (halves grid steps and grad-block count)
    rays256 = B._tile_rays(jax.random.PRNGKey(2), TILES // 2,
                           tile_shape=(16, 16))
    target256 = jnp.full(rays256.origins.shape[:2] + (3,), 0.4)

    def step_runner_256(trainer):
        my_bg = jax.tree_util.tree_map(jnp.copy, bg)
        rms = trainer.init_rms_bricks(my_bg)
        holder = {"bg": my_bg, "rms": rms}

        def run(k):
            b, r = holder["bg"], holder["rms"]
            st = None
            for i in range(k):
                b, r, st = trainer.train_step_tiles_pallas(
                    b, r, rays256, target256, jnp.asarray(float(i)),
                    jax.random.PRNGKey(i))
            _ = float(st["mse"])
            holder["bg"], holder["rms"] = b, r
        return run

    report("full_256", lambda: step_runner_256(make_trainer()))
    report("full_256_bf16g", lambda: step_runner_256(
        make_trainer(bf16_grad_blocks=True)))

    def packed_runner_256(trainer, my_bg=None, compact=None,
                          use_occ=False):
        import functools

        from nerf_projects_tpu.train import plenoxels_sparse as ps

        geom = my_bg if my_bg is not None else bg
        holder = {"st": ps.packed_state_from_grid(geom)}

        @functools.partial(jax.jit, static_argnums=(0, 3, 4),
                           donate_argnums=1)
        def scan_steps(k, st, key, ck, occ):
            def body(st, i):
                st, stats = ps.train_step_tiles_packed(
                    trainer, geom, st, rays256, target256,
                    i, jax.random.fold_in(key, i),
                    compact_chunks=ck, use_occupancy=occ)
                return st, stats["mse"]

            return jax.lax.scan(body, st,
                                jnp.arange(k, dtype=jnp.int32))

        def run(k):
            st, mses = scan_steps(k, holder["st"],
                                  jax.random.PRNGKey(k), compact,
                                  use_occ)
            _ = float(mses[-1])
            holder["st"] = st
        return run

    report("packed_256", lambda: packed_runner_256(make_trainer()))
    report("packed_256_bf16g", lambda: packed_runner_256(
        make_trainer(bf16_grad_blocks=True)))

    def shell_packed_256(**kw):
        from nerf_projects_tpu.ops.pallas.tile_march import (
            required_chunks,
        )

        sb = B._shell_setup(RESO, dtype=jnp.float32)
        ck = required_chunks(sb, rays256, opts, use_occupancy=True)
        print(json.dumps({"shell_nb": int(sb.n_bricks),
                          "shell_ck_256": ck}), flush=True)
        return packed_runner_256(make_trainer(**kw), my_bg=sb,
                                 compact=ck, use_occ=True)

    report("packed_shell_256", lambda: shell_packed_256())

    # ---- packed-path attribution: kernels / scatter / optimizer
    def packed_parts(which, use_256):
        import functools

        from nerf_projects_tpu.ops.pallas.tile_march import (
            fused_grad_blocks,
        )
        from nerf_projects_tpu.train import plenoxels_sparse as ps

        st0 = ps.packed_state_from_grid(bg)
        my_rays = rays256 if use_256 else rays
        my_tgt = target256 if use_256 else target
        nb, B = bg.n_bricks, st0.basis_dim
        trainer = make_trainer()

        if which == "kernels":
            fused = jax.jit(lambda k, r: fused_grad_blocks(
                bg, r, my_tgt, opts, kernel_arrays=k))

            def run(k):
                out = None
                for i in range(k):
                    out = fused(st0.packed_k, my_rays._replace(
                        origins=my_rays.origins + i * 1e-7))
                _ = float(out[0].sum())
            return run

        _, _, gp_blocks, rows, _ = jax.block_until_ready(
            jax.jit(lambda kk, r: fused_grad_blocks(
                bg, r, my_tgt, opts, kernel_arrays=kk))(
                    st0.packed_k, my_rays))

        if which == "scatter":
            @jax.jit
            def scat(gp, rws):
                return jnp.zeros(
                    (nb + 1, B + 1, 8, 192), jnp.float32
                ).at[rws.reshape(-1)].add(
                    gp.reshape(-1, B + 1, 8, 192).astype(jnp.float32)
                ).sum()

            def run(k):
                out = None
                for i in range(k):
                    out = scat(gp_blocks, rows)
                    gp_blocks_alias = gp_blocks  # noqa
                _ = float(out)
            return run

        # optimizer sweep over the packed state
        acc = jax.block_until_ready(jnp.zeros(
            (nb + 1, B + 1, 8, 192), jnp.float32
        ).at[rows.reshape(-1)].add(
            gp_blocks.reshape(-1, B + 1, 8, 192).astype(jnp.float32)))
        m192 = jnp.repeat(
            jnp.concatenate(
                [bg.cell_mask, jnp.zeros_like(bg.cell_mask[:1])]
            ).astype(jnp.float32).reshape(nb + 1, 8, 64), 3, axis=-1,
        )[:, None]
        slot = jnp.arange(B + 1)

        @jax.jit
        def optim(pk, rms, a, i):
            lr_vec = jnp.where(
                slot == B, trainer.lr_sigma_fn(i), trainer.lr_sh_fn(i)
            )[None, :, None, None]
            g = a * m192
            b = trainer.rms_beta
            nrms = b * rms + (1.0 - b) * g * g
            upd = lr_vec * g / (jnp.sqrt(nrms) + 1e-8)
            new = (pk - upd) * m192
            return new.sum() + nrms.sum()

        pk0, rms0 = st0.packed_k, jnp.zeros_like(st0.rms)

        def run(k):
            out = None
            for i in range(k):
                out = optim(pk0, rms0, acc, jnp.asarray(float(i)))
            _ = float(out)
        return run

    report("pk_kernels_128", lambda: packed_parts("kernels", False))
    report("pk_kernels_256", lambda: packed_parts("kernels", True))
    report("pk_scatter", lambda: packed_parts("scatter", False))
    report("pk_optim", lambda: packed_parts("optim", False))

    print(json.dumps({"summary": results, "reso": RESO, "tiles": TILES}),
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
