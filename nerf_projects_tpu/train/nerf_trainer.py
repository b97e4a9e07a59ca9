"""Vanilla-NeRF training driver (the notebook `train()` loop, TPU-native).

Parity target: reference nerf/nerf.ipynb cell 19 — one Adam optimizer over
coarse+fine params at lrate=5e-4, loss = MSE(fine) + MSE(coarse), LR decays
0.1^(step/(lrate_decay*1000)), PSNR = -10 log10(mse).

TPU design: the step is a single jitted function over a ray batch whose
leading axis is sharded across the mesh ("rays" DP axis); params are
replicated and XLA emits the ICI psum for the gradient all-reduce from the
sharding annotations. Random ray selection happens on device from a
pre-sharded ray pool; there is no per-step host->device traffic beyond the
step counter.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.models.nerf import NeRFMLP
from nerf_projects_tpu.models.pipeline import NeRFRenderConfig, render_rays
from nerf_projects_tpu.ops.posenc import posenc_dim
from nerf_projects_tpu.train.schedules import exponential_decay


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any          # (coarse, fine_or_None) tuple pytree
    opt_state: Any
    key: jax.Array


class NeRFTrainer:
    """Owns the model/optimizer definitions and the jitted train/eval steps."""

    def __init__(
        self,
        cfg: NeRFRenderConfig,
        *,
        depth: int = 8,
        width: int = 256,
        lrate: float = 5e-4,
        lrate_decay: float = 250,
        near: float = 2.0,
        far: float = 6.0,
        compute_dtype=jnp.float32,
        separate_fine: bool = True,
        use_fused_mlp: bool = False,
        use_mega: bool = False,
        mesh=None,
        mega_rc: int = 8,
        mega_rf: int = 4,
    ):
        self.cfg = cfg
        self.near = near
        self.far = far
        self.lrate = lrate
        self.model = NeRFMLP(
            depth=depth,
            width=width,
            use_viewdirs=cfg.use_viewdirs,
            compute_dtype=compute_dtype,
        )
        # The fully-fused Pallas MLP kernel covers exactly the flagship
        # architecture (8x256, viewdirs, multires 10/4).
        self.use_fused_mlp = bool(
            use_fused_mlp
            and depth == 8
            and width == 256
            and cfg.use_viewdirs
            and cfg.multires == 10
            and cfg.multires_views == 4
        )
        if self.use_fused_mlp:
            # Encoded-input variant: measured fastest end-to-end (the
            # in-kernel-posenc raw variant serializes VPU encode ahead of
            # the MXU per tile and benches slower; see NOTES_ROUND1.md).
            from nerf_projects_tpu.ops.pallas.fused_mlp import (
                fused_apply,
                pack_params,
            )

            if mesh is not None:
                # Under a device mesh, a pallas_call is opaque to the
                # GSPMD partitioner — wrap it in shard_map over the
                # sample axis so every device runs the kernel on its own
                # shard and no resharding is inserted around it. The
                # weights stay replicated; grads pick up the psum from
                # shard_map's AD transpose.
                from jax.experimental.shard_map import shard_map
                from jax.sharding import PartitionSpec as P

                from nerf_projects_tpu.parallel.mesh import RAY_AXIS

                def apply_fn(params, pts_enc, views_enc):
                    packed = pack_params(params)

                    def local(w, x, v):
                        return fused_apply(w, x, v)

                    return shard_map(
                        local,
                        mesh=mesh,
                        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS)),
                        out_specs=P(RAY_AXIS),
                        check_rep=False,
                    )(packed, pts_enc, views_enc)

            else:

                def apply_fn(params, pts_enc, views_enc):
                    return fused_apply(pack_params(params), pts_enc, views_enc)

            self._apply_fn = apply_fn
        else:
            self._apply_fn = None
        self.separate_fine = separate_fine and cfg.num_fine_samples > 0
        # The fused train-step mega-kernel (fwd + compositing + loss
        # grad + bwd in one pallas_call per level) replaces
        # value_and_grad entirely; same architecture gate as the fused
        # MLP, plus no sigma noise (the loss grad is generated
        # in-kernel).
        self.use_mega = bool(
            use_mega
            and depth == 8
            and width == 256
            and cfg.use_viewdirs
            and cfg.multires == 10
            and cfg.multires_views == 4
            and cfg.raw_noise_std == 0.0
        )
        self.mesh = mesh
        # rays per mega-kernel tile: coarse S=96 -> 768-row tiles; fine
        # S=288 -> 1152-row tiles (bf16 act stash + f32 grads + the
        # [TILE, TILE] prefix matrix co-reside; the pallas_call raises
        # the scoped-vmem cap)
        self.mega_rc = mega_rc
        self.mega_rf = mega_rf
        # raw-input mega kernels: posenc happens in-kernel (block
        # layout); the XLA glue streams 8 cols instead of 64 and runs
        # no transcendentals
        self.mega_raw = True
        self.schedule = exponential_decay(lrate, lrate_decay)
        self.tx = optax.adam(
            learning_rate=self.schedule, b1=0.9, b2=0.999, eps=1e-7
        )

    # -- state ------------------------------------------------------------

    def init_state(self, key: jax.Array) -> TrainState:
        k1, k2, k3 = jax.random.split(key, 3)
        pe = jnp.zeros((1, posenc_dim(3, self.cfg.multires)))
        ve = (
            jnp.zeros((1, posenc_dim(3, self.cfg.multires_views)))
            if self.cfg.use_viewdirs
            else None
        )
        init = (
            (lambda k: self.model.init(k, pe, ve))
            if self.cfg.use_viewdirs
            else (lambda k: self.model.init(k, pe))
        )
        params_c = init(k1)
        params_f = init(k2) if self.separate_fine else None
        opt_state = self.tx.init((params_c, params_f))
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=(params_c, params_f),
            opt_state=opt_state,
            key=k3,
        )

    # -- steps ------------------------------------------------------------

    @property
    def apply_fn(self):
        return self._apply_fn if self._apply_fn is not None else self.model.apply

    def loss_fn(self, params, key, rays: Rays, target: jnp.ndarray):
        out = render_rays(
            key,
            params[0],
            params[1],
            self.apply_fn,
            rays,
            self.near,
            self.far,
            self.cfg,
            randomized=True,
        )
        loss = jnp.mean((out["rgb"] - target) ** 2)
        psnr_mse = loss
        if "rgb0" in out:
            loss = loss + jnp.mean((out["rgb0"] - target) ** 2)
        return loss, psnr_mse

    def _mega_level(self, packed, x, vt, *, S, R, n_rays_total,
                    bkgd, want_weights):
        """One mega-kernel level; under a mesh the pallas_call is
        wrapped in shard_map over the ray axis (kernels are opaque to
        GSPMD) with an explicit psum of the weight grads."""
        from nerf_projects_tpu.ops.pallas.fused_train import (
            fused_train_level,
        )

        if self.mesh is None:
            return fused_train_level(
                packed, x, vt, S=S, R=R,
                n_rays_total=n_rays_total, bkgd=bkgd,
                want_weights=want_weights, raw_inputs=self.mega_raw,
            )
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from nerf_projects_tpu.parallel.mesh import RAY_AXIS

        def local(w, xx, vv):
            rgb, acc, ws, g = fused_train_level(
                w, xx, vv, S=S, R=R, n_rays_total=n_rays_total,
                bkgd=bkgd, want_weights=want_weights,
                raw_inputs=self.mega_raw,
            )
            g = jax.tree_util.tree_map(
                lambda a: jax.lax.psum(a, RAY_AXIS), g
            )
            return (rgb, acc, ws, g) if want_weights else (rgb, acc, g)

        in_specs = (P(), P(RAY_AXIS), P(RAY_AXIS))
        if want_weights:
            out = shard_map(
                local, mesh=self.mesh, in_specs=in_specs,
                out_specs=(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P()),
                check_rep=False,
            )(packed, x, vt)
            return out
        rgb, acc, g = shard_map(
            local, mesh=self.mesh, in_specs=in_specs,
            out_specs=(P(RAY_AXIS), P(RAY_AXIS), P()),
            check_rep=False,
        )(packed, x, vt)
        return rgb, acc, None, g

    def _mega_value_and_grad(self, params, key, rays, target):
        """value_and_grad replacement via the fused train-level
        mega-kernel (ops/pallas/fused_train.py): sampling/posenc in XLA,
        MLP fwd + compositing + MSE grad + MLP bwd in one pallas_call
        per level. Numerics: the same fused-MLP bf16 matmuls and
        volumetric_rendering compositing as the autograd path
        (parity-tested in tests/test_fused_train.py)."""
        from nerf_projects_tpu.ops.pallas.fused_mlp import (
            pack_params,
            unpack_grads,
        )
        from nerf_projects_tpu.ops.pallas.fused_train import (
            pack_level_inputs,
            pack_level_inputs_raw,
        )
        from nerf_projects_tpu.ops.sampling import (
            cast_rays,
            merge_sorted,
            piecewise_constant_pdf,
            stratified_sample,
        )

        cfg = self.cfg
        n_rays = rays.origins.shape[0]
        bkgd = 1.0 if cfg.white_bkgd else 0.0
        Sc = cfg.num_coarse_samples

        if cfg.perturb:
            key, k_strat = jax.random.split(key)
        else:
            k_strat = None
        z_vals = stratified_sample(
            k_strat, Sc, self.near, self.far, (n_rays,),
            lindisp=cfg.lindisp, randomized=cfg.perturb,
        )
        pts = cast_rays(z_vals, rays.origins, rays.directions)
        packed_c = pack_params(params[0], raw_layout=self.mega_raw)
        if self.mega_raw:
            x, vt = pack_level_inputs_raw(
                pts, rays.viewdirs, z_vals, rays.directions, target,
                Sc, self.mega_rc,
            )
        else:
            x, vt = pack_level_inputs(
                pts, rays.viewdirs, z_vals, rays.directions, target,
                Sc, self.mega_rc,
                multires=cfg.multires,
                multires_views=cfg.multires_views,
            )
        rgb0, acc0, w0, gc = self._mega_level(
            packed_c, x, vt, S=Sc, R=self.mega_rc,
            n_rays_total=n_rays, bkgd=bkgd,
            want_weights=cfg.num_fine_samples > 0,
        )
        mse0 = jnp.mean((rgb0 - target) ** 2)
        grads_c = unpack_grads(gc, params[0], raw_layout=self.mega_raw)
        if cfg.num_fine_samples == 0:
            return (mse0, mse0), (grads_c, None)

        if cfg.perturb:
            key, k_pdf = jax.random.split(key)
        else:
            k_pdf = None
        z_mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = piecewise_constant_pdf(
            k_pdf, z_mids, w0[..., 1:-1], cfg.num_fine_samples,
            randomized=cfg.perturb, mode=cfg.pdf_mode,
            sorted_u=cfg.resample_sorted,
        )
        if cfg.resample_sorted:
            z_comb = merge_sorted(z_vals, z_samples)
        else:
            z_comb = jnp.sort(
                jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1
            )
        pts_f = cast_rays(z_comb, rays.origins, rays.directions)
        Sf = Sc + cfg.num_fine_samples
        pf = params[1] if params[1] is not None else params[0]
        packed_f = pack_params(pf, raw_layout=self.mega_raw)
        if self.mega_raw:
            xf, vtf = pack_level_inputs_raw(
                pts_f, rays.viewdirs, z_comb, rays.directions, target,
                Sf, self.mega_rf,
            )
        else:
            xf, vtf = pack_level_inputs(
                pts_f, rays.viewdirs, z_comb, rays.directions, target,
                Sf, self.mega_rf,
                multires=cfg.multires,
                multires_views=cfg.multires_views,
            )
        rgb, acc, _, gf = self._mega_level(
            packed_f, xf, vtf, S=Sf, R=self.mega_rf,
            n_rays_total=n_rays, bkgd=bkgd, want_weights=False,
        )
        mse = jnp.mean((rgb - target) ** 2)
        grads_f = unpack_grads(gf, pf, raw_layout=self.mega_raw)
        if params[1] is None:
            grads = (
                jax.tree_util.tree_map(
                    lambda a, b: a + b, grads_c, grads_f
                ),
                None,
            )
        else:
            grads = (grads_c, grads_f)
        return (mse + mse0, mse), grads

    def _value_and_grad(self, params, key, rays, target):
        if self.use_mega:
            return self._mega_value_and_grad(params, key, rays, target)
        return jax.value_and_grad(self.loss_fn, has_aux=True)(
            params, key, rays, target
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, rays: Rays, target: jnp.ndarray):
        key, sub = jax.random.split(state.key)
        (loss, psnr_mse), grads = self._value_and_grad(
            state.params, sub, rays, target
        )
        updates, opt_state = self.tx.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        psnr = -10.0 * jnp.log(psnr_mse) / jnp.log(10.0)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, key=key
        )
        return new_state, {"loss": loss, "psnr": psnr}

    @functools.partial(jax.jit, static_argnums=(0, 4, 5), donate_argnums=1)
    def scan_steps(
        self,
        state: TrainState,
        pool_rays: Rays,
        pool_rgb: jnp.ndarray,
        n_steps: int,
        batch_size: int = 1024,
    ):
        """Run n_steps train steps fully on device with lax.scan.

        Ray batches are drawn on device from the resident pool each step —
        zero host involvement per step. This is how a TPU training loop
        should run (the host only dispatches once per scan); it also
        amortizes dispatch latency on tunneled/remote device setups.
        Returns (state, stats dict of [n_steps] arrays).
        """
        n_pool = pool_rgb.shape[0]

        def body(carry, _):
            st = carry
            key, k_draw, k_step = jax.random.split(st.key, 3)
            idx = jax.random.randint(k_draw, (batch_size,), 0, n_pool)
            rays = jax.tree_util.tree_map(lambda x: x[idx], pool_rays)
            target = pool_rgb[idx]
            (loss, psnr_mse), grads = self._value_and_grad(
                st.params, k_step, rays, target
            )
            updates, opt_state = self.tx.update(grads, st.opt_state)
            params = optax.apply_updates(st.params, updates)
            new_state = TrainState(
                step=st.step + 1, params=params, opt_state=opt_state, key=key
            )
            psnr = -10.0 * jnp.log(psnr_mse) / jnp.log(10.0)
            return new_state, {"loss": loss, "psnr": psnr}

        return jax.lax.scan(body, state, None, length=n_steps)

    @functools.partial(jax.jit, static_argnums=0)
    def render_step(self, params, rays: Rays):
        """Deterministic (eval) rendering of a ray batch.

        Uses the plain XLA apply — the fused kernel wins on fwd+bwd (no
        activation re-materialization) but XLA's forward alone is
        slightly faster."""
        return render_rays(
            None,
            params[0],
            params[1],
            self.model.apply,
            rays,
            self.near,
            self.far,
            self.cfg,
            randomized=False,
        )

    def render_image(self, params, rays: Rays, chunk: int = 16384):
        """Render H×W rays in fixed-size chunks (eval path).

        Equivalent of the reference's `batchify_rays` + `render_path`
        (notebook cells 11/13) with static chunk shapes.
        """
        shape = rays.batch_shape
        flat = jax.tree_util.tree_map(lambda x: x.reshape(-1, 3), rays)
        n = flat.origins.shape[0]
        outs = []
        for i in range(0, n, chunk):
            sl = jax.tree_util.tree_map(lambda x: x[i : i + chunk], flat)
            pad = chunk - sl.origins.shape[0]
            if pad:
                sl = jax.tree_util.tree_map(
                    lambda x: jnp.pad(x, ((0, pad), (0, 0)), mode="edge"), sl
                )
            out = self.render_step(params, sl)
            if pad:
                out = {k: v[: chunk - pad] for k, v in out.items()}
            outs.append(out)
        merged = {
            k: jnp.concatenate([o[k] for o in outs], axis=0) for k in outs[0]
        }
        return {
            k: v.reshape(shape + v.shape[1:]) for k, v in merged.items()
        }
