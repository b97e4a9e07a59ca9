"""Plenoxels training driver: fused render+grad+optimizer over a SparseGrid.

Parity target: reference svox2/opt/opt.py:395-898 train loop —
  * MSE on rendered ray batches with fused beta / sparsity loss gradients
    (volume_render_fused, opt.py:699-701; beta scaled 1/N_rays and
    Cauchy sparsity per sample, render_lerp_kernel_cuvol.cu:259-262,
    345-350, 1127-1128);
  * SAMPLED-fraction TV regularization on density and SH (inplace_tv_grad
    / inplace_tv_color_grad with sparse_frac=tv_sparsity=0.01,
    opt.py:222,227,794-811) plus optional lumisphere TV and L2 color
    shrinkage (opt.py:812-827) — all as direct gradient injections, no
    autograd, exactly like the reference (ops/tv.py);
  * fused RMSprop or SGD per param group with log-lerp LR schedules
    (optim_density_step / optim_sh_step, opt.py:832-842;
    optim_kernel.cu:20-27: rms <- b*rms + (1-b)*g^2;
    p <- max(p - lr*g/(sqrt(rms)+eps), minval); sgd variants :98-160).

TPU design: there is no autograd graph in the reference hot path; here
the whole step (render -> MSE/beta/sparsity grad -> sampled TV grad ->
optimizer) is ONE jitted function, so XLA fuses it the same way —
gathers transpose to scatter-adds, the TV window's neighbor links are
contiguous slices, the optimizer update is elementwise over the compact
arrays, and nothing returns to the host but scalars.
"""
from __future__ import annotations

import functools
from dataclasses import replace
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.models.sparse_grid import SparseGrid
from nerf_projects_tpu.ops.grid import GridRenderOptions, volume_render_grid
from nerf_projects_tpu.ops.tv import (
    l2_color_grad,
    sample_window,
    tv_grad_sampled,
    tv_lumisphere_grad_sampled,
)
from nerf_projects_tpu.train.schedules import log_linear_decay


def build_neighbor_links(links: np.ndarray) -> np.ndarray:
    """[cap, 3] compact rows of the +x/+y/+z neighbors of each active cell
    (-1 where the neighbor is empty/out of bounds). Host-side; used by the
    full-grid TV *loss* (autotune scoring / tests) — the training path
    uses the sampled TV gradient in ops/tv.py instead."""
    links = np.asarray(links)
    cap = int(links.max()) + 1
    try:
        from nerf_projects_tpu.utils import native

        res = native.build_neighbor_links(links, cap)
        if res is not None:
            return res
    except Exception:
        pass
    nbr = np.full((cap, 3), -1, np.int32)
    active = np.argwhere(links >= 0)
    rows = links[active[:, 0], active[:, 1], active[:, 2]]
    X, Y, Z = links.shape
    for axis in range(3):
        shifted = active.copy()
        shifted[:, axis] += 1
        ok = shifted[:, axis] < links.shape[axis]
        n_rows = np.full(len(active), -1, np.int32)
        n_rows[ok] = links[
            shifted[ok, 0], shifted[ok, 1], shifted[ok, 2]
        ]
        nbr[rows, axis] = n_rows
    return nbr


def tv_loss(data: jnp.ndarray, nbr: jnp.ndarray) -> jnp.ndarray:
    """Isotropic total variation over active cells via neighbor rows.

    data [cap, C]; nbr [cap, 3]. Differences to empty neighbors are 0
    (matches the reference's link-guarded tv, loss_kernel.cu:65-110).
    Loss VALUE only (reporting); training injects ops/tv.py gradients.
    """
    diffs = []
    for axis in range(3):
        n = nbr[:, axis]
        valid = (n >= 0)[:, None]
        d = jnp.where(valid, data[jnp.maximum(n, 0)] - data, 0.0)
        diffs.append(d)
    sq = sum(jnp.sum(d * d, axis=-1) for d in diffs)  # [cap]
    return jnp.mean(jnp.sqrt(sq + 1e-12))


class RMSState(NamedTuple):
    rms_density: jnp.ndarray
    rms_sh: jnp.ndarray


class PlenoxelsTrainer:
    def __init__(
        self,
        opts: GridRenderOptions = GridRenderOptions(),
        *,
        n_iters: int = 128_000,
        lr_sigma: float = 3e1,
        lr_sigma_final: float = 5e-2,
        lr_sigma_delay_steps: int = 15000,
        lr_sigma_delay_mult: float = 1e-2,
        lr_sh: float = 1e-2,
        lr_sh_final: float = 5e-6,
        lambda_tv: float = 1e-5,
        tv_sparsity: float = 0.01,
        lambda_tv_sh: float = 1e-3,
        tv_sh_sparsity: float = 0.01,
        lambda_beta: float = 0.0,
        lambda_sparsity: float = 0.0,
        lambda_l2_sh: float = 0.0,
        lambda_tv_lumisphere: float = 0.0,
        tv_lumisphere_sparsity: float = 0.01,
        tv_lumisphere_dir_factor: float = 0.0,
        sigma_optim: str = "rmsprop",
        sh_optim: str = "rmsprop",
        rms_beta: float = 0.95,
        rms_pervisit: bool = False,
        density_minval: float = -1e9,
        bf16_grad_blocks: bool = False,
        use_occupancy: bool = False,
    ):
        self.opts = opts
        self.lambda_tv = lambda_tv
        self.tv_sparsity = tv_sparsity
        self.lambda_tv_sh = lambda_tv_sh
        self.tv_sh_sparsity = tv_sh_sparsity
        self.lambda_beta = lambda_beta
        self.lambda_sparsity = lambda_sparsity
        self.lambda_l2_sh = lambda_l2_sh
        self.lambda_tv_lumisphere = lambda_tv_lumisphere
        self.tv_lumisphere_sparsity = tv_lumisphere_sparsity
        self.tv_lumisphere_dir_factor = tv_lumisphere_dir_factor
        self.sigma_optim = sigma_optim
        self.sh_optim = sh_optim
        self.rms_beta = rms_beta
        # RMSprop second-moment semantics for the touched/sparse steps.
        # False = reference-literal: rms decays by beta EVERY global
        # step (svox2.cu rmsprop_step runs densely each step), applied
        # lazily as beta^delta on next touch. That semantics is only
        # benign in the reference's regime — globally-shuffled ray
        # batches touch nearly every active voxel every step (delta~1).
        # Under coherent-tile sampling a voxel is visited in bursts
        # (delta ~ 50-500), beta^delta ~ 0, rms collapses to
        # (1-beta)*g^2 and every visit applies lr*g/sqrt((1-beta)g^2)
        # = 4.47*lr*sign(g) regardless of |g| — unbounded oscillation.
        # True = per-visit decay: rms decays by beta once per TOUCH, so
        # it tracks the running mean of per-visit g^2 (the reference's
        # EFFECTIVE dynamics for frequently-touched voxels).
        self.rms_pervisit = rms_pervisit
        self.density_minval = density_minval
        # bf16 per-corner gradient blocks halve the backward kernel's
        # HBM emission (the dominant cost at scale); accumulation stays
        # fp32 in the scatter-add. Deviation from the reference's fp32
        # atomics is per-block rounding only.
        self.grad_block_dtype = (
            jnp.bfloat16 if bf16_grad_blocks else jnp.float32
        )
        # restrict the static chunk count to the active bricks' bound
        # (helps real scenes whose occupied region is much smaller than
        # the grid; no-op for a grid-filling sphere)
        self.use_occupancy = use_occupancy
        self.lr_sigma_fn = log_linear_decay(
            lr_sigma,
            lr_sigma_final,
            n_iters,
            lr_delay_steps=lr_sigma_delay_steps,
            lr_delay_mult=lr_sigma_delay_mult,
        )
        self.lr_sh_fn = log_linear_decay(lr_sh, lr_sh_final, n_iters)

    def init_rms(self, grid: SparseGrid) -> RMSState:
        return RMSState(
            rms_density=jnp.zeros_like(grid.density_data),
            rms_sh=jnp.zeros_like(grid.sh_data),
        )

    # -- loss pieces --------------------------------------------------------

    def _data_loss(self, out, target):
        """MSE + beta + Cauchy sparsity, the fused-kernel loss set."""
        mse = jnp.mean((out["rgb"] - target) ** 2)
        total = mse
        if self.lambda_beta > 0:
            # Neural-Volumes beta prior, averaged over rays
            # (cuvol backward :259-262 with beta_loss/Q at :1127).
            log_T = out["log_transmit"]
            total = total + self.lambda_beta * jnp.mean(
                log_T + jnp.log(1.0 - jnp.exp(log_T) + 1e-3)
            )
        if self.lambda_sparsity > 0:
            # Cauchy sparsity on every marched sample, unnormalized
            # (grad 4*sigma/(1+2 sigma^2) == d/dsigma log(1+2 sigma^2)).
            sigma = out["sigma"]
            total = total + self.lambda_sparsity * jnp.sum(
                jnp.log1p(2.0 * sigma * sigma)
            )
        return total, mse

    def _tv_grads(self, grid, key):
        """Sampled-fraction TV gradient injections (may be zero-cost:
        every branch is compile-time static)."""
        g_d = None
        g_s = None
        X, Y, Z = grid.reso
        grid_size = X * Y * Z
        k_tv, k_sh, k_lum = jax.random.split(key, 3)
        if self.lambda_tv > 0:
            w = max(int(self.tv_sparsity * grid_size), 1)
            cells = sample_window(k_tv, grid_size, w)
            g_d = tv_grad_sampled(
                grid.links, grid.density_data, cells,
                scale=self.lambda_tv, ignore_edge=False,
            )
        if self.lambda_tv_sh > 0:
            w = max(int(self.tv_sh_sparsity * grid_size), 1)
            cells = sample_window(k_sh, grid_size, w)
            g_s = tv_grad_sampled(
                grid.links, grid.sh_data, cells,
                scale=self.lambda_tv_sh, ignore_edge=True,
            )
        if self.lambda_tv_lumisphere > 0:
            w = max(int(self.tv_lumisphere_sparsity * grid_size), 1)
            cells = sample_window(k_lum, grid_size, w)
            g = tv_lumisphere_grad_sampled(
                grid.links, grid.sh_data, cells, k_lum,
                basis_dim=grid.basis_dim,
                scale=self.lambda_tv_lumisphere,
                dir_factor=self.tv_lumisphere_dir_factor,
            )
            g_s = g if g_s is None else g_s + g
        if self.lambda_l2_sh > 0:
            g = l2_color_grad(grid.sh_data, scale=self.lambda_l2_sh)
            g_s = g if g_s is None else g_s + g
        return g_d, g_s

    def _optim(self, optim, data, grad, rms, lr, minval=None):
        """Fused RMSprop-with-floor / SGD (optim_kernel.cu:20-27,98-160).

        First-visit bootstrap per optim_kernel.cu:21 (`rms == 0 ?
        SQR(grad) : lerp(SQR(grad), rms, beta)`): the first update is
        bounded by lr instead of lr/sqrt(1-beta) = 4.47x lr — material
        at lr_sigma=30 in the first training steps."""
        if optim == "rmsprop":
            b = self.rms_beta
            rms = jnp.where(
                (rms == 0.0) & (grad != 0.0),
                grad**2,
                b * rms + (1 - b) * grad**2,
            )
            new = data - lr * grad / (jnp.sqrt(rms) + 1e-8)
        else:  # sgd
            new = data - lr * grad
        if minval is not None:
            new = jnp.maximum(new, minval)
        return new, rms

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def train_step(
        self,
        grid: SparseGrid,
        rms: RMSState,
        rays: Rays,
        target: jnp.ndarray,
        step: jnp.ndarray,
        key: jax.Array,
    ):
        def loss_fn(density_data, sh_data):
            g = replace(grid, density_data=density_data, sh_data=sh_data)
            out = volume_render_grid(g, rays, self.opts)
            return self._data_loss(out, target)

        (loss, mse), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(grid.density_data, grid.sh_data)
        g_density, g_sh = grads

        tv_d, tv_s = self._tv_grads(grid, key)
        if tv_d is not None:
            g_density = g_density + tv_d
        if tv_s is not None:
            g_sh = g_sh + tv_s

        lr_sigma = self.lr_sigma_fn(step)
        lr_sh = self.lr_sh_fn(step)
        new_density, rms_d = self._optim(
            self.sigma_optim, grid.density_data, g_density,
            rms.rms_density, lr_sigma, minval=self.density_minval,
        )
        new_sh, rms_s = self._optim(
            self.sh_optim, grid.sh_data, g_sh, rms.rms_sh, lr_sh
        )

        new_grid = replace(grid, density_data=new_density, sh_data=new_sh)
        psnr = -10.0 * jnp.log(mse) / jnp.log(10.0)
        return (
            new_grid,
            RMSState(rms_density=rms_d, rms_sh=rms_s),
            {"loss": loss, "mse": mse, "psnr": psnr},
        )

    @functools.partial(jax.jit, static_argnums=0)
    def render_step(self, grid: SparseGrid, rays: Rays):
        return volume_render_grid(grid, rays, self.opts, return_depth=True)

    @functools.partial(
        jax.jit, static_argnums=0,
        static_argnames=("basis_type", "mlp_posenc_size", "lr_basis"),
    )
    def train_step_with_basis(
        self,
        grid: SparseGrid,
        rms: RMSState,
        basis_params,
        rms_basis,
        rays: Rays,
        target: jnp.ndarray,
        step: jnp.ndarray,
        key: jax.Array,
        *,
        basis_type: int,
        mlp_posenc_size: int = 0,
        lr_basis: float = 1e-6,
    ):
        """Joint grid + learned-basis step (opt.py's lr_basis path +
        optim_basis_step, svox2.py:2086; basis types in ops/basis.py).
        basis_params: [r,r,r,B] texture (BASIS_TYPE_3D_TEXTURE) or the
        MLP param dict (BASIS_TYPE_MLP); rms_basis matches its pytree."""
        from nerf_projects_tpu.ops.basis import eval_basis

        def loss_fn(density_data, sh_data, bparams):
            g = replace(grid, density_data=density_data, sh_data=sh_data)
            if isinstance(bparams, dict):
                sh_mult = eval_basis(
                    basis_type, grid.basis_dim, rays.viewdirs,
                    mlp_params=bparams, mlp_posenc_size=mlp_posenc_size,
                )
            else:
                sh_mult = eval_basis(
                    basis_type, grid.basis_dim, rays.viewdirs,
                    basis_data=bparams,
                )
            out = volume_render_grid(g, rays, self.opts, sh_mult=sh_mult)
            total, mse = self._data_loss(out, target)
            return total, mse

        (loss, mse), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(grid.density_data, grid.sh_data, basis_params)
        g_density, g_sh, g_basis = grads

        tv_d, tv_s = self._tv_grads(grid, key)
        if tv_d is not None:
            g_density = g_density + tv_d
        if tv_s is not None:
            g_sh = g_sh + tv_s

        lr_sigma = self.lr_sigma_fn(step)
        lr_sh = self.lr_sh_fn(step)
        new_density, rms_d = self._optim(
            self.sigma_optim, grid.density_data, g_density,
            rms.rms_density, lr_sigma, minval=self.density_minval,
        )
        new_sh, rms_s = self._optim(
            self.sh_optim, grid.sh_data, g_sh, rms.rms_sh, lr_sh
        )
        # basis RMSprop (optim_basis_step defaults)
        b = self.rms_beta

        def upd(p, g, r):
            r2 = b * r + (1 - b) * g**2
            return p - lr_basis * g / (jnp.sqrt(r2) + 1e-8), r2

        flat = jax.tree_util.tree_map(upd, basis_params, g_basis, rms_basis)
        new_basis = jax.tree_util.tree_map(
            lambda t: t[0], flat,
            is_leaf=lambda t: isinstance(t, tuple) and len(t) == 2,
        )
        new_rms_basis = jax.tree_util.tree_map(
            lambda t: t[1], flat,
            is_leaf=lambda t: isinstance(t, tuple) and len(t) == 2,
        )

        psnr = -10.0 * jnp.log(mse) / jnp.log(10.0)
        return (
            replace(grid, density_data=new_density, sh_data=new_sh),
            RMSState(rms_density=rms_d, rms_sh=rms_s),
            new_basis,
            new_rms_basis,
            {"loss": loss, "mse": mse, "psnr": psnr},
        )

    # -- brick/tile fast path ------------------------------------------------

    def init_rms_bricks(self, bg) -> RMSState:
        return RMSState(
            rms_density=jnp.zeros_like(bg.density_bricks),
            rms_sh=jnp.zeros_like(bg.sh_bricks),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def train_step_tiles(
        self,
        bg,
        rms: RMSState,
        rays: Rays,           # [T, R] coherent tiles
        target: jnp.ndarray,  # [T, R, 3]
        step: jnp.ndarray,
        key: jax.Array,
    ):
        """The fused hot step on the brick/tile path (ops/tile_render.py):
        the TPU equivalent of the reference's volume_render_fused +
        inplace TV + fused RMSprop sequence (opt.py:699-842), one XLA
        program, MXU-bound instead of gather-bound."""
        from nerf_projects_tpu.ops.tile_render import render_tiles
        from nerf_projects_tpu.ops.tv_bricks import (
            sample_brick_window,
            tv_grad_bricks,
        )

        def loss_fn(density_bricks, sh_bricks):
            b = replace(
                bg, density_bricks=density_bricks, sh_bricks=sh_bricks
            )
            out = render_tiles(b, rays, self.opts)
            mse = jnp.mean((out["rgb"] - target) ** 2)
            total = mse
            if self.lambda_beta > 0:
                log_T = out["log_transmit"]
                total = total + self.lambda_beta * jnp.mean(
                    log_T + jnp.log(1.0 - jnp.exp(log_T) + 1e-3)
                )
            if self.lambda_sparsity > 0:
                total = total + self.lambda_sparsity * jnp.sum(
                    out["sparsity_sum"]
                )
            return total, mse

        (loss, mse), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(bg.density_bricks, bg.sh_bricks)
        g_density, g_sh = grads

        k_tv, k_sh = jax.random.split(key)
        nb = bg.n_bricks
        if self.lambda_tv > 0:
            w = max(int(self.tv_sparsity * nb), 1)
            rows = sample_brick_window(k_tv, nb, w)
            g_density = g_density + tv_grad_bricks(
                bg, bg.density_bricks, rows,
                scale=self.lambda_tv, ignore_edge=False,
            )
        if self.lambda_tv_sh > 0:
            w = max(int(self.tv_sh_sparsity * nb), 1)
            rows = sample_brick_window(k_sh, nb, w)
            g_sh = g_sh + tv_grad_bricks(
                bg, bg.sh_bricks, rows,
                scale=self.lambda_tv_sh, ignore_edge=True,
            )
        if self.lambda_l2_sh > 0:
            g_sh = g_sh + (self.lambda_l2_sh / (nb * 512)) * bg.sh_bricks

        # keep dead cells dead (the reference has no storage for them)
        g_density = g_density * bg.cell_mask
        g_sh = g_sh * bg.cell_mask[..., None]

        lr_sigma = self.lr_sigma_fn(step)
        lr_sh = self.lr_sh_fn(step)
        new_density, rms_d = self._optim(
            self.sigma_optim, bg.density_bricks, g_density,
            rms.rms_density, lr_sigma, minval=self.density_minval,
        )
        new_sh, rms_s = self._optim(
            self.sh_optim, bg.sh_bricks, g_sh, rms.rms_sh, lr_sh
        )
        # density floor would resurrect dead cells; re-zero them
        new_density = new_density * bg.cell_mask
        new_bg = replace(
            bg, density_bricks=new_density, sh_bricks=new_sh
        )
        psnr = -10.0 * jnp.log(mse) / jnp.log(10.0)
        return (
            new_bg,
            RMSState(rms_density=rms_d, rms_sh=rms_s),
            {"loss": loss, "mse": mse, "psnr": psnr},
        )

    @functools.partial(jax.jit, static_argnums=0)
    def render_tiles_step(self, bg, rays: Rays):
        from nerf_projects_tpu.ops.tile_render import render_tiles

        return render_tiles(bg, rays, self.opts, return_depth=True)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def train_step_tiles_pallas(
        self,
        bg,
        rms: RMSState,
        rays: Rays,           # [T, 128] coherent tiles
        target: jnp.ndarray,  # [T, 128, 3]
        step: jnp.ndarray,
        key: jax.Array,
    ):
        """The Pallas-fused hot step: render + MSE/beta/sparsity grads in
        two kernel sweeps (ops/pallas/tile_march.py), sampled TV grads,
        fused RMSprop — the whole reference opt.py step (:699-842) with
        no autograd graph, exactly like the CUDA original."""
        from nerf_projects_tpu.ops.pallas.tile_march import (
            render_fused_tiles_pallas,
        )
        from nerf_projects_tpu.ops.tv_bricks import (
            sample_brick_window,
            tv_grad_bricks,
        )

        rgb, g_density, g_sh, aux = render_fused_tiles_pallas(
            bg, rays, target, self.opts,
            beta_loss=self.lambda_beta,
            sparsity_loss=self.lambda_sparsity,
            grad_dtype=self.grad_block_dtype,
            use_occupancy=self.use_occupancy,
        )
        mse = jnp.mean((rgb - target) ** 2)

        k_tv, k_sh = jax.random.split(key)
        nb = bg.n_bricks
        if self.lambda_tv > 0:
            w = max(int(self.tv_sparsity * nb), 1)
            rows = sample_brick_window(k_tv, nb, w)
            g_density = g_density + tv_grad_bricks(
                bg, bg.density_bricks, rows,
                scale=self.lambda_tv, ignore_edge=False,
            )
        if self.lambda_tv_sh > 0:
            w = max(int(self.tv_sh_sparsity * nb), 1)
            rows = sample_brick_window(k_sh, nb, w)
            g_sh = g_sh + tv_grad_bricks(
                bg, bg.sh_bricks, rows,
                scale=self.lambda_tv_sh, ignore_edge=True,
            )
        if self.lambda_l2_sh > 0:
            g_sh = g_sh + (self.lambda_l2_sh / (nb * 512)) * bg.sh_bricks

        g_density = g_density * bg.cell_mask
        g_sh = g_sh * bg.cell_mask[..., None]

        lr_sigma = self.lr_sigma_fn(step)
        lr_sh = self.lr_sh_fn(step)
        new_density, rms_d = self._optim(
            self.sigma_optim, bg.density_bricks, g_density,
            rms.rms_density, lr_sigma, minval=self.density_minval,
        )
        new_sh, rms_s = self._optim(
            self.sh_optim, bg.sh_bricks, g_sh, rms.rms_sh, lr_sh
        )
        new_density = new_density * bg.cell_mask
        new_bg = replace(bg, density_bricks=new_density, sh_bricks=new_sh)
        psnr = -10.0 * jnp.log(mse) / jnp.log(10.0)
        return (
            new_bg,
            RMSState(rms_density=rms_d, rms_sh=rms_s),
            {"loss": mse, "mse": mse, "psnr": psnr,
             "window_miss": aux["window_miss"]},
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2, 3, 4))
    def train_step_bg(
        self,
        grid: SparseGrid,
        background,
        rms: RMSState,
        rms_bg: jnp.ndarray,
        rays: Rays,
        target: jnp.ndarray,
        step: jnp.ndarray,
        key: jax.Array,
        *,
        lr_bg_scale: float = 0.1,
        lambda_tv_bg: float = 1e-3,
    ):
        """Joint foreground + background-MSI step (opt.py's bg_optim path:
        lr_sigma_bg/lr_color_bg RMSprop + background TV, opt.py:120-135,
        svox2.py optim_background_step). Background TV rides autodiff over
        the full MSI (documented deviation: the reference samples
        tv_background_sparsity of it; the MSI is small enough on TPU that
        the full-grid gradient is cheaper than the gather)."""
        from nerf_projects_tpu.ops.background import (
            BackgroundMSI,
            background_tv_loss,
        )

        def loss_fn(density_data, sh_data, bg_data):
            g = replace(grid, density_data=density_data, sh_data=sh_data)
            bg = BackgroundMSI(bg_data, background.radii)
            out = volume_render_grid(g, rays, self.opts, background=bg)
            total, mse = self._data_loss(out, target)
            total = total + lambda_tv_bg * background_tv_loss(bg)
            return total, mse

        (loss, mse), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(grid.density_data, grid.sh_data, background.data)
        g_density, g_sh, g_bg = grads

        tv_d, tv_s = self._tv_grads(grid, key)
        if tv_d is not None:
            g_density = g_density + tv_d
        if tv_s is not None:
            g_sh = g_sh + tv_s

        lr_sigma = self.lr_sigma_fn(step)
        lr_sh = self.lr_sh_fn(step)
        new_density, rms_d = self._optim(
            self.sigma_optim, grid.density_data, g_density,
            rms.rms_density, lr_sigma, minval=self.density_minval,
        )
        new_sh, rms_s = self._optim(
            self.sh_optim, grid.sh_data, g_sh, rms.rms_sh, lr_sh
        )
        b = self.rms_beta
        rms_b = b * rms_bg + (1 - b) * g_bg**2
        new_bg = background.data - (lr_sh * lr_bg_scale / 1e-2) * g_bg / (
            jnp.sqrt(rms_b) + 1e-8
        )

        from nerf_projects_tpu.ops.background import BackgroundMSI as _BG

        psnr = -10.0 * jnp.log(mse) / jnp.log(10.0)
        return (
            replace(grid, density_data=new_density, sh_data=new_sh),
            _BG(new_bg, background.radii),
            RMSState(rms_density=rms_d, rms_sh=rms_s),
            rms_b,
            {"loss": loss, "mse": mse, "psnr": psnr},
        )
