"""NeRF-SH: NeRF with spherical-harmonic / spherical-Gaussian radiance heads.

Behavioral parity with reference plenoctree/nerf_sh/nerf/models.py:52-428
(`NerfModel`, `construct_nerf`) and model_utils.py:30-94 (`MLP`):
  * trunk depth 8 x width 256, skip concat after layers i where
    i % skip_layer == 0 and i > 0;
  * condition branch (viewdirs): bottleneck W -> concat -> 1 x 128;
  * radiance head widths: 3 channels (plain / viewdirs), 3*(deg+1)^2 (SH
    mode, decoded against viewdirs via ops.sh.eval_sh), 3*sg_dim (SG mode
    with learnable global lambda / mu_spher variables);
  * noise added to raw sigma before activation; activations configurable
    and validated at construction (models.py:366-385);
  * coarse+fine hierarchical sampling with jaxnerf pdf numerics.

TPU-first deviations from the reference (behavior preserved):
  * the MLP consumes pre-flattened [batch*samples, feat] arrays (big MXU
    matmuls); encoding happens outside so XLA fuses it into the first
    matmul;
  * optional bfloat16 compute dtype with fp32 params/outputs.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.ops import sg as sg_ops
from nerf_projects_tpu.ops import sh as sh_ops
from nerf_projects_tpu.ops.posenc import posenc
from nerf_projects_tpu.ops.render import volumetric_rendering
from nerf_projects_tpu.ops.sampling import (
    cast_rays,
    sample_pdf,
    stratified_sample,
)


class CondMLP(nn.Module):
    """Trunk + optional condition branch (reference model_utils.MLP)."""

    net_depth: int = 8
    net_width: int = 256
    net_depth_condition: int = 1
    net_width_condition: int = 128
    skip_layer: int = 4
    num_rgb_channels: int = 3
    num_sigma_channels: int = 1
    net_activation: Callable = nn.relu
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, condition=None):
        """x: [N, feat] encoded points; condition: [N, feat_c] encoded dirs
        (already broadcast to one row per sample). Returns (raw_rgb [N, R],
        raw_sigma [N, S]) in fp32."""
        dense = lambda w: nn.Dense(
            w,
            kernel_init=jax.nn.initializers.glorot_uniform(),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
        )
        x = x.astype(self.compute_dtype)
        inputs = x
        for i in range(self.net_depth):
            x = dense(self.net_width)(x)
            x = self.net_activation(x)
            if i % self.skip_layer == 0 and i > 0:
                x = jnp.concatenate([x, inputs], axis=-1)
        raw_sigma = dense(self.num_sigma_channels)(x)

        if condition is not None:
            bottleneck = dense(self.net_width)(x)
            x = jnp.concatenate(
                [bottleneck, condition.astype(self.compute_dtype)], axis=-1
            )
            for _ in range(self.net_depth_condition):
                x = dense(self.net_width_condition)(x)
                x = self.net_activation(x)
        raw_rgb = dense(self.num_rgb_channels)(x)
        return raw_rgb.astype(jnp.float32), raw_sigma.astype(jnp.float32)


class NeRFSHModel(nn.Module):
    """Coarse+fine NeRF with plain / viewdirs / SH / SG radiance output."""

    num_coarse_samples: int = 64
    num_fine_samples: int = 128
    use_viewdirs: bool = False
    sh_deg: int = -1
    sg_dim: int = -1
    near: float = 2.0
    far: float = 6.0
    noise_std: Optional[float] = None
    net_depth: int = 8
    net_width: int = 256
    net_depth_condition: int = 1
    net_width_condition: int = 128
    skip_layer: int = 4
    num_sigma_channels: int = 1
    white_bkgd: bool = True
    min_deg_point: int = 0
    max_deg_point: int = 10
    deg_view: int = 4
    lindisp: bool = False
    rgb_activation: Callable = nn.sigmoid
    sigma_activation: Callable = nn.relu
    net_activation: Callable = nn.relu
    compute_dtype: Any = jnp.float32
    use_fused_trunk: bool = False  # Pallas fused kernel for the SH/SG
                                   # trunk (condition-free, 8x256, skip 4,
                                   # deg-10 encoding)

    @property
    def num_rgb_channels(self) -> int:
        if self.sh_deg >= 0:
            return 3 * (self.sh_deg + 1) ** 2
        if self.sg_dim > 0:
            return 3 * self.sg_dim
        return 3

    def setup(self):
        if self.sh_deg >= 0 and (self.use_viewdirs or self.sg_dim > 0):
            raise ValueError("use at most one of: SH, SG, use_viewdirs")
        if self.sg_dim > 0 and self.use_viewdirs:
            raise ValueError("use at most one of: SH, SG, use_viewdirs")
        mlp = lambda: CondMLP(
            net_depth=self.net_depth,
            net_width=self.net_width,
            net_depth_condition=self.net_depth_condition,
            net_width_condition=self.net_width_condition,
            skip_layer=self.skip_layer,
            num_rgb_channels=self.num_rgb_channels,
            num_sigma_channels=self.num_sigma_channels,
            net_activation=self.net_activation,
            compute_dtype=self.compute_dtype,
        )
        self.mlp_coarse = mlp()
        self.mlp_fine = mlp() if self.num_fine_samples > 0 else None
        if self.sg_dim > 0:
            k1, k2 = jax.random.split(jax.random.PRNGKey(0))
            self.sg_lambda = self.param(
                "sg_lambda", lambda _: jnp.ones([self.sg_dim], jnp.float32)
            )
            self.sg_mu_spher = self.param(
                "sg_mu_spher",
                lambda _: jnp.concatenate(
                    [
                        jax.random.uniform(k1, [self.sg_dim, 1]) * jnp.pi,
                        jax.random.uniform(k2, [self.sg_dim, 1]) * 2 * jnp.pi,
                    ],
                    axis=-1,
                ),
            )

    # -- helpers ----------------------------------------------------------

    def _encode_points(self, pts):
        return posenc(
            pts,
            self.max_deg_point - self.min_deg_point,
            min_deg=self.min_deg_point,
            ordering="block",
            include_input=True,
        )

    def _encode_views(self, viewdirs):
        return posenc(
            viewdirs, self.deg_view, min_deg=0, ordering="block", include_input=True
        )

    def _fused_trunk_ok(self, mlp):
        # The fused kernel hardcodes ReLU and a single sigma channel;
        # gate on both so softplus/elu configs fall back to the flax path
        # instead of silently computing wrong outputs (ADVICE r1).
        return (
            self.use_fused_trunk
            and not self.is_initializing()
            and not self.use_viewdirs
            and self.net_depth == 8
            and self.net_width == 256
            and self.skip_layer == 4
            and self.min_deg_point == 0
            and self.max_deg_point == 10
            and self.num_rgb_channels <= 128
            and self.num_sigma_channels == 1
            and self.net_activation is nn.relu
        )

    def _run_mlp(self, mlp, pts, viewdirs_enc):
        """pts: [R, N, 3]; viewdirs_enc: [R, Cv] or None -> ([R,N,Crgb],[R,N,1])."""
        r, n = pts.shape[0], pts.shape[1]
        pts_enc = self._encode_points(pts.reshape(r * n, 3))
        if viewdirs_enc is None and self._fused_trunk_ok(mlp):
            from nerf_projects_tpu.ops.pallas.fused_sh_mlp import (
                fused_sh_apply,
            )

            raw_rgb, raw_sigma = fused_sh_apply(
                mlp.variables["params"], pts_enc, self.num_rgb_channels
            )
            return (
                raw_rgb.reshape(r, n, -1),
                raw_sigma.reshape(r, n, self.num_sigma_channels),
            )
        cond = None
        if viewdirs_enc is not None:
            cond = jnp.broadcast_to(
                viewdirs_enc[:, None, :], (r, n, viewdirs_enc.shape[-1])
            ).reshape(r * n, -1)
        raw_rgb, raw_sigma = mlp(pts_enc, cond)
        return (
            raw_rgb.reshape(r, n, -1),
            raw_sigma.reshape(r, n, self.num_sigma_channels),
        )

    def _decode_radiance(self, raw_rgb, viewdirs):
        """SH/SG decode of raw head outputs against per-ray viewdirs."""
        if self.sh_deg >= 0:
            coeffs = raw_rgb.reshape(
                raw_rgb.shape[:-1] + (3, (self.sh_deg + 1) ** 2)
            )
            return sh_ops.eval_sh(self.sh_deg, coeffs, viewdirs[:, None, :])
        if self.sg_dim > 0:
            coeffs = raw_rgb.reshape(raw_rgb.shape[:-1] + (3, self.sg_dim))
            return sg_ops.eval_sg(
                self.sg_lambda, self.sg_mu_spher, coeffs, viewdirs[:, None, :]
            )
        return raw_rgb

    def _one_level(self, key, mlp, pts, z_vals, rays, viewdirs_enc, randomized):
        raw_rgb, raw_sigma = self._run_mlp(mlp, pts, viewdirs_enc)
        if self.noise_std and randomized:
            raw_sigma = raw_sigma + (
                jax.random.normal(key, raw_sigma.shape) * self.noise_std
            )
        decoded = self._decode_radiance(raw_rgb, rays.viewdirs)
        rgb = self.rgb_activation(decoded)
        sigma = self.sigma_activation(raw_sigma)
        return volumetric_rendering(
            rgb,
            sigma[..., 0],
            z_vals,
            rays.directions,
            white_bkgd=self.white_bkgd,
            disp_mode="jaxnerf",
        )

    # -- public API -------------------------------------------------------

    def __call__(self, key_coarse, key_fine, rays: Rays, randomized: bool):
        """Returns [(rgb, disp, acc), ...] for coarse (+ fine) levels, and
        per-level weights in an aux dict (reference returns the 3-tuples)."""
        if randomized:
            k_strat, k_noise = jax.random.split(key_coarse)
        else:
            k_strat = k_noise = None
        z_vals = stratified_sample(
            k_strat,
            self.num_coarse_samples,
            self.near,
            self.far,
            rays.origins.shape[:-1],
            lindisp=self.lindisp,
            randomized=randomized,
        )
        pts = cast_rays(z_vals, rays.origins, rays.directions)
        viewdirs_enc = (
            self._encode_views(rays.viewdirs) if self.use_viewdirs else None
        )
        coarse = self._one_level(
            k_noise, self.mlp_coarse, pts, z_vals, rays, viewdirs_enc, randomized
        )
        levels = [coarse]
        if self.num_fine_samples > 0:
            if randomized:
                k_pdf, k_noise2 = jax.random.split(key_fine)
            else:
                k_pdf = k_noise2 = None
            z_mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_vals_f, pts_f = sample_pdf(
                k_pdf,
                z_mids,
                coarse.weights[..., 1:-1],
                rays.origins,
                rays.directions,
                z_vals,
                self.num_fine_samples,
                randomized=randomized,
                mode="jaxnerf",
            )
            fine = self._one_level(
                k_noise2,
                self.mlp_fine,
                pts_f,
                z_vals_f,
                rays,
                viewdirs_enc,
                randomized,
            )
            levels.append(fine)
        return levels

    def eval_points_raw(self, points, viewdirs=None, coarse=False):
        """Raw (rgb-or-coeffs, sigma) at [B, 3] points — the grid-extraction
        entry point (models.py:146-181)."""
        pts = points[:, None, :]  # [B, 1, 3]
        mlp = (
            self.mlp_coarse
            if (coarse or self.num_fine_samples <= 0)
            else self.mlp_fine
        )
        viewdirs_enc = None
        if self.use_viewdirs:
            if viewdirs is None:
                raise ValueError("use_viewdirs model needs viewdirs")
            viewdirs_enc = self._encode_views(viewdirs)
        raw_rgb, raw_sigma = self._run_mlp(mlp, pts, viewdirs_enc)
        return raw_rgb[:, 0], raw_sigma[:, 0]

    def eval_points(self, points, viewdirs=None, coarse=False):
        """Decoded (rgb, sigma) at [B, 3] points (models.py:183-214)."""
        raw_rgb, raw_sigma = self.eval_points_raw(points, viewdirs, coarse)
        if self.sh_deg >= 0 or self.sg_dim > 0:
            if viewdirs is None:
                raise ValueError("SH/SG decode needs viewdirs")
            decoded = self._decode_radiance(
                raw_rgb[:, None, :], viewdirs
            )[:, 0]
        else:
            decoded = raw_rgb
        return self.rgb_activation(decoded), self.sigma_activation(raw_sigma)


def validate_activations(rgb_activation: Callable, sigma_activation: Callable):
    """Constructor-time activation range checks (models.py:366-385)."""
    x = jnp.exp(jnp.linspace(-90, 90, 1024))
    x = jnp.concatenate([-x[::-1], x], 0)
    rgb = rgb_activation(x)
    if bool(jnp.any(rgb < 0)) or bool(jnp.any(rgb > 1)):
        raise ValueError("rgb_activation produces colors outside [0, 1]")
    sigma = sigma_activation(x)
    if bool(jnp.any(sigma < 0)):
        raise ValueError("sigma_activation produces negative densities")
