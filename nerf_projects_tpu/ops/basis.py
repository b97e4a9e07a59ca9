"""Learned color-basis families for the Plenoxels grid.

Parity target: svox2's three `basis_type`s (defs.py:1-4,
svox2.py:355-535, 2262-2296):
  * BASIS_TYPE_SH (1) — analytic real SH (ops/sh.py, the default);
  * BASIS_TYPE_3D_TEXTURE (4) — a learnable [reso^3, basis_dim] volume;
    the basis for a view direction is the TRILINEAR sample of that
    volume at the point `dir` inside the [-1, 1]^3 cube
    (grid_sample align_corners=True, zeros padding — svox2.py:2262);
  * BASIS_TYPE_MLP (255) — a hard-coded 4-layer ReLU MLP width
    `mlp_width` from (optionally posenc'd) directions to basis_dim,
    passed through sigmoid at use (svox2.py:2270-2282, 673-675).

`reinit_learned_basis` mirrors reinit_learned_bases (svox2.py:2284+):
seed the texture with SH values or random spherical Gaussians so
training starts from a sane spherical function.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.ops.sh import eval_sh_bases

BASIS_TYPE_SH = 1
BASIS_TYPE_3D_TEXTURE = 4
BASIS_TYPE_MLP = 255


def eval_basis_3d(basis_data: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of basis_data [r, r, r, B] at unit dirs [..., 3]
    embedded in [-1, 1]^3 (align_corners=True, zeros outside)."""
    r = basis_data.shape[0]
    B = basis_data.shape[-1]
    g = (dirs + 1.0) * 0.5 * (r - 1)  # [..., 3]
    l = jnp.floor(g).astype(jnp.int32)
    w = g - l
    out = jnp.zeros(dirs.shape[:-1] + (B,), basis_data.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                c = l + jnp.asarray([dx, dy, dz])
                inside = jnp.all((c >= 0) & (c <= r - 1), axis=-1)
                cc = jnp.clip(c, 0, r - 1)
                vals = basis_data[cc[..., 0], cc[..., 1], cc[..., 2]]
                cw = (
                    (w[..., 0] if dx else 1 - w[..., 0])
                    * (w[..., 1] if dy else 1 - w[..., 1])
                    * (w[..., 2] if dz else 1 - w[..., 2])
                )
                out = out + jnp.where(
                    inside[..., None], vals * cw[..., None], 0.0
                )
    return out


def init_basis_3d(basis_reso: int = 16, basis_dim: int = 9) -> jnp.ndarray:
    return jnp.zeros((basis_reso, basis_reso, basis_reso, basis_dim),
                     jnp.float32)


def init_basis_mlp(
    key: jax.Array,
    basis_dim: int = 9,
    *,
    mlp_width: int = 16,
    mlp_posenc_size: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Params of the hard-coded 4-layer basis MLP (svox2.py:470-482)."""
    d_in = 3 + 6 * mlp_posenc_size
    dims = [d_in, mlp_width, mlp_width, mlp_width, basis_dim]
    params = {}
    for i in range(4):
        key, k = jax.random.split(key)
        # Kaiming-uniform-ish init (torch Linear default scale)
        bound = 1.0 / np.sqrt(dims[i])
        params[f"w{i}"] = jax.random.uniform(
            k, (dims[i], dims[i + 1]), minval=-bound, maxval=bound
        )
        params[f"b{i}"] = jnp.zeros((dims[i + 1],))
    return params


def _posenc_dirs(dirs: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    if n_freqs <= 0:
        return dirs
    freqs = 2.0 ** jnp.arange(n_freqs)
    ang = dirs[..., None, :] * freqs[:, None]  # [..., F, 3]
    enc = jnp.concatenate(
        [jnp.sin(ang), jnp.cos(ang)], axis=-1
    ).reshape(dirs.shape[:-1] + (6 * n_freqs,))
    return jnp.concatenate([dirs, enc], axis=-1)


def eval_basis_mlp(
    params: Dict[str, jnp.ndarray],
    dirs: jnp.ndarray,
    *,
    mlp_posenc_size: int = 0,
) -> jnp.ndarray:
    """Raw MLP output (the caller applies sigmoid, matching
    svox2.py:675/903 `torch.sigmoid(self._eval_basis_mlp(...))`)."""
    x = _posenc_dirs(dirs, mlp_posenc_size)
    for i in range(4):
        x = x @ params[f"w{i}"] + params[f"b{i}"]
        if i < 3:
            x = jax.nn.relu(x)
    return x


def eval_basis(
    basis_type: int,
    basis_dim: int,
    dirs: jnp.ndarray,
    *,
    basis_data: Optional[jnp.ndarray] = None,
    mlp_params: Optional[Dict[str, jnp.ndarray]] = None,
    mlp_posenc_size: int = 0,
) -> jnp.ndarray:
    """sh_mult for any basis type — the dispatch at svox2.py:671-677."""
    if basis_type == BASIS_TYPE_3D_TEXTURE:
        return eval_basis_3d(basis_data, dirs)
    if basis_type == BASIS_TYPE_MLP:
        return jax.nn.sigmoid(
            eval_basis_mlp(mlp_params, dirs, mlp_posenc_size=mlp_posenc_size)
        )
    return eval_sh_bases(basis_dim, dirs)


def reinit_learned_basis(
    basis_data: jnp.ndarray,
    key: jax.Array,
    *,
    init_type: str = "sh",
    sg_lambda_max: float = 1.0,
    upper_hemi: bool = False,
) -> jnp.ndarray:
    """Seed the 3D-texture basis with SH or spherical-Gaussian values
    evaluated at each texel's direction (svox2.py reinit_learned_bases)."""
    r = basis_data.shape[0]
    B = basis_data.shape[-1]
    ax = jnp.linspace(-1.0, 1.0, r)
    X, Y, Z = jnp.meshgrid(ax, ax, ax, indexing="ij")
    pts = jnp.stack([X, Y, Z], -1)  # [r, r, r, 3]
    norms = jnp.maximum(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1e-6)
    dirs = pts / norms

    if init_type == "sh":
        vals = eval_sh_bases(B, dirs.reshape(-1, 3)).reshape(r, r, r, B)
    elif init_type == "sg":
        k1, k2 = jax.random.split(key)
        mu = jax.random.normal(k1, (B, 3))
        mu = mu / jnp.linalg.norm(mu, axis=-1, keepdims=True)
        if upper_hemi:
            mu = mu.at[:, 2].set(-jnp.abs(mu[:, 2]))
        lam = jax.random.uniform(k2, (B,), minval=0.0, maxval=sg_lambda_max)
        dot = jnp.einsum("xyzc,bc->xyzb", dirs, mu)
        vals = jnp.exp(lam * (dot - 1.0))
    else:
        raise ValueError(f"unknown init_type {init_type}")
    return vals.astype(basis_data.dtype)
