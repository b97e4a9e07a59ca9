"""Real spherical-harmonic basis evaluation and projection (degrees 0-4).

Behavioral parity with the reference's three SH implementations —
plenoctree/nerf_sh/nerf/sh.py:54-109 (`eval_sh`), octree/nerf/sh_proj.py
(`EvalSH`, `ProjectFunctionNeRF`), svox2/svox2/utils.py:114-165
(`eval_sh_bases`) — which all hardcode the standard real-SH polynomial
constants. The constants below are the canonical Condon–Shortley real SH
normalization factors (public mathematical constants).

TPU notes: basis evaluation is pure VPU elementwise work on [..., 3] dirs;
`eval_sh` contracts [..., C, B] coeffs with [..., B] bases — shaped as a
fused multiply-add chain that XLA folds into the surrounding pipeline.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
SH_C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)

MAX_SH_DEGREE = 4


def eval_sh_bases(basis_dim: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH basis values at unit directions.

    Args:
      basis_dim: (deg+1)^2 for deg in 0..4 (1, 4, 9, 16, 25). The svox2
        variant also admits non-square dims (truncated bands); we accept
        any 1 <= basis_dim <= 25 and truncate.
      dirs: [..., 3] unit vectors.

    Returns: [..., basis_dim].
    """
    if not (1 <= basis_dim <= 25):
        raise ValueError(f"basis_dim must be in [1, 25], got {basis_dim}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    comps = [SH_C0 * one]
    if basis_dim > 1:
        comps += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if basis_dim > 4:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        comps += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if basis_dim > 9:
        comps += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    if basis_dim > 16:
        comps += [
            SH_C4[0] * xy * (xx - yy),
            SH_C4[1] * yz * (3.0 * xx - yy),
            SH_C4[2] * xy * (7.0 * zz - 1.0),
            SH_C4[3] * yz * (7.0 * zz - 3.0),
            SH_C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            SH_C4[5] * xz * (7.0 * zz - 3.0),
            SH_C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            SH_C4[7] * xz * (xx - 3.0 * yy),
            SH_C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(comps[:basis_dim], axis=-1)


def eval_sh(deg: int, sh_coeffs: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH-encoded functions at directions.

    Args:
      deg: SH degree (0..4).
      sh_coeffs: [..., C, (deg+1)^2] per-channel coefficients.
      dirs: [..., 3] unit directions (broadcastable to sh_coeffs[...]).

    Returns: [..., C] decoded values (raw; caller applies activation).
    """
    basis_dim = (deg + 1) ** 2
    if sh_coeffs.shape[-1] != basis_dim:
        raise ValueError(
            f"expected trailing dim {basis_dim} for deg {deg}, got {sh_coeffs.shape[-1]}"
        )
    basis = eval_sh_bases(basis_dim, dirs)  # [..., B]
    return jnp.sum(sh_coeffs * basis[..., None, :], axis=-1)


# ---------------------------------------------------------------------------
# SH projection of a view-dependent radiance function
# (parity: octree/nerf/sh_proj.py:241-346)
# ---------------------------------------------------------------------------

def spherical_uniform_dirs(key: jax.Array, n: int) -> jnp.ndarray:
    """n uniform unit directions (area-uniform on S^2)."""
    u = jax.random.uniform(key, (n, 2))
    z = 1.0 - 2.0 * u[:, 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[:, 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def project_function_sh(
    fn_vals: jnp.ndarray, dirs: jnp.ndarray, deg: int
) -> jnp.ndarray:
    """Monte-Carlo SH projection.

    Args:
      fn_vals: [N_pts, N_dirs, C] function samples at `dirs`.
      dirs: [N_dirs, 3] uniform unit directions.
      deg: target SH degree.

    Returns: [N_pts, C, (deg+1)^2] coefficients, using the 4*pi/N
    Monte-Carlo weight (sh_proj.py:278-306).
    """
    basis_dim = (deg + 1) ** 2
    basis = eval_sh_bases(basis_dim, dirs)  # [N_dirs, B]
    weight = 4.0 * jnp.pi / dirs.shape[0]
    # [N_pts, C, B] = sum_d fn[N,d,C] * basis[d,B]
    return weight * jnp.einsum("ndc,db->ncb", fn_vals, basis)


def project_function_sh_lstsq(
    fn_vals: jnp.ndarray, dirs: jnp.ndarray, deg: int
) -> jnp.ndarray:
    """Least-squares SH projection (sh_proj.py:308-346 variant).

    Solves basis @ coeffs ~= fn_vals per point/channel; more accurate than
    Monte-Carlo at low sample counts.
    """
    basis_dim = (deg + 1) ** 2
    basis = eval_sh_bases(basis_dim, dirs)  # [D, B]
    gram_inv = jnp.linalg.pinv(basis.T @ basis)  # [B, B]
    # coeffs [N, C, B]
    return jnp.einsum("ndc,db,be->nce", fn_vals, basis, gram_inv)
