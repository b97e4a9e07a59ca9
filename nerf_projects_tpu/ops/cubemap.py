"""Cubemap direction->texel math (svox2 cubemap_util equivalent).

Parity target: the reference ships cubemap machinery in two places —
a python mirror (`/root/reference/svox2/svox2/utils.py:166-369`:
`dir_to_cubemap_coord`, `cubemap_build_query`, `cubemap_sample`) and a
CUDA header (`csrc/include/cubemap_util.cuh:1-279`). Note that in the
reference the only CUDA *user* of this math (`sample_cubemap_kernel`,
`csrc/misc_kernel.cu:282-470`) is entirely commented out, and the live
background-MSI path samples an equirect grid instead
(`svox2.py:796-870`, `utils.py:599-609` xyz2equirect). This module
exists for component-level parity and for anyone carrying cubemap
environment data.

TPU-first design: everything is branch-free vectorized jnp — face
selection via argmax, per-face (u, v) via a [6, 3] axis-permutation
gather instead of data-dependent indexing, so it jits to pure
gathers/selects. Supports equi-angular cubemaps (EAC) like the
reference.

Modes: "nearest" and "linear" (per-face clamped bilinear — the
reference python calls this `linear_simple`). The reference's
cross-edge `linear` mode is not reproduced: its own python mirror is
marked "FIXME not quite correct" and its CUDA consumer is dead code;
clamped bilerp differs only inside the last half-texel ring of each
face.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# For face f = ax * 2 + ori (ax = dominant axis 0/1/2, ori = sign bit):
# u runs along axis (ax ^ 1) & 1, v along axis (ax ^ 2) & 2 — the same
# convention as the reference so face images are interchangeable.
_U_AXIS = np.array([1, 0, 1], np.int32)  # (ax ^ 1) & 1  per ax
_V_AXIS = np.array([2, 2, 0], np.int32)  # (ax ^ 2) & 2  per ax


def dir_to_cubemap_coord(dirs: jnp.ndarray, face_reso: int, eac: bool = True):
    """Directions [..., 3] (need not be unit) -> (face, u, v).

    face in {0..5} = dominant_axis*2 + (component >= 0); u, v are
    continuous texel coords in [-0.5, face_reso - 0.5] where integer
    values are texel centers (the reference's convention:
    u = ((u_eac + 1) * R - 1) / 2).
    """
    ax = jnp.argmax(jnp.abs(dirs), axis=-1)
    maxv = jnp.take_along_axis(dirs, ax[..., None], axis=-1)[..., 0]
    scaled = dirs / jnp.abs(maxv)[..., None]
    if eac:
        scaled = jnp.arctan(scaled) * (4.0 / jnp.pi)
    u_ax = jnp.asarray(_U_AXIS)[ax]
    v_ax = jnp.asarray(_V_AXIS)[ax]
    ue = jnp.take_along_axis(scaled, u_ax[..., None], axis=-1)[..., 0]
    ve = jnp.take_along_axis(scaled, v_ax[..., None], axis=-1)[..., 0]
    ori = (maxv >= 0).astype(jnp.int32)
    face = ax.astype(jnp.int32) * 2 + ori
    u = ((ue + 1.0) * face_reso - 1.0) * 0.5
    v = ((ve + 1.0) * face_reso - 1.0) * 0.5
    return face, u, v


def cubemap_sample(
    cubemap: jnp.ndarray,
    dirs: jnp.ndarray,
    *,
    eac: bool = True,
    mode: str = "linear",
) -> jnp.ndarray:
    """Sample a [6, R, R, C] cubemap at directions [..., 3] -> [..., C]."""
    R = cubemap.shape[1]
    face, u, v = dir_to_cubemap_coord(dirs, R, eac=eac)
    if mode == "nearest":
        ui = jnp.clip(jnp.floor(u + 0.5).astype(jnp.int32), 0, R - 1)
        vi = jnp.clip(jnp.floor(v + 0.5).astype(jnp.int32), 0, R - 1)
        return cubemap[face, ui, vi]
    if mode != "linear":
        raise ValueError(f"unknown cubemap sample mode: {mode}")
    uc = jnp.clip(u, 0.0, R - 1.0)
    vc = jnp.clip(v, 0.0, R - 1.0)
    u0 = jnp.clip(jnp.floor(uc).astype(jnp.int32), 0, R - 2)
    v0 = jnp.clip(jnp.floor(vc).astype(jnp.int32), 0, R - 2)
    du = (uc - u0)[..., None]
    dv = (vc - v0)[..., None]
    c00 = cubemap[face, u0, v0]
    c01 = cubemap[face, u0, v0 + 1]
    c10 = cubemap[face, u0 + 1, v0]
    c11 = cubemap[face, u0 + 1, v0 + 1]
    r0 = c00 * (1 - dv) + c01 * dv
    r1 = c10 * (1 - dv) + c11 * dv
    return r0 * (1 - du) + r1 * du


def cubemap_coord_to_dir(face: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                         face_reso: int, eac: bool = True) -> jnp.ndarray:
    """Inverse of dir_to_cubemap_coord (unit-cube directions, |max|=1)."""
    ue = (u * 2.0 + 1.0) / face_reso - 1.0
    ve = (v * 2.0 + 1.0) / face_reso - 1.0
    if eac:
        ue = jnp.tan(ue * (jnp.pi / 4.0))
        ve = jnp.tan(ve * (jnp.pi / 4.0))
    ax = face // 2
    sign = (face % 2).astype(jnp.float32) * 2.0 - 1.0
    u_ax = jnp.asarray(_U_AXIS)[ax]
    v_ax = jnp.asarray(_V_AXIS)[ax]
    out = jnp.zeros(face.shape + (3,), jnp.float32)
    idx = jnp.arange(3)
    # one-hot scatter (branch-free): component = sign where idx==ax, etc.
    out = (
        jnp.where(idx == ax[..., None], sign[..., None], 0.0)
        + jnp.where(idx == u_ax[..., None], ue[..., None], 0.0)
        + jnp.where(idx == v_ax[..., None], ve[..., None], 0.0)
    )
    return out
