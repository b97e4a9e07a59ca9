"""Background MSI (multi-sphere image) model for unbounded scenes.

Parity target: svox2's optional background model (svox2.py:497-521
background links/data, render_lerp_kernel_cuvol.cu:386-611 background
forward/backward, cubemap_util.cuh): `background_nlayers` concentric
spheres outside the foreground grid, each storing RGBA, composited behind
the foreground with the remaining transmittance.

TPU-first re-design: the reference parameterizes each sphere as a cubemap
(6 faces, per-face bilinear with edge handling — heavy branching); here
each layer is an equirectangular [H, W, 4] panorama sampled bilinearly —
branch-free, identical capability. Sphere radii follow the reference's
inverse-depth spacing r_i = 1 / (1 - i/n) (the MSI convention), and rays
intersect the spheres via the same concentric-spheres stepping
(ConcentricSpheresIntersector, svox2/svox2/utils.py:370-416).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BackgroundMSI(NamedTuple):
    """Equirect multi-sphere image: data [nlayers, H, W, 4] (rgb logits +
    density), radii [nlayers] (world units, increasing)."""

    data: jnp.ndarray
    radii: np.ndarray

    @staticmethod
    def create(
        nlayers: int = 16,
        reso: int = 128,
        *,
        inner_radius: float = 1.0,
        init_density: float = 0.1,
    ) -> "BackgroundMSI":
        # inverse-depth spacing: r_i = inner / (1 - i/n), last layer at
        # ~n*inner (far "infinity" shell), matching the reference's MSI
        # layout (svox2.py background init).
        i = np.arange(nlayers, dtype=np.float64)
        radii = inner_radius / (1.0 - i / nlayers)
        data = jnp.zeros((nlayers, reso, 2 * reso, 4), jnp.float32)
        if init_density:
            data = data.at[..., 3].set(init_density)
        return BackgroundMSI(data=data, radii=radii.astype(np.float32))


def _equirect_uv(dirs: jnp.ndarray):
    """Unit dirs [..., 3] -> (u, v) in [0, 1): longitude/latitude."""
    lon = jnp.arctan2(dirs[..., 0], -dirs[..., 2])  # [-pi, pi]
    lat = jnp.arcsin(jnp.clip(dirs[..., 1], -1.0, 1.0))  # [-pi/2, pi/2]
    u = (lon / (2 * jnp.pi)) + 0.5
    v = 0.5 - lat / jnp.pi
    return u, v


def sample_equirect(img: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear panorama sample. img [H, W, C]; dirs [..., 3] unit."""
    H, W = img.shape[:2]
    u, v = _equirect_uv(dirs)
    x = u * W - 0.5
    y = jnp.clip(v * H - 0.5, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0w = jnp.mod(x0, W)
    x1w = jnp.mod(x0 + 1, W)  # wrap longitude
    c00 = img[y0, x0w]
    c01 = img[y0, x1w]
    c10 = img[y0 + 1, x0w]
    c11 = img[y0 + 1, x1w]
    return (
        c00 * (1 - wx) * (1 - wy)
        + c01 * wx * (1 - wy)
        + c10 * (1 - wx) * wy
        + c11 * wx * wy
    )


def _sphere_exit_t(origins, dirs, radius):
    """t of the FAR intersection of |o + t d| = radius (NaN-free; rays are
    assumed to start inside the sphere, as MSI rays do)."""
    a = jnp.sum(dirs * dirs, axis=-1)
    b = 2.0 * jnp.sum(origins * dirs, axis=-1)
    c = jnp.sum(origins * origins, axis=-1) - radius**2
    disc = jnp.maximum(b * b - 4 * a * c, 0.0)
    return (-b + jnp.sqrt(disc)) / (2.0 * a)


def render_background(
    msi: BackgroundMSI,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    transmittance: jnp.ndarray,
    *,
    background_brightness: float = 1.0,
):
    """Composite the MSI behind the foreground.

    origins/dirs: [R, 3] world rays; transmittance: [R] leftover T after
    the foreground march. Returns rgb contribution [R, 3] (already scaled
    by T) — add to the foreground color instead of T * brightness.
    """
    n_layers = msi.data.shape[0]
    world_len = jnp.linalg.norm(dirs, axis=-1)
    radii = jnp.asarray(msi.radii)

    def layer(carry, i):
        log_T, rgb_acc, prev_t = carry
        radius = radii[i]
        t = _sphere_exit_t(origins, dirs, radius)
        pts = origins + t[:, None] * dirs
        pdirs = pts / jnp.maximum(
            jnp.linalg.norm(pts, axis=-1, keepdims=True), 1e-9
        )
        vals = sample_equirect(msi.data[i], pdirs)  # [R, 4]
        rgb = jax.nn.sigmoid(vals[:, :3])
        sigma = jax.nn.relu(vals[:, 3])
        seg = jnp.maximum(t - prev_t, 0.0) * world_len
        tau = sigma * seg
        alpha = 1.0 - jnp.exp(-tau)
        w = jnp.exp(log_T) * alpha
        return (log_T - tau, rgb_acc + w[:, None] * rgb, t), None

    init = (jnp.log(jnp.maximum(transmittance, 1e-10)), jnp.zeros(origins.shape[:1] + (3,)), jnp.zeros(origins.shape[0]))
    (log_T, rgb_acc, _), _ = jax.lax.scan(layer, init, jnp.arange(n_layers))
    # whatever survives all shells hits the solid background color
    rgb_acc = rgb_acc + jnp.exp(log_T)[:, None] * background_brightness
    return rgb_acc


# ---------------------------------------------------------------------------
# Reference-layout background (svox2 checkpoint interop)
# ---------------------------------------------------------------------------


class ReferenceBackground(NamedTuple):
    """svox2's background MSI exactly as stored in its npz checkpoints
    (svox2.py:497-521, 1546-1548): `links` int32 [2*reso (lon), reso
    (lat)] indexing rows of `data` [capacity, nlayers, 4] (rgb as SH-DC
    logits, density). -1 links = pruned texels."""

    data: jnp.ndarray   # [cap, nlayers, 4]
    links: jnp.ndarray  # int32 [2*reso, reso]

    @property
    def nlayers(self) -> int:
        return self.data.shape[1]

    @property
    def reso(self) -> int:
        return self.links.shape[1]


SH_C0 = 0.28209479177387814


def xyz2equirect(dirs: jnp.ndarray, reso: int) -> jnp.ndarray:
    """Unit dirs [..., 3] -> continuous equirect pixel coords [..., 2]
    in the REFERENCE convention (svox2/svox2/utils.py:599-609):
    x = 2*reso*(0.5 + atan2(dx, dz)/2pi) in [0, 2*reso),
    y = reso*(0.5 - asin(dy)/pi) in [0, reso]."""
    lat = jnp.arcsin(jnp.clip(dirs[..., 1], -1.0, 1.0))
    lon = jnp.arctan2(dirs[..., 0], dirs[..., 2])
    x = reso * 2 * (0.5 + lon / (2 * jnp.pi))
    y = reso * (0.5 - lat / jnp.pi)
    return jnp.stack([x, y], axis=-1)


def equirect2xyz(xy: jnp.ndarray, reso: int) -> jnp.ndarray:
    """Inverse of xyz2equirect (unit directions)."""
    lon = (xy[..., 0] / (2 * reso) - 0.5) * (2 * jnp.pi)
    lat = (0.5 - xy[..., 1] / reso) * jnp.pi
    cl = jnp.cos(lat)
    return jnp.stack(
        [cl * jnp.sin(lon), jnp.sin(lat), cl * jnp.cos(lon)], axis=-1
    )


def _fetch_bg(bg: ReferenceBackground, lx, ly, lz):
    """links-indirect fetch with pruned texels reading 0 (svox2.py:809)."""
    lnk = bg.links[lx, ly]
    vals = bg.data[jnp.maximum(lnk, 0), lz]
    return jnp.where((lnk >= 0)[..., None], vals, 0.0)


def sample_reference_background(
    bg: ReferenceBackground, sphdirs: jnp.ndarray, invr: jnp.ndarray
) -> jnp.ndarray:
    """Trilinear (lon, lat, layer) fetch at unit sphere points, matching
    the reference python path (svox2.py:833-866): x wraps mod 2*reso,
    y wraps mod reso, layer index z = (1-invr)*nlayers - 0.5 clamped."""
    n_layers = bg.nlayers
    reso = bg.reso
    xy = xyz2equirect(sphdirs, reso)
    z = jnp.clip((1.0 - invr) * n_layers - 0.5, 0.0, n_layers - 1.0)
    pts = jnp.concatenate([xy, z[..., None]], axis=-1)
    l = jnp.floor(pts).astype(jnp.int32)
    l = jnp.minimum(
        l, jnp.asarray([2 * reso - 1, reso - 1, n_layers - 2], jnp.int32)
    )
    wb = pts - l
    wa = 1.0 - wb
    lx, ly, lz = l[..., 0], l[..., 1], l[..., 2]
    lnx = (lx + 1) % (2 * reso)
    lny = (ly + 1) % reso
    lnz = lz + 1
    v000 = _fetch_bg(bg, lx, ly, lz)
    v001 = _fetch_bg(bg, lx, ly, lnz)
    v010 = _fetch_bg(bg, lx, lny, lz)
    v011 = _fetch_bg(bg, lx, lny, lnz)
    v100 = _fetch_bg(bg, lnx, ly, lz)
    v101 = _fetch_bg(bg, lnx, ly, lnz)
    v110 = _fetch_bg(bg, lnx, lny, lz)
    v111 = _fetch_bg(bg, lnx, lny, lnz)
    c00 = v000 * wa[..., 2:] + v001 * wb[..., 2:]
    c01 = v010 * wa[..., 2:] + v011 * wb[..., 2:]
    c10 = v100 * wa[..., 2:] + v101 * wb[..., 2:]
    c11 = v110 * wa[..., 2:] + v111 * wb[..., 2:]
    c0 = c00 * wa[..., 1:2] + c01 * wb[..., 1:2]
    c1 = c10 * wa[..., 1:2] + c11 * wb[..., 1:2]
    return c0 * wa[..., :1] + c1 * wb[..., :1]


def render_background_reference(
    bg: ReferenceBackground,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    transmittance: jnp.ndarray,
    *,
    radius,
    center,
    step_size: float = 0.5,
    background_brightness: float = 1.0,
):
    """Reference-faithful MSI composite for svox2 checkpoints.

    Mirrors the python twin path (svox2.py:796-883): rays are mapped to
    the normalized sphere frame ((o - center)/radius with the foreground
    AABB inscribed in the unit sphere), marched over n_steps =
    nlayers/step_size + 2 concentric shells at r_i = n/(n - i - 0.5),
    starting outside each ray's inner radius max(||o x d||, 1); each
    segment trilerps (lon, lat, inverse-radius layer), decodes rgb as
    SH-DC (c*C0 + 0.5, clamped at 0) and attenuates by
    exp(-world_step * relu(sigma) * dt). origins/dirs are world rays
    (dirs unit); transmittance [R] is the leftover foreground T.
    Returns the rgb contribution [R, 3] including the solid
    background_brightness floor.
    """
    radius = jnp.asarray(radius, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    o_n = (origins - center) / radius
    d_s = dirs / radius
    inorm = 1.0 / jnp.linalg.norm(d_s, axis=-1)
    d_n = d_s * inorm[..., None]
    # normalized-frame dt -> world length (reference world_step_scale)
    world_step = inorm

    n_layers = bg.nlayers
    n_steps = int(n_layers / step_size) + 2

    inner_radius = jnp.maximum(
        jnp.linalg.norm(jnp.cross(o_n, d_n), axis=-1) + 1e-3, 1.0
    )
    qb = jnp.sum(o_n * d_n, axis=-1)
    c0 = jnp.sum(o_n * o_n, axis=-1)

    def far_t(r):
        det = qb * qb - (c0 - r * r)
        ok = det >= 0
        return ok, jnp.where(ok, -qb + jnp.sqrt(jnp.maximum(det, 0.0)), 0.0)

    _, t_inner = far_t(inner_radius)

    def step(carry, i):
        log_T, rgb_acc, t_last = carry
        r = n_steps / (n_steps - i.astype(jnp.float32) - 0.5)
        ok, t = far_t(r)
        active = ok & (r >= inner_radius)
        t_mid = (t + t_last) * 0.5
        sphpos = o_n + t_mid[..., None] * d_n
        norm = jnp.linalg.norm(sphpos, axis=-1)
        invr_mid = 1.0 / jnp.maximum(norm, 1e-9)
        sphdir = sphpos * invr_mid[..., None]
        rgba = sample_reference_background(bg, sphdir, invr_mid)
        sigma = jax.nn.relu(rgba[..., 3])
        log_att = -world_step * sigma * jnp.maximum(t - t_last, 0.0)
        weight = jnp.exp(log_T) * (1.0 - jnp.exp(log_att))
        rgb = jnp.maximum(rgba[..., :3] * SH_C0 + 0.5, 0.0)
        weight = jnp.where(active, weight, 0.0)
        rgb_acc = rgb_acc + weight[..., None] * rgb
        log_T = jnp.where(active, log_T + log_att, log_T)
        t_last = jnp.where(active, t, t_last)
        return (log_T, rgb_acc, t_last), None

    init = (
        jnp.log(jnp.maximum(transmittance, 1e-10)),
        jnp.zeros(origins.shape[:-1] + (3,)),
        t_inner,
    )
    (log_T, rgb_acc, _), _ = jax.lax.scan(step, init, jnp.arange(n_steps))
    return rgb_acc + jnp.exp(log_T)[..., None] * background_brightness


def reference_to_msi(bg: ReferenceBackground, radius=None) -> BackgroundMSI:
    """Resample a reference background into our equirect BackgroundMSI
    (for continued training). Direction-space bilinear resample per
    layer; rgb logits converted SH-DC -> sigmoid-logit (clipped where
    the SH-DC decode saturates)."""
    n_layers, reso = bg.nlayers, bg.reso
    H, W = reso, 2 * reso
    # our texel-center directions (ops/background.py _equirect_uv inverse)
    u = (jnp.arange(W) + 0.5) / W
    v = (jnp.arange(H) + 0.5) / H
    lon = (u - 0.5) * 2 * jnp.pi
    lat = (0.5 - v) * jnp.pi
    cl = jnp.cos(lat)[:, None]
    dirs = jnp.stack(
        [
            cl * jnp.sin(lon)[None, :],
            jnp.broadcast_to(jnp.sin(lat)[:, None], (H, W)),
            cl * (-jnp.cos(lon))[None, :],
        ],
        axis=-1,
    )  # matches _equirect_uv: lon = atan2(x, -z)
    layers = []
    for i in range(n_layers):
        invr = 1.0 - (i + 0.5) / n_layers
        vals = sample_reference_background(
            bg, dirs.reshape(-1, 3), jnp.full((H * W,), invr)
        ).reshape(H, W, 4)
        rgb01 = jnp.clip(vals[..., :3] * SH_C0 + 0.5, 1e-4, 1 - 1e-4)
        logits = jnp.log(rgb01) - jnp.log1p(-rgb01)
        layers.append(jnp.concatenate([logits, vals[..., 3:]], axis=-1))
    i = np.arange(n_layers, dtype=np.float64)
    radii = 1.0 / (1.0 - (i + 0.5) / n_layers)
    return BackgroundMSI(
        data=jnp.stack(layers), radii=radii.astype(np.float32)
    )


def load_reference_background(path: str):
    """Pull background arrays out of a svox2 npz checkpoint (or None)."""
    z = np.load(path)
    if "background_data" not in z:
        return None
    return ReferenceBackground(
        data=jnp.asarray(z["background_data"].astype(np.float32)),
        links=jnp.asarray(z["background_links"].astype(np.int32)),
    )


def save_reference_background(path_dict: dict, bg: ReferenceBackground):
    """Add reference-schema background keys to a npz save dict."""
    path_dict["background_data"] = np.asarray(bg.data, np.float32)
    path_dict["background_links"] = np.asarray(bg.links, np.int32)


def background_tv_loss(msi: BackgroundMSI) -> jnp.ndarray:
    """TV over each layer's panorama + across layers
    (inplace_tv_background_grad equivalent, svox2.py:1930)."""
    d = msi.data
    tv_h = jnp.mean(jnp.square(d[:, 1:] - d[:, :-1]))
    tv_w = jnp.mean(jnp.square(d[:, :, 1:] - d[:, :, :-1]))
    tv_l = jnp.mean(jnp.square(d[1:] - d[:-1]))
    return tv_h + tv_w + tv_l
