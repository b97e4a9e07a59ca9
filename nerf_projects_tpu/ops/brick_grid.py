"""Brick-major sparse voxel storage — the TPU-native layout for the
Plenoxels grid renderer.

Why bricks: the reference's cuvol CUDA kernels
(svox2/svox2/csrc/render_lerp_kernel_cuvol.cu:30-120) gather 8 corner
cells per sample through the `links` indirection — cheap on a GPU's
cache hierarchy, catastrophic on TPU where every gathered row is a
serialized transfer (round-1 measurement: 78-140 Mrows/s regardless of
row width; a 256-cube render spent >90% of its time in gathers).

The fix is to make gathers FEW and WIDE instead of many and narrow:
  * cells are stored in 8x8x8 bricks; a brick is one contiguous row
    ([512] density floats, [512, 3*basis_dim] SH);
  * a coherent ray tile marching in lockstep reads a 2x2x2-brick window
    (16^3 cells) per chunk of steps — 8 wide row gathers replace ~12k
    narrow corner gathers;
  * trilinear interpolation inside the window becomes separable
    hat-matrix contractions that run on the MXU (ops/tile_render.py);
  * gradients transpose to wide row scatter-adds.

`brick_links` [BX, BY, BZ] maps brick coords to compact brick rows
(-1 = brick entirely empty), the brick-level analog of the reference's
cell-level links (svox2.py:355-535). Cells that were empty inside an
active brick hold zeros — identical render semantics to an empty cell
(zero density contributes nothing; zero SH only matters where weight>0,
which requires density>0). `cell_mask` preserves the exact cell-level
occupancy for round-tripping and for keeping dead cells dead during
training.
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.models.sparse_grid import SparseGrid

BRICK = 8  # brick edge in cells; window = 2x2x2 bricks = 16^3 cells


@dataclass
class BrickGrid:
    """Pytree: brick_links static per topology; data leaves differentiable."""

    brick_links: jnp.ndarray     # int32 [BX, BY, BZ], -1 = empty brick
    density_bricks: jnp.ndarray  # [nb, 512]
    sh_bricks: jnp.ndarray       # [nb, 512, 3*basis_dim]
    cell_mask: jnp.ndarray       # bool [nb, 512] — active cells
    brick_coords: jnp.ndarray    # int32 [nb, 3] — brick xyz of each row
    reso: Tuple[int, int, int]   # original cell resolution (pre-padding)
    radius: np.ndarray           # [3]
    center: np.ndarray           # [3]
    basis_dim: int = 9

    @property
    def n_bricks(self) -> int:
        return self.density_bricks.shape[0]

    @property
    def bricks_shape(self) -> Tuple[int, int, int]:
        return tuple(self.brick_links.shape)

    def world_to_grid(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Same voxel-unit transform as SparseGrid.world_to_grid — sample
        points land on integer coordinates."""
        reso = jnp.asarray(self.reso, jnp.float32)
        scale = reso * 0.5
        offset = reso * 0.5 - 0.5
        unit = (pts - jnp.asarray(self.center)) / jnp.asarray(self.radius)
        return unit * scale + offset

    # -- pytree ------------------------------------------------------------

    def tree_flatten(self):
        return (
            (self.brick_links, self.density_bricks, self.sh_bricks,
             self.cell_mask, self.brick_coords),
            (self.reso, self.radius.tobytes(), self.center.tobytes(),
             self.basis_dim),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        reso, radius_b, center_b, basis_dim = aux
        return cls(
            brick_links=children[0],
            density_bricks=children[1],
            sh_bricks=children[2],
            cell_mask=children[3],
            brick_coords=children[4],
            reso=reso,
            radius=np.frombuffer(radius_b, np.float32).copy(),
            center=np.frombuffer(center_b, np.float32).copy(),
            basis_dim=basis_dim,
        )


jax.tree_util.register_pytree_node(
    BrickGrid, BrickGrid.tree_flatten, BrickGrid.tree_unflatten
)


def _brick_view(dense: np.ndarray, BX: int, BY: int, BZ: int):
    """[BX*8, BY*8, BZ*8, ...] -> [BX, BY, BZ, 512, ...]."""
    tail = dense.shape[3:]
    v = dense.reshape(BX, BRICK, BY, BRICK, BZ, BRICK, *tail)
    v = np.moveaxis(v, (1, 3), (3, 4))  # [BX, BY, BZ, 8, 8, 8, ...]
    return v.reshape(BX, BY, BZ, BRICK**3, *tail)


def from_sparse_grid(grid: SparseGrid) -> BrickGrid:
    """Host-side conversion SparseGrid -> BrickGrid (npz-interop bridge)."""
    links = np.asarray(grid.links)
    X, Y, Z = links.shape
    BX, BY, BZ = -(-X // BRICK), -(-Y // BRICK), -(-Z // BRICK)
    pad = (BX * BRICK - X, BY * BRICK - Y, BZ * BRICK - Z)
    if any(pad):
        links = np.pad(
            links, [(0, pad[0]), (0, pad[1]), (0, pad[2])],
            constant_values=-1,
        )
    lb = _brick_view(links, BX, BY, BZ)  # [BX, BY, BZ, 512]
    active = (lb >= 0).any(axis=-1)
    nb = int(active.sum())
    brick_links = np.full((BX, BY, BZ), -1, np.int32)
    brick_links[active] = np.arange(nb, dtype=np.int32)

    brick_coords = np.argwhere(active).astype(np.int32)  # [nb, 3]

    cell_links = lb[active]  # [nb, 512]
    mask = cell_links >= 0
    safe = np.maximum(cell_links, 0)
    density = np.asarray(grid.density_data)[:, 0][safe] * mask
    sh = np.asarray(grid.sh_data)[safe] * mask[..., None]
    return BrickGrid(
        brick_links=jnp.asarray(brick_links),
        density_bricks=jnp.asarray(density.astype(np.float32)),
        sh_bricks=jnp.asarray(
            sh.reshape(nb, BRICK**3, -1).astype(np.float32)
        ),
        cell_mask=jnp.asarray(mask),
        brick_coords=jnp.asarray(brick_coords),
        reso=(X, Y, Z),
        radius=np.asarray(grid.radius, np.float32).copy(),
        center=np.asarray(grid.center, np.float32).copy(),
        basis_dim=grid.basis_dim,
    )


def create_brick_grid(
    reso,
    *,
    basis_dim: int = 9,
    radius=1.0,
    center=(0.0, 0.0, 0.0),
    use_sphere_bound: bool = True,
    init_density: float = 0.0,
    data_dtype=jnp.float32,
    alloc_data: bool = True,
) -> BrickGrid:
    """Build a BrickGrid directly, with the heavy per-cell arrays created
    ON DEVICE (no [reso^3] host numpy, no multi-GB host->HBM transfer —
    SparseGrid.create + from_sparse_grid at 512^3 moves ~16 GB through
    the host, which times out through the TPU relay).

    Brick-level occupancy is computed host-side at brick resolution
    (tiny); the exact cell-level sphere mask (same semantics as
    SparseGrid.create's use_sphere_bound, svox2 ctor svox2.py:420-447)
    is computed on device per active brick row.
    """
    if isinstance(reso, int):
        reso = (reso, reso, reso)
    X, Y, Z = (int(r) for r in reso)
    if any(r % BRICK for r in (X, Y, Z)):
        raise ValueError(f"reso {reso} must be brick-aligned ({BRICK})")
    BX, BY, BZ = X // BRICK, Y // BRICK, Z // BRICK
    rs = np.asarray([X, Y, Z], np.float64)
    voxel_diag = float(np.linalg.norm(2.0 / rs)) * 0.5
    thresh2 = (1.0 + voxel_diag) ** 2

    if use_sphere_bound:
        # brick is active iff its CLOSEST point to the sphere center is
        # inside the threshold sphere (superset of the per-cell test)
        bi, bj, bk = np.meshgrid(
            np.arange(BX), np.arange(BY), np.arange(BZ), indexing="ij"
        )
        lo = (np.stack([bi, bj, bk], -1) * BRICK + 0.5) / rs * 2.0 - 1.0
        hi = (np.stack([bi, bj, bk], -1) * BRICK + BRICK - 0.5) / rs * 2 - 1
        closest = np.clip(0.0, lo, hi)
        active = (closest**2).sum(-1) <= thresh2
    else:
        active = np.ones((BX, BY, BZ), bool)

    nb = int(active.sum())
    brick_links = np.full((BX, BY, BZ), -1, np.int32)
    brick_links[active] = np.arange(nb, dtype=np.int32)
    brick_coords = np.argwhere(active).astype(np.int32)

    # device-side exact cell mask
    coords = jnp.asarray(brick_coords)
    off = jnp.arange(BRICK**3, dtype=jnp.int32)
    oi = off // (BRICK * BRICK)
    oj = (off // BRICK) % BRICK
    ok = off % BRICK
    cell = (
        coords[:, None, :] * BRICK
        + jnp.stack([oi, oj, ok], axis=-1)[None, :, :]
    )  # [nb, 512, 3]
    if use_sphere_bound:
        c = (cell.astype(jnp.float32) + 0.5) / jnp.asarray(
            rs, jnp.float32
        ) * 2.0 - 1.0
        mask = jnp.sum(c * c, axis=-1) <= thresh2
    else:
        mask = jnp.ones((nb, BRICK**3), bool)

    if alloc_data:
        density = (
            jnp.full((nb, BRICK**3), init_density, data_dtype)
            * mask.astype(data_dtype)
        )
        sh = jnp.zeros((nb, BRICK**3, 3 * basis_dim), data_dtype)
    else:
        # geometry-only (see tile_march.geometry_only): callers supply
        # prebuilt kernel arrays; skips multi-GB allocations at 512^3
        density = jnp.zeros((nb, 1), data_dtype)
        sh = jnp.zeros((nb, 1, 1), data_dtype)
    return BrickGrid(
        brick_links=jnp.asarray(brick_links),
        density_bricks=density,
        sh_bricks=sh,
        cell_mask=mask,
        brick_coords=coords,
        reso=(X, Y, Z),
        radius=np.broadcast_to(
            np.asarray(radius, np.float32), (3,)
        ).copy(),
        center=np.asarray(center, np.float32).copy(),
        basis_dim=basis_dim,
    )


def to_sparse_grid(bg: BrickGrid) -> SparseGrid:
    """Inverse conversion (exact round-trip via cell_mask)."""
    BX, BY, BZ = bg.bricks_shape
    X, Y, Z = bg.reso
    brick_links = np.asarray(bg.brick_links)
    mask = np.asarray(bg.cell_mask)  # [nb, 512]
    density = np.asarray(bg.density_bricks)
    sh = np.asarray(bg.sh_bricks)

    # compact rows in (brick, cell) order
    order = (np.cumsum(mask.reshape(-1)) - 1).reshape(mask.shape)
    cell_rows = np.where(mask, order, -1)  # [nb, 512]
    dens_out = density[mask][:, None].astype(np.float32)
    sh_out = sh[mask].astype(np.float32)

    cell_links_full = np.full((BX, BY, BZ, BRICK**3), -1, np.int64)
    cell_links_full[brick_links >= 0] = cell_rows[
        brick_links[brick_links >= 0]
    ]
    v = cell_links_full.reshape(BX, BY, BZ, BRICK, BRICK, BRICK)
    # [bx, by, bz, lx, ly, lz] -> [bx, lx, by, ly, bz, lz]
    v = v.transpose(0, 3, 1, 4, 2, 5)
    links = v.reshape(BX * BRICK, BY * BRICK, BZ * BRICK).astype(np.int32)
    links = np.ascontiguousarray(links[:X, :Y, :Z])
    return SparseGrid(
        links=jnp.asarray(links),
        density_data=jnp.asarray(dens_out),
        sh_data=jnp.asarray(sh_out),
        radius=bg.radius.copy(),
        center=bg.center.copy(),
        basis_dim=bg.basis_dim,
    )


def gather_windows(bg: BrickGrid, wb: jnp.ndarray):
    """Fetch 2x2x2-brick windows for brick anchors wb [..., 3] (int32,
    clipped to [0, B-2]).

    Returns (win_density [..., 16, 16, 16],
             win_sh      [..., 16, 16, 16, C]).
    Empty bricks contribute zeros. The 8 fetches are row gathers of
    512-wide (density) / 512*C-wide (SH) rows — the wide-gather design
    point this whole module exists for.
    """
    BX, BY, BZ = bg.bricks_shape
    offs = jnp.asarray(
        [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
        jnp.int32,
    )  # [8, 3] — dz fastest, dx slowest
    coords = wb[..., None, :] + offs  # [..., 8, 3]
    rows = bg.brick_links[
        coords[..., 0], coords[..., 1], coords[..., 2]
    ]  # [..., 8]
    safe = jnp.maximum(rows, 0)
    valid = (rows >= 0).astype(bg.density_bricks.dtype)

    d = bg.density_bricks[safe] * valid[..., None]  # [..., 8, 512]
    sh = bg.sh_bricks[safe] * valid[..., None, None]  # [..., 8, 512, C]

    def assemble(x, n_tail):
        # [lead..., 8(bricks dz-fast), 512(cells lz-fast), tail...]
        #   -> [lead..., 16(x), 16(y), 16(z), tail...]
        lead = x.shape[: x.ndim - 2 - n_tail]
        tail = x.shape[x.ndim - n_tail:] if n_tail else ()
        L = len(lead)
        b = x.reshape(*lead, 2, 2, 2, BRICK, BRICK, BRICK, *tail)
        # axes: [lead, dx, dy, dz, lx, ly, lz, tail]
        perm = (
            tuple(range(L))
            + (L + 0, L + 3, L + 1, L + 4, L + 2, L + 5)
            + tuple(range(L + 6, L + 6 + n_tail))
        )
        b = jnp.transpose(b, perm)
        return b.reshape(*lead, 16, 16, 16, *tail)

    win_d = assemble(d, 0)
    win_sh = assemble(sh, 1)
    return win_d, win_sh
