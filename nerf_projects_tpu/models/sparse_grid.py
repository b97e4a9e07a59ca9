"""Plenoxels sparse voxel grid — the svox2 `SparseGrid` equivalent.

Storage schema matches the reference for npz interop (SURVEY.md §5
Checkpoint/resume; reference svox2/svox2/svox2.py:355-535, 1526-1628):
  * `links`   int32 [X, Y, Z] — dense index grid, -1 = empty, else row in
    the compact arrays;
  * `density_data` fp32 [cap, 1];
  * `sh_data`      fp32 [cap, 3 * basis_dim] (fp16 in saved npz);
  * `radius`, `center` fp32 [3] — world AABB is center +- radius;
  * Morton/z-order data layout for locality (svox2.py:415-418).

TPU-first design: the grid lives in HBM as flat compact arrays; sampling
is an XLA gather of 8 corner rows per sample (scatter-add transpose for
gradients), which XLA vectorizes well. All world<->grid transforms keep
static shapes. Topology changes (resample/dilate) are host-staged events
between jitted epochs, exactly as the reference treats them
(svox2/opt/opt.py:855-887).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def morton_code_3d(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Interleave bits of 3 coordinate arrays (z-order curve, up to 2^21)."""

    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 32)) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << 16)) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << 8)) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << 4)) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << 2)) & np.uint64(0x1249249249249249)
        return v

    return (spread(x) << np.uint64(2)) | (spread(y) << np.uint64(1)) | spread(z)


@dataclass
class SparseGrid:
    """Pytree-of-arrays sparse voxel grid.

    Differentiable leaves: density_data, sh_data (+ optional basis/bg).
    links and geometry are static per topology epoch.
    """

    links: jnp.ndarray         # int32 [X, Y, Z]
    density_data: jnp.ndarray  # [cap, 1]
    sh_data: jnp.ndarray       # [cap, 3*basis_dim]
    radius: np.ndarray         # [3] host-side
    center: np.ndarray         # [3] host-side
    basis_dim: int = 9

    # -- constructors ------------------------------------------------------

    @staticmethod
    def create(
        reso,
        *,
        basis_dim: int = 9,
        radius=1.0,
        center=(0.0, 0.0, 0.0),
        use_sphere_bound: bool = False,
        use_z_order: bool = True,
        init_density: float = 0.1,
        init_sh: float = 0.0,
    ) -> "SparseGrid":
        """Dense-allocated grid (all voxels active), optionally clipped to
        the bounding sphere (reference ctor svox2.py:420-447)."""
        if isinstance(reso, int):
            reso = (reso, reso, reso)
        reso = tuple(int(r) for r in reso)
        radius = np.broadcast_to(np.asarray(radius, np.float32), (3,)).copy()
        center = np.asarray(center, np.float32).copy()

        X, Y, Z = reso
        ii, jj, kk = np.meshgrid(
            np.arange(X), np.arange(Y), np.arange(Z), indexing="ij"
        )
        if use_sphere_bound:
            # Voxel-center world coords in the unit cube [-1, 1].
            cx = (ii + 0.5) / X * 2.0 - 1.0
            cy = (jj + 0.5) / Y * 2.0 - 1.0
            cz = (kk + 0.5) / Z * 2.0 - 1.0
            # Keep voxels whose center is within the sphere of radius 1
            # plus half a voxel diagonal (so boundary voxels survive).
            voxel_diag = np.linalg.norm([2.0 / X, 2.0 / Y, 2.0 / Z]) * 0.5
            active = (cx**2 + cy**2 + cz**2) <= (1.0 + voxel_diag) ** 2
        else:
            active = np.ones(reso, bool)

        n_active = int(active.sum())
        links = np.full(reso, -1, np.int32)
        act_idx = np.stack([ii[active], jj[active], kk[active]], -1)
        if use_z_order:
            order = np.argsort(
                morton_code_3d(act_idx[:, 0], act_idx[:, 1], act_idx[:, 2])
            )
            act_idx = act_idx[order]
        links[act_idx[:, 0], act_idx[:, 1], act_idx[:, 2]] = np.arange(
            n_active, dtype=np.int32
        )

        density = jnp.full((n_active, 1), init_density, jnp.float32)
        sh = jnp.full((n_active, 3 * basis_dim), init_sh, jnp.float32)
        # SH DC component init so initial color decodes near 0.5 is left to
        # the caller; reference inits sh to 0.
        return SparseGrid(
            links=jnp.asarray(links),
            density_data=density,
            sh_data=sh,
            radius=radius,
            center=center,
            basis_dim=basis_dim,
        )

    # -- geometry ----------------------------------------------------------

    @property
    def reso(self) -> Tuple[int, int, int]:
        return tuple(self.links.shape)

    @property
    def capacity(self) -> int:
        return self.density_data.shape[0]

    def world_to_grid(self, pts: jnp.ndarray) -> jnp.ndarray:
        """World [..., 3] -> continuous grid coords in voxel units, where
        integer coordinates are data sample locations (svox2 convention:
        grid coord g = (p - c)/r scaled so g in [-0.5, reso-0.5])."""
        reso = jnp.asarray(self.reso, jnp.float32)
        scale = reso * 0.5
        offset = reso * 0.5 - 0.5
        unit = (pts - jnp.asarray(self.center)) / jnp.asarray(self.radius)
        return unit * scale + offset

    def grid_to_world(self, g: jnp.ndarray) -> jnp.ndarray:
        reso = jnp.asarray(self.reso, jnp.float32)
        scale = reso * 0.5
        offset = reso * 0.5 - 0.5
        unit = (g - offset) / scale
        return unit * jnp.asarray(self.radius) + jnp.asarray(self.center)

    # -- persistence -------------------------------------------------------

    def save(self, path: str, background=None):
        """npz snapshot with the svox2 key schema (svox2.py:1526-1576).

        `background`: optional ops.background.ReferenceBackground saved
        under the reference's background_data/background_links keys
        (svox2.py:1546-1548) so checkpoints round-trip with svox2.
        """
        data = dict(
            radius=self.radius,
            center=self.center,
            links=np.asarray(self.links),
            density_data=np.asarray(self.density_data, np.float32),
            sh_data=np.asarray(self.sh_data, np.float16),
            basis_type=0,  # BASIS_TYPE_SH
            basis_dim=self.basis_dim,
        )
        if background is not None:
            data["background_data"] = np.asarray(
                background.data, np.float32
            )
            data["background_links"] = np.asarray(
                background.links, np.int32
            )
        np.savez_compressed(path, **data)

    @staticmethod
    def load(path: str) -> "SparseGrid":
        z = np.load(path)
        sh = z["sh_data"].astype(np.float32)
        basis_dim = int(z["basis_dim"]) if "basis_dim" in z else sh.shape[1] // 3
        return SparseGrid(
            links=jnp.asarray(z["links"].astype(np.int32)),
            density_data=jnp.asarray(z["density_data"].astype(np.float32)),
            sh_data=jnp.asarray(sh),
            radius=z["radius"].astype(np.float32),
            center=z["center"].astype(np.float32),
            basis_dim=basis_dim,
        )

    # -- pytree plumbing ---------------------------------------------------

    def tree_flatten(self):
        return (
            (self.links, self.density_data, self.sh_data),
            (self.radius.tobytes(), self.center.tobytes(), self.basis_dim),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        radius_b, center_b, basis_dim = aux
        return cls(
            links=children[0],
            density_data=children[1],
            sh_data=children[2],
            radius=np.frombuffer(radius_b, np.float32).copy(),
            center=np.frombuffer(center_b, np.float32).copy(),
            basis_dim=basis_dim,
        )


jax.tree_util.register_pytree_node(
    SparseGrid, SparseGrid.tree_flatten, SparseGrid.tree_unflatten
)
