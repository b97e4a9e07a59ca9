"""PlenOctree — the svox `N3Tree` equivalent, TPU-native.

The reference consumes the external CUDA `svox` package (N3Tree octree +
VolumeRenderer; SURVEY.md §2.1 "Not vendored — must implement
equivalents"; used by plenoctree/octree/extraction.py:56-67,
optimization.py:185-192, compression.py:34,90).

Structure (host-constructed numpy, device-rendered jnp):
  * `child`  int32 [N, 2, 2, 2] — relative offset to the child NODE index
    (0 = leaf cell), i.e. absolute child node = node_idx + child[...]
    (svox's internal format, kept for npz interop);
  * `data`   float32 [N, 2, 2, 2, data_dim] — leaf payload, layout
    [SH coeffs (3*(deg+1)^2) ..., sigma] (svox data_dim convention);
  * `invradius`, `offset` — world -> unit-cube transform
    p_tree = p_world * invradius + offset.

Construction (refine-by-mask) is a host-side operation between jitted
phases — topology is static during rendering, matching how the reference
treats tree building (extraction-time only). Queries on device are a
fixed-depth vectorized descent: depth_limit gathers per point, no
data-dependent control flow (SURVEY.md §7 hard part 4).
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class PlenOctree:
    child: jnp.ndarray      # int32 [N, 2, 2, 2]
    data: jnp.ndarray       # float32 [N, 2, 2, 2, D]
    invradius: np.ndarray   # [3]
    offset: np.ndarray      # [3]
    depth_limit: int = 10

    # -- construction ------------------------------------------------------

    @staticmethod
    def create(
        data_dim: int,
        *,
        center=(0.0, 0.0, 0.0),
        radius=1.0,
        depth_limit: int = 10,
    ) -> "PlenOctree":
        """Single-root tree covering the cube center +- radius."""
        radius = np.broadcast_to(np.asarray(radius, np.float32), (3,)).copy()
        center = np.asarray(center, np.float32)
        invradius = 0.5 / radius
        offset = 0.5 - center * invradius
        return PlenOctree(
            child=jnp.zeros((1, 2, 2, 2), jnp.int32),
            data=jnp.zeros((1, 2, 2, 2, data_dim), jnp.float32),
            invradius=invradius,
            offset=offset,
            depth_limit=depth_limit,
        )

    @property
    def n_nodes(self) -> int:
        return self.child.shape[0]

    @property
    def data_dim(self) -> int:
        return self.data.shape[-1]

    @property
    def n_leaves(self) -> int:
        return int((np.asarray(self.child) == 0).sum())

    def world_to_tree(self, pts: jnp.ndarray) -> jnp.ndarray:
        return pts * jnp.asarray(self.invradius) + jnp.asarray(self.offset)

    def tree_to_world(self, pts: jnp.ndarray) -> jnp.ndarray:
        return (pts - jnp.asarray(self.offset)) / jnp.asarray(self.invradius)

    # -- host-side topology ------------------------------------------------

    def leaf_cells(self) -> np.ndarray:
        """[L, 4] array of (node, i, j, k) for every leaf cell."""
        child = np.asarray(self.child)
        n, i, j, k = np.nonzero(child == 0)
        return np.stack([n, i, j, k], -1)

    def leaf_depths_and_corners(self):
        """Per-leaf depth and unit-cube lower corner + size.

        Returns (cells [L,4], depth [L], corner [L,3], size [L]).
        Computed by walking the tree top-down on the host — via the C++
        native op when available (utils/native.py), else pure Python.
        """
        child = np.asarray(self.child)
        try:
            from nerf_projects_tpu.utils import native

            res = native.octree_leaf_geometry(child)
        except Exception:
            res = None
        if res is not None:
            depth_c, corner_c, size_c, is_leaf = res
            cells = self.leaf_cells()
            n, i, j, k = cells.T
            cell_flat = i * 4 + j * 2 + k
            return (
                cells,
                depth_c[n, cell_flat],
                corner_c[n, cell_flat],
                size_c[n, cell_flat],
            )
        n_nodes = child.shape[0]
        node_depth = np.zeros(n_nodes, np.int32)
        node_corner = np.zeros((n_nodes, 3), np.float64)
        node_size = np.ones(n_nodes, np.float64)  # cube edge of the NODE
        # BFS from root following relative child pointers.
        for node in range(n_nodes):
            for i in range(2):
                for j in range(2):
                    for k in range(2):
                        c = child[node, i, j, k]
                        if c != 0:
                            tgt = node + c
                            node_depth[tgt] = node_depth[node] + 1
                            half = node_size[node] * 0.5
                            node_corner[tgt] = node_corner[node] + np.array(
                                [i, j, k]
                            ) * half
                            node_size[tgt] = half
        cells = self.leaf_cells()
        n, i, j, k = cells.T
        half = node_size[n] * 0.5
        corner = node_corner[n] + np.stack([i, j, k], -1) * half[:, None]
        return cells, node_depth[n] + 1, corner, half

    def refine(self, leaf_mask: Optional[np.ndarray] = None) -> "PlenOctree":
        """Split leaf cells into child nodes (svox N3Tree.refine).

        leaf_mask: boolean [L] over `leaf_cells()` order, or None = all.
        New child nodes inherit the parent cell's data in all 8 cells.
        Host-side; returns a NEW tree (topology is immutable per epoch).
        """
        child = np.asarray(self.child).copy()
        data = np.asarray(self.data)
        cells = self.leaf_cells()
        if leaf_mask is not None:
            cells = cells[np.asarray(leaf_mask)]
        if len(cells) == 0:
            return self
        n_old = child.shape[0]
        n_new = len(cells)
        new_ids = n_old + np.arange(n_new)
        child[cells[:, 0], cells[:, 1], cells[:, 2], cells[:, 3]] = (
            new_ids - cells[:, 0]
        ).astype(np.int32)
        new_child = np.concatenate(
            [child, np.zeros((n_new, 2, 2, 2), np.int32)], 0
        )
        inherited = data[cells[:, 0], cells[:, 1], cells[:, 2], cells[:, 3]]
        new_data = np.concatenate(
            [
                data,
                np.broadcast_to(
                    inherited[:, None, None, None, :],
                    (n_new, 2, 2, 2, self.data_dim),
                ).copy(),
            ],
            0,
        )
        return replace(
            self, child=jnp.asarray(new_child), data=jnp.asarray(new_data)
        )

    # -- device-side query -------------------------------------------------

    def locate(self, pts_world: jnp.ndarray):
        """Containing leaf of world points [..., 3].

        Returns (node [...], cell [..., 3] int, inside [...] bool) via a
        fixed-depth vectorized descent (no per-point control flow).
        """
        t = self.world_to_tree(pts_world)
        inside = jnp.all((t >= 0.0) & (t < 1.0), axis=-1)
        t = jnp.clip(t, 0.0, 1.0 - 1e-7)

        def body(_, carry):
            node, pos, done = carry
            cell = jnp.minimum((pos * 2).astype(jnp.int32), 1)  # [..., 3]
            rel = self.child[node, cell[..., 0], cell[..., 1], cell[..., 2]]
            is_leaf = rel == 0
            new_node = jnp.where(done | is_leaf, node, node + rel)
            new_pos = jnp.where(
                (done | is_leaf)[..., None], pos, pos * 2 - cell.astype(pos.dtype)
            )
            return new_node, new_pos, done | is_leaf

        node0 = jnp.zeros(t.shape[:-1], jnp.int32)
        done0 = jnp.zeros(t.shape[:-1], bool)
        node, pos, _ = jax.lax.fori_loop(
            0, self.depth_limit, body, (node0, t, done0)
        )
        cell = jnp.minimum((pos * 2).astype(jnp.int32), 1)
        return node, cell, inside

    def query(self, pts_world: jnp.ndarray) -> jnp.ndarray:
        """Leaf data at world points [..., 3] -> [..., data_dim].
        Points outside [0, 1)^3 return zeros."""
        node, cell, inside = self.locate(pts_world)
        vals = self.data[node, cell[..., 0], cell[..., 1], cell[..., 2]]
        return jnp.where(inside[..., None], vals, 0.0)

    def leaf_order_lookup(self) -> np.ndarray:
        """Host-side [N, 2, 2, 2] map from (node, cell) to the row of that
        cell in leaf_cells() order (-1 for internal cells)."""
        child = np.asarray(self.child)
        lut = np.full(child.shape, -1, np.int64)
        cells = self.leaf_cells()
        lut[cells[:, 0], cells[:, 1], cells[:, 2], cells[:, 3]] = np.arange(
            len(cells)
        )
        return lut

    # -- persistence -------------------------------------------------------

    def _parent_depth_table(self) -> np.ndarray:
        """svox bookkeeping: [N, 2] int32 where col 0 is the packed parent
        pointer (parent_node * 8 + flat cell index) and col 1 is the node
        depth. Root row stays (0, 0). Derived by the same top-down walk as
        leaf_depths_and_corners."""
        child = np.asarray(self.child)
        n_nodes = child.shape[0]
        pd = np.zeros((n_nodes, 2), np.int32)
        nz = np.nonzero(child != 0)
        tgt = nz[0] + child[nz]
        pd[tgt, 0] = (nz[0] * 8 + nz[1] * 4 + nz[2] * 2 + nz[3]).astype(np.int32)
        # Depths: propagate in node-index order (children always have a
        # higher index than their parent in our append-only refine).
        order = np.argsort(tgt)
        for t in tgt[order]:
            pd[t, 1] = pd[pd[t, 0] // 8, 1] + 1
        return pd

    def save(self, path: str, *, compress: bool = True):
        """svox-style npz: child/data/invradius/offset + the bookkeeping
        keys upstream svox N3Tree.load requires (parent_depth, n_internal,
        n_free, geom_resize_fact — the reference's own
        compressed_evaluation.py:169-189 patches these in when absent)."""
        saver = np.savez_compressed if compress else np.savez
        saver(
            path,
            child=np.asarray(self.child),
            data=np.asarray(self.data, np.float16),
            invradius3=self.invradius,
            offset=self.offset,
            depth_limit=self.depth_limit,
            data_dim=self.data_dim,
            parent_depth=self._parent_depth_table(),
            n_internal=np.int64(self.n_nodes),
            n_free=np.int64(0),
            geom_resize_fact=np.float64(1.0),
        )

    @staticmethod
    def load(path: str) -> "PlenOctree":
        z = np.load(path)
        inv = (
            z["invradius3"]
            if "invradius3" in z
            else np.repeat(np.float32(z["invradius"]), 3)
        )
        return PlenOctree(
            child=jnp.asarray(z["child"].astype(np.int32)),
            data=jnp.asarray(z["data"].astype(np.float32)),
            invradius=inv.astype(np.float32),
            offset=z["offset"].astype(np.float32),
            depth_limit=int(z["depth_limit"]) if "depth_limit" in z else 10,
        )

    # -- pytree ------------------------------------------------------------

    def tree_flatten(self):
        return (
            (self.child, self.data),
            (self.invradius.tobytes(), self.offset.tobytes(), self.depth_limit),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        inv_b, off_b, depth_limit = aux
        return cls(
            child=children[0],
            data=children[1],
            invradius=np.frombuffer(inv_b, np.float32).copy(),
            offset=np.frombuffer(off_b, np.float32).copy(),
            depth_limit=depth_limit,
        )


jax.tree_util.register_pytree_node(
    PlenOctree, PlenOctree.tree_flatten, PlenOctree.tree_unflatten
)
