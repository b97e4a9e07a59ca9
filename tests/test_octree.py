"""PlenOctree structure, query, and rendering tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.models.octree import PlenOctree
from nerf_projects_tpu.ops.octree_render import (
    OctreeRenderOptions,
    infer_sh_deg,
    volume_render_octree,
)


class TestStructure:
    def test_create(self):
        t = PlenOctree.create(4)
        assert t.n_nodes == 1
        assert t.n_leaves == 8
        assert t.data_dim == 4

    def test_refine_all(self):
        t = PlenOctree.create(4).refine()
        assert t.n_nodes == 9
        assert t.n_leaves == 64

    def test_refine_masked(self):
        t = PlenOctree.create(4)
        mask = np.zeros(8, bool)
        mask[0] = True
        t2 = t.refine(mask)
        assert t2.n_nodes == 2
        assert t2.n_leaves == 8 - 1 + 8

    def test_refine_inherits_data(self):
        t = PlenOctree.create(1)
        data = np.asarray(t.data).copy()
        data[0, 1, 0, 1, 0] = 7.0
        t = PlenOctree(
            child=t.child, data=jnp.asarray(data), invradius=t.invradius,
            offset=t.offset, depth_limit=t.depth_limit,
        )
        cells = t.leaf_cells()
        mask = (cells[:, 1] == 1) & (cells[:, 2] == 0) & (cells[:, 3] == 1)
        t2 = t.refine(mask)
        # children of the refined cell all carry 7.0
        np.testing.assert_allclose(np.asarray(t2.data[1]), 7.0)

    def test_leaf_geometry(self):
        t = PlenOctree.create(1).refine()  # uniform depth-2
        cells, depth, corner, size = t.leaf_depths_and_corners()
        assert (depth == 2).all()
        np.testing.assert_allclose(size, 0.25)
        assert corner.min() == 0.0 and corner.max() == 0.75

    def test_save_load(self, tmp_path):
        t = PlenOctree.create(28, radius=1.5).refine()
        p = str(tmp_path / "tree.npz")
        t.save(p)
        t2 = PlenOctree.load(p)
        assert t2.n_nodes == t.n_nodes
        np.testing.assert_allclose(t2.invradius, t.invradius)
        np.testing.assert_array_equal(np.asarray(t2.child), np.asarray(t.child))


class TestQuery:
    def _tree_with_marked_octant(self):
        """depth-2 tree where the (0,0,0) fine cell holds value 5."""
        t = PlenOctree.create(1)
        t = t.refine()  # 8 child nodes
        data = np.asarray(t.data).copy()
        # node 1 is the child of root cell (0,0,0); its (0,0,0) cell spans
        # [0, 0.25)^3 in unit coords
        data[1, 0, 0, 0, 0] = 5.0
        return PlenOctree(
            child=t.child, data=jnp.asarray(data), invradius=t.invradius,
            offset=t.offset, depth_limit=t.depth_limit,
        )

    def test_query_hits_correct_cell(self):
        t = self._tree_with_marked_octant()
        # world coords: unit [0,1] maps from world [-1,1] (radius 1, center 0)
        inside = t.query(jnp.asarray([[-0.9, -0.9, -0.9]]))  # unit ~0.05
        outside = t.query(jnp.asarray([[0.9, 0.9, 0.9]]))
        assert float(inside[0, 0]) == 5.0
        assert float(outside[0, 0]) == 0.0

    def test_query_outside_returns_zero(self):
        t = self._tree_with_marked_octant()
        out = t.query(jnp.asarray([[5.0, 0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_query_gradients_scatter_to_leaf(self):
        t = self._tree_with_marked_octant()

        def f(data):
            from dataclasses import replace

            t2 = replace(t, data=data)
            return jnp.sum(t2.query(jnp.asarray([[-0.9, -0.9, -0.9]])))

        g = np.asarray(jax.grad(f)(t.data))
        assert g[1, 0, 0, 0].sum() == 1.0
        assert g.sum() == 1.0  # only that leaf


class TestRender:
    def _solid_tree(self, rgb=(0.9, 0.2, 0.1), sigma=500.0, deg=0):
        data_dim = 3 * (deg + 1) ** 2 + 1
        t = PlenOctree.create(data_dim, radius=1.0).refine()
        data = np.asarray(t.data).copy()
        C0 = 0.28209479177387814

        def logit(p):
            return np.log(p / (1 - p))

        # only the central region (children nodes cover everything;
        # set all cells solid)
        for c in range(3):
            data[..., c * (deg + 1) ** 2] = logit(rgb[c]) / C0
        data[..., -1] = sigma
        return PlenOctree(
            child=t.child, data=jnp.asarray(data), invradius=t.invradius,
            offset=t.offset, depth_limit=t.depth_limit,
        )

    def test_solid_color(self):
        t = self._solid_tree()
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        rays = Rays(jnp.asarray([[0.0, 0.0, -2.0]]), d, d)
        out = volume_render_octree(t, rays, OctreeRenderOptions(step_size=5e-3))
        rgb = np.asarray(out["rgb"][0])
        np.testing.assert_allclose(rgb, [0.9, 0.2, 0.1], atol=0.03)
        assert float(out["acc"][0]) > 0.99

    def test_miss_is_background(self):
        t = self._solid_tree()
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        rays = Rays(jnp.asarray([[10.0, 0.0, -2.0]]), d, d)
        out = volume_render_octree(t, rays, OctreeRenderOptions(step_size=5e-3))
        np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-5)

    def test_empty_tree_background(self):
        t = PlenOctree.create(4)
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        rays = Rays(jnp.asarray([[0.0, 0.0, -2.0]]), d, d)
        out = volume_render_octree(t, rays, OctreeRenderOptions(step_size=1e-2))
        np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-5)

    def test_infer_sh_deg(self):
        assert infer_sh_deg(4) == 0
        assert infer_sh_deg(28) == 2
        assert infer_sh_deg(49) == 3
        with pytest.raises(ValueError):
            infer_sh_deg(5)

    def test_render_differentiable(self):
        t = self._solid_tree(sigma=50.0)
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        rays = Rays(jnp.asarray([[0.0, 0.0, -2.0]]), d, d)

        def f(data):
            from dataclasses import replace

            t2 = replace(t, data=data)
            out = volume_render_octree(
                t2, rays, OctreeRenderOptions(step_size=1e-2)
            )
            return jnp.sum(out["rgb"])

        g = jax.grad(f)(t.data)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).sum()) > 0
