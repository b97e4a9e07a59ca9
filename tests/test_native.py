"""Native C++ ops vs their Python twins."""
import numpy as np
import pytest

from nerf_projects_tpu.utils import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native library unavailable (no g++?)")
    return True


class TestNativeOps:
    def test_octree_geometry_matches_python(self, lib_available):
        from nerf_projects_tpu.models.octree import PlenOctree

        t = PlenOctree.create(4).refine()
        mask = np.zeros(t.n_leaves, bool)
        mask[::3] = True
        t = t.refine(mask)

        child = np.asarray(t.child)
        depth_c, corner_c, size_c, is_leaf = native.octree_leaf_geometry(child)

        # python twin (the fallback path in leaf_depths_and_corners)
        n_nodes = child.shape[0]
        node_depth = np.zeros(n_nodes, np.int32)
        node_corner = np.zeros((n_nodes, 3))
        node_size = np.ones(n_nodes)
        for node in range(n_nodes):
            for i in range(2):
                for j in range(2):
                    for k in range(2):
                        c = child[node, i, j, k]
                        if c != 0:
                            tgt = node + c
                            node_depth[tgt] = node_depth[node] + 1
                            half = node_size[node] * 0.5
                            node_corner[tgt] = node_corner[node] + np.array([i, j, k]) * half
                            node_size[tgt] = half
        cells = t.leaf_cells()
        n, i, j, k = cells.T
        half = node_size[n] * 0.5
        want_corner = node_corner[n] + np.stack([i, j, k], -1) * half[:, None]
        want_depth = node_depth[n] + 1

        flat = i * 4 + j * 2 + k
        np.testing.assert_array_equal(depth_c[n, flat], want_depth)
        np.testing.assert_allclose(corner_c[n, flat], want_corner)
        np.testing.assert_allclose(size_c[n, flat], half)
        assert is_leaf[n, flat].all()

    def test_median_cut_quality(self, lib_available):
        rng = np.random.default_rng(0)
        true_palette = rng.uniform(size=(8, 3)).astype(np.float32)
        ids = rng.integers(0, 8, 5000)
        vec = true_palette[ids]
        palette, got_ids = native.median_cut(vec, 64)
        recon = palette.astype(np.float32)[got_ids]
        np.testing.assert_allclose(recon, vec, atol=1e-3)

    def test_median_cut_budget(self, lib_available):
        rng = np.random.default_rng(1)
        vec = rng.standard_normal((1000, 3)).astype(np.float32)
        palette, ids = native.median_cut(vec, 16)
        assert len(palette) <= 16
        assert ids.max() < len(palette)
        # quantization error bounded
        err = np.abs(palette.astype(np.float32)[ids] - vec).mean()
        assert err < 0.6

    def test_neighbor_links_match_python(self, lib_available):
        from nerf_projects_tpu.models.sparse_grid import SparseGrid

        g = SparseGrid.create(8, use_sphere_bound=True)
        links = np.asarray(g.links)
        got = native.build_neighbor_links(links, g.capacity)

        # python twin
        want = np.full((g.capacity, 3), -1, np.int32)
        X, Y, Z = links.shape
        for x in range(X):
            for y in range(Y):
                for z in range(Z):
                    r = links[x, y, z]
                    if r < 0:
                        continue
                    if x + 1 < X:
                        want[r, 0] = links[x + 1, y, z]
                    if y + 1 < Y:
                        want[r, 1] = links[x, y + 1, z]
                    if z + 1 < Z:
                        want[r, 2] = links[x, y, z + 1]
        np.testing.assert_array_equal(got, want)

    def test_native_is_active_in_this_env(self, lib_available):
        assert native.available()
