"""Cubemap math tests (ops/cubemap.py vs the reference's conventions)."""
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.ops.cubemap import (
    cubemap_coord_to_dir,
    cubemap_sample,
    dir_to_cubemap_coord,
)


class TestDirToCoord:
    def test_face_selection(self):
        dirs = jnp.asarray(
            [
                [-1.0, 0.1, 0.1],  # -x -> face 0
                [1.0, 0.1, 0.1],   # +x -> face 1
                [0.1, -1.0, 0.1],  # -y -> face 2
                [0.1, 1.0, 0.1],   # +y -> face 3
                [0.1, 0.1, -1.0],  # -z -> face 4
                [0.1, 0.1, 1.0],   # +z -> face 5
            ]
        )
        face, _, _ = dir_to_cubemap_coord(dirs, 16)
        assert list(np.asarray(face)) == [0, 1, 2, 3, 4, 5]

    def test_center_of_face(self):
        # Straight down each axis hits the face center texel coordinate
        R = 8
        face, u, v = dir_to_cubemap_coord(jnp.asarray([[0.0, 0.0, 1.0]]), R)
        center = (R - 1.0) * 0.5
        assert float(u[0]) == center and float(v[0]) == center

    def test_roundtrip(self):
        R = 32
        rng = np.random.default_rng(0)
        d = rng.normal(size=(256, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        for eac in (True, False):
            face, u, v = dir_to_cubemap_coord(jnp.asarray(d), R, eac=eac)
            d2 = cubemap_coord_to_dir(face, u, v, R, eac=eac)
            d2 = np.array(d2)
            d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
            np.testing.assert_allclose(d2, d, atol=1e-5)

    def test_uv_in_range(self):
        R = 16
        rng = np.random.default_rng(1)
        d = rng.normal(size=(1000, 3)).astype(np.float32)
        _, u, v = dir_to_cubemap_coord(jnp.asarray(d), R)
        assert float(jnp.min(u)) >= -0.5 - 1e-5
        assert float(jnp.max(u)) <= R - 0.5 + 1e-5
        assert float(jnp.min(v)) >= -0.5 - 1e-5


class TestSample:
    def test_constant_map(self):
        cm = jnp.full((6, 8, 8, 3), 0.25)
        rng = np.random.default_rng(2)
        d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        for mode in ("nearest", "linear"):
            out = cubemap_sample(cm, d, mode=mode)
            np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-6)

    def test_per_face_constant_nearest(self):
        cm = jnp.zeros((6, 4, 4, 1))
        for f in range(6):
            cm = cm.at[f].set(float(f))
        axes = jnp.asarray(
            [
                [-1, 0, 0], [1, 0, 0],
                [0, -1, 0], [0, 1, 0],
                [0, 0, -1], [0, 0, 1],
            ],
            jnp.float32,
        )
        out = cubemap_sample(cm, axes, mode="nearest")
        np.testing.assert_allclose(
            np.asarray(out)[:, 0], np.arange(6.0), atol=1e-6
        )

    def test_linear_interpolates(self):
        # gradient along u on the +z face; rotating the direction in the
        # u plane moves the sample smoothly
        R = 16
        cm = jnp.zeros((6, R, R, 1))
        grad = jnp.arange(R, dtype=jnp.float32)[:, None, None]
        cm = cm.at[5].set(jnp.broadcast_to(grad, (R, R, 1)))
        # +z face: u axis = y (ax=2 -> (2^1)&1 = 1)
        thetas = np.linspace(-0.3, 0.3, 9)
        dirs = jnp.asarray(
            [[0.0, np.sin(t), np.cos(t)] for t in thetas], jnp.float32
        )
        out = np.asarray(cubemap_sample(cm, dirs, mode="linear"))[:, 0]
        assert np.all(np.diff(out) > 0)
        mid = (R - 1.0) * 0.5
        assert abs(out[4] - mid) < 1e-4
