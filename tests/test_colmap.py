"""COLMAP reader/converter tests over synthetically written binary models."""
import os
import struct

import numpy as np
import pytest

from nerf_projects_tpu.data.colmap import (
    colmap_c2w,
    colmap_to_nsvf,
    colmap_to_poses_bounds,
    qvec2rotmat,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
)


def _write_model(sparse_dir, n_images=3, n_points=50):
    os.makedirs(sparse_dir, exist_ok=True)
    # cameras.bin: one PINHOLE camera
    with open(os.path.join(sparse_dir, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))  # PINHOLE 64x48
        f.write(struct.pack("<4d", 50.0, 50.0, 32.0, 24.0))
    # images.bin
    rng = np.random.default_rng(0)
    with open(os.path.join(sparse_dir, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            q = rng.standard_normal(4)
            q /= np.linalg.norm(q)
            t = rng.standard_normal(3) * 0.1 + [0, 0, 4]
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            f.write(f"img_{i:03d}.jpg".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))  # two 2D points
            for _ in range(2):
                f.write(struct.pack("<ddQ", 1.0, 2.0, 7))  # id is uint64
    # points3D.bin
    with open(os.path.join(sparse_dir, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_points))
        for j in range(n_points):
            xyz = rng.standard_normal(3) * 0.5
            f.write(struct.pack("<QdddBBBd", j, *xyz, 100, 120, 140, 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))
    return sparse_dir


class TestReaders:
    def test_read_model(self, tmp_path):
        sparse = _write_model(str(tmp_path / "sparse"))
        cams = read_cameras_binary(os.path.join(sparse, "cameras.bin"))
        assert cams[1].model == "PINHOLE"
        assert cams[1].width == 64
        np.testing.assert_allclose(cams[1].params, [50, 50, 32, 24])
        imgs = read_images_binary(os.path.join(sparse, "images.bin"))
        assert len(imgs) == 3
        assert imgs[1].name == "img_000.jpg"
        assert len(imgs[1].point3d_ids) == 2
        assert (imgs[1].point3d_ids == 7).all()
        xyz, rgb = read_points3d_binary(os.path.join(sparse, "points3D.bin"))
        assert xyz.shape == (50, 3)
        assert (rgb[0] == [100, 120, 140]).all()

    def test_qvec_rotation_orthonormal(self):
        q = np.array([0.9, 0.1, -0.2, 0.3])
        q /= np.linalg.norm(q)
        R = qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.linalg.det(R) == pytest.approx(1.0)

    def test_c2w_inverts_w2c(self, tmp_path):
        sparse = _write_model(str(tmp_path / "s2"))
        imgs = read_images_binary(os.path.join(sparse, "images.bin"))
        img = imgs[1]
        c2w = colmap_c2w(img)
        R = qvec2rotmat(img.qvec)
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = img.tvec
        np.testing.assert_allclose(c2w @ w2c, np.eye(4), atol=1e-10)


class TestConverters:
    def test_to_nsvf(self, tmp_path):
        sparse = _write_model(str(tmp_path / "sparse"))
        out = str(tmp_path / "nsvf")
        colmap_to_nsvf(sparse, out)
        assert os.path.exists(os.path.join(out, "intrinsics.txt"))
        assert os.path.exists(os.path.join(out, "bbox.txt"))
        poses = sorted(os.listdir(os.path.join(out, "pose")))
        assert len(poses) == 3
        pose = np.loadtxt(os.path.join(out, "pose", poses[0]))
        assert pose.shape == (4, 4)
        np.testing.assert_allclose(pose[3], [0, 0, 0, 1])

    def test_to_poses_bounds(self, tmp_path):
        sparse = _write_model(str(tmp_path / "sparse"))
        out = str(tmp_path / "poses_bounds.npy")
        arr = colmap_to_poses_bounds(sparse, out)
        assert arr.shape == (3, 17)
        assert (arr[:, 15] < arr[:, 16]).all()  # near < far
        # loadable by the LLFF loader's pose math: 3x5 reshape works
        pose = arr[0, :15].reshape(3, 5)
        assert pose[2, 4] == 50.0  # focal in hwf column
