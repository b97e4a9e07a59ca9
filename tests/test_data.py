"""Loader tests on tiny generated datasets (format round-trips + auto-detect)."""
import json
import os

import numpy as np
import pytest

from nerf_projects_tpu.data.base import detect_dataset_type, load_scene


def _write_png(path, arr):
    import imageio.v2 as imageio

    imageio.imwrite(path, (np.clip(arr, 0, 1) * 255).astype(np.uint8))


@pytest.fixture
def blender_root(tmp_path):
    root = tmp_path / "lego"
    (root / "train").mkdir(parents=True)
    (root / "test").mkdir()
    rng = np.random.default_rng(0)
    for split, n in [("train", 3), ("test", 4)]:
        frames = []
        for i in range(n):
            img = rng.uniform(size=(16, 16, 4))
            _write_png(root / split / f"r_{i}.png", img)
            frames.append(
                {
                    "file_path": f"{split}/r_{i}",
                    "transform_matrix": np.eye(4).tolist(),
                }
            )
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    return str(root)


@pytest.fixture
def llff_root(tmp_path):
    root = tmp_path / "fern"
    (root / "images").mkdir(parents=True)
    rng = np.random.default_rng(1)
    n = 10
    poses_bounds = np.zeros((n, 17))
    for i in range(n):
        _write_png(root / "images" / f"img_{i:03d}.png", rng.uniform(size=(24, 32, 3)))
        # [down, right, back] convention pose with hwf column; vary the
        # rotation slightly so pose-averaging math is non-degenerate.
        th = 0.05 * i
        rot = np.array(
            [
                [np.cos(th), 0, np.sin(th)],
                [0, 1, 0],
                [-np.sin(th), 0, np.cos(th)],
            ]
        )
        t = np.array([0.1 * i, 0.0, 4.0])
        pose = np.concatenate([rot, t[:, None]], 1)  # 3x4
        hwf = np.array([24.0, 32.0, 30.0])[:, None]
        poses_bounds[i, :15] = np.concatenate([pose, hwf], 1).ravel()
        poses_bounds[i, 15:] = [2.0, 8.0]
    np.save(root / "poses_bounds.npy", poses_bounds)
    return str(root)


@pytest.fixture
def nsvf_root(tmp_path):
    root = tmp_path / "Truck"
    (root / "rgb").mkdir(parents=True)
    (root / "pose").mkdir()
    rng = np.random.default_rng(2)
    for split_idx, n in [(0, 3), (2, 2)]:
        for i in range(n):
            name = f"{split_idx}_{i:04d}"
            _write_png(root / "rgb" / f"{name}.png", rng.uniform(size=(16, 16, 3)))
            pose = np.eye(4)
            pose[:3, 3] = [0, 0, 3.0 + i]
            np.savetxt(root / "pose" / f"{name}.txt", pose)
    np.savetxt(root / "intrinsics.txt", np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]]))
    np.savetxt(root / "bbox.txt", np.array([-1, -1, -1, 1, 1, 1, 0.1]))
    (root / "pose" / "dummy").unlink(missing_ok=True)
    return str(root)


@pytest.fixture
def dv_root(tmp_path):
    root = tmp_path / "greek"
    for split in ["train", "test"]:
        (root / split / "rgb").mkdir(parents=True)
        (root / split / "pose").mkdir()
        rng = np.random.default_rng(3)
        for i in range(3):
            _write_png(root / split / "rgb" / f"{i:05d}.png", rng.uniform(size=(16, 16, 3)))
            pose = np.eye(4)
            pose[:3, 3] = [0, 0, 2.0]
            np.savetxt(root / split / "pose" / f"{i:05d}.txt", pose.ravel()[None])
        with open(root / split / "intrinsics.txt", "w") as f:
            f.write("20.0 8.0 8.0 0.\n0. 0. 0.\n0.5\n1.0\n16 16\n")
    # top-level intrinsics for detection
    with open(root / "intrinsics.txt", "w") as f:
        f.write("20.0 8.0 8.0 0.\n0. 0. 0.\n0.5\n1.0\n16 16\n")
    return str(root)


@pytest.fixture
def linemod_root(tmp_path):
    root = tmp_path / "ape"
    (root / "imgs").mkdir(parents=True)
    rng = np.random.default_rng(4)
    K = [[50.0, 0, 8], [0, 50.0, 8], [0, 0, 1]]
    for split, n in [("train", 3), ("test", 2)]:
        frames = []
        for i in range(n):
            name = f"imgs/{split}_{i}.png"
            _write_png(root / name, rng.uniform(size=(16, 16, 3)))
            frames.append(
                {
                    "file_path": name,
                    "transform_matrix": np.eye(4).tolist(),
                    "intrinsic_matrix": K,
                }
            )
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump(
                {"frames": frames, "intrinsic_matrix": K, "near": 0.5, "far": 2.5},
                f,
            )
    return str(root)


class TestDetect:
    def test_blender(self, blender_root):
        assert detect_dataset_type(blender_root) == "blender"

    def test_llff(self, llff_root):
        assert detect_dataset_type(llff_root) == "llff"

    def test_nsvf(self, nsvf_root):
        assert detect_dataset_type(nsvf_root) == "nsvf"

    def test_linemod(self, linemod_root):
        assert detect_dataset_type(linemod_root) == "linemod"


class TestBlender:
    def test_load(self, blender_root):
        ds = load_scene(blender_root, "train")
        assert ds.images.shape == (3, 16, 16, 3)
        assert ds.poses.shape == (3, 4, 4)
        assert ds.near == 2.0 and ds.far == 6.0
        assert ds.render_poses.shape == (40, 4, 4)
        # white background composite applied
        assert ds.images.max() <= 1.0

    def test_testskip(self, blender_root):
        ds = load_scene(blender_root, "test", testskip=2)
        assert ds.images.shape[0] == 2

    def test_half_res(self, blender_root):
        ds = load_scene(blender_root, "train", half_res=True)
        assert ds.images.shape[1:3] == (8, 8)
        assert ds.intrinsics[0, 0] == pytest.approx(
            load_scene(blender_root, "train").intrinsics[0, 0] / 2
        )


class TestLLFF:
    def test_load_train_test_split(self, llff_root):
        train = load_scene(llff_root, "train", factor=1)
        test = load_scene(llff_root, "test", factor=1)
        assert test.images.shape[0] == 2  # every 8th of 10
        assert train.images.shape[0] == 8
        assert train.ndc  # forward-facing default
        assert train.near == 0.0 and train.far == 1.0
        assert train.render_poses.shape[0] == 120

    def test_spherify(self, llff_root):
        ds = load_scene(llff_root, "train", factor=1, spherify=True)
        assert not ds.ndc
        assert ds.near > 0

    def test_no_ndc_bounds(self, llff_root):
        ds = load_scene(llff_root, "train", factor=1, ndc=False)
        assert ds.near > 0 and ds.far > ds.near


class TestNSVF:
    def test_load(self, nsvf_root):
        train = load_scene(nsvf_root, "train")
        test = load_scene(nsvf_root, "test")
        assert train.images.shape[0] == 3
        assert test.images.shape[0] == 2
        assert train.bbox.shape == (2, 3)


class TestDeepVoxels:
    def test_load(self, dv_root):
        ds = load_scene(dv_root, "train")
        assert ds.images.shape[0] == 3
        assert ds.near == pytest.approx(1.0)
        assert ds.far == pytest.approx(3.0)


class TestLINEMOD:
    def test_load(self, linemod_root):
        ds = load_scene(linemod_root, "train")
        assert ds.images.shape == (3, 16, 16, 3)
        assert ds.intrinsics[0, 0] == 50.0
        assert ds.near == 0.5 and ds.far == 2.5
