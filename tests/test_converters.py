"""Converter tests: ingp2nsvf, minify, timings parser, calc_metrics CLI."""
import json
import os

import numpy as np
import pytest

from nerf_projects_tpu.data.converters import ingp_to_nsvf, minify, parse_timings


class TestIngp:
    def test_convert(self, tmp_path):
        meta = {
            "camera_angle_x": 0.8,
            "w": 64, "h": 64,
            "aabb_scale": 2,
            "frames": [
                {"file_path": f"images/{i:03d}.png",
                 "transform_matrix": np.eye(4).tolist()}
                for i in range(3)
            ],
        }
        p = tmp_path / "transforms.json"
        p.write_text(json.dumps(meta))
        out = str(tmp_path / "nsvf")
        ingp_to_nsvf(str(p), out)
        assert os.path.exists(os.path.join(out, "intrinsics.txt"))
        assert len(os.listdir(os.path.join(out, "pose"))) == 3
        K = np.loadtxt(os.path.join(out, "intrinsics.txt"))
        assert K[0, 0] == pytest.approx(0.5 * 64 / np.tan(0.4))
        bbox = np.loadtxt(os.path.join(out, "bbox.txt"))
        assert bbox[3] == 2.0


class TestMinify:
    def test_images_n_created(self, tmp_path):
        import imageio.v2 as imageio

        src = tmp_path / "scene" / "images"
        src.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(2):
            imageio.imwrite(
                str(src / f"i{i}.png"),
                (rng.uniform(size=(32, 48, 3)) * 255).astype(np.uint8),
            )
        minify(str(tmp_path / "scene"), factors=(2, 4))
        im = imageio.imread(str(tmp_path / "scene" / "images_4" / "i0.png"))
        assert im.shape[:2] == (8, 12)


class TestTimings:
    def test_parse(self, tmp_path):
        p = tmp_path / "timings.txt"
        p.write_text(
            "100 2026-01-01T00:00:00\n200 2026-01-01T00:00:10\n"
        )
        out = parse_timings(str(p))
        assert out["steps"] == 100
        assert out["steps_per_sec"] == pytest.approx(10.0)


class TestCalcMetrics:
    def test_cli(self, tmp_path, capsys):
        import imageio.v2 as imageio

        from nerf_projects_tpu.cli.calc_metrics import main
        from nerf_projects_tpu.core.rays import pose_spherical

        # build a 1-image blender set + identical "render"
        root = tmp_path / "scene"
        (root / "test").mkdir(parents=True)
        rng = np.random.default_rng(1)
        img = (rng.uniform(size=(16, 16, 3)) * 255).astype(np.uint8)
        imageio.imwrite(str(root / "test" / "r_0.png"), img)
        meta = {"camera_angle_x": 0.7, "frames": [
            {"file_path": "test/r_0",
             "transform_matrix": pose_spherical(0, -30, 4).tolist()}]}
        with open(root / "transforms_test.json", "w") as f:
            json.dump(meta, f)
        with open(root / "transforms_train.json", "w") as f:
            json.dump(meta, f)  # detection needs the train split file
        rdir = tmp_path / "renders"
        rdir.mkdir()
        imageio.imwrite(str(rdir / "0000.png"), img)
        main([str(rdir), str(root), "--split", "test",
              "--out", str(tmp_path / "m.json")])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["psnr"] > 45  # identical images
        assert os.path.exists(tmp_path / "m.json")
