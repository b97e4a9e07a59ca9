"""Data-prep tooling tests: split/unsplit round trip, colmap runner with
a mocked binary, Record3D conversion on a synthesized capture,
extract_metrics CSV."""
import json
import os
import os.path as osp
import stat

import numpy as np
import pytest

from nerf_projects_tpu.data import prep


def make_nsvf_dirs(root, n=8):
    os.makedirs(osp.join(root, "pose"))
    os.makedirs(osp.join(root, "rgb"))
    for i in range(n):
        np.savetxt(osp.join(root, "pose", f"{i:04d}.txt"), np.eye(4))
        open(osp.join(root, "rgb", f"{i:04d}.png"), "wb").write(b"png")
    return root


class TestSplit:
    def test_split_then_unsplit_round_trip(self, tmp_path):
        root = make_nsvf_dirs(str(tmp_path))
        before = sorted(os.listdir(osp.join(root, "pose")))
        renames = prep.create_split(root, every=4)
        assert len(renames) == 16  # 8 poses + 8 images
        names = sorted(os.listdir(osp.join(root, "pose")))
        test = [n for n in names if n.startswith("1_")]
        train = [n for n in names if n.startswith("0_")]
        assert len(test) == 2 and len(train) == 6  # every 4th of 8
        # idempotent: rerun renames nothing
        assert prep.create_split(root, every=4) == []
        prep.unsplit(root)
        assert sorted(os.listdir(osp.join(root, "pose"))) == before

    def test_dry_run_touches_nothing(self, tmp_path):
        root = make_nsvf_dirs(str(tmp_path))
        before = sorted(os.listdir(osp.join(root, "rgb")))
        renames = prep.create_split(root, every=4, dry_run=True)
        assert renames
        assert sorted(os.listdir(osp.join(root, "rgb"))) == before


class TestColmapRunner:
    def test_command_construction_matches_reference_flags(self, tmp_path):
        root = str(tmp_path)
        res = prep.run_colmap(root, run=False)
        ext, match, mapper = res.commands
        assert ext[1] == "feature_extractor"
        assert "--ImageReader.single_camera=1" in ext
        assert "--SiftExtraction.peak_threshold=0.004" in ext
        assert "--ImageReader.camera_model=SIMPLE_PINHOLE" in ext
        assert match[1] == "exhaustive_matcher"
        assert "--SiftMatching.max_ratio=0.8" in match
        assert mapper[1] == "mapper"

    def test_known_intrinsics_and_fix(self, tmp_path):
        root = str(tmp_path)
        K = np.array([[100.0, 0, 32], [0, 102.0, 24], [0, 0, 1]])
        np.savetxt(osp.join(root, "intrinsics.txt"), K)
        res = prep.run_colmap(root, known_intrin=True, fix_intrin=True,
                              run=False)
        ext = res.commands[0]
        param_arg = [a for a in ext if "camera_params" in a][0]
        f, cx, cy = [float(x) for x in param_arg.split("=")[1].split(",")]
        assert f == pytest.approx(101.0)
        assert (cx, cy) == (32.0, 24.0)
        assert "--Mapper.ba_refine_focal_length=0" in res.commands[2]

    def test_pipeline_with_mock_binary(self, tmp_path):
        root = str(tmp_path)
        # mock colmap: log each invocation
        mock = tmp_path / "colmap"
        log = tmp_path / "calls.log"
        mock.write_text(
            "#!/bin/sh\necho \"$1\" >> %s\n" % log
        )
        mock.chmod(mock.stat().st_mode | stat.S_IEXEC)
        prep.run_colmap(root, colmap_bin=str(mock), run=True)
        calls = log.read_text().split()
        assert calls == ["feature_extractor", "exhaustive_matcher", "mapper"]


class TestRecord3D:
    def test_converts_synthesized_capture(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        root = str(tmp_path)
        W, H, N = 32, 16, 6
        vw = cv2.VideoWriter(
            osp.join(root, "cap.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 10, (2 * W, H),
        )
        for i in range(N):
            frame = np.zeros((H, 2 * W, 3), np.uint8)
            frame[:, W:] = (i * 30) % 255  # rgb half
            vw.write(frame)
        vw.release()
        rng = np.random.default_rng(0)
        q = rng.standard_normal((N, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        t = rng.standard_normal((N, 3))
        meta = {
            "K": np.array([[50.0, 0, 16], [0, 50.0, 8], [0, 0, 1]]).ravel().tolist(),
            "poses": np.concatenate([q, t], axis=-1).tolist(),
        }
        json.dump(meta, open(osp.join(root, "metadata.json"), "w"))

        n = prep.proc_record3d(root, every=2, factor=2)
        assert n == 3
        assert len(os.listdir(osp.join(root, "rgb"))) == 3
        assert len(os.listdir(osp.join(root, "pose"))) == 3
        Kout = np.loadtxt(osp.join(root, "intrinsics.txt"))
        assert Kout.shape == (4, 4)
        assert Kout[0, 0] == pytest.approx(25.0)  # focal / factor
        pose = np.loadtxt(osp.join(root, "pose", "00000.txt"))
        assert pose.shape == (4, 4) and pose[3, 3] == 1
        img = cv2.imread(osp.join(root, "rgb", "00000.png"))
        assert img.shape == (8, 16, 3)  # downsampled rgb half


class TestExtractMetrics:
    def test_collects_rows_and_csv(self, tmp_path):
        from nerf_projects_tpu.obs.json_logger import MetricsLogger

        base = str(tmp_path)
        for scene, psnr in [("lego", 34.4), ("ship", 29.6)]:
            d = osp.join(base, scene)
            os.makedirs(d)
            MetricsLogger(d).log_evaluation_step(
                100, {"psnr": psnr, "ssim": 0.95}
            )
            open(osp.join(d, "time_mins.txt"), "w").write("12.5\n")
        rows = prep.extract_metrics(base)
        assert len(rows) == 2
        by_scene = {r["scene"]: r for r in rows}
        assert by_scene["lego"]["test_psnr"] == pytest.approx(34.4)
        assert by_scene["ship"]["time_mins"] == pytest.approx(12.5)
        assert osp.exists(osp.join(base, "metrics_extracted.csv"))

    def test_cli(self, tmp_path, capsys):
        from nerf_projects_tpu.cli.data_prep import main

        root = make_nsvf_dirs(str(tmp_path / "scene"))
        main(["create_split", root, "--every", "4"])
        out = capsys.readouterr().out
        assert "16 files" in out
        main(["run_colmap", root, "--dry_run"])
        out = capsys.readouterr().out
        assert "feature_extractor" in out and "mapper" in out


class TestViewData:
    def test_emits_obj_and_png(self, tmp_path):
        import json as _json

        import numpy as np

        # minimal blender-style dataset
        root = tmp_path / "scene"
        (root / "train").mkdir(parents=True)
        import imageio.v2 as imageio

        frames = []
        for i in range(3):
            name = f"r_{i}"
            imageio.imwrite(root / "train" / f"{name}.png",
                            np.zeros((8, 8, 4), np.uint8))
            c2w = np.eye(4)
            c2w[2, 3] = 4.0 + i
            frames.append({"file_path": f"./train/{name}",
                           "transform_matrix": c2w.tolist()})
        meta = {"camera_angle_x": 0.7, "frames": frames}
        _json.dump(meta, open(root / "transforms_train.json", "w"))

        from nerf_projects_tpu.cli.view_data import view_dataset

        obj, png = view_dataset(str(root), "train", str(tmp_path / "out"))
        assert osp.exists(obj) and osp.exists(png)
        content = open(obj).read()
        assert content.count("l ") > 20  # frustum + bbox edges
