"""End-to-end driver test: config -> generated blender scene -> train() ->
logs/checkpoints/testset artifacts on disk."""
import json
import os

import numpy as np
import pytest

from nerf_projects_tpu.utils.config import (
    AttrDict,
    create_default_config,
    load_or_create_config,
    maybe_merge_config_file,
    update_flags,
    validate_config,
)


def _make_blender_set(root, n=3, size=24):
    import imageio.v2 as imageio

    from nerf_projects_tpu.core.rays import pose_spherical

    rng = np.random.default_rng(0)
    os.makedirs(f"{root}/train", exist_ok=True)
    os.makedirs(f"{root}/test", exist_ok=True)
    for split, cnt in [("train", n), ("test", 2)]:
        frames = []
        for i in range(cnt):
            img = rng.uniform(size=(size, size, 4))
            imageio.imwrite(
                f"{root}/{split}/r_{i}.png", (img * 255).astype(np.uint8)
            )
            pose = pose_spherical(i * 60.0, -30.0, 4.0)
            frames.append(
                {"file_path": f"{split}/r_{i}", "transform_matrix": pose.tolist()}
            )
        with open(f"{root}/transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)


class TestConfig:
    def test_defaults_validate(self):
        cfg = create_default_config()
        assert validate_config(cfg)
        assert cfg["N_samples"] == 64

    def test_reference_yaml_consumable(self, tmp_path):
        # a config in the reference's format
        p = tmp_path / "exp.yaml"
        p.write_text(
            "expname: ship_test\ndataset_type: blender\nN_samples: 96\n"
            "N_importance: 192\nuse_viewdirs: true\nwhite_bkgd: true\n"
            "datadir: ./data/ship\n"
        )
        cfg = load_or_create_config(str(p))
        assert cfg.N_samples == 96
        assert cfg.use_viewdirs is True
        assert cfg.lrate == 5e-4  # default preserved

    def test_update_flags_rejects_unknown(self, tmp_path):
        class F:
            def __init__(self):
                self.train_dir = "x"
                self.data_dir = "y"
                self.batch_size = 8

        p = tmp_path / "c.yaml"
        p.write_text("batch_size: 16\n")
        f = update_flags(F(), str(p))
        assert f.batch_size == 16
        p.write_text("nonexistent_key: 1\n")
        with pytest.raises(ValueError):
            update_flags(F(), str(p))

    def test_merge_json_config(self, tmp_path):
        import argparse

        p = tmp_path / "c.json"
        p.write_text('{"lr": 0.1}')
        ns = argparse.Namespace(config=str(p), lr=0.5)
        ns = maybe_merge_config_file(ns)
        assert ns.lr == 0.1
        p.write_text('{"bogus": 1}')
        ns = argparse.Namespace(config=str(p), lr=0.5)
        with pytest.raises(ValueError):
            maybe_merge_config_file(ns)


class TestTrainLoop:
    def test_end_to_end_artifacts(self, tmp_path):
        from nerf_projects_tpu.train.loop import train

        data_root = str(tmp_path / "scene")
        _make_blender_set(data_root)
        cfg = AttrDict(create_default_config())
        cfg.update(
            dataset_type="blender",
            datadir=data_root,
            basedir=str(tmp_path / "logs"),
            expname="smoke",
            N_rand=128,
            N_samples=16,
            N_importance=0,
            netdepth=2,
            netwidth=32,
            multires=4,
            multires_views=2,
            use_viewdirs=False,
            white_bkgd=True,
            i_print=5,
            i_weights=20,
            i_testset=20,
            testskip=1,
            half_res=False,
        )
        trainer, state = train(cfg, max_iters=20)
        exp = os.path.join(cfg.basedir, "smoke")
        assert os.path.exists(os.path.join(exp, "training_log.jsonl"))
        assert os.path.exists(os.path.join(exp, "training_log.csv"))
        assert os.path.exists(
            os.path.join(exp, "checkpoints", f"{20:09d}.msgpack")
        )
        test_dir = os.path.join(exp, "testset_000020")
        assert os.path.exists(os.path.join(test_dir, "metrics.json"))
        with open(os.path.join(test_dir, "metrics.json")) as f:
            m = json.load(f)
        assert "psnr" in m["mean"] and "ssim" in m["mean"]
        with open(os.path.join(exp, "metrics_log.json")) as f:
            entries = json.load(f)
        assert any(e["phase"] == "training" for e in entries)
        assert any(e["phase"] == "evaluation" for e in entries)

    def test_resume_from_checkpoint(self, tmp_path):
        from nerf_projects_tpu.train.loop import train

        data_root = str(tmp_path / "scene")
        _make_blender_set(data_root)
        cfg = AttrDict(create_default_config())
        cfg.update(
            dataset_type="blender",
            datadir=data_root,
            basedir=str(tmp_path / "logs"),
            expname="resume",
            N_rand=64,
            N_samples=8,
            N_importance=0,
            netdepth=2,
            netwidth=16,
            multires=2,
            multires_views=2,
            use_viewdirs=False,
            white_bkgd=True,
            i_print=100,
            i_weights=10,
            i_testset=1000,
            testskip=1,
        )
        _, state1 = train(cfg, max_iters=10)
        assert int(state1.step) == 10
        # resume continues from step 10
        _, state2 = train(cfg, max_iters=15)
        assert int(state2.step) == 15


class TestNoBatching:
    def test_per_image_sampling_with_precrop(self, tmp_path):
        from nerf_projects_tpu.train.loop import train

        data_root = str(tmp_path / "scene")
        _make_blender_set(data_root)
        cfg = AttrDict(create_default_config())
        cfg.update(
            dataset_type="blender",
            datadir=data_root,
            basedir=str(tmp_path / "logs"),
            expname="nobatch",
            no_batching=True,
            precrop_iters=5,
            precrop_frac=0.5,
            N_rand=64,
            N_samples=8,
            N_importance=0,
            netdepth=2,
            netwidth=16,
            multires=2,
            multires_views=2,
            use_viewdirs=False,
            white_bkgd=True,
            i_print=100,
            i_weights=1000,
            i_testset=1000,
            testskip=1,
        )
        trainer, state = train(cfg, max_iters=10)
        assert int(state.step) == 10
