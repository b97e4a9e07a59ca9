"""Plenoxels CLI smoke test: args -> training with upsampling -> artifacts."""
import json
import os

import numpy as np
import pytest

from nerf_projects_tpu.cli.train_plenoxels import build_parser, run
from nerf_projects_tpu.data.base import SceneData
from nerf_projects_tpu.data.synthetic import make_dataset
from nerf_projects_tpu.utils.config import maybe_merge_config_file


@pytest.fixture
def scene():
    ds = make_dataset(n_views=4, image_size=24)
    return SceneData(
        images=np.asarray(ds["images"]),
        poses=np.asarray(ds["poses"]),
        intrinsics=ds["intrinsics"],
        near=ds["near"],
        far=ds["far"],
    )


class TestPlenoxelsCli:
    def test_end_to_end_with_upsample(self, tmp_path, scene):
        parser = build_parser()
        args = parser.parse_args(
            [
                "--train_dir", str(tmp_path / "ckpt"),
                "--reso", "[[16,16,16],[24,24,24]]",
                "--upsamp_every", "60",
                "--n_iters", "120",
                "--batch_size", "512",
                "--lr_sigma", "3.0",
                "--lr_sigma_delay_steps", "0",
                "--lr_sh", "0.1",
                "--sh_dim", "1",
                "--thresh_type", "sigma",
                "--density_thresh", "0.5",
                "--print_every", "20",
                "--log_fdr",
            ]
        )
        grid, trainer, result = run(args, scene=scene, test_scene=scene)
        assert grid.reso == (24, 24, 24)  # upsample happened
        assert os.path.exists(os.path.join(args.train_dir, "ckpt.npz"))
        assert os.path.exists(os.path.join(args.train_dir, "time_mins.txt"))
        assert os.path.exists(os.path.join(args.train_dir, "test_psnr.txt"))
        assert os.path.exists(os.path.join(args.train_dir, "args.json"))
        assert result["psnr"] > 10
        assert "FDR" in result

    @pytest.mark.parametrize("mode", ["tiles", "sparse"])
    def test_tile_step_modes(self, tmp_path, scene, mode):
        """Brick/tile fast paths reachable from the CLI: a few steps +
        one upsample boundary (grid materialize/rebuild) + save."""
        import nerf_projects_tpu.ops.pallas.tile_march as tm

        old = tm.INTERPRET
        tm.INTERPRET = True
        try:
            parser = build_parser()
            args = parser.parse_args(
                [
                    "--train_dir", str(tmp_path / "ckpt"),
                    "--reso", "[[16,16,16],[24,24,24]]",
                    "--upsamp_every", "3",
                    "--n_iters", "4",
                    "--batch_size", "128",
                    "--lr_sigma", "3.0",
                    "--lr_sigma_delay_steps", "0",
                    "--lr_sh", "0.1",
                    "--sh_dim", "1",
                    "--thresh_type", "sigma",
                    "--density_thresh", "0.0",
                    "--print_every", "2",
                    "--step_mode", mode,
                ]
            )
            grid, trainer, result = run(args, scene=scene,
                                        test_scene=scene)
            assert grid.reso == (24, 24, 24)
            assert os.path.exists(
                os.path.join(args.train_dir, "ckpt.npz")
            )
            assert np.isfinite(result["psnr"])
        finally:
            tm.INTERPRET = old

    def test_json_config_merge(self, tmp_path, scene):
        cfg = tmp_path / "syn.json"
        cfg.write_text(json.dumps({"n_iters": 10, "batch_size": 256,
                                   "sh_dim": 1, "lr_sigma": 3.0,
                                   "lr_sigma_delay_steps": 0}))
        parser = build_parser()
        args = parser.parse_args(
            ["--train_dir", str(tmp_path / "c2"), "--config", str(cfg),
             "--reso", "[[12,12,12]]", "--thresh_type", "sigma"]
        )
        args = maybe_merge_config_file(args)
        assert args.n_iters == 10
        grid, trainer, result = run(args, scene=scene, test_scene=scene)
        assert grid.reso == (12, 12, 12)
