"""NeRF-SH train/eval CLI smoke tests (flags -> training -> eval JSONs)."""
import json
import os

import jax
import numpy as np
import pytest

from nerf_projects_tpu.cli.eval_nerf_sh import evaluate
from nerf_projects_tpu.cli.nerf_sh_flags import NeRFSHFlags, build_model
from nerf_projects_tpu.cli.train_nerf_sh import train_main
from nerf_projects_tpu.data.base import SceneData
from nerf_projects_tpu.data.synthetic import make_dataset


@pytest.fixture
def scene():
    ds = make_dataset(n_views=3, image_size=24)
    return SceneData(
        images=np.asarray(ds["images"]),
        poses=np.asarray(ds["poses"]),
        intrinsics=ds["intrinsics"],
        near=ds["near"],
        far=ds["far"],
    )


class TestSHCli:
    def test_train_and_eval(self, tmp_path, scene):
        flags = NeRFSHFlags(
            train_dir=str(tmp_path / "run"),
            sh_deg=1,
            use_viewdirs=False,
            num_coarse_samples=8,
            num_fine_samples=0,
            net_depth=2,
            net_width=32,
            max_deg_point=4,
            batch_size=64,
            print_every=10,
            save_every=20,
            render_every=0,
            chunk=256,
        )
        trainer, state, _, _ = train_main(
            flags, scene=scene, test_scene=scene, max_steps=20
        )
        assert os.path.exists(os.path.join(flags.train_dir, "checkpoint.msgpack"))
        assert os.path.exists(os.path.join(flags.train_dir, "timings.txt"))

        summary = evaluate(flags, trainer=trainer, state=state, scene=scene)
        for fname in (
            "nerf_evaluation_steps.json",
            "nerf_evaluation_summary.json",
            "nerf_evaluation_final.json",
        ):
            assert os.path.exists(os.path.join(flags.train_dir, fname))
        assert summary["n_images"] == 3
        assert "rays_per_sec" in summary
        assert "efficiency_indices" in summary

    def test_eval_from_checkpoint_reload(self, tmp_path, scene):
        flags = NeRFSHFlags(
            train_dir=str(tmp_path / "run2"),
            sh_deg=0,
            use_viewdirs=False,
            num_coarse_samples=8,
            num_fine_samples=0,
            net_depth=2,
            net_width=32,
            max_deg_point=4,
            batch_size=64,
            print_every=100,
            save_every=10,
            render_every=0,
            chunk=256,
            approx_eval_skip=2,
        )
        train_main(flags, scene=scene, test_scene=scene, max_steps=10)
        # fresh evaluate() reconstructing model+state from flags/checkpoint
        summary = evaluate(flags, scene=scene)
        assert summary["n_images"] == 2  # approx_eval_skip=2 over 3 views
