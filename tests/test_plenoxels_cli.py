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

    @pytest.mark.parametrize("mode", ["tiles", "sparse", "touched",
                                      "flat"])
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

    def test_render_imgs_tiles_renderer(self, scene):
        """The --tiles renderer path (prebuilt kernel arrays + chunk
        compaction) renders a full view from a SparseGrid."""
        import jax.tree_util as tu

        import nerf_projects_tpu.ops.pallas.tile_march as tm
        from nerf_projects_tpu.cli import render_imgs as ri
        from nerf_projects_tpu.cli.train_plenoxels import _to_opencv_pose
        from nerf_projects_tpu.core.rays import camera_rays_opencv
        from nerf_projects_tpu.models.sparse_grid import SparseGrid
        from nerf_projects_tpu.ops.brick_grid import from_sparse_grid
        from nerf_projects_tpu.ops.grid import GridRenderOptions
        from nerf_projects_tpu.ops.tile_render import tiles_from_image_rays

        old = tm.INTERPRET
        tm.INTERPRET = True
        try:
            import jax.numpy as jnp

            g = SparseGrid.create(16, basis_dim=1, use_sphere_bound=True,
                                  init_density=0.5)
            bg = from_sparse_grid(g)
            opts = GridRenderOptions(step_size=0.5)
            ka = tm.build_kernel_arrays(bg)
            fx = float(scene.intrinsics[0, 0])
            fy = float(scene.intrinsics[1, 1])
            cx = float(scene.intrinsics[0, 2])
            cy = float(scene.intrinsics[1, 2])
            Hp = -(-scene.height // 8) * 8
            Wp = -(-scene.width // 16) * 16
            r0 = camera_rays_opencv(
                Hp, Wp, fx, fy, cx, cy,
                jnp.asarray(_to_opencv_pose(scene.poses[0], scene)),
            )
            t0 = tiles_from_image_rays(
                tu.tree_map(lambda x: x.reshape(-1, 3), r0),
                Hp, Wp, 8, 16,
            )
            ck = tm.required_chunks(bg, t0, opts)
            img = ri.render_grid_image_tiles(
                tm.geometry_only(bg), ka, ck, scene, 0, opts
            )
            assert img.shape == (scene.height, scene.width, 3)
            assert bool(jnp.all(jnp.isfinite(img)))

            # --frame: the whole-frame single-dispatch renderer must
            # reproduce the tile renderer's image on the same view
            pka = tm.pack_kernel_arrays(*ka)
            img_f = ri.render_grid_image_frame(
                tm.geometry_only(bg), pka, scene, 0, opts,
                tm.default_chunks_for(bg, opts),
            )
            assert img_f.shape == (scene.height, scene.width, 3)
            np.testing.assert_allclose(
                np.asarray(img_f), np.asarray(img), rtol=1e-4,
                atol=1e-5,
            )
            # approximate fast mode stays finite
            img_c = ri.render_grid_image_frame(
                tm.geometry_only(bg), pka, scene, 0, opts,
                tm.default_chunks_for(bg, opts), max_windows=2,
            )
            assert bool(jnp.all(jnp.isfinite(img_c)))
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


class TestCliQualityRecipe:
    def test_default_schedule_matches_reference_ratios(self):
        """The -1 sentinels must resolve to the reference's schedule
        ratios (svox2/opt/opt.py:100 defaults against its 128k-step
        run): delay 15000/128000, decay horizon 250000/128000 — the
        round-3 quality root causes live in exactly these knobs."""
        from nerf_projects_tpu.cli.train_plenoxels import (
            build_parser, resolve_schedule,
        )

        p = build_parser()
        a = resolve_schedule(p.parse_args(
            ["--train_dir", "/tmp/x", "--n_iters", "128000"]))
        assert a.lr_sigma_delay_steps == 15000
        assert a.lr_sigma_decay_steps == 250000
        assert a.lr_sh_decay_steps == 250000
        assert a.lambda_sparsity == 0.0        # syn.json: TV only
        assert a.rms_pervisit == 1             # sparse-indexer rms
        a2 = resolve_schedule(p.parse_args(
            ["--train_dir", "/tmp/x", "--n_iters", "20000"]))
        assert a2.lr_sigma_delay_steps == round(20000 * 15000 / 128000)
        assert a2.lr_sigma_decay_steps == round(20000 * 250000 / 128000)

    def test_convergence_via_cli_defaults(self, tmp_path):
        """Quality-catastrophe regression gate: the DEFAULT CLI
        schedule (delay ramp + per-visit rms + normalized TV + zero
        sparsity) must converge well past the 18-19 dB fixed point the
        round-3 dynamics probe measured for the broken schedule
        (NOTES_ROUND3 r3z). At this miniature scale (48^2 images, 32^3
        grid, 800 steps) the healthy recipe reaches ~25 dB held-out —
        the 30 dB-class recipe's behavior; the broken one locks below
        19 regardless of step count."""
        H = 48
        ds = make_dataset(n_views=10, image_size=H,
                          focal=80.0 * H / 96.0, seed=3)
        scene = SceneData(
            images=np.asarray(ds["images"][1:]),
            poses=np.asarray(ds["poses"][1:]),
            intrinsics=ds["intrinsics"], near=ds["near"], far=ds["far"],
        )
        test = SceneData(
            images=np.asarray(ds["images"][:1]),
            poses=np.asarray(ds["poses"][:1]),
            intrinsics=ds["intrinsics"], near=ds["near"], far=ds["far"],
        )
        parser = build_parser()
        args = parser.parse_args([
            "--train_dir", str(tmp_path / "ckpt"),
            "--reso", "[[32,32,32]]",
            "--n_iters", "800", "--batch_size", "1024",
            "--step_mode", "cell", "--print_every", "400",
        ])
        _grid, _trainer, result = run(args, scene=scene,
                                      test_scene=test)
        assert result["psnr"] > 23.0, result
