"""End-to-end training convergence tests on the synthetic sphere scene."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.data.synthetic import (
    default_scene,
    make_dataset,
    ray_batches,
    render_scene,
)
from nerf_projects_tpu.models.pipeline import NeRFRenderConfig
from nerf_projects_tpu.train.nerf_trainer import NeRFTrainer
from nerf_projects_tpu.core.rays import camera_rays


def small_cfg(fine=0):
    return NeRFRenderConfig(
        num_coarse_samples=32,
        num_fine_samples=fine,
        multires=6,
        multires_views=2,
        use_viewdirs=False,
        white_bkgd=True,
        perturb=True,
    )


class TestSyntheticScene:
    def test_groundtruth_has_structure(self):
        ds = make_dataset(n_views=2, image_size=32)
        img = np.asarray(ds["images"][0])
        assert img.shape == (32, 32, 3)
        assert img.max() > 0.9  # white background visible
        assert img.std() > 0.1  # spheres visible


class TestTraining:
    def test_loss_drops_and_psnr_climbs(self):
        ds = make_dataset(n_views=4, image_size=32)
        cfg = small_cfg()
        trainer = NeRFTrainer(
            cfg, depth=4, width=96, near=ds["near"], far=ds["far"], lrate=5e-3
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        batches = ray_batches(jax.random.PRNGKey(1), ds, 512)
        first_psnr, last_psnr = None, None
        for i in range(150):
            rays, target = next(batches)
            state, stats = trainer.train_step(state, rays, target)
            if i == 0:
                first_psnr = float(stats["psnr"])
        last_psnr = float(stats["psnr"])
        assert last_psnr > first_psnr + 5.0, (first_psnr, last_psnr)
        assert last_psnr > 18.0, last_psnr

    def test_hierarchical_path_trains(self):
        ds = make_dataset(n_views=2, image_size=24)
        cfg = small_cfg(fine=16)
        trainer = NeRFTrainer(
            cfg, depth=3, width=64, near=ds["near"], far=ds["far"], lrate=5e-3
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        batches = ray_batches(jax.random.PRNGKey(1), ds, 256)
        losses = []
        for _ in range(60):
            rays, target = next(batches)
            state, stats = trainer.train_step(state, rays, target)
            losses.append(float(stats["loss"]))
        assert losses[-1] < losses[0] * 0.5

    def test_render_image_matches_target_after_training(self):
        ds = make_dataset(n_views=4, image_size=24)
        cfg = small_cfg()
        trainer = NeRFTrainer(
            cfg, depth=4, width=96, near=ds["near"], far=ds["far"], lrate=5e-3
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        batches = ray_batches(jax.random.PRNGKey(1), ds, 512)
        for _ in range(120):
            rays, target = next(batches)
            state, _ = trainer.train_step(state, rays, target)
        rays = camera_rays(24, 24, ds["intrinsics"], jnp.asarray(ds["poses"][0]))
        out = trainer.render_image(state.params, rays, chunk=256)
        assert out["rgb"].shape == (24, 24, 3)
        mse = float(jnp.mean((out["rgb"] - ds["images"][0]) ** 2))
        psnr = -10 * np.log10(mse)
        assert psnr > 16.0, psnr


class TestNeRFSHTraining:
    def test_sh_model_trains_on_synthetic(self):
        from nerf_projects_tpu.models.nerf_sh import NeRFSHModel
        from nerf_projects_tpu.train.nerf_sh_trainer import NeRFSHTrainer

        ds = make_dataset(n_views=3, image_size=24)
        model = NeRFSHModel(
            num_coarse_samples=24,
            num_fine_samples=0,
            sh_deg=1,
            net_depth=3,
            net_width=64,
            max_deg_point=5,
            near=ds["near"],
            far=ds["far"],
            white_bkgd=True,
        )
        trainer = NeRFSHTrainer(
            model,
            lr_init=5e-3,
            lr_final=5e-4,
            max_steps=200,
            lr_delay_steps=0,
            sparsity_weight=0.01,
            sparsity_npoints=256,
            weight_decay_mult=1e-6,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        batches = ray_batches(jax.random.PRNGKey(1), ds, 256)
        first = None
        for i in range(120):
            rays, target = next(batches)
            state, stats = trainer.train_step(state, rays, target)
            if i == 0:
                first = float(stats["psnr"])
        assert float(stats["psnr"]) > first + 4.0
        assert "loss_sp" in stats and "weight_l2" in stats


class TestScanSteps:
    def test_scan_matches_loop_semantics_and_converges(self):
        ds = make_dataset(n_views=4, image_size=24)
        cfg = small_cfg()
        trainer = NeRFTrainer(
            cfg, depth=3, width=64, near=ds["near"], far=ds["far"], lrate=5e-3
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, stats = trainer.scan_steps(
            state, ds["rays"], ds["pixels"], 100, batch_size=256
        )
        assert int(state.step) == 100
        psnrs = np.asarray(stats["psnr"])
        assert psnrs.shape == (100,)
        assert psnrs[-10:].mean() > psnrs[:10].mean() + 3


class TestNDCTraining:
    def test_forward_facing_ndc_converges(self):
        """Driver config 3 parity: NDC ray parameterization end-to-end."""
        from nerf_projects_tpu.core.rays import Rays, camera_rays, ndc_rays
        from nerf_projects_tpu.data.synthetic import default_scene, render_scene

        scene = default_scene()
        H = W = 24
        focal = 40.0
        K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
        # forward-facing cameras at z ~ 4 with small lateral offsets
        rng = np.random.default_rng(0)
        all_rays, all_ndc, all_rgb = [], [], []
        for v in range(6):
            c2w = np.eye(4, dtype=np.float32)
            c2w[:2, 3] = rng.uniform(-0.4, 0.4, 2)
            c2w[2, 3] = 4.0
            rays = camera_rays(H, W, K, jnp.asarray(c2w))
            gt = render_scene(scene, rays, near=2.0, far=6.0)
            o, d = ndc_rays(H, W, focal, 1.0, rays.origins, rays.directions)
            flat = Rays(
                o.reshape(-1, 3), d.reshape(-1, 3),
                rays.viewdirs.reshape(-1, 3),
            )
            all_ndc.append(flat)
            all_rgb.append(gt.reshape(-1, 3))
        pool = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *all_ndc)
        pixels = jnp.concatenate(all_rgb)

        cfg = NeRFRenderConfig(
            num_coarse_samples=32, num_fine_samples=0, multires=6,
            multires_views=2, use_viewdirs=False, white_bkgd=False,
            perturb=True,
        )
        # NDC: march t in [0, 1]
        trainer = NeRFTrainer(cfg, depth=4, width=96, near=0.0, far=1.0, lrate=5e-3)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, stats = trainer.scan_steps(state, pool, pixels, 150, batch_size=512)
        psnrs = np.asarray(stats["psnr"])
        assert psnrs[-10:].mean() > psnrs[:10].mean() + 4, (
            psnrs[:10].mean(), psnrs[-10:].mean()
        )
        assert psnrs[-10:].mean() > 20
