"""Observability tests: JSON logger, memory tracker, MCQ/FDR metrics."""
import json
import os
from dataclasses import replace

import jax.numpy as jnp
import numpy as np
import pytest

from nerf_projects_tpu.models.sparse_grid import SparseGrid
from nerf_projects_tpu.obs.advanced_metrics import (
    compute_all_advanced_metrics,
    compute_fdr,
    compute_mcq,
)
from nerf_projects_tpu.obs.json_logger import MetricsLogger
from nerf_projects_tpu.obs.memory_tracker import MemoryTracker


class TestJsonLogger:
    def test_array_file_valid_json(self, tmp_path):
        lg = MetricsLogger(str(tmp_path))
        lg.log_training_step(1, {"loss": 0.5, "psnr": np.float32(20.0)}, 1e-3)
        lg.log_evaluation_step(2, {"psnr": jnp.asarray(21.0)})
        lg.log_octree_evaluation(3, {"psnr": 22.0}, {"note": "x"})
        with open(lg.log_file) as f:
            entries = json.load(f)
        assert len(entries) == 3
        assert entries[0]["phase"] == "training"
        assert entries[0]["metrics"]["psnr"] == 20.0
        assert isinstance(entries[1]["metrics"]["psnr"], float)
        assert entries[2]["phase"] == "octree_evaluation"

    def test_clean_existing(self, tmp_path):
        lg = MetricsLogger(str(tmp_path))
        lg.log_metrics(1, "training", {"a": 1})
        lg2 = MetricsLogger(str(tmp_path), clean_existing=True)
        assert lg2.read_entries() == []

    def test_append_preserves(self, tmp_path):
        lg = MetricsLogger(str(tmp_path))
        lg.log_metrics(1, "training", {"a": 1})
        lg2 = MetricsLogger(str(tmp_path), clean_existing=False)
        lg2.log_metrics(2, "training", {"a": 2})
        assert len(lg2.read_entries()) == 2


class TestMemoryTracker:
    def test_snapshot_and_metrics(self):
        tr = MemoryTracker()
        snap = tr.capture_snapshot(5)
        m = tr.get_memory_metrics(snap)
        assert m["process_rss_gb"] > 0
        assert m["system_total_gb"] > 0

    def test_efficiency_indices(self):
        tr = MemoryTracker()
        tr.peak_rss_gb = 2.0  # force a known memory value
        idx = tr.calculate_efficiency_indices(
            30.0, ssim=0.9, lpips=0.1,
            storage_size_gb=0.5, compression_ratio=10.0, occupancy_ratio=0.2,
        )
        assert idx["memory_efficiency_index"] == pytest.approx(15.0)
        assert idx["quality_memory_tradeoff"] == pytest.approx(13.5)
        assert idx["lpips_memory_efficiency"] == pytest.approx(0.45)
        assert idx["combined_quality_memory_index"] == pytest.approx(
            30 * 0.9 * 0.9 / 2
        )
        assert idx["storage_aware_mei"] == pytest.approx(30 * 1.0 / 0.5)
        assert idx["voxel_density_efficiency"] == pytest.approx(30 * 0.2 / 0.5)

    def test_model_size_estimate(self):
        tr = MemoryTracker()
        params = {"w": jnp.zeros((10, 10)), "b": jnp.zeros((10,))}
        est = tr.get_model_size_estimate(params)
        assert est["param_count"] == 110
        assert est["param_gb"] == pytest.approx(110 * 4 / 1e9)


class TestAdvancedMetrics:
    def test_mcq(self):
        m = compute_mcq(30.0, 3072.0)
        assert m["MCQ"] == pytest.approx(0.1)
        assert m["peak_gpu_gb"] == pytest.approx(3.0)

    def test_fdr_single_blob_no_floaters(self):
        occ = np.zeros((32, 32, 32), bool)
        occ[8:24, 8:24, 8:24] = True
        r = compute_fdr(occupancy=occ, min_object_size=10)
        assert r["FDR"] == 0.0
        assert r["num_floaters"] == 0
        assert r["num_components"] == 1

    def test_fdr_detects_floaters(self):
        occ = np.zeros((64, 64, 64), bool)
        occ[8:40, 8:40, 8:40] = True  # main object, 32^3
        occ[55, 55, 55] = True        # floater voxel
        occ[60:62, 60:62, 60:62] = True  # another small floater
        r = compute_fdr(occupancy=occ, min_object_size=100)
        assert r["num_floaters"] == 2
        assert r["floater_volume"] == 9
        assert r["FDR"] == pytest.approx(9 / (32**3 + 9))
        assert r["main_volume"] == 32**3

    def test_fdr_on_sparse_grid(self):
        g = SparseGrid.create(16, basis_dim=1, init_density=0.0)
        links = np.asarray(g.links)
        dens = np.zeros((g.capacity, 1), np.float32)
        dens[links[4:12, 4:12, 4:12].ravel()] = 10.0
        dens[links[15, 15, 15]] = 10.0
        g = replace(g, density_data=jnp.asarray(dens))
        r = compute_fdr(g, threshold=1.0, min_object_size=10)
        assert r["num_floaters"] == 1
        assert r["total_volume"] == 8**3 + 1

    def test_all_metrics_bundle(self):
        g = SparseGrid.create(8, basis_dim=1, init_density=1.0)
        out = compute_all_advanced_metrics(
            g, psnr=30.0, peak_memory_mb=1024.0, storage_bytes=10**9
        )
        assert "MCQ" in out and "FDR" in out and "SMEI" in out


class TestAnalysis:
    def _fake_experiment(self, exp_dir):
        import json as _json
        import os as _os

        _os.makedirs(exp_dir, exist_ok=True)
        with open(_os.path.join(exp_dir, "training_log.jsonl"), "w") as f:
            for i in range(5):
                f.write(_json.dumps({
                    "step": (i + 1) * 100, "loss": 0.1 / (i + 1),
                    "psnr": 20 + i, "rays_per_sec": 1000.0 + i,
                }) + "\n")
        ts = _os.path.join(exp_dir, "testset_000500")
        _os.makedirs(ts, exist_ok=True)
        with open(_os.path.join(ts, "metrics.json"), "w") as f:
            _json.dump({"mean": {"psnr": 24.5, "ssim": 0.8}}, f)
        from nerf_projects_tpu.obs.json_logger import MetricsLogger

        lg = MetricsLogger(exp_dir, clean_existing=False)
        lg.log_training_step(100, {"loss": 0.1, "psnr": 20}, 1e-3,
                             memory_metrics={"device_memory_gb": 1.0,
                                             "process_rss_gb": 2.0})

    def test_curves_and_summary(self, tmp_path):
        from nerf_projects_tpu.obs.analysis import (
            analyze_all_experiments,
            experiment_summary,
            plot_training_curves,
        )

        exp = str(tmp_path / "exp_a")
        self._fake_experiment(exp)
        png = plot_training_curves(exp)
        assert png and os.path.exists(png)
        row = experiment_summary(exp)
        assert row["final_train_psnr"] == 24
        assert row["test_psnr"] == 24.5
        self._fake_experiment(str(tmp_path / "exp_b"))
        rows = analyze_all_experiments(str(tmp_path))
        assert len(rows) == 2
        assert os.path.exists(tmp_path / "comparison.json")


class TestFloaterViz:
    def test_slices_written(self, tmp_path):
        from nerf_projects_tpu.obs.floater_viz import (
            floater_masks,
            render_floater_slices,
        )

        g = SparseGrid.create(24, basis_dim=1, init_density=0.0)
        links = np.asarray(g.links)
        dens = np.zeros((g.capacity, 1), np.float32)
        dens[links[6:16, 6:16, 6:16].ravel()] = 5.0  # main blob
        dens[links[21, 21, 21]] = 5.0                 # floater
        g = replace(g, density_data=jnp.asarray(dens))
        occ, flo = floater_masks(g, threshold=1.0, min_object_size=50)
        assert flo.sum() == 1 and flo[21, 21, 21]
        paths = render_floater_slices(
            g, str(tmp_path), threshold=1.0, min_object_size=50, n_slices=2
        )
        assert len(paths) == 2
        assert all(os.path.exists(p) for p in paths)


class TestFloaterVizDepth:
    def _grid(self):
        from dataclasses import replace as _replace

        import jax.numpy as jnp

        g = SparseGrid.create(32, basis_dim=1, use_sphere_bound=False,
                              init_density=0.0)
        links = np.asarray(g.links)
        dens = np.zeros((g.capacity, 1), np.float32)
        dens[links[12:20, 12:20, 12:20].ravel()] = 5.0  # main blob
        dens[links[2, 2, 2]] = 5.0                      # floater A
        dens[links[28, 28, 28]] = 5.0                   # floater B
        return _replace(g, density_data=jnp.asarray(dens))

    def test_density_projection(self):
        from nerf_projects_tpu.obs.floater_viz import (
            render_density_projection,
        )

        g = self._grid()
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.0, 0.0, -3.0]
        K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1.0]])
        img = render_density_projection(g, pose, K, 64, 64)
        assert img.shape == (64, 64)
        assert img.max() == 5.0  # x-ray max projection hits the blob
        imgs = render_density_projection(g, pose, K, 64, 64,
                                         reduce="sum")
        assert imgs.max() > img.max()  # summed density exceeds max

    def test_component_overlay_colors_floaters(self):
        from nerf_projects_tpu.obs.floater_viz import component_overlay

        g = self._grid()
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.0, 0.0, -3.0]
        K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1.0]])
        rgb = np.full((64, 64, 3), 0.5, np.float32)
        out = component_overlay(rgb, g, pose, K, threshold=0.5,
                                min_object_size=100)
        assert out.shape == rgb.shape
        diff = np.abs(out - rgb).sum(-1)
        assert (diff > 0.1).sum() >= 2  # floaters + main tint visible
        # floater pixels are reddish (first palette color), greener
        # pixels are the main-object tint
        changed = out[diff > 0.1]
        assert (changed[:, 0] > changed[:, 2]).any()

    def test_floater_panel_written(self, tmp_path):
        from nerf_projects_tpu.obs.floater_viz import floater_panel

        g = self._grid()
        p = floater_panel(
            g, os.path.join(str(tmp_path), "panel.png"),
            threshold=0.5, min_object_size=100, n_slices=3,
        )
        assert os.path.exists(p)


class TestFloaterVizTB:
    def test_projection_and_tb_logging(self, tmp_path):
        import jax.numpy as jnp
        from dataclasses import replace as _replace

        from nerf_projects_tpu.models.sparse_grid import SparseGrid
        from nerf_projects_tpu.obs.floater_viz import (
            log_floater_visualizations,
            overlay_on_render,
            project_floaters_to_view,
            floater_masks,
        )

        # a big central blob + a tiny detached floater
        g = SparseGrid.create(32, basis_dim=1, use_sphere_bound=False,
                              init_density=0.0)
        links = np.asarray(g.links)
        dens = np.zeros((g.capacity, 1), np.float32)
        for x in range(12, 20):
            for y in range(12, 20):
                for z in range(12, 20):
                    dens[links[x, y, z]] = 5.0
        dens[links[2, 2, 2]] = 5.0  # floater voxel
        g = _replace(g, density_data=jnp.asarray(dens))

        occ, flo = floater_masks(g, threshold=0.5, min_object_size=100)
        assert flo[2, 2, 2] and not flo[15, 15, 15]

        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.0, 0.0, -3.0]
        K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1.0]])
        heat = project_floaters_to_view(g, flo, pose, K, 64, 64,
                                        min_density=0.1)
        assert heat is not None and heat.sum() >= 1

        rgb = np.full((64, 64, 3), 0.5, np.float32)
        over = overlay_on_render(rgb, heat)
        assert over.shape == rgb.shape
        assert (over != rgb).any()

        class FakeTB:
            def __init__(self):
                self.images = {}
                self.scalars = {}

            def image(self, tag, img, step):
                self.images[tag] = np.asarray(img)

            def scalar(self, tag, val, step):
                self.scalars[tag] = float(val)

        tb = FakeTB()
        n = log_floater_visualizations(
            tb, g, 100, cameras=[(pose, K, 64, 64)], renders=[rgb],
            threshold=0.5, min_object_size=100,
        )
        assert n >= 4
        assert tb.scalars["floaters/voxels"] == 1.0
        assert any(t.startswith("floaters/slice_z") for t in tb.images)
        assert "floaters/heatmap_view_0" in tb.images
        assert "floaters/overlay_view_0" in tb.images


class TestMemoryAnalysis:
    def _make_log(self, tmp_path):
        from nerf_projects_tpu.obs.json_logger import MetricsLogger

        lg = MetricsLogger(str(tmp_path))
        for i in range(5):
            lg.log_training_step(
                i, {"psnr": 20.0 + i, "loss": 0.1 / (i + 1)}, 1e-2,
                memory_metrics={"device_memory_gb": 1.0 + 0.1 * i,
                                "device_peak_memory_gb": 2.0},
                efficiency_indices={
                    "memory_efficiency_index": (20.0 + i) / (1.0 + 0.1 * i)
                },
            )
        lg.log_evaluation_step(
            5, {"psnr": 26.0, "ssim": 0.9},
            memory_metrics={"device_memory_gb": 1.5,
                            "device_peak_memory_gb": 2.5},
            efficiency_indices={"memory_efficiency_index": 26.0 / 1.5},
        )
        return lg.log_file

    def test_analyzer_stats_and_report(self, tmp_path):
        from nerf_projects_tpu.obs.memory_analysis import MemoryAnalyzer

        log = self._make_log(tmp_path)
        an = MemoryAnalyzer([log])
        assert len(an.entries) == 6
        stats = an.analyze_memory_efficiency()
        assert stats["max_memory_efficiency_index"] >= 20.0
        assert abs(stats["max_device_memory_gb"] - 1.5) < 1e-9
        train = an.analyze_memory_efficiency("training")
        assert train["min_device_memory_gb"] == 1.0
        cmp = an.compare_phases()
        assert "training" in cmp.index and "evaluation" in cmp.index
        rep = an.generate_report(str(tmp_path / "mem.md"))
        text = open(rep).read()
        assert "Phase: training" in text and "Phase comparison" in text

    def test_analyze_directory(self, tmp_path):
        from nerf_projects_tpu.obs.memory_analysis import analyze_directory

        self._make_log(tmp_path)
        an = analyze_directory(str(tmp_path))
        assert os.path.exists(os.path.join(str(tmp_path),
                                           "memory_report.md"))
        assert os.path.exists(os.path.join(str(tmp_path),
                                           "memory_trends.png"))
        assert len(an.entries) > 0
