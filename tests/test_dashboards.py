"""Analysis-suite tests on generated logs (VERDICT r1 #7: run_all emits
the dashboard set from a directory of experiment logs)."""
import json
import os

import numpy as np
import pytest

from nerf_projects_tpu.obs.json_logger import MetricsLogger


def make_experiment(base, name, *, n_steps=50, with_pipeline=True,
                    psnr0=15.0, seed=0):
    d = os.path.join(base, name)
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    logger = MetricsLogger(d)
    for i in range(0, n_steps, 5):
        psnr = psnr0 + 10 * i / n_steps + rng.normal(0, 0.2)
        logger.log_training_step(
            i,
            {"loss": float(np.exp(-i / n_steps) * 0.1), "psnr": float(psnr)},
            5e-4,
            memory_metrics={"device_memory_gb": 1.0 + i / n_steps},
            efficiency_indices={"memory_efficiency_index": float(psnr)},
        )
    if with_pipeline:
        logger.log_evaluation_step(n_steps, {"psnr": psnr0 + 10.5,
                                             "ssim": 0.93})
        logger.log_metrics(n_steps, "extraction",
                           {"psnr": psnr0 + 8.0, "capacity": 1e6})
        logger.log_metrics(n_steps + 1, "optimization",
                           {"psnr": psnr0 + 9.5})
        logger.log_metrics(n_steps + 2, "compression",
                           {"psnr": psnr0 + 9.2, "compression_ratio": 40.0,
                            "storage_mb": 22.0})
    return d


class TestDashboards:
    def test_run_all_emits_full_set(self, tmp_path):
        base = str(tmp_path)
        make_experiment(base, "lego", seed=1)
        make_experiment(base, "ship", seed=2, psnr0=13.0)
        from nerf_projects_tpu.obs.dashboards import run_all

        manifest = run_all(base)
        assert len(manifest["per_experiment"]) == 2
        for entry in manifest["per_experiment"]:
            names = {os.path.basename(f) for f in entry["figures"]}
            assert "scene_dashboard.png" in names
            assert "efficiency_trends.png" in names
            assert "training_curves.png" in names
        assert os.path.exists(os.path.join(base, "cross_experiment.png"))
        lb = json.load(open(os.path.join(base, "leaderboard.json")))
        assert len(lb) == 2
        # ranked by PSNR: lego (psnr0 15) above ship (13)
        assert lb[0]["experiment"] == "lego"
        assert os.path.exists(os.path.join(base, "leaderboard.md"))
        # consolidated HTML results view (view_results.ipynb parity):
        # summary table, every per-experiment figure inlined, file list
        report = os.path.join(base, "results_report.html")
        assert report in manifest["global"]
        html = open(report).read()
        assert "lego" in html and "ship" in html
        assert "scene_dashboard.png" in html
        assert "<table>" in html and "<details>" in html

    def test_pipeline_stage_extraction(self, tmp_path):
        d = make_experiment(str(tmp_path), "chair", seed=3)
        from nerf_projects_tpu.obs.dashboards import extract_pipeline_stages

        stages = extract_pipeline_stages(d)
        assert set(stages) >= {"training", "extraction", "optimization",
                               "compression", "evaluation"}
        assert stages["training"]["best_psnr"] is not None
        assert stages["compression"]["extras"]["compression_ratio"] == 40.0

    def test_efficiency_report(self, tmp_path):
        d = make_experiment(str(tmp_path), "mic", seed=4)
        from nerf_projects_tpu.obs.dashboards import efficiency_report

        fig = efficiency_report(d)
        assert fig and os.path.exists(fig)
        rep = json.load(open(os.path.join(d, "efficiency_report.json")))
        assert "memory_efficiency_index" in rep["final"]

    def test_enhanced_scene_dashboard(self, tmp_path):
        """Enhanced per-scene figure set (reference
        enhanced_scene_analyzer.py): memory, efficiency, quality,
        progression panels."""
        d = os.path.join(str(tmp_path), "hotdog")
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(7)
        logger = MetricsLogger(d)
        for i in range(0, 60, 5):
            psnr = 16.0 + 12 * i / 60 + rng.normal(0, 0.1)
            logger.log_training_step(
                i,
                {"psnr": float(psnr), "ssim": 0.8 + 0.15 * i / 60,
                 "lpips": 0.3 - 0.2 * i / 60},
                5e-4,
                memory_metrics={
                    "device_memory_gb": 1.0 + 0.5 * i / 60,
                    "device_peak_memory_gb": 2.0 + 0.5 * i / 60,
                },
                efficiency_indices={
                    "memory_efficiency_index": float(psnr) / 2.0,
                    "quality_memory_tradeoff": float(psnr) * 0.8 / 2.0,
                },
            )
        from nerf_projects_tpu.obs.dashboards import (
            enhanced_scene_dashboard,
        )

        figs = enhanced_scene_dashboard(d)
        names = {os.path.basename(f) for f in figs}
        assert names == {
            "memory_analysis.png", "efficiency_comparison.png",
            "quality_detailed.png", "training_progression.png",
        }, names
        assert all(os.path.exists(f) for f in figs)

    def test_cli_run_all(self, tmp_path, capsys):
        base = str(tmp_path)
        make_experiment(base, "drums", seed=5)
        from nerf_projects_tpu.cli.run_analysis import main

        main([base, "--json"])
        out = json.loads(capsys.readouterr().out)
        assert out["per_experiment"][0]["figures"]

    def test_handles_empty_dir(self, tmp_path):
        from nerf_projects_tpu.obs.dashboards import run_all

        manifest = run_all(str(tmp_path))
        assert manifest["per_experiment"] == []
