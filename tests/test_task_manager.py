"""Task manager / autotune tests."""
import json
import os
import sys

import numpy as np
import pytest

from nerf_projects_tpu.pipeline.task_manager import (
    TaskManager,
    build_tasks_from_spec,
    expand_variables,
    leaderboard,
    parse_stdout_metrics,
    substitute,
)


class TestExpansion:
    def test_loglin(self):
        vals = expand_variables({"lr": "loglin(1, 100, 3)"})
        lrs = [v["lr"] for v in vals]
        np.testing.assert_allclose(lrs, [1.0, 10.0, 100.0], rtol=1e-6)

    def test_lin_and_list(self):
        vals = expand_variables({"a": "lin(0, 1, 3)", "b": [1, 2]})
        assert len(vals) == 6
        assert {v["b"] for v in vals} == {1, 2}

    def test_substitute(self):
        s = substitute("train.py {scene} --lr {lr}", {"scene": "lego", "lr": 0.1})
        assert s == "train.py lego --lr 0.1"

    def test_parse_stdout(self):
        m = parse_stdout_metrics('done {"psnr": 31.25, "capacity": 1000}')
        assert m["psnr"] == 31.25
        assert m["capacity"] == 1000


class TestRunner:
    def test_runs_real_subprocesses(self, tmp_path):
        spec = {
            "scenes": ["lego", "chair"],
            "tasks": [
                {
                    "name": "echo",
                    "cmd": [sys.executable, "-c",
                            "print('{\"psnr\": 25.0}')"],
                }
            ],
        }
        # list cmds skip substitution; use string form for scene expansion
        spec["tasks"][0]["cmd"] = (
            f"{sys.executable} -c \"print('psnr: 25.0 for {{scene}}')\""
        )
        tasks = build_tasks_from_spec(spec)
        assert len(tasks) == 2
        tm = TaskManager(n_workers=1)
        results = tm.run(tasks, results_path=str(tmp_path / "results.txt"))
        assert all(r["returncode"] == 0 for r in results)
        assert all(r["metrics"]["psnr"] == 25.0 for r in results)
        lines = open(tmp_path / "results.txt").read().splitlines()
        assert len(lines) == 2

    def test_sweep_and_leaderboard(self, tmp_path):
        spec = {
            "tasks": [
                {
                    "name": "sweep",
                    "cmd": f"{sys.executable} -c \"print('psnr:', 10 * {{lr}})\"",
                }
            ],
            "variables": {"lr": [1.0, 3.0, 2.0]},
        }
        tasks = build_tasks_from_spec(spec)
        results = TaskManager(n_workers=1).run(tasks)
        board = leaderboard(results)
        assert board[0][0] == 30.0
        assert "lr=3" in board[0][1]

    def test_test_psnr_file_preferred(self, tmp_path):
        td = tmp_path / "run"
        td.mkdir()
        (td / "test_psnr.txt").write_text("42.5\n")
        tasks = [{
            "name": "t",
            "cmd": f"{sys.executable} -c \"print('psnr: 1.0')\"",
            "train_dir": str(td),
        }]
        results = TaskManager(n_workers=1).run(tasks)
        assert results[0]["metrics"]["psnr"] == 42.5
