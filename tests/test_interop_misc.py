"""Interop (keras/jaxnerf import), equirect rays, Timing, env check."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_projects_tpu.core.rays import equirect_rays
from nerf_projects_tpu.models.nerf import NeRFMLP
from nerf_projects_tpu.models.nerf_sh import NeRFSHModel
from nerf_projects_tpu.utils.interop import (
    nerf_params_from_keras,
    nerf_sh_params_from_jaxnerf,
)
from nerf_projects_tpu.utils.timing import Timing


class TestKerasImport:
    def test_roundtrip(self):
        model = NeRFMLP(depth=8, width=256, use_viewdirs=True)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 63)), jnp.zeros((1, 27))
        )
        # serialize to the keras list layout, re-import, compare outputs
        p = params["params"]
        weights = []
        for i in range(8):
            weights += [np.asarray(p[f"trunk_{i}"]["kernel"]),
                        np.asarray(p[f"trunk_{i}"]["bias"])]
        weights += [np.asarray(p["bottleneck"]["kernel"]),
                    np.asarray(p["bottleneck"]["bias"]),
                    np.asarray(p["view_0"]["kernel"]),
                    np.asarray(p["view_0"]["bias"]),
                    np.asarray(p["rgb_head"]["kernel"]),
                    np.asarray(p["rgb_head"]["bias"]),
                    np.asarray(p["sigma_head"]["kernel"]),
                    np.asarray(p["sigma_head"]["bias"])]
        restored = nerf_params_from_keras(weights)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 63)), jnp.float32)
        v = jnp.asarray(np.random.default_rng(1).standard_normal((4, 27)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(model.apply(params, x, v)),
            np.asarray(model.apply(restored, x, v)),
            atol=1e-6,
        )


class TestJaxnerfImport:
    def test_rename_roundtrip(self):
        model = NeRFSHModel(
            num_coarse_samples=4, num_fine_samples=4, sh_deg=1,
            net_depth=3, net_width=32, max_deg_point=4,
        )
        from nerf_projects_tpu.core.rays import Rays

        d = jnp.asarray([[0.0, 0.0, 1.0]])
        rays = Rays(jnp.zeros((1, 3)), d, d)
        params = model.init(
            jax.random.PRNGKey(0), jax.random.PRNGKey(1),
            jax.random.PRNGKey(2), rays, False,
        )
        # fake a jaxnerf-layout checkpoint from our params
        src = {
            "params": {
                "MLP_0": params["params"]["mlp_coarse"],
                "MLP_1": params["params"]["mlp_fine"],
            }
        }
        restored = nerf_sh_params_from_jaxnerf(src)
        a = model.apply(params, None, None, rays, False)
        b = model.apply(
            jax.tree_util.tree_map(jnp.asarray, restored), None, None, rays, False
        )
        np.testing.assert_allclose(
            np.asarray(a[-1].rgb), np.asarray(b[-1].rgb), atol=1e-6
        )


class TestEquirect:
    def test_directions_cover_sphere(self):
        rays = equirect_rays(32, 64, np.eye(4))
        d = np.asarray(rays.directions).reshape(-1, 3)
        norms = np.linalg.norm(d, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        # z covers both hemispheres, mean direction near zero
        assert d[:, 1].min() < -0.9 and d[:, 1].max() > 0.9
        assert np.abs(d.mean(0)).max() < 0.1


class TestTiming:
    def test_measures_elapsed(self):
        import time

        with Timing("t", silent=True) as t:
            time.sleep(0.02)
        assert t.elapsed_ms >= 15


class TestProfilerTrace:
    def test_captures_trace_files(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from nerf_projects_tpu.utils.timing import profiler_trace

        import os

        d = str(tmp_path / "trace")
        with profiler_trace(d):
            x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((64, 64)))
            float(x)
        files = [
            os.path.join(r, f)
            for r, _, fs in os.walk(d) for f in fs
        ]
        assert files, "profiler trace wrote no files"
        assert any(f.endswith((".xplane.pb", ".trace.json.gz", ".json.gz"))
                   for f in files), files

    def test_noop_without_dir(self):
        from nerf_projects_tpu.utils.timing import profiler_trace

        with profiler_trace(None):
            pass


class TestCheckEnv:
    def test_runs_all_green(self, capsys):
        from nerf_projects_tpu.cli.check_env import main

        main([])
        out = capsys.readouterr().out
        assert '"all_ok": true' in out
        assert "FAIL" not in out
