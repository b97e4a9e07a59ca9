"""Driver-contract regression tests (the harness runs these externally;
keep them covered by pytest too)."""
import jax
import pytest


class TestGraftContracts:
    def test_dryrun_multichip_8(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_bench_module_importable(self):
        import bench

        assert bench.BASELINE_NERF_RAYS_PER_S > 0
        assert bench.N_RAND == 1024
        # multi-workload contract (VERDICT r1 #3): all four families
        assert set(bench.WORKLOADS) >= {
            "nerf_train",
            "plenoxels_train",
            "grid_render_fps",
            "nerf_sh_train",
        }
