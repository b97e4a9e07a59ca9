"""Environment smoke test.

Parity target: reference plenoctree/test_gpu_comprehensive.py:1-395 —
verify every stack layer with a tiny real computation: device presence,
jit compile/dispatch, the render pipeline, grid and octree renderers,
native C++ ops, and optional deps. Prints a pass/fail table and exits
nonzero on failure.
"""
from __future__ import annotations

import json
import sys
import time


def check(name, fn, results):
    t0 = time.time()
    try:
        detail = fn()
        results.append({"check": name, "ok": True,
                        "detail": detail, "sec": round(time.time() - t0, 2)})
    except Exception as e:  # noqa: BLE001
        results.append({"check": name, "ok": False,
                        "detail": f"{type(e).__name__}: {e}",
                        "sec": round(time.time() - t0, 2)})


def main(argv=None):
    results = []

    def devices():
        import jax

        return str(jax.devices())

    check("jax devices", devices, results)

    def tiny_jit():
        import jax
        import jax.numpy as jnp

        y = jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128)))
        return float(y)

    check("jit matmul", tiny_jit, results)

    def render():
        import jax
        import jax.numpy as jnp

        from nerf_projects_tpu.core.rays import Rays
        from nerf_projects_tpu.models.nerf import NeRFMLP
        from nerf_projects_tpu.models.pipeline import (
            NeRFRenderConfig,
            render_rays,
        )
        from nerf_projects_tpu.ops.posenc import posenc_dim

        cfg = NeRFRenderConfig(num_coarse_samples=8, num_fine_samples=0,
                               multires=4, use_viewdirs=False)
        m = NeRFMLP(depth=2, width=32, use_viewdirs=False)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, posenc_dim(3, 4))))
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        out = render_rays(None, p, None, m.apply,
                          Rays(jnp.zeros((1, 3)), d, d), 2.0, 6.0, cfg,
                          randomized=False)
        assert bool(jnp.isfinite(out["rgb"]).all())
        return "rgb finite"

    check("nerf pipeline", render, results)

    def grid():
        import jax.numpy as jnp

        from nerf_projects_tpu.core.rays import Rays
        from nerf_projects_tpu.models.sparse_grid import SparseGrid
        from nerf_projects_tpu.ops.grid import (
            GridRenderOptions,
            volume_render_grid,
        )

        g = SparseGrid.create(8, basis_dim=1)
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        out = volume_render_grid(
            g, Rays(jnp.asarray([[0.0, 0.0, -3.0]]), d, d), GridRenderOptions()
        )
        return f"acc={float(out['acc'][0]):.3f}"

    check("sparse grid render", grid, results)

    def octree():
        import jax.numpy as jnp

        from nerf_projects_tpu.core.rays import Rays
        from nerf_projects_tpu.models.octree import PlenOctree
        from nerf_projects_tpu.ops.octree_render import (
            OctreeRenderOptions,
            volume_render_octree,
        )

        t = PlenOctree.create(4).refine()
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        out = volume_render_octree(
            t, Rays(jnp.asarray([[0.0, 0.0, -2.0]]), d, d),
            OctreeRenderOptions(step_size=0.05),
        )
        return "ok"

    check("octree render", octree, results)

    def native():
        from nerf_projects_tpu.utils import native as nat

        return "compiled" if nat.available() else "fallback (no g++)"

    check("native C++ ops", native, results)

    def deps():
        mods = []
        for m in ("imageio", "cv2", "scipy", "psutil", "matplotlib", "yaml"):
            try:
                __import__(m)
                mods.append(m)
            except ImportError:
                pass
        return ",".join(mods)

    check("optional deps", deps, results)

    ok = all(r["ok"] for r in results)
    for r in results:
        mark = "PASS" if r["ok"] else "FAIL"
        print(f"[{mark}] {r['check']:22s} {r['detail']} ({r['sec']}s)")
    print(json.dumps({"all_ok": ok}))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
