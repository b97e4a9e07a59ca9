"""FPS levers probe at 512^3 shell (the real-scene render regime).

Measures, over a REAL 800^2 frame's 5000 tiles:
  1. the active-chunk histogram (how much the flat compact bound wastes),
  2. flat render at the frame's exact max bound,
  3. whole-frame bucketed render at several bucket counts (per-bucket
     compact bounds; large per-bucket batches amortize dispatch).

Env: PROBE_RESO (512), PROBE_BUCKETS ("2,4,8").
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

RESO = int(os.environ.get("PROBE_RESO", 512))
BUCKETS = [int(b) for b in os.environ.get("PROBE_BUCKETS", "2,4,8").split(",")]
H = W = int(os.environ.get("PROBE_FRAME", 800))


def main():
    import bench as B
    from nerf_projects_tpu.core.rays import camera_rays_opencv
    from nerf_projects_tpu.ops.grid import GridRenderOptions
    from nerf_projects_tpu.ops.pallas.tile_march import (
        _active_counts_jit,
        render_tiles_pallas,
    )
    from nerf_projects_tpu.ops.tile_render import tiles_from_image_rays

    bg, ka = B._shell_setup_render(RESO)
    opts = GridRenderOptions(step_size=0.5)

    # one real camera frame: 800^2 -> 5000 8x16 tiles
    import jax.tree_util as tu

    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, -2.4]
    r0 = camera_rays_opencv(H, W, float(H), float(H), H / 2.0, H / 2.0,
                            jnp.asarray(pose))
    tiles = tiles_from_image_rays(
        tu.tree_map(lambda x: x.reshape(-1, 3), r0), H, W, 8, 16
    )
    T = tiles.origins.shape[0]

    from nerf_projects_tpu.ops.tile_render import default_chunks

    C = default_chunks(bg, opts.step_size, 16)
    active = np.asarray(_active_counts_jit(bg, tiles, opts, False, C))
    hist = np.percentile(active, [0, 25, 50, 75, 90, 99, 100])
    print(json.dumps({
        "tiles": int(T), "C_default": int(C),
        "active_pct": {p: float(v) for p, v in
                       zip([0, 25, 50, 75, 90, 99, 100], hist)},
        "active_mean": float(active.mean()),
    }), flush=True)

    def timeit(run, lo=1, hi=3, rep=3):
        run(lo); run(hi)
        best = None
        for _ in range(rep):
            t0 = time.perf_counter(); run(lo); t1 = time.perf_counter()
            run(hi); t2 = time.perf_counter()
            s = ((t2 - t1) - (t1 - t0)) / (hi - lo)
            if s > 0:
                best = s if best is None else min(best, s)
        return best

    # ---- flat render, frame-exact bound, whole frame in one scan
    ck = min(C, int(-(-int(active.max()) // 8) * 8))
    batch = min(500, T)  # tiles per inner call
    nb_batches = T // batch

    import functools

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def frame_flat(ckv, k, b, kad, kas, r):
        def body(acc, i):
            def inner(acc2, j):
                sl = tu.tree_map(
                    lambda x: jax.lax.dynamic_slice_in_dim(
                        x, j * batch, batch
                    ),
                    r,
                )
                out = render_tiles_pallas(
                    b, tu.tree_map(
                        lambda x: x + i * 1e-7, sl
                    ), opts,
                    kernel_arrays=(kad, kas), compact_chunks=ckv,
                )["rgb"]
                return acc2 + out.sum(), None

            acc2, _ = jax.lax.scan(
                inner, acc, jnp.arange(nb_batches, dtype=jnp.int32)
            )
            return acc2, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros(()), jnp.arange(k, dtype=jnp.float32)
        )
        return acc

    def run_flat(k):
        _ = float(frame_flat(ck, k, bg, ka[0], ka[1], tiles))

    s = timeit(run_flat)
    print(json.dumps({"variant": "flat", "ck": ck,
                      "sec_per_frame": round(s, 4),
                      "fps": round(1.0 / s, 3)}), flush=True)

    # ---- whole-frame bucketed: sort tiles by active count, static
    # per-bucket sizes + 8-rounded per-bucket bounds
    order = np.argsort(active, kind="stable")
    for nbuck in BUCKETS:
        grps = np.array_split(order, nbuck)
        bounds = [
            min(C, max(8, int(-(-int(active[g].max()) // 8) * 8)))
            for g in grps
        ]

        # one jitted call per bucket (few, large); bucket tail beyond
        # nb_b*batch_ is dropped (<0.2% of tiles — probe-only)
        calls = []
        for g, bd in zip(grps, bounds):
            sub = tu.tree_map(lambda x: jnp.asarray(x[g]), tiles)
            n = sub.origins.shape[0]
            nb_b = max(1, -(-n // batch))
            batch_sz = n // nb_b

            @functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
            def bucket_call(bd_, nb_b_, batch_, k, b, kad, kas, r):
                def body(acc, i):
                    def inner(acc2, j):
                        sl = tu.tree_map(
                            lambda x: jax.lax.dynamic_slice_in_dim(
                                x, j * batch_, batch_
                            ),
                            r,
                        )
                        out = render_tiles_pallas(
                            b,
                            tu.tree_map(lambda x: x + i * 1e-7, sl),
                            opts, kernel_arrays=(kad, kas),
                            compact_chunks=bd_,
                        )["rgb"]
                        return acc2 + out.sum(), None

                    acc2, _ = jax.lax.scan(
                        inner, acc, jnp.arange(nb_b_, dtype=jnp.int32)
                    )
                    return acc2, None

                acc, _ = jax.lax.scan(
                    body, jnp.zeros(()),
                    jnp.arange(k, dtype=jnp.float32),
                )
                return acc

            calls.append((bucket_call, bd, nb_b, batch_sz, sub))

        def run_bucketed(k):
            tot = 0.0
            for call, bd, nb_b, bt, sub in calls:
                tot += float(call(bd, nb_b, bt, k, bg, ka[0], ka[1],
                                  sub))

        s = timeit(run_bucketed)
        print(json.dumps({
            "variant": f"bucketed_{nbuck}", "bounds": bounds,
            "sizes": [int(len(g)) for g in grps],
            "sec_per_frame": round(s, 4),
            "fps": round(1.0 / s, 3),
        }), flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
