"""A/B f32 vs bf16 grad blocks on the current (fetch-free) dense step."""
import json, os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import bench as B
from nerf_projects_tpu.ops.grid import GridRenderOptions
from nerf_projects_tpu.train.plenoxels_trainer import PlenoxelsTrainer

bg0 = B._plenoxels_setup(256)
rays = B._tile_rays(jax.random.PRNGKey(2), 40)
target = jnp.full(rays.origins.shape[:2] + (3,), 0.4)

def slope(fn, lo=5, hi=25):
    fn(lo); fn(hi)
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); fn(lo); t1 = time.perf_counter()
        fn(hi); t2 = time.perf_counter()
        s_ = ((t2 - t1) - (t1 - t0)) / (hi - lo)
        if s_ > 0:
            best = s_ if best is None else min(best, s_)
    return best

for bf16 in (False, True):
    trainer = PlenoxelsTrainer(
        GridRenderOptions(step_size=0.5), n_iters=128_000,
        lambda_tv=1e-5, lambda_tv_sh=1e-3, bf16_grad_blocks=bf16)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def scan_steps(k, b, r, key, trainer=trainer):
        def body(carry, i):
            b, r = carry
            b, r, st = trainer.train_step_tiles_pallas(
                b, r, rays, target, i,
                jax.random.fold_in(key, i.astype(jnp.int32)))
            return (b, r), st["mse"]
        (b, r), mses = jax.lax.scan(
            body, (b, r), jnp.arange(k, dtype=jnp.float32))
        return b, r, mses

    b0 = jax.tree_util.tree_map(jnp.copy, bg0)
    holder = {"b": b0, "r": trainer.init_rms_bricks(b0)}
    def run(k):
        b, r, mses = scan_steps(k, holder["b"], holder["r"],
                                jax.random.PRNGKey(k))
        _ = float(mses[-1]); holder["b"], holder["r"] = b, r
    ms = slope(run) * 1e3
    print(json.dumps({"bf16_blocks": bf16, "ms": round(ms, 2),
                      "rays_per_s": round(5120 / ms * 1e3)}), flush=True)
