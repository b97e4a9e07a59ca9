import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import nerf_projects_tpu.ops.pallas.fused_train as ft
import nerf_projects_tpu.ops.pallas.fused_mlp as fm
from nerf_projects_tpu.models.nerf import NeRFMLP

S, R = int(sys.argv[1]), int(sys.argv[2])
want_w = sys.argv[3] == "1"
n_rays = R * 2
model = NeRFMLP(depth=8, width=256, use_viewdirs=True)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 63)), jnp.zeros((1, 27)))
packed = fm.pack_params(params)
N = n_rays * S
T = n_rays // R
x = jnp.zeros((N, 64)); vt = jnp.zeros((T, 8, 32))
out = ft.fused_train_level(packed, x, vt, S=S, R=R,
                           n_rays_total=n_rays, bkgd=1.0, want_weights=want_w)
print("ok", jax.tree_util.tree_map(lambda a: None if a is None else a.shape, out[:2]))
