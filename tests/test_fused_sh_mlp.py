"""Fused NeRF-SH trunk kernel vs the flax CondMLP (interpreter mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nerf_projects_tpu.ops.pallas.fused_sh_mlp as fsm
from nerf_projects_tpu.models.nerf_sh import CondMLP


@pytest.fixture(autouse=True)
def interpret_mode():
    old = fsm.INTERPRET
    fsm.INTERPRET = True
    yield
    fsm.INTERPRET = old


@pytest.fixture(scope="module")
def mlp_and_params():
    # sh_deg=2 head: 27 rgb channels
    mlp = CondMLP(num_rgb_channels=27, compute_dtype=jnp.bfloat16)
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, 63)))
    return mlp, params


class TestFusedSH:
    def test_forward_matches(self, mlp_and_params):
        mlp, params = mlp_and_params
        rng = np.random.default_rng(0)
        n = fsm.TILE + 77  # tail padding too
        x = jnp.asarray(rng.standard_normal((n, 63)), jnp.float32)
        want_rgb, want_sig = mlp.apply(params, x)
        got_rgb, got_sig = fsm.fused_sh_apply(params["params"], x, 27)
        assert got_rgb.shape == (n, 27)
        np.testing.assert_allclose(
            np.asarray(got_rgb), np.asarray(want_rgb), atol=0.25, rtol=0.05
        )
        np.testing.assert_allclose(
            np.asarray(got_sig), np.asarray(want_sig), atol=0.25, rtol=0.05
        )

    def test_weight_grads_match(self, mlp_and_params):
        mlp, params = mlp_and_params
        rng = np.random.default_rng(1)
        n = 2 * fsm.TILE
        x = jnp.asarray(rng.standard_normal((n, 63)), jnp.float32)
        cot_rgb = jnp.asarray(rng.standard_normal((n, 27)), jnp.float32)
        cot_sig = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)

        def loss_flax(p):
            r, s = mlp.apply(p, x)
            return jnp.sum(r * cot_rgb) + jnp.sum(s * cot_sig)

        def loss_fused(p):
            r, s = fsm.fused_sh_apply(p["params"], x, 27)
            return jnp.sum(r * cot_rgb) + jnp.sum(s * cot_sig)

        want = jax.grad(loss_flax)(params)
        got = jax.grad(loss_fused)(params)
        for a, b in zip(jax.tree_util.tree_leaves(want),
                        jax.tree_util.tree_leaves(got)):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-3)
            assert rel < 0.05, (a.shape, rel)


class TestModelIntegration:
    def test_model_with_fused_trunk_matches(self):
        from nerf_projects_tpu.core.rays import Rays
        from nerf_projects_tpu.models.nerf_sh import NeRFSHModel

        kw = dict(
            num_coarse_samples=8, num_fine_samples=0, sh_deg=2,
            net_depth=8, net_width=256, max_deg_point=10,
            compute_dtype=jnp.bfloat16,
        )
        ref = NeRFSHModel(**kw)
        fused = NeRFSHModel(use_fused_trunk=True, **kw)
        d = jax.random.normal(jax.random.PRNGKey(0), (8, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = Rays(jnp.zeros((8, 3)), d, d)
        params = ref.init(
            jax.random.PRNGKey(1), jax.random.PRNGKey(2),
            jax.random.PRNGKey(3), rays, False,
        )
        a = ref.apply(params, None, None, rays, False)
        b = fused.apply(params, None, None, rays, False)
        np.testing.assert_allclose(
            np.asarray(a[-1].rgb), np.asarray(b[-1].rgb), atol=0.02
        )
