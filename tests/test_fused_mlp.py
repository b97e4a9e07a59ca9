"""Fused-MLP Pallas kernel vs the flax NeRFMLP (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nerf_projects_tpu.ops.pallas.fused_mlp as fm
from nerf_projects_tpu.models.nerf import NeRFMLP


@pytest.fixture(autouse=True)
def interpret_mode():
    old = fm.INTERPRET
    fm.INTERPRET = True
    yield
    fm.INTERPRET = old


@pytest.fixture(scope="module")
def model_and_params():
    model = NeRFMLP(depth=8, width=256, use_viewdirs=True)
    pts = jnp.zeros((1, 63))
    views = jnp.zeros((1, 27))
    params = model.init(jax.random.PRNGKey(0), pts, views)
    return model, params


class TestFusedForward:
    def test_matches_flax(self, model_and_params):
        model, params = model_and_params
        rng = np.random.default_rng(0)
        n = fm.TILE  # one tile
        pts = jnp.asarray(rng.standard_normal((n, 63)), jnp.float32)
        views = jnp.asarray(rng.standard_normal((n, 27)), jnp.float32)
        want = model.apply(params, pts, views)
        weights = fm.pack_params(params)
        got = fm.fused_apply(weights, pts, views)
        assert got.shape == want.shape
        # bf16 matmuls vs flax fp32: compare loosely but meaningfully
        err = np.abs(np.asarray(got) - np.asarray(want))
        scale = np.abs(np.asarray(want)).mean() + 1.0
        assert err.max() / scale < 0.05, err.max()

    def test_matches_flax_bf16_reference(self, model_and_params):
        """Tight check against the flax model run in bf16 (same arith)."""
        model, params = model_and_params
        model_bf = NeRFMLP(depth=8, width=256, use_viewdirs=True,
                           compute_dtype=jnp.bfloat16)
        rng = np.random.default_rng(1)
        n = fm.TILE
        pts = jnp.asarray(rng.standard_normal((n, 63)), jnp.float32)
        views = jnp.asarray(rng.standard_normal((n, 27)), jnp.float32)
        want = model_bf.apply(params, pts, views)
        got = fm.fused_apply(fm.pack_params(params), pts, views)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=0.25, rtol=0.05
        )

    def test_padding_tail(self, model_and_params):
        """n not a multiple of TILE still works and matches."""
        model, params = model_and_params
        rng = np.random.default_rng(2)
        n = fm.TILE + 100
        pts = jnp.asarray(rng.standard_normal((n, 63)), jnp.float32)
        views = jnp.asarray(rng.standard_normal((n, 27)), jnp.float32)
        got = fm.fused_apply(fm.pack_params(params), pts, views)
        want = model.apply(params, pts, views)
        assert got.shape == (n, 4)
        err = np.abs(np.asarray(got) - np.asarray(want)).max()
        assert err / (np.abs(np.asarray(want)).mean() + 1) < 0.05


class TestFusedBackward:
    def test_weight_grads_match_flax_bf16(self, model_and_params):
        """Compare against the flax model in bf16 — identical arithmetic
        (fp32 deltas are bf16 backprop numerics, ~10-18% on deep-trunk
        grads, matching what flax-bf16 itself shows vs fp32)."""
        model, params = model_and_params
        model_bf = NeRFMLP(depth=8, width=256, use_viewdirs=True,
                           compute_dtype=jnp.bfloat16)
        rng = np.random.default_rng(3)
        n = 2 * fm.TILE  # two tiles to exercise accumulation
        pts = jnp.asarray(rng.standard_normal((n, 63)), jnp.float32)
        views = jnp.asarray(rng.standard_normal((n, 27)), jnp.float32)
        cot = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)

        def loss_flax(p):
            return jnp.sum(model_bf.apply(p, pts, views) * cot)

        want = jax.grad(loss_flax)(params)

        def loss_fused(p):
            w = fm.pack_params(p)
            return jnp.sum(fm.fused_apply(w, pts, views) * cot)

        got = jax.grad(loss_fused)(params)

        flat_w, _ = jax.tree_util.tree_flatten(want)
        flat_g, _ = jax.tree_util.tree_flatten(got)
        for a, b in zip(flat_w, flat_g):
            a, b = np.asarray(a), np.asarray(b)
            denom = np.abs(a).max() + 1e-3
            rel = np.abs(a - b).max() / denom
            assert rel < 0.05, (a.shape, rel)

    def test_grad_through_composite_loss(self, model_and_params):
        """Gradients flow through sigmoid/relu/compositing downstream."""
        model, params = model_and_params
        rng = np.random.default_rng(4)
        R, S = 16, 32
        n = R * S
        pts = jnp.asarray(rng.standard_normal((n, 63)), jnp.float32)
        views = jnp.asarray(rng.standard_normal((n, 27)), jnp.float32)
        z = jnp.broadcast_to(jnp.linspace(2, 6, S), (R, S))
        dirs = jnp.ones((R, 3))
        tgt = jnp.zeros((R, 3))

        from nerf_projects_tpu.ops.render import volumetric_rendering

        def loss(p, apply_fn):
            raw = apply_fn(p, pts, views).reshape(R, S, 4)
            rgb = jax.nn.sigmoid(raw[..., :3])
            sig = jax.nn.relu(raw[..., 3])
            out = volumetric_rendering(rgb, sig, z, dirs)
            return jnp.mean((out.rgb - tgt) ** 2)

        model_bf = NeRFMLP(depth=8, width=256, use_viewdirs=True,
                           compute_dtype=jnp.bfloat16)
        want = jax.grad(
            lambda p: loss(p, lambda p_, a, b: model_bf.apply(p_, a, b))
        )(params)
        got = jax.grad(
            lambda p: loss(p, lambda p_, a, b: fm.fused_apply(fm.pack_params(p_), a, b))
        )(params)
        flat_w, _ = jax.tree_util.tree_flatten(want)
        flat_g, _ = jax.tree_util.tree_flatten(got)
        for a, b in zip(flat_w, flat_g):
            a, b = np.asarray(a), np.asarray(b)
            denom = np.abs(a).max() + 1e-5
            assert np.abs(a - b).max() / denom < 0.1, (a.shape,)


class TestFusedRaw:
    def test_raw_matches_posenc_plus_fused(self, model_and_params):
        from nerf_projects_tpu.ops.posenc import posenc

        model, params = model_and_params
        rng = np.random.default_rng(5)
        n = fm.TILE
        pts = jnp.asarray(rng.uniform(-1.5, 1.5, (n, 3)), jnp.float32)
        vd = rng.standard_normal((n, 3))
        vd = jnp.asarray(vd / np.linalg.norm(vd, axis=-1, keepdims=True), jnp.float32)
        want = fm.fused_apply(fm.pack_params(params), posenc(pts, 10), posenc(vd, 4))
        got = fm.fused_apply_raw(fm.pack_params(params, raw_layout=True), pts, vd)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=0.3, rtol=0.05
        )

    def test_raw_grads_match(self, model_and_params):
        from nerf_projects_tpu.ops.posenc import posenc

        model, params = model_and_params
        rng = np.random.default_rng(6)
        n = 2 * fm.TILE
        pts = jnp.asarray(rng.uniform(-1.5, 1.5, (n, 3)), jnp.float32)
        vd = rng.standard_normal((n, 3))
        vd = jnp.asarray(vd / np.linalg.norm(vd, axis=-1, keepdims=True), jnp.float32)
        cot = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)

        def loss_enc(p):
            w = fm.pack_params(p)
            return jnp.sum(fm.fused_apply(w, posenc(pts, 10), posenc(vd, 4)) * cot)

        def loss_raw(p):
            w = fm.pack_params(p, raw_layout=True)
            return jnp.sum(fm.fused_apply_raw(w, pts, vd) * cot)

        want = jax.grad(loss_enc)(params)
        got = jax.grad(loss_raw)(params)
        for a, b in zip(jax.tree_util.tree_leaves(want),
                        jax.tree_util.tree_leaves(got)):
            a, b = np.asarray(a), np.asarray(b)
            assert np.abs(a - b).max() / (np.abs(a).max() + 1e-3) < 0.05
