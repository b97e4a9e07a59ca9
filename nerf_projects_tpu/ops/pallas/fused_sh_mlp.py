"""Fully-fused NeRF-SH trunk MLP — Pallas TPU kernel.

The SH/SG-headed models (models/nerf_sh.py CondMLP with condition=None:
SH mode sets use_viewdirs=False) are a pure trunk: 8x256 with a skip
concat after layer skip_layer (h FIRST, then input — jaxnerf order,
model_utils.py:70-71), a sigma head [256->1] and a coefficient head
[256->3*(deg+1)^2]. Same VMEM-resident-weights design as
ops/pallas/fused_mlp.py: stream encoded points in, raw (coeffs, sigma)
out; custom-VJP backward recomputes forward per tile and accumulates
weight grads across the sequential grid (inputs carry no gradient).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512

INTERPRET = False


class FusedSHWeights(NamedTuple):
    w0: jnp.ndarray    # [64, 256]
    w1: jnp.ndarray
    w2: jnp.ndarray
    w3: jnp.ndarray
    w4: jnp.ndarray
    w5: jnp.ndarray    # [320, 256]: rows [h(256) | x(64, 63 live)]
    w6: jnp.ndarray
    w7: jnp.ndarray
    wsig: jnp.ndarray  # [256, 128] col 0 live
    wrgb: jnp.ndarray  # [256, 128] cols 0..num_rgb-1 live
    b0: jnp.ndarray
    b1: jnp.ndarray
    b2: jnp.ndarray
    b3: jnp.ndarray
    b4: jnp.ndarray
    b5: jnp.ndarray
    b6: jnp.ndarray
    b7: jnp.ndarray
    bsig: jnp.ndarray
    brgb: jnp.ndarray


def _pad(x, rows, cols, dtype):
    out = jnp.zeros((rows, cols), dtype)
    return out.at[: x.shape[0], : x.shape[1]].set(x.astype(dtype))


def pack_sh_params(mlp_params, dtype=jnp.bfloat16) -> FusedSHWeights:
    """CondMLP param dict (Dense_0..Dense_9, no condition branch) ->
    padded kernel weights. Layer order (nerf_sh.CondMLP, no cond):
    Dense_0..7 trunk, Dense_8 sigma head, Dense_9 rgb head."""
    p = mlp_params

    def kb(i, rows, cols):
        k = jnp.asarray(p[f"Dense_{i}"]["kernel"])
        b = jnp.asarray(p[f"Dense_{i}"]["bias"])
        return (
            _pad(k, rows, cols, dtype),
            _pad(b[None, :], 1, cols, dtype),
        )

    w0, b0 = kb(0, 64, 256)
    w1, b1 = kb(1, 256, 256)
    w2, b2 = kb(2, 256, 256)
    w3, b3 = kb(3, 256, 256)
    w4, b4 = kb(4, 256, 256)
    # Dense_5 consumes cat([h(256), x(63)]): rows [256 | 63] -> pad x to 64
    k5 = jnp.asarray(p["Dense_5"]["kernel"])
    w5 = jnp.zeros((320, 256), dtype)
    w5 = w5.at[:256].set(k5[:256].astype(dtype))
    w5 = w5.at[256 : 256 + 63].set(k5[256:319].astype(dtype))
    b5 = _pad(jnp.asarray(p["Dense_5"]["bias"])[None, :], 1, 256, dtype)
    w6, b6 = kb(6, 256, 256)
    w7, b7 = kb(7, 256, 256)
    wsig, bsig = kb(8, 256, 128)
    wrgb, brgb = kb(9, 256, 128)
    return FusedSHWeights(
        w0, w1, w2, w3, w4, w5, w6, w7, wsig, wrgb,
        b0, b1, b2, b3, b4, b5, b6, b7, bsig, brgb,
    )


def _mm(a, w):
    return jnp.dot(a.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)


def _mmT(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mmBT(g, w):
    return jax.lax.dot_general(
        g.astype(jnp.bfloat16), w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_tile(x, W):
    acts = {}
    h = jnp.maximum(_mm(x, W.w0) + W.b0.astype(jnp.float32), 0.0)
    acts["a0"] = h
    for i, (w, b) in enumerate(
        [(W.w1, W.b1), (W.w2, W.b2), (W.w3, W.b3), (W.w4, W.b4)], 1
    ):
        h = jnp.maximum(_mm(h, w) + b.astype(jnp.float32), 0.0)
        acts[f"a{i}"] = h
    cat = jnp.concatenate([h, x.astype(jnp.float32)], axis=-1)  # h FIRST
    acts["cat"] = cat
    h = jnp.maximum(_mm(cat, W.w5) + W.b5.astype(jnp.float32), 0.0)
    acts["a5"] = h
    h = jnp.maximum(_mm(h, W.w6) + W.b6.astype(jnp.float32), 0.0)
    acts["a6"] = h
    h = jnp.maximum(_mm(h, W.w7) + W.b7.astype(jnp.float32), 0.0)
    acts["a7"] = h
    sig = _mm(h, W.wsig) + W.bsig.astype(jnp.float32)
    rgb = _mm(h, W.wrgb) + W.brgb.astype(jnp.float32)
    return rgb, sig, acts


def _weights_from_refs(refs):
    return FusedSHWeights(*[r[:] for r in refs])


def _fwd_kernel(x_ref, *refs):
    w_refs, rgb_ref, sig_ref = refs[:-2], refs[-2], refs[-1]
    W = _weights_from_refs(w_refs)
    rgb, sig, _ = _fwd_tile(x_ref[:], W)
    rgb_ref[:] = rgb
    sig_ref[:] = sig[:, :8]


def _bwd_kernel(x_ref, *refs):
    w_refs = refs[:20]
    g_rgb_ref, g_sig_ref = refs[20], refs[21]
    gw_refs = refs[22:]
    W = _weights_from_refs(w_refs)
    x = x_ref[:]
    rgb, sig, acts = _fwd_tile(x, W)

    g_rgb = g_rgb_ref[:]  # [T, 128]
    g_sig8 = g_sig_ref[:]  # [T, 8] col 0 live
    g_sig = jnp.concatenate(
        [g_sig8, jnp.zeros((g_sig8.shape[0], 120), g_sig8.dtype)], axis=-1
    )
    col = jax.lax.broadcasted_iota(jnp.int32, g_sig.shape, 1)
    g_sig = jnp.where(col < 1, g_sig, 0.0)

    grads = {}
    grads["wrgb"] = _mmT(acts["a7"], g_rgb)
    grads["brgb"] = jnp.sum(g_rgb, axis=0, keepdims=True)
    grads["wsig"] = _mmT(acts["a7"], g_sig)
    grads["bsig"] = jnp.sum(g_sig, axis=0, keepdims=True)
    g_h = (_mmBT(g_rgb, W.wrgb) + _mmBT(g_sig, W.wsig)) * (acts["a7"] > 0)
    grads["w7"] = _mmT(acts["a6"], g_h)
    grads["b7"] = jnp.sum(g_h, axis=0, keepdims=True)
    g_h = _mmBT(g_h, W.w7) * (acts["a6"] > 0)
    grads["w6"] = _mmT(acts["a5"], g_h)
    grads["b6"] = jnp.sum(g_h, axis=0, keepdims=True)
    g_h = _mmBT(g_h, W.w6) * (acts["a5"] > 0)
    grads["w5"] = _mmT(acts["cat"], g_h)
    grads["b5"] = jnp.sum(g_h, axis=0, keepdims=True)
    g_cat = _mmBT(g_h, W.w5)           # [T, 320]; h rows first
    g_h = g_cat[:, :256] * (acts["a4"] > 0)
    grads["w4"] = _mmT(acts["a3"], g_h)
    grads["b4"] = jnp.sum(g_h, axis=0, keepdims=True)
    g_h = _mmBT(g_h, W.w4) * (acts["a3"] > 0)
    grads["w3"] = _mmT(acts["a2"], g_h)
    grads["b3"] = jnp.sum(g_h, axis=0, keepdims=True)
    g_h = _mmBT(g_h, W.w3) * (acts["a2"] > 0)
    grads["w2"] = _mmT(acts["a1"], g_h)
    grads["b2"] = jnp.sum(g_h, axis=0, keepdims=True)
    g_h = _mmBT(g_h, W.w2) * (acts["a1"] > 0)
    grads["w1"] = _mmT(acts["a0"], g_h)
    grads["b1"] = jnp.sum(g_h, axis=0, keepdims=True)
    g_h = _mmBT(g_h, W.w1) * (acts["a0"] > 0)
    grads["w0"] = _mmT(x.astype(jnp.float32), g_h)
    grads["b0"] = jnp.sum(g_h, axis=0, keepdims=True)

    first = pl.program_id(0) == 0
    for name, ref in zip(FusedSHWeights._fields, gw_refs):
        val = grads[name]

        @pl.when(first)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, val=val):
            ref[:] = ref[:] + val


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


@jax.custom_vjp
def fused_sh_mlp(weights: FusedSHWeights, x: jnp.ndarray):
    """x [N, 64] encoded points (63 live), N multiple of TILE.
    Returns (rgb_coeffs [N, 128] padded, sigma [N, 8] col 0 live)."""
    return _fused_sh_impl(weights, x)


def _fused_sh_impl(weights, x):
    n = x.shape[0]
    grid = (n // TILE,)
    w_specs = [_full_spec(w.shape) for w in weights]
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=(
            pl.BlockSpec((TILE, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, 8), jnp.float32),
        ),
        interpret=INTERPRET,
    )(x, *weights)


def _fused_sh_fwd(weights, x):
    return _fused_sh_impl(weights, x), (weights, x)


def _fused_sh_bwd(res, g):
    weights, x = res
    g_rgb, g_sig = g
    n = x.shape[0]
    grid = (n // TILE,)
    w_specs = [_full_spec(w.shape) for w in weights]
    grads = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
            pl.BlockSpec((TILE, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(_full_spec(w.shape) for w in weights),
        out_shape=tuple(
            jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights
        ),
        interpret=INTERPRET,
    )(x, *weights, g_rgb, g_sig)
    return FusedSHWeights(*grads), jnp.zeros_like(x)


fused_sh_mlp.defvjp(_fused_sh_fwd, _fused_sh_bwd)


def fused_sh_apply(mlp_params, pts_enc: jnp.ndarray, num_rgb: int):
    """Drop-in for CondMLP(condition=None): [N, 63] encodings ->
    (raw_rgb [N, num_rgb], raw_sigma [N, 1])."""
    n = pts_enc.shape[0]
    pad = (-n) % TILE
    x = jnp.zeros((n + pad, 64), pts_enc.dtype).at[:n, :63].set(pts_enc)
    w = pack_sh_params(mlp_params)
    rgb, sig = fused_sh_mlp(w, x)
    return rgb[:n, :num_rgb], sig[:n, :1]
