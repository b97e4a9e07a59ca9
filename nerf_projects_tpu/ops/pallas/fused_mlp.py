"""Fully-fused NeRF MLP — Pallas TPU kernel.

Why: profiling the flagship train step (bench.py workload) shows it is
HBM-bandwidth bound: every MLP layer round-trips [N, 256] activations
through HBM (~1.6 GB/step forward, ~2x that backward), capping MXU
utilization near 27%. All of the NeRF MLP's weights total ~1.3 MB in
bf16 — they fit in VMEM with room to spare. This kernel keeps the whole
8-layer trunk + heads resident in VMEM and streams only the encoded
inputs in and the 4-channel raw outputs out, the same design the
reference's CUDA ecosystem uses for its fastest MLPs and the Pallas
equivalent of fusing the entire `run_network` (notebook cell 15).

Forward: grid over row tiles; each program runs every layer on its tile.
Backward (custom VJP): NeRF's MLP inputs carry no gradient (sample
positions are stop-gradient w.r.t. params), so only WEIGHT gradients are
needed. The backward kernel recomputes the forward per tile in VMEM
(activations never hit HBM either way) and accumulates dW/db into
grid-invariant output blocks — TPU grids execute sequentially, so
accumulation across programs is race-free.

Architecture fused (models/nerf.py NeRFMLP, use_viewdirs=True, D=8,
W=256, skip at 4): trunk_0..7 with input concat after trunk_4's relu,
sigma head, bottleneck, one W/2 view layer, rgb head. Feature dims are
padded to lane multiples: pts 63->64, views 27->32, heads to 128.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 768       # rows per program (backward: VMEM-bound; 1024 OOMs, 768 fits and is ~5% faster than 512)
FWD_TILE = 2048  # forward-only tile (no activation stash -> fits bigger;
                 # 2048 measures fastest, 4096 fails to compile)

# set True to run kernels in interpreter mode (CPU testing)
INTERPRET = False


class FusedMLPWeights(NamedTuple):
    """Padded bf16 weights/biases. Names mirror models/nerf.py."""

    w0: jnp.ndarray    # [64, 256]
    w1: jnp.ndarray    # [256, 256]
    w2: jnp.ndarray
    w3: jnp.ndarray
    w4: jnp.ndarray
    w5: jnp.ndarray    # [320, 256] (input-first concat)
    w6: jnp.ndarray
    w7: jnp.ndarray
    wsig: jnp.ndarray  # [256, 128] col 0 live
    wb: jnp.ndarray    # [256, 256]
    wv: jnp.ndarray    # [288, 128]
    wrgb: jnp.ndarray  # [128, 128] cols 0..2 live
    b0: jnp.ndarray    # [1, 256] ...
    b1: jnp.ndarray
    b2: jnp.ndarray
    b3: jnp.ndarray
    b4: jnp.ndarray
    b5: jnp.ndarray
    b6: jnp.ndarray
    b7: jnp.ndarray
    bsig: jnp.ndarray  # [1, 128]
    bb: jnp.ndarray    # [1, 256]
    bv: jnp.ndarray    # [1, 128]
    brgb: jnp.ndarray  # [1, 128]


def _pad_to(x, rows=None, cols=None):
    r = rows if rows is not None else x.shape[0]
    c = cols if cols is not None else x.shape[-1]
    if x.ndim == 1:
        out = jnp.zeros((c,), x.dtype).at[: x.shape[0]].set(x)
        return out
    out = jnp.zeros((r, c), x.dtype)
    return out.at[: x.shape[0], : x.shape[1]].set(x)


def pack_params(flax_params, dtype=jnp.bfloat16,
                raw_layout: bool = False) -> FusedMLPWeights:
    """Flax NeRFMLP params -> padded kernel weights.

    raw_layout=True permutes the trunk_0 / view_0 input rows from the
    interleaved posenc ordering to the block ordering produced by the
    in-kernel encoder (_encode_tile)."""
    p = flax_params["params"] if "params" in flax_params else flax_params
    perm_pts = _block_perm(10) if raw_layout else None
    perm_views = _block_perm(4) if raw_layout else None

    def kb(name, rpad, cpad):
        k = jnp.asarray(p[name]["kernel"])
        b = jnp.asarray(p[name]["bias"])
        return (
            _pad_to(k, rpad, cpad).astype(dtype),
            _pad_to(b[None, :], 1, cpad).astype(dtype),
        )

    if raw_layout:
        k0 = jnp.asarray(p["trunk_0"]["kernel"])[jnp.asarray(perm_pts)]
        w0 = _pad_to(k0, 64, 256).astype(dtype)
        b0 = _pad_to(jnp.asarray(p["trunk_0"]["bias"])[None, :], 1, 256).astype(dtype)
    else:
        w0, b0 = kb("trunk_0", 64, 256)
    w1, b1 = kb("trunk_1", 256, 256)
    w2, b2 = kb("trunk_2", 256, 256)
    w3, b3 = kb("trunk_3", 256, 256)
    w4, b4 = kb("trunk_4", 256, 256)
    # trunk_5 consumes concat([x(63), h(256)]) -> rows [63+256=319];
    # padded layout: [64 input rows (63 live), 256 h rows] = 320.
    k5 = jnp.asarray(p["trunk_5"]["kernel"])
    k5_x = k5[:63]
    if raw_layout:
        k5_x = k5_x[jnp.asarray(perm_pts)]
    w5 = jnp.zeros((320, 256), dtype)
    w5 = w5.at[:63].set(k5_x.astype(dtype))
    w5 = w5.at[64:320].set(k5[63:319].astype(dtype))
    b5 = _pad_to(jnp.asarray(p["trunk_5"]["bias"])[None, :], 1, 256).astype(dtype)
    w6, b6 = kb("trunk_6", 256, 256)
    w7, b7 = kb("trunk_7", 256, 256)
    wsig, bsig = kb("sigma_head", 256, 128)
    wb, bb = kb("bottleneck", 256, 256)
    # view_0 consumes concat([bottleneck(256), views(27)]) -> padded
    # [256 + 32] = 288 rows (views rows 256..282 live).
    kv = jnp.asarray(p["view_0"]["kernel"])
    kv_views = kv[256:283]
    if raw_layout:
        kv_views = kv_views[jnp.asarray(perm_views)]
    wv = jnp.zeros((288, 128), dtype)
    wv = wv.at[:256].set(kv[:256].astype(dtype))
    wv = wv.at[256 : 256 + 27].set(kv_views.astype(dtype))
    bv = _pad_to(jnp.asarray(p["view_0"]["bias"])[None, :], 1, 128).astype(dtype)
    wrgb, brgb = kb("rgb_head", 128, 128)
    return FusedMLPWeights(
        w0, w1, w2, w3, w4, w5, w6, w7, wsig, wb, wv, wrgb,
        b0, b1, b2, b3, b4, b5, b6, b7, bsig, bb, bv, brgb,
    )


def unpack_grads(g: FusedMLPWeights, flax_params, raw_layout: bool = False):
    """Padded weight grads -> flax param-tree grads (fp32).

    raw_layout=True inverts the block-encoding row permutation that
    pack_params(raw_layout=True) applied to trunk_0 / trunk_5's input
    rows / view_0's view rows (the in-kernel encoder's layout)."""
    p = flax_params["params"] if "params" in flax_params else flax_params
    out = {}

    def put(name, k, b):
        shp = p[name]["kernel"].shape
        out[name] = {
            "kernel": k[: shp[0], : shp[1]].astype(jnp.float32),
            "bias": b[0, : shp[1]].astype(jnp.float32),
        }

    if raw_layout:
        perm_pts = jnp.asarray(_block_perm(10))
        perm_views = jnp.asarray(_block_perm(4))

        def unperm(rows, perm):
            return jnp.zeros_like(rows).at[perm].set(rows[: perm.shape[0]])

        g = g._replace(
            w0=g.w0.at[:63].set(unperm(g.w0[:63], perm_pts)),
            w5=g.w5.at[:63].set(unperm(g.w5[:63], perm_pts)),
            wv=g.wv.at[256 : 256 + 27].set(
                unperm(g.wv[256 : 256 + 27], perm_views)
            ),
        )

    put("trunk_0", g.w0, g.b0)
    put("trunk_1", g.w1, g.b1)
    put("trunk_2", g.w2, g.b2)
    put("trunk_3", g.w3, g.b3)
    put("trunk_4", g.w4, g.b4)
    k5 = jnp.concatenate([g.w5[:63], g.w5[64:320]], axis=0)
    out["trunk_5"] = {
        "kernel": k5[:, :256].astype(jnp.float32),
        "bias": g.b5[0, :256].astype(jnp.float32),
    }
    put("trunk_6", g.w6, g.b6)
    put("trunk_7", g.w7, g.b7)
    put("sigma_head", g.wsig, g.bsig)
    put("bottleneck", g.wb, g.bb)
    kv = jnp.concatenate([g.wv[:256], g.wv[256 : 256 + 27]], axis=0)
    out["view_0"] = {
        "kernel": kv[:, :128].astype(jnp.float32),
        "bias": g.bv[0, :128].astype(jnp.float32),
    }
    put("rgb_head", g.wrgb, g.brgb)
    return {"params": out} if "params" in flax_params else out


def _mm(a, w):
    return jnp.dot(
        a.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )


def _encode_tile(pts, n_freqs, out_cols):
    """In-kernel BLOCK-layout positional encoding: [T, 8 (3 live)] ->
    [T, out_cols] laid out [x(3), sin(f0 xyz .. f_{F-1} xyz), cos(...)].
    The wide single sin over [T, 3F] keeps VPU lanes full (a per-frequency
    [T, 3] formulation wastes 97% of the 8x128 lanes and measured 5x
    slower end-to-end). Weights are packed with the matching row
    permutation (see pack_params raw_layout).
    """
    p3 = pts[:, :3].astype(jnp.float32)
    xb = jnp.concatenate([p3 * (2.0 ** i) for i in range(n_freqs)], axis=-1)
    enc = jnp.concatenate(
        [p3, jnp.sin(xb), jnp.sin(xb + 0.5 * jnp.pi)], axis=-1
    )
    pad = out_cols - enc.shape[-1]
    if pad:
        enc = jnp.concatenate(
            [enc, jnp.zeros((enc.shape[0], pad), enc.dtype)], axis=-1
        )
    return enc


def _block_perm(n_freqs: int, dims: int = 3) -> list:
    """Row permutation mapping block-layout encoding rows to the
    interleaved-layout rows the flax weights expect: perm[j] = interleaved
    row index feeding block row j."""
    perm = list(range(dims))
    for i in range(n_freqs):  # sin block
        for d in range(dims):
            perm.append(dims + 2 * dims * i + d)
    for i in range(n_freqs):  # cos block
        for d in range(dims):
            perm.append(dims + 2 * dims * i + dims + d)
    return perm


def _fwd_tile(x, v, W, stash_dtype=None):
    """Forward for one [T, 64]/[T, 32] tile; returns activations dict.

    stash_dtype: cast stashed activations (e.g. bf16 to halve the VMEM
    stash in a fwd+bwd mega-kernel); the backward only consumes them as
    bf16 matmul operands and sign masks, so bf16 loses nothing but the
    mask threshold resolution."""
    st = (lambda a: a.astype(stash_dtype)) if stash_dtype else (lambda a: a)
    acts = {}
    h = jnp.maximum(_mm(x, W.w0) + W.b0.astype(jnp.float32), 0.0)
    acts["a0"] = st(h)
    for i, (w, b) in enumerate(
        [(W.w1, W.b1), (W.w2, W.b2), (W.w3, W.b3), (W.w4, W.b4)], start=1
    ):
        h = jnp.maximum(_mm(h, w) + b.astype(jnp.float32), 0.0)
        acts[f"a{i}"] = st(h)
    cat = jnp.concatenate([x.astype(jnp.float32), h], axis=-1)  # [T, 320]
    acts["cat"] = st(cat)
    h = jnp.maximum(_mm(cat, W.w5) + W.b5.astype(jnp.float32), 0.0)
    acts["a5"] = st(h)
    h = jnp.maximum(_mm(h, W.w6) + W.b6.astype(jnp.float32), 0.0)
    acts["a6"] = st(h)
    h = jnp.maximum(_mm(h, W.w7) + W.b7.astype(jnp.float32), 0.0)
    acts["a7"] = st(h)
    sig = _mm(h, W.wsig) + W.bsig.astype(jnp.float32)       # [T, 128]
    bneck = _mm(h, W.wb) + W.bb.astype(jnp.float32)          # [T, 256]
    acts["bneck"] = st(bneck)
    catv = jnp.concatenate([bneck, v.astype(jnp.float32)], axis=-1)  # [T, 288]
    acts["catv"] = st(catv)
    hv = jnp.maximum(_mm(catv, W.wv) + W.bv.astype(jnp.float32), 0.0)
    acts["hv"] = st(hv)
    rgb = _mm(hv, W.wrgb) + W.brgb.astype(jnp.float32)       # [T, 128]
    return rgb, sig, acts


def _weights_from_refs(refs):
    return FusedMLPWeights(*[r[:] for r in refs])


def _fwd_kernel(x_ref, v_ref, *refs):
    w_refs, out_ref = refs[:-1], refs[-1]
    W = _weights_from_refs(w_refs)
    rgb, sig, _ = _fwd_tile(x_ref[:], v_ref[:], W)
    # [T, 8]: cols 0..2 rgb, col 4 sigma (slim HBM output)
    out_ref[:] = jnp.concatenate([rgb[:, :4], sig[:, :4]], axis=-1)


def _fwd_raw_kernel(p_ref, v_ref, *refs):
    """Forward from RAW [T, 8] points/viewdirs: posenc happens in-kernel."""
    w_refs, out_ref = refs[:-1], refs[-1]
    W = _weights_from_refs(w_refs)
    x = _encode_tile(p_ref[:], 10, 64)
    v = _encode_tile(v_ref[:], 4, 32)
    rgb, sig, _ = _fwd_tile(x, v, W)
    out_ref[:] = jnp.concatenate([rgb[:, :4], sig[:, :4]], axis=-1)


def _bwd_kernel(x_ref, v_ref, *refs):
    """refs: 24 weight refs, g_ref, then 24 grad-output refs."""
    _bwd_body(x_ref[:], v_ref[:], refs)


def _bwd_raw_kernel(p_ref, v_ref, *refs):
    _bwd_body(
        _encode_tile(p_ref[:], 10, 64), _encode_tile(v_ref[:], 4, 32), refs
    )


def _bwd_body(x, v, refs):
    w_refs = refs[:24]
    g_ref = refs[24]
    gw_refs = refs[25:]
    W = _weights_from_refs(w_refs)
    rgb, sig, acts = _fwd_tile(x, v, W)

    g8 = g_ref[:]  # [T, 8]: cols 0..2 d_rgb, col 4 d_sigma
    # widen to the padded head widths (zero cols beyond the live ones)
    zeros_pad = jnp.zeros((g8.shape[0], 120), g8.dtype)
    g_rgb = jnp.concatenate([g8[:, :4], zeros_pad, jnp.zeros_like(g8[:, :4])], axis=1)[:, :128]
    g_sig = jnp.concatenate([g8[:, 4:8], zeros_pad, jnp.zeros_like(g8[:, :4])], axis=1)[:, :128]
    col = jax.lax.broadcasted_iota(jnp.int32, g_rgb.shape, 1)
    g_rgb = jnp.where(col < 4, g_rgb, 0.0)
    g_sig = jnp.where(col < 4, g_sig, 0.0)

    _mlp_backward(x, v, W, acts, g_rgb, g_sig, gw_refs)


def _mlp_backward(x, v, W, acts, g_rgb, g_sig, gw_refs):
    """Weight-gradient backward from head gradients (g_rgb/g_sig
    [T, 128], live cols 0..3) over stashed activations; accumulates
    into gw_refs across grid programs. Shared by the standalone
    backward kernels and the fused train-step mega-kernel."""
    bf = jnp.bfloat16

    def pos(a):
        # relu mask; the compare must be f32 — Mosaic on v5e rejects
        # bf16 vector cmpf ("Target does not support this comparison"),
        # hit when activations are stashed in bf16. No-op cast for f32.
        return a.astype(jnp.float32) > 0

    def mmT(a, b):  # a[T, I]^T @ b[T, O] -> [I, O] f32
        return jax.lax.dot_general(
            a.astype(bf), b.astype(bf),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mmBT(g_, w):  # g [T, O] @ w^T [O, I] -> [T, I]
        return jax.lax.dot_general(
            g_.astype(bf), w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    grads = {}
    # rgb head
    grads["wrgb"] = mmT(acts["hv"], g_rgb)
    grads["brgb"] = jnp.sum(g_rgb, axis=0, keepdims=True)
    g_hv = mmBT(g_rgb, W.wrgb) * pos(acts["hv"])
    # view layer
    grads["wv"] = mmT(acts["catv"], g_hv)
    grads["bv"] = jnp.sum(g_hv, axis=0, keepdims=True)
    g_catv = mmBT(g_hv, W.wv)                     # [T, 288]
    g_bneck = g_catv[:, :256]
    # bottleneck + sigma head (both consume a7)
    grads["wb"] = mmT(acts["a7"], g_bneck)
    grads["bb"] = jnp.sum(g_bneck, axis=0, keepdims=True)
    grads["wsig"] = mmT(acts["a7"], g_sig)
    grads["bsig"] = jnp.sum(g_sig, axis=0, keepdims=True)
    g_h = (mmBT(g_bneck, W.wb) + mmBT(g_sig, W.wsig)) * pos(acts["a7"])
    # trunk 7, 6
    grads["w7"] = mmT(acts["a6"], g_h)
    grads["b7"] = jnp.sum(g_h, axis=0, keepdims=True)
    g_h = mmBT(g_h, W.w7) * pos(acts["a6"])
    grads["w6"] = mmT(acts["a5"], g_h)
    grads["b6"] = jnp.sum(g_h, axis=0, keepdims=True)
    g_h = mmBT(g_h, W.w6) * pos(acts["a5"])
    # trunk 5 (consumes cat = [x | a4])
    grads["w5"] = mmT(acts["cat"], g_h)
    grads["b5"] = jnp.sum(g_h, axis=0, keepdims=True)
    g_cat = mmBT(g_h, W.w5)                        # [T, 320]
    g_h = g_cat[:, 64:320] * pos(acts["a4"])
    # trunk 4..1
    grads["w4"] = mmT(acts["a3"], g_h)
    grads["b4"] = jnp.sum(g_h, axis=0, keepdims=True)
    g_h = mmBT(g_h, W.w4) * pos(acts["a3"])
    grads["w3"] = mmT(acts["a2"], g_h)
    grads["b3"] = jnp.sum(g_h, axis=0, keepdims=True)
    g_h = mmBT(g_h, W.w3) * pos(acts["a2"])
    grads["w2"] = mmT(acts["a1"], g_h)
    grads["b2"] = jnp.sum(g_h, axis=0, keepdims=True)
    g_h = mmBT(g_h, W.w2) * pos(acts["a1"])
    grads["w1"] = mmT(acts["a0"], g_h)
    grads["b1"] = jnp.sum(g_h, axis=0, keepdims=True)
    g_h = mmBT(g_h, W.w1) * pos(acts["a0"])
    # trunk 0
    grads["w0"] = mmT(x.astype(jnp.float32), g_h)
    grads["b0"] = jnp.sum(g_h, axis=0, keepdims=True)

    order = FusedMLPWeights._fields
    first = pl.program_id(0) == 0
    for name, ref in zip(order, gw_refs):
        val = grads[name]

        @pl.when(first)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, val=val):
            ref[:] = ref[:] + val


def _full_spec(shape):
    # weights: whole array each program
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _pick_fwd_tile(n: int) -> int:
    """Forward tile: prefer the big tile, fall back to TILE; the batch must
    divide one of them exactly (no remainder handling in the kernels)."""
    if n % FWD_TILE == 0:
        return FWD_TILE
    if n % TILE == 0:
        return TILE
    raise ValueError(
        f"fused MLP batch N={n} must be a multiple of {FWD_TILE} or {TILE}"
    )


def _pick_bwd_tile(n: int) -> int:
    """Backward tile: TILE when it divides N; otherwise 512 (fits VMEM,
    divides every FWD_TILE multiple). A silent remainder here would drop
    gradient rows (ADVICE r1)."""
    if n % TILE == 0:
        return TILE
    if n % 512 == 0:
        return 512
    raise ValueError(
        f"fused MLP backward batch N={n} must be a multiple of {TILE} or 512"
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_nerf_mlp(weights: FusedMLPWeights, x: jnp.ndarray, v: jnp.ndarray):
    """x [N, 64] pts encoding (63 live), v [N, 32] view encoding (27
    live); N multiple of FWD_TILE or TILE. Returns raw [N, 8]: cols
    0..2 = rgb logits, col 4 = sigma logit (slim output layout)."""
    return _fused_fwd_impl(weights, x, v)


def _fused_fwd_impl(weights, x, v):
    n = x.shape[0]
    tile = _pick_fwd_tile(n)
    grid = (n // tile,)
    w_specs = [_full_spec(w.shape) for w in weights]
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec(
            (tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
        interpret=INTERPRET,
    )(x, v, *weights)


def _fused_fwd(weights, x, v):
    return _fused_fwd_impl(weights, x, v), (weights, x, v)


def _fused_bwd(res, g):
    weights, x, v = res
    n = x.shape[0]
    tile = _pick_bwd_tile(n)
    grid = (n // tile,)
    w_specs = [_full_spec(w.shape) for w in weights]
    gw_shapes = [
        jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights
    ]
    gw_specs = [_full_spec(w.shape) for w in weights]
    grads = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(gw_specs),
        out_shape=tuple(gw_shapes),
        interpret=INTERPRET,
    )(x, v, *weights, g)
    gweights = FusedMLPWeights(*grads)
    return gweights, jnp.zeros_like(x), jnp.zeros_like(v)


fused_nerf_mlp.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# High-level wrapper: encoded points/views -> raw [N, 4] like NeRFMLP
# ---------------------------------------------------------------------------

def fused_apply(weights: FusedMLPWeights, pts_enc: jnp.ndarray,
                views_enc: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for model.apply on [N, 63]/[N, 27] encodings -> [N, 4]."""
    n = pts_enc.shape[0]
    pad = (-n) % TILE
    x = jnp.zeros((n + pad, 64), pts_enc.dtype).at[:n, :63].set(pts_enc)
    v = jnp.zeros((n + pad, 32), views_enc.dtype).at[:n, :27].set(views_enc)
    out = fused_nerf_mlp(weights, x, v)
    rgb = out[:n, 0:3]
    sigma = out[:n, 4:5]
    return jnp.concatenate([rgb, sigma], axis=-1)


# ---------------------------------------------------------------------------
# Raw-point variant: posenc fused into the kernel
# ---------------------------------------------------------------------------

@jax.custom_vjp
def fused_nerf_mlp_raw(weights: FusedMLPWeights, p: jnp.ndarray, v: jnp.ndarray):
    """p [N, 8] raw points (3 live), v [N, 8] raw unit viewdirs (3 live);
    N multiple of TILE. Positional encoding happens inside the kernel.
    Returns raw [N, 8]: cols 0..2 rgb logits, col 4 sigma logit."""
    return _fused_raw_impl(weights, p, v)


def _fused_raw_impl(weights, p, v):
    n = p.shape[0]
    tile = _pick_fwd_tile(n)
    grid = (n // tile,)
    w_specs = [_full_spec(w.shape) for w in weights]
    return pl.pallas_call(
        _fwd_raw_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec(
            (tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
        interpret=INTERPRET,
    )(p, v, *weights)


def _fused_raw_fwd(weights, p, v):
    return _fused_raw_impl(weights, p, v), (weights, p, v)


def _fused_raw_bwd(res, g):
    weights, p, v = res
    n = p.shape[0]
    tile = _pick_bwd_tile(n)
    grid = (n // tile,)
    w_specs = [_full_spec(w.shape) for w in weights]
    gw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
    gw_specs = [_full_spec(w.shape) for w in weights]
    grads = pl.pallas_call(
        _bwd_raw_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(gw_specs),
        out_shape=tuple(gw_shapes),
        interpret=INTERPRET,
    )(p, v, *weights, g)
    return FusedMLPWeights(*grads), jnp.zeros_like(p), jnp.zeros_like(v)


fused_nerf_mlp_raw.defvjp(_fused_raw_fwd, _fused_raw_bwd)


def fused_apply_raw(weights: FusedMLPWeights, pts: jnp.ndarray,
                    viewdirs: jnp.ndarray) -> jnp.ndarray:
    """Drop-in MLP apply on RAW [N, 3] points and [N, 3] unit viewdirs:
    in-kernel posenc (multires 10 / 4, interleaved ordering). -> [N, 4]."""
    n = pts.shape[0]
    pad = (-n) % TILE
    p = jnp.zeros((n + pad, 8), pts.dtype).at[:n, :3].set(pts)
    v = jnp.zeros((n + pad, 8), viewdirs.dtype).at[:n, :3].set(viewdirs)
    out = fused_nerf_mlp_raw(weights, p, v)
    return jnp.concatenate([out[:n, 0:3], out[:n, 4:5]], axis=-1)
