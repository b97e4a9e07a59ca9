"""Positional (Fourier-feature) encoding.

Two orderings exist in the reference and both are supported for checkpoint /
numeric parity:

  * "interleaved": [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]
    — the vanilla-NeRF Embedder (reference nerf/embedder.py:8-116).
  * "block": [x, sin(2^m x .. 2^(M-1) x), sin(... + pi/2)] — the jaxnerf
    posenc using the cos(x)=sin(x+pi/2) identity (reference
    plenoctree/nerf_sh/nerf/model_utils.py:145-173).

Both produce a single fused sin evaluation on the VPU; the encoding feeds
straight into the first MLP matmul so XLA fuses it into the MXU pipeline.
"""
from __future__ import annotations

import jax.numpy as jnp


def posenc_dim(in_dim: int, num_freqs: int, include_input: bool = True) -> int:
    """Output feature dim of `posenc`."""
    return in_dim * (2 * num_freqs + (1 if include_input else 0))


def posenc(
    x: jnp.ndarray,
    num_freqs: int,
    *,
    min_deg: int = 0,
    include_input: bool = True,
    ordering: str = "interleaved",
    log_sampling: bool = True,
) -> jnp.ndarray:
    """Fourier-feature encode `x` with frequencies 2^min_deg .. 2^(min_deg+num_freqs-1).

    Args:
      x: [..., D] inputs.
      num_freqs: number of frequency bands (`multires` in the reference).
      min_deg: lowest power of two (jaxnerf `min_deg`; vanilla NeRF uses 0).
      include_input: prepend the raw input (reference `include_input=True`).
      ordering: "interleaved" (vanilla NeRF) or "block" (jaxnerf).
      log_sampling: log-spaced (2^i) vs linearly spaced frequencies
        (reference embedder.py `log_sampling` flag).

    Returns:
      [..., D * (2*num_freqs + include_input)] encoded features.
    """
    if num_freqs == 0:
        return x
    if log_sampling:
        freqs = 2.0 ** jnp.arange(min_deg, min_deg + num_freqs, dtype=x.dtype)
    else:
        freqs = jnp.linspace(
            2.0 ** min_deg, 2.0 ** (min_deg + num_freqs - 1), num_freqs, dtype=x.dtype
        )

    # xb: [..., F, D]
    xb = x[..., None, :] * freqs[:, None]
    if ordering == "interleaved":
        # [..., F, 2, D] -> flatten to sin/cos interleaved per frequency.
        four = jnp.sin(jnp.stack([xb, xb + 0.5 * jnp.pi], axis=-2))
        four = four.reshape(x.shape[:-1] + (2 * num_freqs * x.shape[-1],))
    elif ordering == "block":
        flat = xb.reshape(x.shape[:-1] + (num_freqs * x.shape[-1],))
        four = jnp.sin(jnp.concatenate([flat, flat + 0.5 * jnp.pi], axis=-1))
    else:
        raise ValueError(f"unknown posenc ordering: {ordering!r}")

    if include_input:
        return jnp.concatenate([x, four], axis=-1)
    return four
