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
import numpy as np


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
    D = x.shape[-1]
    if log_sampling:
        freqs = 2.0 ** np.arange(min_deg, min_deg + num_freqs, dtype=np.float64)
    else:
        freqs = np.linspace(
            2.0 ** min_deg, 2.0 ** (min_deg + num_freqs - 1), num_freqs,
            dtype=np.float64,
        )

    # TPU layout note: the naive [..., F, 2, D] intermediate puts D (=3)
    # on the lane dimension — 3/128 lane occupancy made posenc ~4 ms/step
    # at 295k points (round-2 bisect). Instead compute the whole encoding
    # in one flat [..., 2*F*D] op: both output orderings have the input
    # dim innermost, so tile(x) * freq_vec + phase_vec followed by one
    # fused sin gives bit-identical values at full lane occupancy.
    j = np.arange(2 * num_freqs * D)
    if ordering == "interleaved":
        # col j = ((f*2 + sc) * D + d): [sin(2^0 x), cos(2^0 x), ...]
        f_idx = (j // D) // 2
        sc = (j // D) % 2
    elif ordering == "block":
        # col j = sc*(F*D) + f*D + d: [sin(2^0 x .. 2^(F-1) x), cos(...)]
        sc = j // (num_freqs * D)
        f_idx = (j // D) % num_freqs
    else:
        raise ValueError(f"unknown posenc ordering: {ordering!r}")
    freq_vec = jnp.asarray(freqs[f_idx], x.dtype)
    phase_vec = jnp.asarray(sc * (0.5 * np.pi), x.dtype)

    xt = jnp.tile(x, (1,) * (x.ndim - 1) + (2 * num_freqs,))
    four = jnp.sin(xt * freq_vec + phase_vec)

    if include_input:
        return jnp.concatenate([x, four], axis=-1)
    return four
