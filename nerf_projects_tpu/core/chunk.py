"""Chunked evaluation helpers — the TPU analog of the reference's `batchify`.

The reference chunks ray batches (`chunk`, notebook cell 11) and MLP point
batches (`netchunk`, cell 8) to bound peak memory. On TPU we keep chunk
sizes static so every chunk hits the same compiled executable, pad the tail
chunk instead of shrinking it, and use `lax.map` when the chunk count is
static so the whole loop stays inside one jit.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int = 0):
    """Pad `x` along `axis` (edge-replicating) to a multiple of `multiple`.

    Returns (padded, original_size). Edge replication (rather than zeros)
    keeps padded lanes numerically benign for renderers (no 0-length rays).
    Mirrors the device-padding in reference nerf_sh/nerf/utils.py:353-369.
    """
    size = x.shape[axis]
    remainder = size % multiple
    if remainder == 0:
        return x, size
    pad = multiple - remainder
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, pad)
    return jnp.pad(x, pad_width, mode="edge"), size


def chunk_apply(fn: Callable, x, chunk_size: int):
    """Apply `fn` over leading-axis chunks of a pytree and concatenate.

    All leaves must share the leading dim. The input is padded to a multiple
    of `chunk_size` so every chunk has identical shape (one XLA program),
    then evaluated with `lax.map` and cropped back. `fn` must be traceable.
    """
    leaves = jax.tree_util.tree_leaves(x)
    n = leaves[0].shape[0]
    padded = jax.tree_util.tree_map(
        lambda l: pad_to_multiple(l, chunk_size, axis=0)[0], x
    )
    n_chunks = (n + chunk_size - 1) // chunk_size
    stacked = jax.tree_util.tree_map(
        lambda l: l.reshape((n_chunks, chunk_size) + l.shape[1:]), padded
    )
    out = jax.lax.map(fn, stacked)
    out = jax.tree_util.tree_map(
        lambda l: l.reshape((n_chunks * chunk_size,) + l.shape[2:])[:n], out
    )
    return out
