"""Mesh-sharded distributed rendering and multi-host helpers.

Parity target: the reference's distributed-inference path
(plenoctree/nerf_sh/nerf/utils.py:331-381 `render_image` +
:701-731 `get_render_pfn`): chunk an image's rays, pad to a device
multiple, shard per host+device, pmap-render with `lax.all_gather`, and
the multi-host gates (host0-only logging, per-host data shards,
train.py:134-214).

TPU-native form: rays sharded over the 1-D "rays" mesh axis via
NamedSharding; jit emits the gather when the caller asks for replicated
output. Host helpers wrap jax.process_index/count (the jax.host_* API
the reference uses is the deprecated spelling of the same thing).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerf_projects_tpu.core.rays import Rays
from nerf_projects_tpu.parallel.mesh import RAY_AXIS


# -- multi-host gates (train.py:200,228; datasets.py:81) --------------------

def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def host_shard_slice(n: int):
    """This host's contiguous shard of an n-element dataset
    (batch_size // host_count splitting, datasets.py:81)."""
    pc, pi = jax.process_count(), jax.process_index()
    per = n // pc
    return slice(pi * per, (pi + 1) * per if pi < pc - 1 else n)


def host_offset_key(key: jax.Array) -> jax.Array:
    """Per-host RNG decorrelation (train.py:138,207)."""
    return jax.random.fold_in(key, jax.process_index())


# -- sharded rendering -------------------------------------------------------

def render_rays_sharded(
    mesh: Mesh,
    render_fn: Callable[[Rays], dict],
    rays: Rays,
    *,
    chunk: Optional[int] = None,
):
    """Render a flat ray batch with the batch sharded over the mesh.

    render_fn must be shardable (pure jnp over the leading axis). Rays
    are padded to a multiple of (devices * optional chunk), placed with
    a batch sharding, and the jitted render runs once; outputs come back
    fully addressable (replicated gather happens on host fetch).
    """
    n = rays.origins.shape[0]
    n_dev = mesh.devices.size
    multiple = n_dev * (chunk or 1)
    pad = (-n) % multiple
    if pad:
        rays = jax.tree_util.tree_map(
            lambda x: jnp.pad(x, ((0, pad), (0, 0)), mode="edge"), rays
        )
    sharding = NamedSharding(mesh, P(RAY_AXIS))
    rays = jax.device_put(rays, sharding)
    out = jax.jit(render_fn)(rays)
    out = jax.tree_util.tree_map(lambda x: np.asarray(x)[:n], out)
    return out


def render_image_sharded(
    mesh: Mesh,
    render_fn: Callable[[Rays], dict],
    rays_image: Rays,
    **kw,
):
    """Full [H, W] image render over the mesh; returns numpy dict."""
    h, w = rays_image.batch_shape
    flat = jax.tree_util.tree_map(lambda x: x.reshape(-1, 3), rays_image)
    out = render_rays_sharded(mesh, render_fn, flat, **kw)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((h, w) + x.shape[1:]), out
    )
