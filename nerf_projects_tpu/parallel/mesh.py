"""Device-mesh construction and sharding layouts.

The reference's distributed story (SURVEY.md §2.4) is ray-batch data
parallelism: `jax.pmap(train_step, axis_name="batch")` with replicated
params and `lax.pmean` grads (plenoctree/nerf_sh/train.py:184-198), plus
all-gathered pmap rendering (nerf_sh/nerf/utils.py:701-731).

Here that becomes the idiomatic single-jit equivalent: a 1-D "rays" mesh
over all devices, batch inputs sharded on their leading axis, parameters
replicated, and XLA inserting the psum for the gradient reduction over ICI
automatically from the sharding annotations (no explicit collectives
needed for DP; shard_map is reserved for the Pallas collective kernels).

The scaling axes of this domain are rays and grid memory — there is no
sequence/expert dimension — so the mesh is 1-D by default but
`make_mesh(axes={"rays": 4, "grid": 2})` supports a 2-D layout for
grid-sharded Plenoxels once fields outgrow one chip's HBM.
"""
from __future__ import annotations

from typing import Mapping, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Optional[Mapping[str, int]] = None,
) -> Mesh:
    """Build a mesh over the first n_devices (default: all local devices).

    axes: ordered {axis_name: size} mapping; defaults to 1-D {"rays": n}.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if axes is None:
        axes = {RAY_AXIS: n_devices}
    sizes = list(axes.values())
    if int(np.prod(sizes)) != n_devices:
        raise ValueError(f"mesh axes {axes} do not multiply to {n_devices}")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(axes.keys()))


def shard_rays(mesh: Mesh, tree, axis: str = RAY_AXIS):
    """Place a pytree with its leading axis sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh, axis: str = RAY_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
