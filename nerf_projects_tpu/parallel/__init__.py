from nerf_projects_tpu.parallel.mesh import (
    make_mesh,
    shard_rays,
    replicate,
    RAY_AXIS,
)

__all__ = ["make_mesh", "shard_rays", "replicate", "RAY_AXIS"]
