from nerf_projects_tpu.core.rays import (
    Rays,
    camera_rays,
    camera_rays_opencv,
    ndc_rays,
    pose_spherical,
)
from nerf_projects_tpu.core.chunk import chunk_apply, pad_to_multiple

__all__ = [
    "Rays",
    "camera_rays",
    "camera_rays_opencv",
    "ndc_rays",
    "pose_spherical",
    "chunk_apply",
    "pad_to_multiple",
]
