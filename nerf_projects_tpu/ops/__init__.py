from nerf_projects_tpu.ops.posenc import posenc, posenc_dim
from nerf_projects_tpu.ops.sampling import (
    stratified_sample,
    sample_pdf,
    piecewise_constant_pdf,
    cast_rays,
)
from nerf_projects_tpu.ops.render import volumetric_rendering, RenderOutputs

__all__ = [
    "posenc",
    "posenc_dim",
    "stratified_sample",
    "sample_pdf",
    "piecewise_constant_pdf",
    "cast_rays",
    "volumetric_rendering",
    "RenderOutputs",
]
