from nerf_projects_tpu.models.nerf import NeRFMLP
from nerf_projects_tpu.models.pipeline import render_rays, NeRFRenderConfig

__all__ = ["NeRFMLP", "render_rays", "NeRFRenderConfig"]
