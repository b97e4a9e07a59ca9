"""Render-path video generation.

Parity target: reference plenoctree/nerf_sh/gen_video.py:108-176 and the
notebook's i_video spiral renders: render a pose path with any
image-render function and write frames + an animation. ffmpeg is absent
in this environment, so mp4 falls back to GIF (imageio PIL writer) with
the frame PNGs always written.
"""
from __future__ import annotations

import os
from typing import Callable, Sequence

import numpy as np

from nerf_projects_tpu.obs.metrics import to8b


def render_video(
    render_image_fn: Callable,
    poses: Sequence,
    out_dir: str,
    *,
    fps: int = 30,
    basename: str = "video",
    save_frames: bool = True,
):
    """render_image_fn(c2w) -> [H, W, 3] float image. Returns frame paths
    + the animation path actually written."""
    os.makedirs(out_dir, exist_ok=True)
    frames = []
    frame_paths = []
    for i, pose in enumerate(poses):
        img = to8b(np.asarray(render_image_fn(pose)))
        frames.append(img)
        if save_frames:
            import imageio.v2 as imageio

            p = os.path.join(out_dir, f"{basename}_{i:03d}.png")
            imageio.imwrite(p, img)
            frame_paths.append(p)

    import imageio.v2 as imageio

    anim_path = os.path.join(out_dir, f"{basename}.mp4")
    try:
        imageio.mimwrite(anim_path, frames, fps=fps)
    except Exception:
        anim_path = os.path.join(out_dir, f"{basename}.gif")
        imageio.mimwrite(anim_path, frames, duration=1000.0 / fps, loop=0)
    return frame_paths, anim_path
