"""Floater visualization.

Parity target: reference svox2/opt/util/floater_visualization.py —
visualize FDR floater detections as density-slice images with floater
voxels highlighted, plus a per-component summary panel. Renders headless
PNGs (usable standalone or logged to TensorBoard as images).
"""
from __future__ import annotations

import os
import numpy as np


def floater_masks(grid, *, threshold: float = 0.01, min_object_size: int = 1000,
                  connectivity: int = 26):
    """Dense (occupancy, floater_mask) volumes from a SparseGrid."""
    from scipy import ndimage

    from nerf_projects_tpu.obs.advanced_metrics import _occupancy_from_grid

    occ = _occupancy_from_grid(grid, threshold, True)
    struct = ndimage.generate_binary_structure(3, {6: 1, 18: 2, 26: 3}[connectivity])
    labels, n = ndimage.label(occ, structure=struct)
    sizes = np.bincount(labels.ravel())
    sizes[0] = 0
    if n == 0:
        return occ, np.zeros_like(occ)
    order = np.argsort(sizes)[::-1]
    main_label = order[0]
    floater_labels = [
        l for l in range(1, n + 1)
        if l != main_label and sizes[l] < max(min_object_size, sizes[main_label])
    ]
    floater = np.isin(labels, floater_labels)
    return occ, floater


def render_floater_slices(
    grid,
    out_dir: str,
    *,
    threshold: float = 0.01,
    min_object_size: int = 100,
    n_slices: int = 4,
    axis: int = 2,
):
    """Write axis-aligned density slices with floaters highlighted red.

    Returns the list of written PNG paths.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    occ, floater = floater_masks(
        grid, threshold=threshold, min_object_size=min_object_size
    )
    os.makedirs(out_dir, exist_ok=True)
    reso = occ.shape[axis]
    paths = []
    for i, frac in enumerate(np.linspace(0.2, 0.8, n_slices)):
        idx = int(frac * (reso - 1))
        sl = [slice(None)] * 3
        sl[axis] = idx
        occ_sl = occ[tuple(sl)]
        flo_sl = floater[tuple(sl)]
        img = np.zeros(occ_sl.shape + (3,))
        img[occ_sl] = [0.7, 0.7, 0.7]
        img[flo_sl] = [1.0, 0.1, 0.1]
        fig, ax = plt.subplots(figsize=(4, 4))
        ax.imshow(img, origin="lower")
        ax.set_title(f"axis {axis} slice {idx} — floaters red")
        ax.axis("off")
        p = os.path.join(out_dir, f"floater_slice_{axis}_{idx:04d}.png")
        fig.savefig(p, bbox_inches="tight")
        plt.close(fig)
        paths.append(p)
    return paths


def project_floaters_to_view(
    grid,
    floater_mask: np.ndarray,
    pose: np.ndarray,
    intrinsics: np.ndarray,
    height: int,
    width: int,
    *,
    min_density: float = 0.1,
):
    """2D heatmap of floater voxels projected into a camera
    (floater_visualization.py:59 project_floaters_to_view; density
    filtering reproduced, occlusion filtering left to the overlay's
    alpha since our renders already carry the geometry).

    pose: OpenCV-convention c2w [4,4]; intrinsics [3,3]. Returns
    [H, W] float heatmap (None if no visible floaters).
    """
    coords = np.argwhere(floater_mask)
    if len(coords) == 0:
        return None
    links = np.asarray(grid.links)
    rows = links[coords[:, 0], coords[:, 1], coords[:, 2]]
    dens = np.zeros(len(coords))
    ok = rows >= 0
    dens[ok] = np.asarray(grid.density_data)[rows[ok], 0]
    keep = dens >= min_density
    coords = coords[keep]
    if len(coords) == 0:
        return None

    import jax.numpy as jnp

    world = np.asarray(grid.grid_to_world(jnp.asarray(coords, jnp.float32)))
    w2c = np.linalg.inv(np.asarray(pose, np.float64))
    cam = world @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[:, 2]
    front = z > 1e-6
    cam = cam[front]
    if len(cam) == 0:
        return None
    px = intrinsics[0, 0] * cam[:, 0] / cam[:, 2] + intrinsics[0, 2]
    py = intrinsics[1, 1] * cam[:, 1] / cam[:, 2] + intrinsics[1, 2]
    inside = (px >= 0) & (px < width) & (py >= 0) & (py < height)
    if not inside.any():
        return None
    heat, _, _ = np.histogram2d(
        py[inside], px[inside],
        bins=[height, width], range=[[0, height], [0, width]],
    )
    return heat


def overlay_on_render(rgb: np.ndarray, heatmap: np.ndarray,
                      alpha: float = 0.9) -> np.ndarray:
    """Red floater overlay on a rendered image
    (create_floater_overlay_on_render)."""
    out = np.asarray(rgb, np.float32).copy()
    h = heatmap / max(float(heatmap.max()), 1e-6)
    mask = h > 0
    out[mask] = (1 - alpha * h[mask, None]) * out[mask] + alpha * h[
        mask, None
    ] * np.array([1.0, 0.05, 0.05])
    return np.clip(out, 0, 1)


def log_floater_visualizations(
    tb,
    grid,
    step: int,
    *,
    cameras=None,
    renders=None,
    gt_images=None,
    threshold: float = 0.01,
    min_object_size: int = 100,
    n_slices: int = 3,
    max_views: int = 3,
):
    """Log the floater visualization set to TensorBoard during training
    eval steps (floater_visualization.py:635
    log_floater_visualizations_to_tensorboard, hooked at opt.py:580-668).

    tb: obs.tb.SummaryWriter (or any object with .image/.scalar).
    cameras: list of (pose_c2w, intrinsics, H, W). Returns the number of
    images logged.
    """
    occ, floater = floater_masks(
        grid, threshold=threshold, min_object_size=min_object_size
    )
    n_logged = 0
    tb.scalar("floaters/voxels", float(floater.sum()), step)

    # axis slices with floaters highlighted
    reso = occ.shape[2]
    for i, frac in enumerate(np.linspace(0.25, 0.75, n_slices)):
        idx = int(frac * (reso - 1))
        img = np.zeros(occ.shape[:2] + (3,), np.float32)
        img[occ[:, :, idx]] = [0.7, 0.7, 0.7]
        img[floater[:, :, idx]] = [1.0, 0.1, 0.1]
        tb.image(f"floaters/slice_z{idx}", img, step)
        n_logged += 1

    if cameras is not None:
        for i, cam in enumerate(cameras[:max_views]):
            pose, K, H, W = cam
            heat = project_floaters_to_view(
                grid, floater, pose, K, H, W
            )
            if heat is None:
                continue
            hn = heat / max(float(heat.max()), 1e-6)
            tb.image(f"floaters/heatmap_view_{i}", hn[..., None].repeat(3, -1), step)
            n_logged += 1
            if renders is not None and i < len(renders):
                tb.image(
                    f"floaters/overlay_view_{i}",
                    overlay_on_render(np.asarray(renders[i]), heat),
                    step,
                )
                n_logged += 1
            if gt_images is not None and i < len(gt_images):
                tb.image(f"floaters/gt_view_{i}", np.asarray(gt_images[i]), step)
                n_logged += 1
    return n_logged
