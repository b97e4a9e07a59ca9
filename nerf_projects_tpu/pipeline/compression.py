"""PlenOctree compression: median-cut palette quantization of SH data.

Parity target: reference plenoctree/octree/compression.py —
  * sigma-threshold kill of near-empty leaves (:156-160);
  * per-SH-channel median-cut quantization to a 2^16-color palette via
    svox `_C.quantize_median_cut` (:186-188): each basis function's rgb
    triple across all leaves becomes (uint16 ids, fp16 palette);
  * optionally keep the first `retain` low-order coefficient groups
    unquantized (:168-173);
  * deflate with np.savez_compressed (:226) dropping tree bookkeeping.

The median-cut itself (the CUDA `quantize_median_cut`) is reimplemented
host-side in numpy: iterative box splitting along the largest-range axis
at the median — construction-time only, not a hot path.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from nerf_projects_tpu.models.octree import PlenOctree


def median_cut(
    vectors: np.ndarray, n_colors: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Median-cut vector quantization.

    vectors: [N, C] float. Returns (palette [K, C] fp16, ids [N] uint16/32)
    with K <= n_colors. Deterministic.
    """
    n = len(vectors)
    if n == 0:
        return np.zeros((1, vectors.shape[1]), np.float16), np.zeros(0, np.uint16)
    try:
        from nerf_projects_tpu.utils import native

        res = native.median_cut(np.asarray(vectors, np.float32), n_colors)
        if res is not None:
            return res
    except Exception:
        pass
    ids = np.zeros(n, np.int64)
    boxes = {0: np.arange(n)}
    next_id = 1
    while len(boxes) < n_colors:
        # split the box with the largest spread (range * count heuristic)
        best, best_score = None, 0.0
        for b, idx in boxes.items():
            if len(idx) < 2:
                continue
            rng = vectors[idx].max(0) - vectors[idx].min(0)
            score = float(rng.max()) * len(idx)
            if score > best_score:
                best, best_score = b, score
        if best is None:
            break
        idx = boxes[best]
        axis = int(np.argmax(vectors[idx].max(0) - vectors[idx].min(0)))
        order = np.argsort(vectors[idx, axis], kind="stable")
        half = len(idx) // 2
        lo, hi = idx[order[:half]], idx[order[half:]]
        boxes[best] = lo
        boxes[next_id] = hi
        ids[hi] = next_id
        next_id += 1

    palette = np.zeros((next_id, vectors.shape[1]), np.float32)
    for b, idx in boxes.items():
        if len(idx):
            palette[b] = vectors[idx].mean(0)
    id_dtype = np.uint16 if next_id <= 65536 else np.uint32
    return palette.astype(np.float16), ids.astype(id_dtype)


def compress_octree(
    tree: PlenOctree,
    path: str,
    *,
    n_colors: int = 65536,
    sigma_thresh: float = 1.0,
    retain: int = 1,
):
    """Quantize + save. Returns the bytes written and compression stats."""
    import os

    data = np.asarray(tree.data, np.float32)
    flat = data.reshape(-1, tree.data_dim)
    sigma = flat[:, -1]
    # sigma kill: zero out data of near-empty leaves (compression.py:156).
    dead = sigma < sigma_thresh
    flat = flat.copy()
    flat[dead] = 0.0

    basis_dim = (tree.data_dim - 1) // 3
    retain = max(0, min(retain, basis_dim))
    retained = flat[:, : 3 * retain]

    quant_payload = {}
    for b in range(retain, basis_dim):
        vec = flat[:, 3 * b : 3 * (b + 1)]
        palette, ids = median_cut(vec, n_colors)
        quant_payload[f"palette_{b}"] = palette
        quant_payload[f"ids_{b}"] = ids

    np.savez_compressed(
        path,
        child=np.asarray(tree.child),
        invradius3=tree.invradius,
        offset=tree.offset,
        depth_limit=tree.depth_limit,
        data_dim=tree.data_dim,
        basis_dim=basis_dim,
        retain=retain,
        sigma=flat[:, -1].astype(np.float16),
        data_retained=retained.astype(np.float16),
        **quant_payload,
    )
    raw_bytes = data.nbytes + np.asarray(tree.child).nbytes
    comp_bytes = os.path.getsize(path)
    return {
        "raw_bytes": raw_bytes,
        "compressed_bytes": comp_bytes,
        "compression_ratio": raw_bytes / max(comp_bytes, 1),
    }


def load_compressed_octree(path: str) -> PlenOctree:
    """Rebuild a renderable tree from the quantized npz
    (compressed_evaluation.py:82-215 equivalent)."""
    z = np.load(path)
    child = z["child"].astype(np.int32)
    data_dim = int(z["data_dim"])
    basis_dim = int(z["basis_dim"])
    retain = int(z["retain"])
    n_cells = child.size
    flat = np.zeros((n_cells, data_dim), np.float32)
    flat[:, : 3 * retain] = z["data_retained"].astype(np.float32)
    for b in range(retain, basis_dim):
        palette = z[f"palette_{b}"].astype(np.float32)
        ids = z[f"ids_{b}"].astype(np.int64)
        flat[:, 3 * b : 3 * (b + 1)] = palette[ids]
    flat[:, -1] = z["sigma"].astype(np.float32)
    data = flat.reshape(child.shape + (data_dim,))
    return PlenOctree(
        child=jnp.asarray(child),
        data=jnp.asarray(data),
        invradius=z["invradius3"].astype(np.float32),
        offset=z["offset"].astype(np.float32),
        depth_limit=int(z["depth_limit"]),
    )
