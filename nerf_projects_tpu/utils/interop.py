"""Cross-framework checkpoint interop.

Parity targets:
  * `load_weights_from_keras` (reference nerf/nerf.py:113-146): import the
    original TF-NeRF Keras weight list into the NeRFMLP parameter tree;
  * `restore_model_state_from_jaxnerf` (reference
    plenoctree/octree/nerf/models.py:66-114): load a jaxnerf/plenoctree
    flax checkpoint (MLP_0/MLP_1 Dense_i layout) into this framework's
    NeRFSHModel parameter tree — so models trained with the reference
    code can be extracted/evaluated here directly.
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np


def nerf_params_from_keras(weights: List[np.ndarray], *, depth: int = 8) -> Dict:
    """Keras weight list -> NeRFMLP flax params (use_viewdirs=True).

    Layout (nerf.py:113-146): [W,b] per trunk layer (2*depth entries),
    then feature(bottleneck), views(view_0), rgb, alpha(sigma) heads.
    """
    p: Dict[str, Any] = {}
    for i in range(depth):
        p[f"trunk_{i}"] = {
            "kernel": np.asarray(weights[2 * i], np.float32),
            "bias": np.asarray(weights[2 * i + 1], np.float32),
        }
    idx = 2 * depth
    p["bottleneck"] = {
        "kernel": np.asarray(weights[idx], np.float32),
        "bias": np.asarray(weights[idx + 1], np.float32),
    }
    p["view_0"] = {
        "kernel": np.asarray(weights[idx + 2], np.float32),
        "bias": np.asarray(weights[idx + 3], np.float32),
    }
    p["rgb_head"] = {
        "kernel": np.asarray(weights[idx + 4], np.float32),
        "bias": np.asarray(weights[idx + 5], np.float32),
    }
    p["sigma_head"] = {
        "kernel": np.asarray(weights[idx + 6], np.float32),
        "bias": np.asarray(weights[idx + 7], np.float32),
    }
    return {"params": p}


def _mlp_from_jaxnerf(mlp_dict: Dict, net_depth: int, net_depth_condition: int):
    """jaxnerf MLP_i { Dense_j: {kernel, bias} } -> CondMLP param dict.

    jaxnerf Dense order (model_utils.py:30-94): trunk 0..net_depth-1,
    sigma head, [bottleneck, condition layers...], rgb head.
    """
    out = {}
    j = 0
    for i in range(net_depth):
        out[f"Dense_{j}"] = mlp_dict[f"Dense_{j}"]
        j += 1
    # sigma head, bottleneck, condition, rgb head keep jaxnerf order; the
    # CondMLP applies Dense modules in an identical sequence, so the
    # numbered layout maps 1:1.
    while f"Dense_{j}" in mlp_dict:
        out[f"Dense_{j}"] = mlp_dict[f"Dense_{j}"]
        j += 1
    return out


def nerf_sh_params_from_jaxnerf(ckpt_params: Dict) -> Dict:
    """jaxnerf/plenoctree flax checkpoint params -> NeRFSHModel params.

    The reference checkpoint tree is {params: {MLP_0: {Dense_i: ...},
    MLP_1: {...}[, sg_lambda, sg_mu_spher]}} (octree/nerf/models.py:66-114
    documents the same key walk for its torch port). Our CondMLP uses
    flax auto-numbered Dense submodules in the same call order, so the
    mapping is a rename of MLP_0 -> mlp_coarse, MLP_1 -> mlp_fine.
    """
    src = ckpt_params.get("params", ckpt_params)
    out: Dict[str, Any] = {}
    if "MLP_0" in src:
        out["mlp_coarse"] = _to_np_tree(src["MLP_0"])
    if "MLP_1" in src:
        out["mlp_fine"] = _to_np_tree(src["MLP_1"])
    for extra in ("sg_lambda", "sg_mu_spher"):
        if extra in src:
            out[extra] = np.asarray(src[extra])
    return {"params": out}


def _to_np_tree(d):
    if isinstance(d, dict):
        return {k: _to_np_tree(v) for k, v in d.items()}
    return np.asarray(d)
