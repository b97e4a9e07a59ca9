"""The vanilla NeRF MLP as a flax module, shaped for the MXU.

Architecture parity: reference nerf/nerf.py:8-111 — trunk of D=8 layers of
width W=256 with a skip concat of the encoded input after the activation of
layer index 4 (i.e. the 5th layer sees [input, h]); with viewdirs a
bottleneck (feature_linear W->W), a density head (alpha_linear W->1) off the
trunk, and a single W/2 view-conditioned layer before the rgb head.
Without viewdirs a single (W -> output_ch) head.

TPU notes: all layers are dense matmuls over a flattened [rays*samples,
features] batch — ideal MXU work. `compute_dtype=bfloat16` runs the matmuls
on the bf16 MXU path while keeping params and the returned raw outputs in
fp32 (compositing numerics stay fp32; see ops/render.py).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class NeRFMLP(nn.Module):
    depth: int = 8
    width: int = 256
    skips: Sequence[int] = (4,)
    use_viewdirs: bool = False
    output_ch: int = 4  # only used when use_viewdirs=False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts_enc: jnp.ndarray, views_enc: jnp.ndarray = None):
        """pts_enc: [..., Cp] encoded points; views_enc: [..., Cv] encoded dirs.

        Returns raw [..., 4] = (rgb logits, sigma logit) when use_viewdirs or
        output_ch=4; activations (sigmoid/relu/noise) are applied by the
        render pipeline, matching the reference split of nerf.py vs cell 9.
        """
        dense = lambda feats, name: nn.Dense(feats, name=name, dtype=self.compute_dtype, param_dtype=jnp.float32)
        x = pts_enc.astype(self.compute_dtype)
        h = x
        for i in range(self.depth):
            h = dense(self.width, f"trunk_{i}")(h)
            h = nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([x, h], axis=-1)

        if self.use_viewdirs:
            if views_enc is None:
                raise ValueError("use_viewdirs=True requires views_enc")
            sigma = dense(1, "sigma_head")(h)
            feat = dense(self.width, "bottleneck")(h)
            v = jnp.concatenate([feat, views_enc.astype(self.compute_dtype)], axis=-1)
            v = nn.relu(dense(self.width // 2, "view_0")(v))
            rgb = dense(3, "rgb_head")(v)
            raw = jnp.concatenate([rgb, sigma], axis=-1)
        else:
            raw = dense(self.output_ch, "output")(h)
        return raw.astype(jnp.float32)
