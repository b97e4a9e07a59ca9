"""Spherical-Gaussian radiance basis.

Behavioral parity with reference plenoctree/nerf_sh/nerf/sg.py:35-66
(`eval_sg`): output = (1/N) * sum_i coeffs_i * exp(softplus(lambda_i) *
(mu_i . d - 1)), with lobe directions optionally given as (theta, phi)
spherical coordinates. Pure VPU elementwise + small contractions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def spher2cart(r, theta, phi):
    x = r * jnp.sin(theta) * jnp.cos(phi)
    y = r * jnp.sin(theta) * jnp.sin(phi)
    z = r * jnp.cos(theta)
    return jnp.stack([x, y, z], axis=-1)


def eval_sg(sg_lambda, sg_mu, sg_coeffs, dirs):
    """Evaluate a learnable SG basis at unit directions.

    Args:
      sg_lambda: lobe sharpness logits, [N] or [..., N] (softplus applied).
      sg_mu: lobe directions, [..., N, 3] cartesian or [..., N, 2] (theta, phi).
      sg_coeffs: lobe amplitudes, [..., C, N].
      dirs: [..., 3] unit directions.

    Returns: [..., C] decoded values (divided by lobe count N).
    """
    sg_lambda = jax.nn.softplus(sg_lambda)
    if sg_mu.shape[-1] == 2:
        sg_mu = spher2cart(1.0, sg_mu[..., 0], sg_mu[..., 1])
    product = jnp.einsum("...ij,...j->...i", sg_mu, dirs)
    basis = jnp.exp(sg_lambda * (product - 1.0))
    out = jnp.einsum("...ki,...i->...k", sg_coeffs, basis)
    return out / sg_lambda.shape[-1]


def euler2mat(angle):
    """Euler angles [..., 3] (x, y, z, radians) -> rotation matrices [..., 3, 3]."""
    x, y, z = angle[..., 0], angle[..., 1], angle[..., 2]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    zeros, ones = jnp.zeros_like(z), jnp.ones_like(z)
    zmat = jnp.stack(
        [
            jnp.stack([cz, -sz, zeros], -1),
            jnp.stack([sz, cz, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        -1,
    )
    ymat = jnp.stack(
        [
            jnp.stack([cy, zeros, sy], -1),
            jnp.stack([zeros, ones, zeros], -1),
            jnp.stack([-sy, zeros, cy], -1),
        ],
        -1,
    )
    xmat = jnp.stack(
        [
            jnp.stack([ones, zeros, zeros], -1),
            jnp.stack([zeros, cx, -sx], -1),
            jnp.stack([zeros, sx, cx], -1),
        ],
        -1,
    )
    return jnp.einsum("...ij,...jk,...kq->...iq", xmat, ymat, zmat)
