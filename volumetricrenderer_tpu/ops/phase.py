"""Phase function + small shared math (VolumetricHelper.hlsl:73-99)."""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.1415926535  # helper:7 — the reference's truncated constant, kept for parity


def henyey_greenstein(g, cos_theta):
    """PhaseFunction (helper:94-99): (1-g^2) / (1+g^2-2g cosθ)^1.5 / (4π).

    b^1.5 written as b*sqrt(b): jnp.power lowers to exp(1.5*log(b)) — two
    transcendentals per froxel per light on the hot path."""
    g2 = g * g
    b = 1.0 + g2 - 2.0 * g * cos_theta
    return (1.0 - g2) / (b * jnp.sqrt(b)) / 4.0 / PI


def rgb_to_gray(rgb):
    """Rgb2Gray (helper:83-87): luma weights .3/.59/.11, used for the extinction
    of the directional scatter pass (VolumetricCompute.compute:82)."""
    return rgb[..., 0] * 0.3 + rgb[..., 1] * 0.59 + rgb[..., 2] * 0.11


def smoothstep(edge0, edge1, x):
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)
