"""Volume sampling ops.

TPUs have no texture units, so the reference's hardware trilinear samples
(SampleLevel with bilinear samplers) become explicit 8-tap interpolation. Two
regimes with very different costs:

1. `shift_sample_3d` — sampling the *whole grid* at a constant offset (the jitter
   applied by JitterFroxelPos is the same for every froxel). This is a fixed
   8-tap stencil with constant weights: implemented gather-free with one padded
   copy + 8 dynamically-offset slices. Used by the accumulation pass's jittered
   scatter fetch (VolumetricCompute.compute:187-188).

2. `trilinear_sample_3d` — arbitrary per-element positions (temporal
   reprojection, composite): a genuine gather, implemented as flat-index takes.

Sampling convention (SPEC.md): a GPU `SampleLevel(uvw)` on an N-sized axis reads
texel coordinate `uvw*N - 0.5`; all functions here take *texel* coordinates
(continuous froxel pos f samples texel coord f - 0.5). Clamp-to-edge borders
(wrap for the noise texture via `wrap=True`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def shift_sample_3d(vol: jax.Array, offset: jax.Array) -> jax.Array:
    """Sample vol [D, H, W] or [D, H, W, C] for every cell center at texel
    coords (z+oz, y+oy, x+ox), clamp-to-edge. offset = (ox, oy, oz), traced
    scalars. Channels stay LAST (C-minor transposes are expensive on TPU).
    Returns same shape as vol."""
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[..., None]
    ox, oy, oz = offset[0], offset[1], offset[2]
    ix = jnp.floor(ox)
    iy = jnp.floor(oy)
    iz = jnp.floor(oz)
    fx = ox - ix
    fy = oy - iy
    fz = oz - iz

    d, h, w, c = vol.shape
    # Pad 2 on each side so base offsets in {-2..2} stay in bounds for any
    # single-cell jitter; clamp-to-edge via edge padding.
    pad = 2
    pvol = jnp.pad(vol, [(pad, pad)] * 3 + [(0, 0)], mode="edge")

    iz0 = (iz.astype(jnp.int32) + pad).clip(0, 2 * pad)
    iy0 = (iy.astype(jnp.int32) + pad).clip(0, 2 * pad)
    ix0 = (ix.astype(jnp.int32) + pad).clip(0, 2 * pad)

    def tap(dz, dy, dx):
        return lax.dynamic_slice(
            pvol,
            (iz0 + dz, iy0 + dy, ix0 + dx, jnp.int32(0)),
            (d, h, w, c),
        )

    wz0, wz1 = (1.0 - fz), fz
    wy0, wy1 = (1.0 - fy), fy
    wx0, wx1 = (1.0 - fx), fx
    out = (
        tap(0, 0, 0) * (wz0 * wy0 * wx0)
        + tap(0, 0, 1) * (wz0 * wy0 * wx1)
        + tap(0, 1, 0) * (wz0 * wy1 * wx0)
        + tap(0, 1, 1) * (wz0 * wy1 * wx1)
        + tap(1, 0, 0) * (wz1 * wy0 * wx0)
        + tap(1, 0, 1) * (wz1 * wy0 * wx1)
        + tap(1, 1, 0) * (wz1 * wy1 * wx0)
        + tap(1, 1, 1) * (wz1 * wy1 * wx1)
    )
    return out[..., 0] if squeeze else out


def trilinear_sample_3d(vol: jax.Array, pos_texel: jax.Array,
                        wrap: bool = False) -> jax.Array:
    """Trilinear sample at arbitrary positions.

    vol: [D, H, W] or [D, H, W, C]; pos_texel: [..., 3] (x, y, z) texel coords.
    Returns [...] or [..., C]. Clamp-to-edge (wrap=True for repeat samplers).
    """
    has_c = vol.ndim == 4
    if not has_c:
        vol = vol[..., None]
    d, h, w, c = vol.shape

    x = pos_texel[..., 0]
    y = pos_texel[..., 1]
    z = pos_texel[..., 2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    fz = (z - z0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)

    if wrap:
        def ind(i, n):
            return jnp.mod(i, n)
    else:
        def ind(i, n):
            return jnp.clip(i, 0, n - 1)

    vflat = vol.reshape(-1, c)

    def tap(dz, dy, dx):
        zi = ind(z0 + dz, d)
        yi = ind(y0 + dy, h)
        xi = ind(x0 + dx, w)
        idx = (zi * h + yi) * w + xi
        return jnp.take(vflat, idx, axis=0)

    wz0, wz1 = (1.0 - fz), fz
    wy0, wy1 = (1.0 - fy), fy
    wx0, wx1 = (1.0 - fx), fx
    out = (
        tap(0, 0, 0) * (wz0 * wy0 * wx0)
        + tap(0, 0, 1) * (wz0 * wy0 * wx1)
        + tap(0, 1, 0) * (wz0 * wy1 * wx0)
        + tap(0, 1, 1) * (wz0 * wy1 * wx1)
        + tap(1, 0, 0) * (wz1 * wy0 * wx0)
        + tap(1, 0, 1) * (wz1 * wy0 * wx1)
        + tap(1, 1, 0) * (wz1 * wy1 * wx0)
        + tap(1, 1, 1) * (wz1 * wy1 * wx1)
    )
    if not has_c:
        out = out[..., 0]
    return out


def bilinear_sample_2d(img: jax.Array, pos_texel: jax.Array) -> jax.Array:
    """Bilinear sample of img [H, W] or [H, W, C] at [..., 2] (x, y) texel coords,
    clamp-to-edge."""
    has_c = img.ndim == 3
    if not has_c:
        img = img[..., None]
    h, w, c = img.shape
    x = pos_texel[..., 0]
    y = pos_texel[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    iflat = img.reshape(-1, c)

    def tap(dy, dx):
        yi = jnp.clip(y0 + dy, 0, h - 1)
        xi = jnp.clip(x0 + dx, 0, w - 1)
        return jnp.take(iflat, yi * w + xi, axis=0)

    out = (tap(0, 0) * (1 - fy) * (1 - fx) + tap(0, 1) * (1 - fy) * fx
           + tap(1, 0) * fy * (1 - fx) + tap(1, 1) * fy * fx)
    if not has_c:
        out = out[..., 0]
    return out
