"""Tileable 3D noise.

The reference samples a 32x32x32 3D noise asset (ExampleNoise23D.asset:15-18,
wrap-sampled with scroll/tiling animation, VolumetricCompute.compute:51-58). The
asset blob is LFS-stripped in the reference checkout, so the framework ships its
own generator: periodic (tileable) Perlin noise with fBm octaves, in the spirit
of the bundled Klak Perlin implementation (Assets/ThirdParty/Klak/Math/Perlin.cs).

Two consumption modes:
- `perlin_texture_3d` bakes an [N,N,N] texture once on the host; the material
  pass wrap-samples it (gather, parity with the reference).
- `perlin_3d` evaluates the same noise procedurally per froxel — pure
  elementwise math, no gather: the TPU fast path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _hash3(ix, iy, iz, seed, xp):
    """Integer lattice hash -> uint32 (xp is np or jnp)."""
    seed_mix = xp.uint32((int(seed) * 0x9E3779B9) & 0xFFFFFFFF)
    h = (ix.astype(xp.uint32) * xp.uint32(0x8da6b343)
         + iy.astype(xp.uint32) * xp.uint32(0xd8163841)
         + iz.astype(xp.uint32) * xp.uint32(0xcb1ab31f)
         + seed_mix)
    h = h ^ (h >> xp.uint32(13))
    h = h * xp.uint32(0x85ebca6b)
    h = h ^ (h >> xp.uint32(16))
    return h


def _grad_dot(h, dx, dy, dz, xp):
    """Ken Perlin's branchless gradient-dot: pick g from the 12-edge set by
    hash bits and dot with d — pure elementwise selects, no table gather
    (a 16-entry table lookup would cost a serial gather per corner on TPU)."""
    h = h.astype(xp.int32)
    u = xp.where(h < 8, dx, dy)
    v = xp.where(h < 4, dy, xp.where((h == 12) | (h == 14), dx, dz))
    return xp.where(h & 1 == 0, u, -u) + xp.where(h & 2 == 0, v, -v)


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def _perlin_single(pos, period, seed, xp):
    """Periodic Perlin at pos [..., 3] with integer period per axis [3]."""
    p0 = xp.floor(pos)
    f = pos - p0
    p0 = p0.astype(xp.int32)
    u = _fade(f)

    def corner(dx, dy, dz):
        cx = xp.mod(p0[..., 0] + dx, period[0])
        cy = xp.mod(p0[..., 1] + dy, period[1])
        cz = xp.mod(p0[..., 2] + dz, period[2])
        h = _hash3(cx, cy, cz, seed, xp) & xp.uint32(15)
        return _grad_dot(h, f[..., 0] - dx, f[..., 1] - dy, f[..., 2] - dz, xp)

    n000 = corner(0, 0, 0)
    n100 = corner(1, 0, 0)
    n010 = corner(0, 1, 0)
    n110 = corner(1, 1, 0)
    n001 = corner(0, 0, 1)
    n101 = corner(1, 0, 1)
    n011 = corner(0, 1, 1)
    n111 = corner(1, 1, 1)

    nx00 = n000 + u[..., 0] * (n100 - n000)
    nx10 = n010 + u[..., 0] * (n110 - n010)
    nx01 = n001 + u[..., 0] * (n101 - n001)
    nx11 = n011 + u[..., 0] * (n111 - n011)
    nxy0 = nx00 + u[..., 1] * (nx10 - nx00)
    nxy1 = nx01 + u[..., 1] * (nx11 - nx01)
    return nxy0 + u[..., 2] * (nxy1 - nxy0)


def perlin_3d(uvw, octaves: int = 3, period: int = 4, seed: int = 7, xp=jnp):
    """Tileable fBm Perlin in [0, 1]; uvw [..., 3] with unit tile = 1.0."""
    total = 0.0
    amp = 1.0
    norm = 0.0
    per = period
    for o in range(octaves):
        p = xp.asarray([per, per, per], dtype=xp.int32)
        total = total + amp * _perlin_single(uvw * per, p, seed + o, xp)
        norm += amp
        amp *= 0.5
        per *= 2
    return xp.clip(0.5 + 0.5 * (total / norm) * 1.5, 0.0, 1.0)


def interleaved_gradient_noise(pix_coord, frame_count, xp=jnp):
    """Jimenez 2014 interleaved gradient noise with per-frame scroll — the
    reference's screen-space dither helper (Random.hlsl:98-104, including its
    frame 'magic scale' animation). pix_coord [..., 2] -> [...] in [0, 1)."""
    magic_xy = xp.asarray([0.06711056, 0.00583715], xp.float32)
    frame_scale = xp.asarray([2.083, 4.867], xp.float32)
    p = pix_coord + xp.asarray(frame_count, xp.float32) * frame_scale
    d = p[..., 0] * magic_xy[0] + p[..., 1] * magic_xy[1]
    frac = d - xp.floor(d)
    v = 52.9829189 * frac
    return v - xp.floor(v)


def perlin_texture_3d(size: int = 32, octaves: int = 3, period: int = 4,
                      seed: int = 7) -> np.ndarray:
    """Bake an [size, size, size] float32 tileable noise texture (z, y, x order),
    texel i holding the noise at (i + 0.5)/size."""
    coords = (np.arange(size, dtype=np.float32) + 0.5) / size
    zz, yy, xx = np.meshgrid(coords, coords, coords, indexing="ij")
    uvw = np.stack([xx, yy, zz], axis=-1)
    return perlin_3d(uvw, octaves=octaves, period=period, seed=seed, xp=np).astype(np.float32)
