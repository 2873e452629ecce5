"""In-kernel material evaluation for the fused scatter kernel.

The XLA material pass (pipeline.write_material_volumes; the reference's
WriteMaterialVolumeConstant[_WITH_NOISE], VolumetricCompute.compute:45-58)
writes [D, H, W, 4] volumes that the fused scatter kernel immediately reads
back — ~130 MB of HBM round-trip per frame at FULL size for values that are
pure elementwise functions of the froxel world position. This module evaluates
the same media model per z-slice INSIDE the kernel: identical semantics to
write_material_volumes for "foldable" media (procedural or no noise; constant
or box volumes; additive or alpha blends), enforced by equivalence tests.

Mosaic constraints shaping the code (CLAUDE.md crash list):
- uint32 <-> float/int casts are unsupported: the lattice hash runs in uint32
  between `lax.bitcast_convert_type`s from/to int32 (verified bit-exact probe).
- f32 iota must be int32 iota + cast (not used here; floors are fine).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def media_foldable(media: Sequence) -> bool:
    """True when every medium can be evaluated fully in-kernel (no texture
    gather). Texture-noise media additionally fold on the RADIANCE-bake path
    (scatter_bake="radiance", ss > 1): their wrap-trilinear factor is sampled
    at the low bake grid in XLA (visibility.bake_noise_channels_xla) and
    rides the bake channels into the kernel — render_frame's fuse_frame gate
    ORs that condition in (renderer.py)."""
    return all(m.noise_tex is None for m in media)


def noise_src(m) -> int:
    """Per-medium noise source code for the static table: 0 = no noise,
    1 = procedural (in-kernel fBm), 2 = texture (factor MUST arrive via
    noise_planes — baked outside the kernel; there is no in-kernel gather)."""
    if m.noise_mode == "procedural":
        return 1
    return 2 if m.noise_tex is not None else 0


ROW = 20  # floats per packed medium row


def pack_media(media: Sequence, time_x) -> Tuple[jax.Array, tuple]:
    """Pack traced medium params into an SMEM table [M, ROW] and the static
    per-medium code-path info into a hashable tuple.

    Row: sigma_s(3) sigma_a g tiling(3) offset(3 = scroll*time_x)
         height_falloff height_base box_min(3) box_max(3) softness.
    Static: (noise_src, octaves, period, seed, is_box, additive) per medium
    — noise_src per the noise_src() code (0 none / 1 procedural / 2 texture;
    truthy = the medium consumes a noise factor)."""
    rows = []
    static = []
    tx = jnp.asarray(time_x, jnp.float32)
    for m in media:
        rows.append(jnp.concatenate([
            m.scattering_coef, m.absorption_coef[None], m.phase_g[None],
            m.noise_tiling, m.noise_scroll * tx,
            m.height_falloff[None], m.height_base[None],
            m.box_min, m.box_max, m.box_softness[None]]))
        static.append((noise_src(m), int(m.noise_octaves),
                       int(m.noise_period), int(m.noise_seed),
                       m.volume_type == "box", m.blend_type == "additive"))
    return jnp.stack(rows), tuple(static)


def _hash3(ix, iy, iz, seed: int):
    """ops/noise._hash3 on int32 lattice planes -> low-4-bit hash (int32)."""
    u = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint32)
    h = (u(ix) * np.uint32(0x8DA6B343) + u(iy) * np.uint32(0xD8163841)
         + u(iz) * np.uint32(0xCB1AB31F)
         + np.uint32((int(seed) * 0x9E3779B9) & 0xFFFFFFFF))
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(16))
    return jax.lax.bitcast_convert_type(h, jnp.int32) & 15


def _grad_dot(h, dx, dy, dz):
    """Branchless 12-edge gradient dot (ops/noise._grad_dot)."""
    u = jnp.where(h < 8, dx, dy)
    v = jnp.where(h < 4, dy, jnp.where((h == 12) | (h == 14), dx, dz))
    return jnp.where(h & 1 == 0, u, -u) + jnp.where(h & 2 == 0, v, -v)


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def _perlin_single(px, py, pz, period: int, seed: int):
    """Periodic Perlin on [h, w] coordinate planes (ops/noise._perlin_single)."""
    p0x, p0y, p0z = jnp.floor(px), jnp.floor(py), jnp.floor(pz)
    fx, fy, fz = px - p0x, py - p0y, pz - p0z
    i0x = p0x.astype(jnp.int32)
    i0y = p0y.astype(jnp.int32)
    i0z = p0z.astype(jnp.int32)
    ux, uy, uz = _fade(fx), _fade(fy), _fade(fz)

    # power-of-two periods (the octave ladder from any pow2 base) wrap with a
    # mask — correct for negative lattice coords in two's complement, and
    # avoids int32 division, which Mosaic may not lower
    if period & (period - 1) == 0:
        wrap = lambda a: a & (period - 1)
    else:
        wrap = lambda a: jnp.mod(a, period)

    def corner(dx, dy, dz):
        h = _hash3(wrap(i0x + dx), wrap(i0y + dy), wrap(i0z + dz), seed)
        return _grad_dot(h, fx - dx, fy - dy, fz - dz)

    n000 = corner(0, 0, 0)
    n100 = corner(1, 0, 0)
    n010 = corner(0, 1, 0)
    n110 = corner(1, 1, 0)
    n001 = corner(0, 0, 1)
    n101 = corner(1, 0, 1)
    n011 = corner(0, 1, 1)
    n111 = corner(1, 1, 1)

    nx00 = n000 + ux * (n100 - n000)
    nx10 = n010 + ux * (n110 - n010)
    nx01 = n001 + ux * (n101 - n001)
    nx11 = n011 + ux * (n111 - n011)
    nxy0 = nx00 + uy * (nx10 - nx00)
    nxy1 = nx01 + uy * (nx11 - nx01)
    return nxy0 + uz * (nxy1 - nxy0)


def perlin_planes(ux, uy, uz, octaves: int, period: int, seed: int):
    """Tileable fBm Perlin in [0, 1] on [h, w] uvw planes (ops/noise.perlin_3d)."""
    total = 0.0
    amp = 1.0
    norm = 0.0
    per = period
    for o in range(octaves):
        fper = float(per)
        total = total + amp * _perlin_single(ux * fper, uy * fper, uz * fper,
                                             per, seed + o)
        norm += amp
        amp *= 0.5
        per *= 2
    return jnp.clip(0.5 + 0.5 * (total / norm) * 1.5, 0.0, 1.0)


def pack_heightfield(geom) -> jax.Array:
    """SMEM row [1, 6]: amp, base, tiling(2), offset(2)."""
    return jnp.concatenate([
        geom.hf_amp[None], geom.hf_base[None],
        geom.hf_tiling, geom.hf_offset])[None].astype(jnp.float32)


def heightfield_occluded(hf_ref, hf_static: tuple, wx, wy, wz,
                         ldx, ldy, ldz, max_t):
    """In-kernel terrain any-hit march (mirror of ops/raycast.occluded's
    heightfield branch: same band clamp + midpoint sampling, so the XLA and
    Pallas paths agree sample-for-sample). hf_static = (octaves, period,
    seed, steps, far). ld* may be scalars or [h, w] planes."""
    octaves, period, seed, steps, far = hf_static
    amp = hf_ref[0, 0]
    base = hf_ref[0, 1]
    hmax = base + amp
    eps = 1e-4
    cap = jnp.minimum(max_t, far)
    safe = jnp.where(jnp.abs(ldy) < 1e-7, 1e-7, ldy)
    ta = (hmax - wy) / safe
    tb = (base - wy) / safe
    # ld* may be SMEM scalars (dir-shadow kernel): broadcast the condition to
    # plane shape — a scalar-cond select over vectors fails to legalize in
    # Mosaic (arith.select, CLAUDE.md crash list)
    horiz = jnp.broadcast_to(jnp.abs(ldy) < 1e-7, wx.shape)
    in_band = (wy >= base) & (wy <= hmax)
    lo = jnp.where(horiz, jnp.where(in_band, eps, cap), jnp.minimum(ta, tb))
    hi = jnp.where(horiz, jnp.where(in_band, cap, 0.0), jnp.maximum(ta, tb))
    lo = jnp.clip(lo, eps, cap)
    hi = jnp.clip(hi, eps, cap)
    valid = hi > lo
    occ = jnp.zeros_like(wx, dtype=jnp.bool_)
    for i in range(steps):
        t = lo + (hi - lo) * ((i + 0.5) / steps)
        px = wx + t * ldx
        py = wy + t * ldy
        pz = wz + t * ldz
        u = px * hf_ref[0, 2] + hf_ref[0, 4]
        v = pz * hf_ref[0, 3] + hf_ref[0, 5]
        h = base + amp * perlin_planes(u, v, jnp.zeros_like(u),
                                       octaves, period, seed)
        occ |= py < h
    return occ & valid


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def phase_g_plane(med_ref, media_static: tuple, wx, wy, wz):
    """Phase-g only (the `g` channel of material_planes) at world-pos planes.

    g carries no noise/height factor (write_material_volumes: only the sigma
    channels are noise-modulated, VolumetricCompute.compute:51-58), so this
    skips the Perlin entirely — used by the low-rate radiance bake
    (ops/pallas/visibility.py), where evaluating full material_planes per
    light batch would pay the fBm for channels it never reads. Box masks and
    blend order match material_planes exactly. Works on SMEM refs in-kernel
    and on plain arrays in XLA."""
    zero = jnp.zeros(wx.shape, jnp.float32)
    g = zero
    for mi, (_has_noise, _oct, _per, _seed, is_box, additive) \
            in enumerate(media_static):
        q = lambda i: med_ref[mi, i]
        if is_box:
            soft = jnp.maximum(q(19), 1e-6)
            lo = jnp.minimum(jnp.minimum(
                _smoothstep(q(13), q(13) + soft, wx),
                _smoothstep(q(14), q(14) + soft, wy)),
                _smoothstep(q(15), q(15) + soft, wz))
            hi = jnp.minimum(jnp.minimum(
                _smoothstep(-q(16), -(q(16) - soft), -wx),
                _smoothstep(-q(17), -(q(17) - soft), -wy)),
                _smoothstep(-q(18), -(q(18) - soft), -wz))
            mask = lo * hi
        else:
            mask = jnp.ones(wx.shape, jnp.float32)
        if additive:
            g = g + q(4) * mask
        else:
            g = g * (1.0 - mask) + q(4) * mask
    return g


def noise_factor_planes(med_ref, media_static: tuple, wx, wy, wz):
    """The per-medium procedural fBm factors at world-pos planes, in
    media_static order, noise-bearing media only — the bake-side producer for
    material_planes(noise_planes=...). Splitting ONLY the fBm out of the
    material (not sigma/masks/height) keeps box edges and the height falloff
    at full rate; the noise field is band-limited by its tiling so the tent
    upsample sits far above its Nyquist rate (tests/test_noise_bake.py)."""
    out = []
    for mi, (src, octaves, period, seed, *_rest) \
            in enumerate(media_static):
        if not src:
            continue
        assert src == 1, \
            "texture-noise media have no in-kernel factor — bake their " \
            "channels outside (visibility.bake_noise_channels_xla)"
        q = lambda i: med_ref[mi, i]
        out.append(perlin_planes(wx * q(5) + q(8), wy * q(6) + q(9),
                                 wz * q(7) + q(10), octaves, period, seed))
    return out


def material_planes(med_ref, media_static: tuple, wx, wy, wz,
                    noise_planes=None):
    """Evaluate the folded media at jittered world-pos planes [h, w].

    med_ref: SMEM ref of the pack_media table. Returns (sr, sg, sb, sa, g) —
    the per-slice material planes, matching write_material_volumes exactly.
    noise_planes: optional precomputed fBm factor planes (one per
    noise-bearing medium, media order — noise_factor_planes upsampled from
    the low-rate bake); when given, the in-kernel Perlin is skipped."""
    h, w = wx.shape
    zero = jnp.zeros((h, w), jnp.float32)
    sr = sg = sb = sa = g = zero
    noise_i = 0

    for mi, (src, octaves, period, seed, is_box, additive) \
            in enumerate(media_static):
        q = lambda i: med_ref[mi, i]

        factor = jnp.ones((h, w), jnp.float32)
        if src:
            if noise_planes is not None:
                factor = factor * noise_planes[noise_i]
                noise_i += 1
            else:
                assert src == 1, \
                    "texture noise requires baked noise_planes (there is " \
                    "no in-kernel texture gather)"
                uxp = wx * q(5) + q(8)
                uyp = wy * q(6) + q(9)
                uzp = wz * q(7) + q(10)
                factor = factor * perlin_planes(uxp, uyp, uzp, octaves,
                                                period, seed)
        # exponential height falloff (extension, BASELINE config 2)
        factor = factor * jnp.exp(-jnp.maximum(q(11), 0.0)
                                  * jnp.maximum(wy - q(12), 0.0))

        if is_box:
            soft = jnp.maximum(q(19), 1e-6)
            lo = jnp.minimum(jnp.minimum(
                _smoothstep(q(13), q(13) + soft, wx),
                _smoothstep(q(14), q(14) + soft, wy)),
                _smoothstep(q(15), q(15) + soft, wz))
            hi = jnp.minimum(jnp.minimum(
                _smoothstep(-q(16), -(q(16) - soft), -wx),
                _smoothstep(-q(17), -(q(17) - soft), -wy)),
                _smoothstep(-q(18), -(q(18) - soft), -wz))
            mask = lo * hi
        else:
            mask = jnp.ones((h, w), jnp.float32)

        a_r, a_g, a_b = q(0) * factor, q(1) * factor, q(2) * factor
        a_a = q(3) * factor
        if additive:
            sr = sr + a_r * mask
            sg = sg + a_g * mask
            sb = sb + a_b * mask
            sa = sa + a_a * mask
            g = g + q(4) * mask
        else:  # alpha/overwrite (the reference's effective behavior)
            inv = 1.0 - mask
            sr = sr * inv + a_r * mask
            sg = sg * inv + a_g * mask
            sb = sb * inv + a_b * mask
            sa = sa * inv + a_a * mask
            g = g * inv + q(4) * mask

    return sr, sg, sb, sa, g
