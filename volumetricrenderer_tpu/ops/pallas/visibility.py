"""Per-light baked visibility volumes (the local-light shadow amortizer).

The reference amortizes local-light occlusion into shadow MAPS baked once per
light (cube faces for points, one perspective map for spots —
VolumetricHelper.hlsl:237-259, dispatched per froxel from
VolumetricCompute.compute:87-167). The round-2 fused scatter kernel instead
re-tested occlusion per (light, froxel) — ~2/3 of its 6.46 ms (PERF.md
"Scatter-kernel accounting"). This module is the TPU-native equivalent of the
reference's amortization: bake per-light VISIBILITY into a low-res froxel-rate
volume once per frame (this kernel — the same any-hit tests at 1/ss^3 the
rate), then let the scatter kernel sample it with an exact separable tent
upsample (z-lerp of two planes + two small matmuls; at ss=2 every weight and
every lerped value is dyadic, so even bf16 MXU dots reproduce f32 exactly).

Map-mode local lights use the same consumer: bake_visibility_from_maps samples
the baked cube/spot maps at the low-res grid in XLA (1/ss^3 of the gathers
that made full-rate map sampling a ~2.5 s/frame cliff).

Grid/coordinate contract: low-res cell k covers full-res cells
[ss*k, ss*k+ss); its sample sits at full-res coordinate ss*k + (ss-1)/2
(continuous position ss*k + (ss+1)/2 + jitter), i.e. the midpoint of its
cells' jittered sample positions. The tent weights in upsample_mats and the
z-lerp in the scatter kernel interpolate in that coordinate frame with
clamp-to-edge at the borders.

Slab y-phase: under H-sharded slabs (params.y0 != 0) the low Y rows are
phase-shifted by (-y0) mod ss so they land on the GLOBAL ss-grid regardless
of the slab's start row (y_phase / upsample_mats_y). Without this, a slab
whose halo-extended start row is odd (e.g. 135 rows / 3 shards with halo 2
-> start 43) bakes at the opposite row parity from the whole-grid render and
its interior drifts by the bake's intrinsic error (measured up to ~5% max
rel on the TPU smoke); with it, interior rows sample identical world
positions for ANY slab decomposition and match the unsharded frame exactly.
y0 = 0 and even starts keep phase 0, i.e. the historical layout.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volumetricrenderer_tpu.ops.pallas.occlude import any_hit, pack_boxes


def low_res_dims(grid_whd: Tuple[int, int, int], ss: int):
    w, h, d = grid_whd
    return (-(-w // ss), -(-h // ss), -(-d // ss))        # (WL, HL, DL)


def upsample_mats(n: int, nl: int, ss: int) -> np.ndarray:
    """[n, nl] f32 tent weights: out[i] = sum_k A[i, k] * low[k], linear
    interpolation between low-res sample positions with clamp-to-edge.
    At ss=2 the weights are 0.25/0.75/1.0 — exact in bf16."""
    a = np.zeros((n, nl), np.float32)
    for i in range(n):
        u = (i - (ss - 1) / 2.0) / ss
        k = int(np.floor(u))
        t = u - k
        if k < 0:
            k, t = 0, 0.0
        if k >= nl - 1:
            k, t = nl - 1, 0.0
        a[i, k] += 1.0 - t
        if t > 0.0:
            a[i, k + 1] += t
    return a


def y_phase(y0, ss: int) -> jax.Array:
    """Slab y-phase (module docstring): the local row offset that puts the
    low Y samples on the GLOBAL ss-grid. 0.0 for y0 = 0 / even slab starts;
    traced (y0 is a traced scalar under shard_map / the multislab step)."""
    return jnp.mod(-jnp.asarray(y0, jnp.float32), float(ss))


def upsample_mats_y(n: int, nl: int, ss: int, y0) -> jax.Array:
    """Traced-phase Y form of upsample_mats: weights for low samples at local
    rows ss*k + (ss-1)/2 + y_phase(y0, ss). Identical values to
    upsample_mats(n, nl, ss) when the phase is 0 (the clamped-tent closed
    form below equals the loop's two-tap construction everywhere, including
    the clamp-to-edge rows); at ss=2 the weights stay dyadic (0.25/0.75/1.0)
    for either phase, so the MXU tent matmuls remain exact."""
    ph = y_phase(y0, ss)
    i = jnp.arange(n, dtype=jnp.float32)
    u = jnp.clip((i - (ss - 1) * 0.5 - ph) / ss, 0.0, float(nl - 1))
    j = jnp.arange(nl, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - j[None, :]))


def low_slice_active(params, view_to_world, positions, ranges,
                     grid_whd: Tuple[int, int, int], ss: int) -> jax.Array:
    """[NL, DL] bool: does any full-res froxel that interpolates from low
    slice k intersect light li's range sphere? Full slice z reads low slices
    floor(u)..floor(u)+1 with u = (z - (ss-1)/2)/ss, so low slice k is read by
    z in [ss*k - ss + 1, ss*k + 2*ss - 1]; pad one voxel for the jitter."""
    from volumetricrenderer_tpu import froxel as froxel_lib

    w, h, d = grid_whd
    wl, hl, dl = low_res_dims(grid_whd, ss)
    h_glob = params.grid[1]
    y0 = jnp.asarray(params.y0, jnp.float32)
    ks = jnp.arange(dl, dtype=jnp.float32)
    z0 = jnp.clip(ss * ks - ss, 0.0, float(d))
    z1 = jnp.clip(ss * ks + 2.0 * ss, 0.0, float(d))
    xs = jnp.asarray([0.0, float(w)])
    # + (ss - 1): the slab y-phase shifts low samples down by up to ss - 1
    # rows (module docstring); keep the cull AABB conservative over them
    ys = jnp.stack([jnp.clip(y0, 0.0, float(h_glob)),
                    jnp.clip(y0 + h + (ss - 1), 0.0, float(h_glob))])
    fx, fy = jnp.meshgrid(xs, ys, indexing="ij")
    fx = jnp.broadcast_to(fx.reshape(1, 4), (dl, 4))
    fy = jnp.broadcast_to(fy.reshape(1, 4), (dl, 4))
    corners = []
    for fz in (z0, z1):
        fzc = jnp.broadcast_to(fz[:, None], (dl, 4))
        corners.append(jnp.stack([fx, fy, fzc], axis=-1))
    fro = jnp.concatenate(corners, axis=1)                 # [DL, 8, 3]
    world = froxel_lib.transform_points(view_to_world,
                                        froxel_lib.froxel_to_view(params, fro))
    lo = jnp.min(world, axis=1)
    hi = jnp.max(world, axis=1)
    nearest = jnp.clip(positions[:, None], lo[None], hi[None])   # [NL, DL, 3]
    diff = nearest - positions[:, None]
    d2 = jnp.sum(diff * diff, axis=-1)
    return d2 <= (ranges[:, None] ** 2)                    # [NL, DL]


def bake_world_planes(par_ref, zi, grid_whd: Tuple[int, int, int], ss: int,
                      h_glob: int):
    """[HL, WL] jittered world-position planes of low-res slice zi — the
    in-kernel coordinate block shared by the standalone bake kernel and the
    megakernel's inline bake (ops/pallas/frame_fused.py). Low-res slice
    sample: full-res froxel coords ss*k + (ss-1)/2, same +0.5+jitter
    convention as the full-res kernel (scatter._kernel); Y rows carry the
    slab phase (module docstring) so they sit on the global ss-grid."""
    w, h, d = grid_whd
    wl, hl, dl = low_res_dims(grid_whd, ss)
    p = lambda i: par_ref[0, i]
    fpx, fpy, fpz, fpw, near = p(12), p(13), p(14), p(15), p(16)
    jx, jy, jz = p(17), p(18), p(19)
    y0 = p(23)

    off = (ss - 1) * 0.5
    fz = float(ss) * zi.astype(jnp.float32) + off + 0.5 + jz
    vz = (jnp.exp(jnp.log(fpz) * fz / d) - 1.0) * fpw + near
    xs = jax.lax.broadcasted_iota(jnp.int32, (hl, wl), 1) \
        .astype(jnp.float32) * float(ss) + off
    ys = jax.lax.broadcasted_iota(jnp.int32, (hl, wl), 0) \
        .astype(jnp.float32) * float(ss) + off + y_phase(y0, ss)
    ys = jnp.clip(ys + y0, 0.0, h_glob - 1.0)
    vx = (2.0 * (xs + 0.5 + jx) / w - 1.0) * vz / fpx
    vy = (2.0 * (ys + 0.5 + jy) / h_glob - 1.0) * vz / fpy
    wx = p(0) * vx + p(1) * vy + p(2) * vz + p(3)
    wy = p(4) * vx + p(5) * vy + p(6) * vz + p(7)
    wz = p(8) * vx + p(9) * vy + p(10) * vz + p(11)
    return wx, wy, wz


def bake_world_planes_stacked(par_ref, m0, grid_whd: Tuple[int, int, int],
                              ss: int, h_glob: int, group: int, hlp: int):
    """[group, hlp, wl] world-position planes for low slices m0..m0+group-1
    — the batched form of bake_world_planes for grouped inline bakes
    (inline_bake_schedule(group=...)). Block b of the leading dim is low
    slice min(m0+b, dl-1); rows >= hl repeat row hl-1 (hlp pads hl to a
    sublane multiple so in-kernel block extraction stays 8-aligned). Every
    per-sample value is bit-identical to bake_world_planes: identical
    inputs through identical elementwise ops, just issued as one
    [group*hlp, wl] batch instead of `group` small planes."""
    w, h, d = grid_whd
    wl, hl, dl = low_res_dims(grid_whd, ss)
    p = lambda i: par_ref[0, i]
    fpx, fpy, fpz, fpw, near = p(12), p(13), p(14), p(15), p(16)
    jx, jy, jz = p(17), p(18), p(19)
    y0 = p(23)

    shape = (group, hlp, wl)
    b = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    rr = jnp.minimum(jax.lax.broadcasted_iota(jnp.int32, shape, 1), hl - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    mz = jnp.minimum(m0 + b, dl - 1).astype(jnp.float32)

    off = (ss - 1) * 0.5
    fz = float(ss) * mz + off + 0.5 + jz
    vz = (jnp.exp(jnp.log(fpz) * fz / d) - 1.0) * fpw + near
    xs = cols.astype(jnp.float32) * float(ss) + off
    ys = rr.astype(jnp.float32) * float(ss) + off + y_phase(y0, ss)
    ys = jnp.clip(ys + y0, 0.0, h_glob - 1.0)
    vx = (2.0 * (xs + 0.5 + jx) / w - 1.0) * vz / fpx
    vy = (2.0 * (ys + 0.5 + jy) / h_glob - 1.0) * vz / fpy
    wx = p(0) * vx + p(1) * vy + p(2) * vz + p(3)
    wy = p(4) * vx + p(5) * vy + p(6) * vz + p(7)
    wz = p(8) * vx + p(9) * vy + p(10) * vz + p(11)
    return wx, wy, wz


def bake_light_plane(lights_ref, li, wx, wy, wz, planes_ref, spheres_ref,
                     boxes_ref, hf_ref, *, n_planes: int, n_spheres: int,
                     n_boxes: int, hf_static: tuple,
                     fractional: bool = False):
    """Visibility plane (1 = lit) of light row li at world planes wx/wy/wz —
    the any-hit block shared by the standalone and inline bakes."""
    q = lambda i: lights_ref[li, i]
    tx = wx - q(0)
    ty = wy - q(1)
    tz = wz - q(2)
    d2 = tx * tx + ty * ty + tz * tz
    inv_d = jax.lax.rsqrt(d2 + 1e-18)
    dist = d2 * inv_d
    occ = any_hit(planes_ref, spheres_ref, boxes_ref, hf_ref,
                  wx, wy, wz, -tx * inv_d, -ty * inv_d, -tz * inv_d,
                  dist - 0.05, n_planes=n_planes, n_spheres=n_spheres,
                  n_boxes=n_boxes, hf_static=hf_static,
                  fractional=fractional)
    return 1.0 - occ.astype(jnp.float32) * q(14)             # shadow gate


def radiance_view_dirs(par_ref, wx, wy, wz):
    """Normalized camera->sample direction planes (camera pos from the packed
    scatter params, rows 20-22)."""
    camx, camy, camz = par_ref[0, 20], par_ref[0, 21], par_ref[0, 22]
    vdx = wx - camx
    vdy = wy - camy
    vdz = wz - camz
    inv = jax.lax.rsqrt(vdx * vdx + vdy * vdy + vdz * vdz + 1e-18)
    return vdx * inv, vdy * inv, vdz * inv


def bake_radiance_plane(lights_ref, li, wx, wy, wz, vdx, vdy, vdz, phg, g2,
                        hg_num, planes_ref, spheres_ref, boxes_ref, hf_ref, *,
                        n_planes: int, n_spheres: int, n_boxes: int,
                        hf_static: tuple, fractional: bool = False):
    """One light's rgb radiance contribution at the low-res sample planes:
    visibility (any-hit march) x falloff x cone x HG phase x light color —
    i.e. everything in the scatter sum except the froxel's own sigma_s.
    Shares light_factor with the full-rate kernel so the physics cannot
    drift. Returns (r, g, b) planes."""
    from volumetricrenderer_tpu.ops.pallas.scatter import light_factor

    q = lambda i: lights_ref[li, i]
    factor, ldx, ldy, ldz, dist, gate, cr, cg, cb = light_factor(
        q, wx, wy, wz, vdx, vdy, vdz, phg, g2, hg_num)
    occ = any_hit(planes_ref, spheres_ref, boxes_ref, hf_ref,
                  wx, wy, wz, -ldx, -ldy, -ldz, dist - 0.05,
                  n_planes=n_planes, n_spheres=n_spheres, n_boxes=n_boxes,
                  hf_static=hf_static, fractional=fractional)
    base = factor * (1.0 - occ.astype(jnp.float32) * gate)
    return base * cr, base * cg, base * cb


def low_slice_light_order(active: jax.Array):
    """active [NL, DL] (low_slice_active) -> per-low-slice schedule
    (order [DL, 1, NL] int32 active-first, count [DL, 1, 1] int32). Skipping
    an inactive light is exact: its low sample lies inside the tested AABB,
    so out-of-range means falloff = 0 at the sample too."""
    act = active.astype(bool).T                         # [DL, NL]
    order = jnp.argsort(~act, axis=1, stable=True).astype(jnp.int32)
    count = jnp.sum(act, axis=1, dtype=jnp.int32)
    return order[:, None, :], count[:, None, None]


def _radiance_kernel(par_ref, lights_ref, order_ref, count_ref, med_ref,
                     planes_ref, spheres_ref, boxes_ref, hf_ref, out_ref, *,
                     grid_whd: Tuple[int, int, int], ss: int, n_planes: int,
                     n_spheres: int, n_boxes: int, h_glob: int,
                     media_static: tuple, hf_static: tuple,
                     fractional: bool = False, n_noise: int = 0):
    from volumetricrenderer_tpu.ops.pallas.material import (
        noise_factor_planes, phase_g_plane)
    from volumetricrenderer_tpu.ops.phase import PI

    wl, hl, dl = low_res_dims(grid_whd, ss)
    zi = pl.program_id(0)
    wx, wy, wz = bake_world_planes(par_ref, zi, grid_whd, ss, h_glob)
    vdx, vdy, vdz = radiance_view_dirs(par_ref, wx, wy, wz)
    phg = phase_g_plane(med_ref, media_static, wx, wy, wz)
    g2 = phg * phg
    hg_num = (1.0 - g2) / (4.0 * PI)

    def body(k, acc):
        ar, ag, ab = acc
        li = order_ref[0, 0, k]
        r, g, b = bake_radiance_plane(
            lights_ref, li, wx, wy, wz, vdx, vdy, vdz, phg, g2, hg_num,
            planes_ref, spheres_ref, boxes_ref, hf_ref, n_planes=n_planes,
            n_spheres=n_spheres, n_boxes=n_boxes, hf_static=hf_static,
            fractional=fractional)
        return ar + r, ag + g, ab + b

    zero = jnp.zeros((hl, wl), jnp.float32)
    ar, ag, ab = jax.lax.fori_loop(0, count_ref[0, 0, 0], body,
                                   (zero, zero, zero))
    out_ref[0, 0] = ar
    out_ref[1, 0] = ag
    out_ref[2, 0] = ab
    if n_noise:
        # per-medium fBm factors at the same low-rate samples (channels 3+)
        nz = noise_factor_planes(med_ref, media_static, wx, wy, wz)
        for c in range(n_noise):
            out_ref[3 + c, 0] = nz[c]


def _pack_media_or_empty(media, time_x):
    from volumetricrenderer_tpu.ops.pallas.material import pack_media
    if media:
        return pack_media(media, time_x)
    return jnp.zeros((1, 20), jnp.float32), ()


def bake_radiance_pallas(params, view_to_world, camera_pos, jitter,
                         point_lights, spot_lights, geometry, media, time_x,
                         grid_whd: Tuple[int, int, int], ss: int,
                         interpret: bool = False,
                         heightfield_shadows: bool = False,
                         bake_noise: bool = False) -> jax.Array:
    """[3(+Nn), DL, HL, WL] f32 local-light RADIANCE at 1/ss^3 rate: the full
    per-light scatter sum (visibility x falloff x cone x phase, color-
    weighted) with raycast occlusion. The scatter kernel then upsamples the
    3 channels once and multiplies by sigma_s — its cost becomes independent
    of light count. Phase g is evaluated at the low-rate samples
    (material.phase_g_plane; g is noise-free, so this is exact per-sample).
    bake_noise=True appends one channel per noise-bearing medium holding the
    procedural fBm factor at the same samples (material.noise_factor_planes),
    letting the fused-material scatter skip the per-froxel Perlin too."""
    from volumetricrenderer_tpu.ops.pallas.material import pack_heightfield
    from volumetricrenderer_tpu.ops.pallas.scatter import (pack_lights,
                                                           pack_params)

    w, h, d = grid_whd
    wl, hl, dl = low_res_dims(grid_whd, ss)
    lights = pack_lights(point_lights, spot_lights)
    par = pack_params(params, view_to_world, camera_pos, jitter)
    positions = jnp.concatenate([point_lights.position, spot_lights.position])
    ranges = jnp.concatenate([point_lights.range, spot_lights.range])
    active = low_slice_active(params, view_to_world, positions, ranges,
                              grid_whd, ss)
    order, count = low_slice_light_order(active)

    planes = jnp.concatenate([geometry.plane_normal,
                              geometry.plane_d[:, None]], axis=-1)
    spheres = jnp.concatenate([geometry.sphere_center,
                               geometry.sphere_radius[:, None]], axis=-1)
    boxes = pack_boxes(geometry)
    n_planes = planes.shape[0]
    n_spheres = spheres.shape[0]
    n_boxes = boxes.shape[0]
    planes = planes if n_planes else jnp.zeros((1, 4), jnp.float32)
    spheres = spheres if n_spheres else jnp.zeros((1, 4), jnp.float32)
    boxes = boxes if n_boxes else jnp.zeros((1, 8), jnp.float32)
    hf = pack_heightfield(geometry)
    hf_static = (geometry.hf_octaves, geometry.hf_period, geometry.hf_seed,
                 geometry.hf_steps, geometry.hf_far) \
        if (geometry.hf_enabled and heightfield_shadows) else None
    med, media_static = _pack_media_or_empty(media, time_x)
    n_noise = sum(1 for st in media_static if st[0]) if bake_noise else 0
    n_ch = 3 + n_noise

    kernel = functools.partial(
        _radiance_kernel, grid_whd=grid_whd, ss=ss, n_planes=n_planes,
        n_spheres=n_spheres, n_boxes=n_boxes, h_glob=params.grid[1],
        media_static=media_static, hf_static=hf_static,
        fractional=bool(geometry.box_fractional), n_noise=n_noise)
    smem = lambda shape: pl.BlockSpec(shape, lambda j: tuple([0] * len(shape)),
                                      memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(dl,),
        in_specs=[
            smem(par.shape),
            smem(lights.shape),
            pl.BlockSpec((1, 1, order.shape[2]), lambda j: (j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda j: (j, 0, 0),
                         memory_space=pltpu.SMEM),
            smem(med.shape),
            smem(planes.shape),
            smem(spheres.shape),
            smem(boxes.shape),
            smem(hf.shape),
        ],
        out_specs=pl.BlockSpec((n_ch, 1, hl, wl), lambda j: (0, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_ch, dl, hl, wl), jnp.float32),
        interpret=interpret,
    )(par, lights, order, count, med, planes, spheres, boxes, hf)


def bake_radiance_from_maps(cfg, params, view_to_world, camera_pos, jitter,
                            point_lights, spot_lights, cube_shadow,
                            spot_shadow, media, time_x, ss: int,
                            bake_noise: bool = False) -> jax.Array:
    """[3(+Nn), DL, HL, WL] radiance with visibility from the baked cube/spot
    shadow MAPS (shadow_mode="map") — bake_visibility_from_maps' gathers plus
    the same low-rate light physics as bake_radiance_pallas (shared
    light_factor / phase_g_plane, evaluated in XLA on the low grid).
    bake_noise as in bake_radiance_pallas."""
    from volumetricrenderer_tpu import shadow as shadow_lib
    from volumetricrenderer_tpu.ops.pallas.material import (
        noise_factor_planes, phase_g_plane)
    from volumetricrenderer_tpu.ops.pallas.scatter import (light_factor,
                                                           pack_lights)
    from volumetricrenderer_tpu.ops.phase import PI

    world = low_res_world_positions(cfg, params, view_to_world, jitter, ss)
    wx, wy, wz = world[..., 0], world[..., 1], world[..., 2]
    vdx = wx - camera_pos[0]
    vdy = wy - camera_pos[1]
    vdz = wz - camera_pos[2]
    inv = jax.lax.rsqrt(vdx * vdx + vdy * vdy + vdz * vdz + 1e-18)
    vdx, vdy, vdz = vdx * inv, vdy * inv, vdz * inv
    med, media_static = _pack_media_or_empty(media, time_x)
    phg = phase_g_plane(med, media_static, wx, wy, wz)
    g2 = phg * phg
    hg_num = (1.0 - g2) / (4.0 * PI)

    lights = pack_lights(point_lights, spot_lights)
    np_l = point_lights.count
    ar = ag = ab = jnp.zeros(wx.shape, jnp.float32)
    for li in range(lights.shape[0]):
        q = lambda i: lights[li, i]
        factor, _, _, _, _, _, cr, cg, cb = light_factor(
            q, wx, wy, wz, vdx, vdy, vdz, phg, g2, hg_num)
        if li < np_l:
            if cube_shadow is not None:
                s = shadow_lib.sample_cube_shadow(
                    cube_shadow, li, world - point_lights.position[li])
                g = point_lights.has_shadow[li].astype(jnp.float32)
                vis = 1.0 + g * (s - 1.0)
            else:
                vis = jnp.ones(wx.shape, jnp.float32)
        else:
            si = li - np_l
            if spot_shadow is not None:
                s = shadow_lib.sample_spot_shadow(spot_shadow, si, world)
                g = spot_lights.has_shadow[si].astype(jnp.float32)
                vis = 1.0 + g * (s - 1.0)
            else:
                vis = jnp.ones(wx.shape, jnp.float32)
        base = factor * vis
        ar = ar + base * cr
        ag = ag + base * cg
        ab = ab + base * cb
    chans = [ar, ag, ab]
    if bake_noise:
        chans += noise_factor_planes(med, media_static, wx, wy, wz)
    return jnp.stack(chans)


def _bake_kernel(par_ref, lights_ref, active_ref, planes_ref, spheres_ref,
                 boxes_ref, hf_ref, out_ref, *,
                 grid_whd: Tuple[int, int, int], ss: int, n_planes: int,
                 n_spheres: int, n_boxes: int, h_glob: int,
                 hf_static: tuple, fractional: bool = False):
    wl, hl, dl = low_res_dims(grid_whd, ss)
    li = pl.program_id(0)
    zi = pl.program_id(1)

    @pl.when(active_ref[li, zi] == 0)
    def _culled():
        out_ref[0, 0] = jnp.ones((hl, wl), jnp.float32)

    @pl.when(active_ref[li, zi] != 0)
    def _bake():
        wx, wy, wz = bake_world_planes(par_ref, zi, grid_whd, ss, h_glob)
        out_ref[0, 0] = bake_light_plane(
            lights_ref, li, wx, wy, wz, planes_ref, spheres_ref, boxes_ref,
            hf_ref, n_planes=n_planes, n_spheres=n_spheres, n_boxes=n_boxes,
            hf_static=hf_static, fractional=fractional)


def bake_visibility_pallas(params, view_to_world, camera_pos, jitter,
                           point_lights, spot_lights, geometry,
                           grid_whd: Tuple[int, int, int], ss: int,
                           interpret: bool = False,
                           heightfield_shadows: bool = False) -> jax.Array:
    """[NL, DL, HL, WL] f32 visibility (1 = lit), raycast occlusion at 1/ss^3
    rate. Light order matches scatter.pack_lights (points then spots); culled
    (light, low-slice) pairs are written fully lit — exact, because the
    scatter kernel's range cull zeroes those froxels anyway."""
    from volumetricrenderer_tpu.ops.pallas.material import pack_heightfield
    from volumetricrenderer_tpu.ops.pallas.scatter import (pack_lights,
                                                           pack_params)

    w, h, d = grid_whd
    wl, hl, dl = low_res_dims(grid_whd, ss)
    lights = pack_lights(point_lights, spot_lights)
    nl = lights.shape[0]
    par = pack_params(params, view_to_world, camera_pos, jitter)
    positions = jnp.concatenate([point_lights.position, spot_lights.position])
    ranges = jnp.concatenate([point_lights.range, spot_lights.range])
    active = low_slice_active(params, view_to_world, positions, ranges,
                              grid_whd, ss).astype(jnp.int32)

    planes = jnp.concatenate([geometry.plane_normal,
                              geometry.plane_d[:, None]], axis=-1)
    spheres = jnp.concatenate([geometry.sphere_center,
                               geometry.sphere_radius[:, None]], axis=-1)
    boxes = pack_boxes(geometry)
    n_planes = planes.shape[0]
    n_spheres = spheres.shape[0]
    n_boxes = boxes.shape[0]
    planes = planes if n_planes else jnp.zeros((1, 4), jnp.float32)
    spheres = spheres if n_spheres else jnp.zeros((1, 4), jnp.float32)
    boxes = boxes if n_boxes else jnp.zeros((1, 8), jnp.float32)
    hf = pack_heightfield(geometry)
    hf_static = (geometry.hf_octaves, geometry.hf_period, geometry.hf_seed,
                 geometry.hf_steps, geometry.hf_far) \
        if (geometry.hf_enabled and heightfield_shadows) else None

    kernel = functools.partial(
        _bake_kernel, grid_whd=grid_whd, ss=ss, n_planes=n_planes,
        n_spheres=n_spheres, n_boxes=n_boxes, h_glob=params.grid[1],
        hf_static=hf_static, fractional=bool(geometry.box_fractional))
    smem = lambda shape: pl.BlockSpec(shape, lambda i, j: tuple([0] * len(shape)),
                                      memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(nl, dl),
        in_specs=[
            smem(par.shape),
            smem(lights.shape),
            smem(active.shape),
            smem(planes.shape),
            smem(spheres.shape),
            smem(boxes.shape),
            smem(hf.shape),
        ],
        out_specs=pl.BlockSpec((1, 1, hl, wl), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nl, dl, hl, wl), jnp.float32),
        interpret=interpret,
    )(par, lights, active, planes, spheres, boxes, hf)


def inline_bake_schedule(d: int, dl: int, ss: int, k: int, n_steps: int,
                         group: int = 1):
    """Per-grid-step schedule for baking low-res visibility slices INSIDE the
    megakernel (ops/pallas/frame_fused.py) instead of a separate pallas_call.

    The megakernel scatters full slice zb at grid step zb + k + 1, reading low
    slices ka(zb) and ka(zb)+1. Baking each low slice at the LATEST step that
    still precedes (in-program-order: equals) its first read bounds how long
    any slice must stay resident, so the bakes live in a small VMEM ring of
    ring_n slots per light (slot = m % ring_n) instead of an HBM volume.

    group > 1 bakes `group` consecutive low slices per bake step (stacked
    into one [group, hlp, wl] batch in-kernel): the bake planes are tiny, so
    the bake is instruction-issue-bound and batching slices cuts its issue
    count ~group-fold with bit-identical per-sample math. A group is
    scheduled at the latest step preceding the FIRST member's first read,
    which extends later members' residency — ring_n grows accordingly.

    Returns (bake_m [n_steps] int32 — FIRST low slice of the group baked at
    each step, -1 = none; ring_n). Asserts the schedule fits (>= 1 free step
    per group) and grows ring_n until no ring slot aliases a live slice."""
    zb = np.arange(d)
    ka = np.clip((2 * zb - (ss - 1)) // (2 * ss), 0, dl - 1)
    kb = np.minimum(ka + 1, dl - 1)
    big = 1 << 30
    first = np.full(dl, big, np.int64)
    last = np.full(dl, -1, np.int64)
    for z in range(d):
        for m in (int(ka[z]), int(kb[z])):
            first[m] = min(first[m], z + k + 1)
            last[m] = max(last[m], z + k + 1)
    used = first < big
    # group g covers slices [g*group, min((g+1)*group, dl)); it is baked
    # whole (tail slices past dl-1 are skipped in-kernel), so every member
    # of a used group is effectively baked/live from the group's step
    ng = -(-dl // group)
    gused = np.array([used[g * group:(g + 1) * group].any()
                      for g in range(ng)])
    gfirst = np.array([first[g * group:(g + 1) * group].min()
                       for g in range(ng)])
    gjb = np.full(ng, -1, np.int64)
    nxt = big
    for g in range(ng - 1, -1, -1):
        if not gused[g]:
            continue
        gjb[g] = min(gfirst[g], nxt - 1)
        nxt = gjb[g]
    assert (gjb[gused] >= 0).all(), "bake schedule does not fit the grid"
    jb = np.full(dl, -1, np.int64)
    baked = np.zeros(dl, bool)
    for g in range(ng):
        if gused[g]:
            jb[g * group:(g + 1) * group] = gjb[g]
            baked[g * group:(g + 1) * group] = True
    last_eff = np.maximum(last, jb)  # unused-but-baked: live only at its step
    ring_n = int((last_eff[baked] - jb[baked]).max()) + 1
    # slot m % ring_n must be exclusive over [jb, last_eff]; grow ring_n
    # until no two baked slices sharing a slot have overlapping lifetimes
    def aliases(rn):
        for m in range(dl):
            if not baked[m]:
                continue
            m2 = m + rn
            while m2 < dl:
                if baked[m2] and jb[m2] <= last_eff[m]:
                    return True
                m2 += rn
        return False
    while aliases(ring_n):
        ring_n += 1
    bake_m = np.full(n_steps, -1, np.int64)
    for g in range(ng):
        if gused[g]:
            assert 0 <= gjb[g] < n_steps and bake_m[gjb[g]] == -1
            bake_m[gjb[g]] = g * group
    return bake_m.astype(np.int32), ring_n


def low_res_world_positions(cfg, params, view_to_world, jitter, ss: int):
    """[DL, HL, WL, 3] world positions at the low-res sample points (the same
    coordinate contract as the bake kernel), for XLA-side visibility bakes."""
    from volumetricrenderer_tpu import froxel as froxel_lib

    d, h, w = cfg.grid_dhw
    wl, hl, dl = low_res_dims((w, h, d), ss)
    off = (ss - 1) * 0.5
    zs = jnp.arange(dl, dtype=jnp.float32) * ss + off
    ys = jnp.arange(hl, dtype=jnp.float32) * ss + off \
        + y_phase(params.y0, ss) + jnp.asarray(params.y0, jnp.float32)
    ys = jnp.clip(ys, 0.0, params.grid[1] - 1.0)
    xs = jnp.arange(wl, dtype=jnp.float32) * ss + off
    fz, fy, fx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    fro = jnp.stack([fx, fy, fz], axis=-1)
    if jitter is not None:
        fro = fro + jitter
    view = froxel_lib.froxel_to_view(params, fro + 0.5)
    return froxel_lib.transform_points(view_to_world, view)


def sample_tex_selection(tex: jax.Array, pos_texel: jax.Array,
                         precision: str = "default") -> jax.Array:
    """Wrap-trilinear 3D texture sampling as ONE selection matmul (no gather).

    XLA's take() is a ~8 ns/element serial gather on TPU: the low-rate
    noise-texture sample (65k samples x 8 taps at FULL/ss=4) measured
    3.46 ms/frame — eight identical 0.433 ms gather fusions in the device
    trace, dwarfing everything else the texture fold added. The TPU-native
    form used everywhere else in this repo applies here too: the (z, y)
    bilinear selection becomes an [N, Nz*Ny] weight matrix (4 nonzeros per
    sample — the wrap-mod'd corner rows, bilinearly weighted) contracted on
    the MXU against the texture's [Nz*Ny, Nx] row matrix; the two x taps
    then reduce over the tiny Nx lane dim elementwise (exact f32).

    precision="default" runs the dot at MXU bf16 (~0.5% factor error — the
    same class as the baked-radiance tent upsample that already ships,
    PERF.md); "highest" is exact trilinear for the parity tests.

    tex [Nz, Ny, Nx]; pos_texel [..., 3] (x, y, z) texel coords, matching
    ops/sampling.trilinear_sample_3d(wrap=True)."""
    nz, ny, nx = tex.shape
    shp = pos_texel.shape[:-1]
    p = pos_texel.reshape(-1, 3)
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    x0f, y0f, z0f = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx, fy, fz = x - x0f, y - y0f, z - z0f
    ix0 = jnp.mod(x0f.astype(jnp.int32), nx)
    ix1 = jnp.mod(ix0 + 1, nx)
    iy0 = jnp.mod(y0f.astype(jnp.int32), ny)
    iy1 = jnp.mod(iy0 + 1, ny)
    iz0 = jnp.mod(z0f.astype(jnp.int32), nz)
    iz1 = jnp.mod(iz0 + 1, nz)

    rows = tex.reshape(nz * ny, nx)
    ri = jnp.arange(nz * ny, dtype=jnp.int32)[None, :]
    wsel = jnp.zeros((p.shape[0], nz * ny), jnp.float32)
    for zi, wz in ((iz0, 1.0 - fz), (iz1, fz)):
        for yi, wy in ((iy0, 1.0 - fy), (iy1, fy)):
            r = (zi * ny + yi)[:, None]
            wsel = wsel + (r == ri).astype(jnp.float32) * (wz * wy)[:, None]
    if precision == "highest":
        v = jnp.matmul(wsel, rows, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # [N, Nx]
    else:
        # explicit bf16 operands: halves the [N, Nz*Ny] weight-matrix
        # traffic (the MXU truncates to bf16 at default precision anyway)
        v = jnp.matmul(wsel.astype(jnp.bfloat16),
                       rows.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)  # [N, Nx]
    xi = jnp.arange(nx, dtype=jnp.int32)[None, :]
    xw = ((ix0[:, None] == xi).astype(jnp.float32) * (1.0 - fx)[:, None]
          + (ix1[:, None] == xi).astype(jnp.float32) * fx[:, None])
    return jnp.sum(v * xw, axis=-1).reshape(shp)


def bake_noise_channels_xla(cfg, params, view_to_world, jitter, media,
                            time_x, ss: int) -> jax.Array:
    """[Nn, DL, HL, WL] per-medium noise-factor channels at the low bake
    grid, computed in XLA — the TEXTURE-noise fold (round 5): texture media
    wrap-trilinear-sample noise_tex at 1/ss^3 rate (the only gather on the
    fused frame, amortized 64x at ss=4), procedural media evaluate the same
    tileable fBm. Channel order = media order over ALL noise-bearing media
    (material.noise_src != 0), matching material_planes' noise_planes
    consumption; the caller concatenates these after the radiance bake's rgb
    channels (frame_volume_fused reads n_noise = vis.shape[0] - 3).
    Coordinate contract: low_res_world_positions — identical samples to the
    in-kernel bake up to FMA association (tests/test_noise_bake.py).
    Reference: WriteMaterialVolumeConstant_WITH_NOISE,
    VolumetricCompute.compute:51-58."""
    from volumetricrenderer_tpu.ops.pallas.material import (noise_src,
                                                            pack_media,
                                                            perlin_planes)
    from volumetricrenderer_tpu.pipeline import _sample_noise

    world = low_res_world_positions(cfg, params, view_to_world, jitter, ss)
    med, media_static = pack_media(media, time_x)
    chans = []
    for mi, m in enumerate(media):
        src = noise_src(m)
        if not src:
            continue
        if src == 1:
            octaves, period, seed = (media_static[mi][1], media_static[mi][2],
                                     media_static[mi][3])
            chans.append(perlin_planes(
                world[..., 0] * med[mi, 5] + med[mi, 8],
                world[..., 1] * med[mi, 6] + med[mi, 9],
                world[..., 2] * med[mi, 7] + med[mi, 10],
                octaves, period, seed))
        else:
            tex = m.noise_tex
            if tex.shape[0] * tex.shape[1] <= 8192:
                # gather-free selection-matmul sampler (same positions as
                # _sample_noise; ~0.5% bf16 factor error, documented above)
                uvw = world * m.noise_tiling + m.noise_scroll \
                    * jnp.asarray(time_x, jnp.float32)
                nzt, nyt, nxt = tex.shape
                texel = jnp.stack([uvw[..., 0] * nxt - 0.5,
                                   uvw[..., 1] * nyt - 0.5,
                                   uvw[..., 2] * nzt - 0.5], axis=-1)
                chans.append(sample_tex_selection(tex, texel))
            else:
                # huge textures: the exact gather sampler (parity fallback)
                chans.append(_sample_noise(m, world, time_x))
    return jnp.stack(chans)


def bake_visibility_from_maps(cfg, params, view_to_world, jitter,
                              point_lights, spot_lights, cube_shadow,
                              spot_shadow, ss: int) -> jax.Array:
    """[NL, DL, HL, WL] visibility from the baked cube/spot shadow MAPS
    (shadow_mode="map"), sampled at the low-res grid — the reference's local
    shadow-map sampling (VolumetricHelper.hlsl:237-259) at 1/ss^3 the gather
    count. XLA gathers are ~8 ns/element (PERF.md), so this runs at
    NL x DL x HL x WL rate instead of the full-rate ~2.5 s/frame cliff."""
    from volumetricrenderer_tpu import shadow as shadow_lib

    world = low_res_world_positions(cfg, params, view_to_world, jitter, ss)
    chans = []
    for i in range(point_lights.count):
        if cube_shadow is not None:
            s = shadow_lib.sample_cube_shadow(
                cube_shadow, i, world - point_lights.position[i])
            g = point_lights.has_shadow[i].astype(jnp.float32)
            chans.append(1.0 + g * (s - 1.0))
        else:
            chans.append(jnp.ones(world.shape[:-1], jnp.float32))
    for i in range(spot_lights.count):
        if spot_shadow is not None:
            s = shadow_lib.sample_spot_shadow(spot_shadow, i, world)
            g = spot_lights.has_shadow[i].astype(jnp.float32)
            chans.append(1.0 + g * (s - 1.0))
        else:
            chans.append(jnp.ones(world.shape[:-1], jnp.float32))
    return jnp.stack(chans)
