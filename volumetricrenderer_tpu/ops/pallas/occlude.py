"""Shared in-kernel any-hit occlusion test (analytic primitives + terrain).

One implementation of the shadow-ray test used by all Mosaic kernels that need
per-froxel visibility (the fused scatter kernel's in-march mode, and the
low-res visibility bake in ops/pallas/visibility.py). Mirrors
ops/raycast.occluded exactly (same epsilons / root selection) so XLA and
Pallas paths agree sample-for-sample; semantics per the reference's raycast
substitute for its shadow maps (SPEC "Shadow pipeline",
VolumetricHelper.hlsl:237-259 is the map-mode counterpart).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_boxes(geometry) -> jax.Array:
    """[B, 8] SMEM box table: (min xyz, opacity, max xyz, 0). Opacity rides
    the spare slot 3: 1.0 = solid; < 1 models alpha-tested foliage as its
    average shadow transmittance (SPEC "Occluder opacity" — the voxelized
    canopy boxes from models/voxelize.py carry their fill fraction here)."""
    op = geometry.box_opacity[:, None] \
        if geometry.box_opacity.shape[0] else \
        jnp.ones_like(geometry.box_min[:, :1])
    return jnp.concatenate([geometry.box_min, op, geometry.box_max,
                            jnp.zeros_like(geometry.box_min[:, :1])], axis=-1)


def any_hit(planes_ref, spheres_ref, boxes_ref, hf_ref, wx, wy, wz,
            dx, dy, dz, max_t, *, n_planes: int, n_spheres: int,
            n_boxes: int, hf_static: tuple | None,
            fractional: bool = False):
    """Occlusion for rays origin (wx, wy, wz), NORMALIZED direction
    (dx, dy, dz) (pointing toward the light), parametric range (1e-4, max_t).
    [h, w] bool — or, with fractional=True (geometry.box_fractional), f32
    occlusion AMOUNT 1 - prod(1 - opacity_i * hit_i): boxes attenuate by
    their opacity (planes/spheres/terrain stay solid). Consumers' existing
    `1 - occ.astype(f32) * gate` works for both forms.

    planes/spheres/boxes/hf refs are the SMEM tables packed by
    ops/pallas/scatter.scatter_local_pallas; hf_static = (octaves, period,
    seed, steps, far) or None to skip the terrain march."""
    if fractional:
        return _any_hit_fractional(
            planes_ref, spheres_ref, boxes_ref, hf_ref, wx, wy, wz,
            dx, dy, dz, max_t, n_planes=n_planes, n_spheres=n_spheres,
            n_boxes=n_boxes, hf_static=hf_static)
    occ = jnp.zeros(wx.shape, jnp.bool_)
    for i in range(n_planes):
        nx_, ny_, nz_, pd = (planes_ref[i, 0], planes_ref[i, 1],
                             planes_ref[i, 2], planes_ref[i, 3])
        denom = dx * nx_ + dy * ny_ + dz * nz_
        denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        t = -(wx * nx_ + wy * ny_ + wz * nz_ + pd) / denom
        occ |= (t > 1e-4) & (t < max_t)
    for i in range(n_spheres):
        cx_, cy_, cz_, r_ = (spheres_ref[i, 0], spheres_ref[i, 1],
                             spheres_ref[i, 2], spheres_ref[i, 3])
        ox, oy, oz = wx - cx_, wy - cy_, wz - cz_
        bq = ox * dx + oy * dy + oz * dz
        cq = ox * ox + oy * oy + oz * oz - r_ * r_
        disc = bq * bq - cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = jnp.where(-bq - sq > 1e-4, -bq - sq, -bq + sq)
        occ |= (disc > 0.0) & (t > 1e-4) & (t < max_t)
    if n_boxes:
        inv_x = 1.0 / jnp.where(jnp.abs(dx) < 1e-9, 1e-9, dx)
        inv_y = 1.0 / jnp.where(jnp.abs(dy) < 1e-9, 1e-9, dy)
        inv_z = 1.0 / jnp.where(jnp.abs(dz) < 1e-9, 1e-9, dz)
        for i in range(n_boxes):
            t0x = (boxes_ref[i, 0] - wx) * inv_x
            t1x = (boxes_ref[i, 4] - wx) * inv_x
            t0y = (boxes_ref[i, 1] - wy) * inv_y
            t1y = (boxes_ref[i, 5] - wy) * inv_y
            t0z = (boxes_ref[i, 2] - wz) * inv_z
            t1z = (boxes_ref[i, 6] - wz) * inv_z
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                           jnp.minimum(t0y, t1y)),
                               jnp.minimum(t0z, t1z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                           jnp.maximum(t0y, t1y)),
                               jnp.maximum(t0z, t1z))
            t = jnp.where(tmin > 1e-4, tmin, tmax)
            occ |= (tmax >= tmin) & (t > 1e-4) & (t < max_t)
    if hf_static is not None:
        from volumetricrenderer_tpu.ops.pallas.material import \
            heightfield_occluded
        occ |= heightfield_occluded(hf_ref, hf_static, wx, wy, wz,
                                    dx, dy, dz, max_t)
    return occ


def _any_hit_fractional(planes_ref, spheres_ref, boxes_ref, hf_ref,
                        wx, wy, wz, dx, dy, dz, max_t, *, n_planes: int,
                        n_spheres: int, n_boxes: int,
                        hf_static: tuple | None):
    """any_hit's fractional-opacity form: transmittance product over prims
    (same intersection math; gated arithmetically — Mosaic's scalar-cond
    select limits, CLAUDE.md)."""
    trans = jnp.ones(wx.shape, jnp.float32)
    for i in range(n_planes):
        nx_, ny_, nz_, pd = (planes_ref[i, 0], planes_ref[i, 1],
                             planes_ref[i, 2], planes_ref[i, 3])
        denom = dx * nx_ + dy * ny_ + dz * nz_
        denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        t = -(wx * nx_ + wy * ny_ + wz * nz_ + pd) / denom
        hit = ((t > 1e-4) & (t < max_t)).astype(jnp.float32)
        trans = trans * (1.0 - hit)
    for i in range(n_spheres):
        cx_, cy_, cz_, r_ = (spheres_ref[i, 0], spheres_ref[i, 1],
                             spheres_ref[i, 2], spheres_ref[i, 3])
        ox, oy, oz = wx - cx_, wy - cy_, wz - cz_
        bq = ox * dx + oy * dy + oz * dz
        cq = ox * ox + oy * oy + oz * oz - r_ * r_
        disc = bq * bq - cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = jnp.where(-bq - sq > 1e-4, -bq - sq, -bq + sq)
        hit = ((disc > 0.0) & (t > 1e-4) & (t < max_t)).astype(jnp.float32)
        trans = trans * (1.0 - hit)
    if n_boxes:
        inv_x = 1.0 / jnp.where(jnp.abs(dx) < 1e-9, 1e-9, dx)
        inv_y = 1.0 / jnp.where(jnp.abs(dy) < 1e-9, 1e-9, dy)
        inv_z = 1.0 / jnp.where(jnp.abs(dz) < 1e-9, 1e-9, dz)
        for i in range(n_boxes):
            t0x = (boxes_ref[i, 0] - wx) * inv_x
            t1x = (boxes_ref[i, 4] - wx) * inv_x
            t0y = (boxes_ref[i, 1] - wy) * inv_y
            t1y = (boxes_ref[i, 5] - wy) * inv_y
            t0z = (boxes_ref[i, 2] - wz) * inv_z
            t1z = (boxes_ref[i, 6] - wz) * inv_z
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                           jnp.minimum(t0y, t1y)),
                               jnp.minimum(t0z, t1z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                           jnp.maximum(t0y, t1y)),
                               jnp.maximum(t0z, t1z))
            t = jnp.where(tmin > 1e-4, tmin, tmax)
            hit = ((tmax >= tmin) & (t > 1e-4)
                   & (t < max_t)).astype(jnp.float32)
            trans = trans * (1.0 - boxes_ref[i, 3] * hit)
    if hf_static is not None:
        from volumetricrenderer_tpu.ops.pallas.material import \
            heightfield_occluded
        hfo = heightfield_occluded(hf_ref, hf_static, wx, wy, wz,
                                   dx, dy, dz, max_t).astype(jnp.float32)
        trans = trans * (1.0 - hfo)
    return 1.0 - trans
