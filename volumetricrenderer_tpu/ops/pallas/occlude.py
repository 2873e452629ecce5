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


def any_hit(planes_ref, spheres_ref, boxes_ref, hf_ref, wx, wy, wz,
            dx, dy, dz, max_t, *, n_planes: int, n_spheres: int,
            n_boxes: int, hf_static: tuple | None):
    """Occlusion [h, w] bool for rays origin (wx, wy, wz), NORMALIZED direction
    (dx, dy, dz) (pointing toward the light), parametric range (1e-4, max_t).

    planes/spheres/boxes/hf refs are the SMEM tables packed by
    ops/pallas/scatter.scatter_local_pallas; hf_static = (octaves, period,
    seed, steps, far) or None to skip the terrain march."""
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
