"""Analytic ray casting over scene primitives.

Supplies what Unity's rasterizer supplies to the reference: the camera depth
buffer + scene color consumed by the composite pass (VolumetricRenderer.shader:73-85)
and the occluder depth rendered into shadow maps (Unity's shadow pass). Closed-form
ray/plane, ray/sphere, ray/AABB intersections, folded sequentially over the
(small, static) primitive count so nothing of size [pixels, prims] is ever
materialized — pure elementwise VPU math.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu.froxel import dot3, transform_dirs
from volumetricrenderer_tpu.models.geometry import Geometry

BIG = 1e9
EPS = 1e-4


# --------------------------------------------------------------------------- #
# Procedural heightfield (terrain stand-in for the reference's mesh
# environment, Assets/Prefabs/Enviornment.prefab). The surface is the same
# tileable fBm Perlin as ops/noise.py — gather-free elementwise math — and ray
# queries march only the [base, base+amp] band the ray can actually cross.
# --------------------------------------------------------------------------- #

def heightfield_height(geom: Geometry, x: jax.Array, z: jax.Array) -> jax.Array:
    """Terrain height y(x, z) = base + amp * fBm(x, z) in [base, base+amp]."""
    from volumetricrenderer_tpu.ops.noise import perlin_3d
    u = x * geom.hf_tiling[0] + geom.hf_offset[0]
    v = z * geom.hf_tiling[1] + geom.hf_offset[1]
    uvw = jnp.stack([u, v, jnp.zeros_like(u)], axis=-1)
    return geom.hf_base + geom.hf_amp * perlin_3d(
        uvw, octaves=geom.hf_octaves, period=geom.hf_period, seed=geom.hf_seed)


def _hf_band(geom: Geometry, oy, dy, max_t):
    """March interval [lo, hi] (in ray-t units) where y(t) crosses the
    terrain band [base, base+amp]; empty (hi <= lo) when it cannot."""
    hmin = geom.hf_base
    hmax = geom.hf_base + geom.hf_amp
    safe = jnp.where(jnp.abs(dy) < 1e-7, 1e-7, dy)
    ta = (hmax - oy) / safe
    tb = (hmin - oy) / safe
    horiz = jnp.abs(dy) < 1e-7
    in_band = (oy >= hmin) & (oy <= hmax)
    lo = jnp.where(horiz, jnp.where(in_band, EPS, max_t), jnp.minimum(ta, tb))
    hi = jnp.where(horiz, jnp.where(in_band, max_t, 0.0), jnp.maximum(ta, tb))
    return jnp.clip(lo, EPS, max_t), jnp.clip(hi, EPS, max_t)


def intersect(geom: Geometry, origins: jax.Array, dirs: jax.Array,
              include_proxies: bool = True
              ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest hit along each ray.

    origins/dirs: [..., 3] (dirs need not be unit — t is in units of |dir|).
    Returns (t [...], albedo [..., 3], normal [..., 3]); t == BIG where no hit.
    include_proxies=False skips the trailing geom.n_proxy_boxes shadow-proxy
    boxes (primary-visibility rays when a rasterized mesh covers them —
    shadow/occlusion rays must keep them).
    """
    shape = origins.shape[:-1]
    best_t = jnp.full(shape, BIG, jnp.float32)
    best_albedo = jnp.zeros(shape + (3,), jnp.float32)
    best_normal = jnp.zeros(shape + (3,), jnp.float32)

    def closer(t, albedo, normal, state):
        bt, ba, bn = state
        hit = t < bt
        return (jnp.where(hit, t, bt),
                jnp.where(hit[..., None], albedo, ba),
                jnp.where(hit[..., None], normal, bn))

    state = (best_t, best_albedo, best_normal)

    # Planes: dot(n, o + t*d) + pd = 0.
    for i in range(geom.plane_normal.shape[0]):
        n = geom.plane_normal[i]
        denom = dot3(dirs, n)
        t = -(dot3(origins, n) + geom.plane_d[i]) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        t = jnp.where((t > EPS) & (jnp.abs(denom) > 1e-9), t, BIG)
        normal = jnp.broadcast_to(n, origins.shape)
        state = closer(t, jnp.broadcast_to(geom.plane_albedo[i], origins.shape), normal, state)

    # Spheres.
    for i in range(geom.sphere_center.shape[0]):
        c = geom.sphere_center[i]
        r = geom.sphere_radius[i]
        oc = origins - c
        a = jnp.sum(dirs * dirs, axis=-1)
        b = jnp.sum(oc * dirs, axis=-1)
        cq = jnp.sum(oc * oc, axis=-1) - r * r
        disc = b * b - a * cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = (-b - sq) / a
        t1 = (-b + sq) / a
        t = jnp.where(t0 > EPS, t0, t1)
        t = jnp.where((disc > 0.0) & (t > EPS), t, BIG)
        hitp = origins + t[..., None] * dirs
        normal = (hitp - c) / r
        state = closer(t, jnp.broadcast_to(geom.sphere_albedo[i], origins.shape), normal, state)

    # Axis-aligned boxes (slab method).
    n_box = geom.box_min.shape[0]
    if not include_proxies:
        n_box -= geom.n_proxy_boxes
    for i in range(n_box):
        bmin = geom.box_min[i]
        bmax = geom.box_max[i]
        inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-9, 1e-9, dirs)
        t0s = (bmin - origins) * inv
        t1s = (bmax - origins) * inv
        tsm = jnp.minimum(t0s, t1s)
        tbg = jnp.maximum(t0s, t1s)
        tmin = jnp.max(tsm, axis=-1)
        tmax = jnp.min(tbg, axis=-1)
        t = jnp.where(tmin > EPS, tmin, tmax)
        t = jnp.where((tmax >= tmin) & (t > EPS), t, BIG)
        # Entry-face normal: the axis achieving tmin, signed against the ray.
        axis_hit = (tsm == tmin[..., None]).astype(jnp.float32)
        normal = -jnp.sign(dirs) * axis_hit
        nl = jnp.linalg.norm(normal, axis=-1, keepdims=True)
        normal = normal / jnp.maximum(nl, 1e-9)
        state = closer(t, jnp.broadcast_to(geom.box_albedo[i], origins.shape), normal, state)

    if geom.hf_enabled:
        oy = origins[..., 1]
        dy = dirs[..., 1]
        lo, hi = _hf_band(geom, oy, dy, jnp.float32(geom.hf_far))
        valid = hi > lo

        def below(t):
            p = origins + t[..., None] * dirs
            return p[..., 1] < heightfield_height(geom, p[..., 0], p[..., 2])

        # Fixed march over the band + bisection refine (primary/bake rays use
        # 4x the shadow-march density; cost is off the froxel frame path).
        # lax.fori_loop, NOT Python unroll: unrolled, each step inlines a full
        # fBm eval and the whole-frame graph hits ~7.5 MB MLIR, which gets
        # the remote TPU compile helper SIGKILLed (CLAUDE.md Mosaic list).
        k = geom.hf_steps * 4
        in_prev0 = below(lo)
        found0 = in_prev0 & valid          # started inside: hit at lo

        def march(i, c):
            found, t_lo, t_hi, t_prev, in_prev = c
            t = lo + (hi - lo) * (i.astype(jnp.float32) / k)
            inside = below(t)
            new = valid & ~found & ~in_prev & inside
            t_lo = jnp.where(new, t_prev, t_lo)
            t_hi = jnp.where(new, t, t_hi)
            return found | new, t_lo, t_hi, t, inside

        found, t_lo, t_hi, _, _ = jax.lax.fori_loop(
            1, k + 1, march, (found0, lo, lo, lo, in_prev0))

        def bisect(_, c):                  # bisection: ~(band/k)/256 accuracy
            t_lo, t_hi = c
            tm = 0.5 * (t_lo + t_hi)
            im = below(tm)
            return (jnp.where(found & ~im, tm, t_lo),
                    jnp.where(found & im, tm, t_hi))

        t_lo, t_hi = jax.lax.fori_loop(0, 8, bisect, (t_lo, t_hi))
        t = jnp.where(found, t_hi, BIG)

        hitp = origins + t_hi[..., None] * dirs
        e = 0.1
        n = jnp.stack([
            heightfield_height(geom, hitp[..., 0] - e, hitp[..., 2])
            - heightfield_height(geom, hitp[..., 0] + e, hitp[..., 2]),
            jnp.full_like(t_hi, 2.0 * e),
            heightfield_height(geom, hitp[..., 0], hitp[..., 2] - e)
            - heightfield_height(geom, hitp[..., 0], hitp[..., 2] + e)],
            axis=-1)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        state = closer(t, jnp.broadcast_to(geom.hf_albedo, origins.shape), n,
                       state)

    return state


def occluded(geom: Geometry, points: jax.Array, to_light: jax.Array,
             max_dist: jax.Array, include_heightfield: bool = True
             ) -> jax.Array:
    """1.0 where the segment point -> point + to_light*max_dist hits geometry.

    to_light unit [..., 3] (or broadcastable); max_dist [...]. Used by the
    gather-free `shadow_mode="raycast"` froxel visibility path. Any-hit only:
    skips the albedo/normal bookkeeping of intersect() (this runs per light
    per froxel — the hot path of raycast shadowing). include_heightfield=False
    skips the hf_steps-sample terrain march (cfg.heightfield_local_shadows:
    local-light rays pay hf_steps noise evals each, the dir light always
    includes it)."""
    origins, dirs = points, to_light
    if geom.box_fractional:
        return _occluded_fractional(geom, points, to_light, max_dist,
                                    include_heightfield)
    hit = jnp.zeros(points.shape[:-1], bool)

    for i in range(geom.plane_normal.shape[0]):
        n = geom.plane_normal[i]
        denom = dot3(dirs, n)
        t = -(dot3(origins, n) + geom.plane_d[i]) / jnp.where(
            jnp.abs(denom) < 1e-9, 1e-9, denom)
        hit |= (t > EPS) & (t < max_dist) & (jnp.abs(denom) > 1e-9)

    for i in range(geom.sphere_center.shape[0]):
        oc = origins - geom.sphere_center[i]
        b = dot3(oc, dirs)
        cq = dot3(oc, oc) - geom.sphere_radius[i] ** 2
        disc = b * b - cq  # dirs unit
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        t = jnp.where(t0 > EPS, t0, t1)
        hit |= (disc > 0.0) & (t > EPS) & (t < max_dist)

    if geom.box_min.shape[0]:
        inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-9, 1e-9, dirs)  # hoisted
        for i in range(geom.box_min.shape[0]):
            t0s = (geom.box_min[i] - origins) * inv
            t1s = (geom.box_max[i] - origins) * inv
            tmin = jnp.max(jnp.minimum(t0s, t1s), axis=-1)
            tmax = jnp.min(jnp.maximum(t0s, t1s), axis=-1)
            t = jnp.where(tmin > EPS, tmin, tmax)
            hit |= (tmax >= tmin) & (t > EPS) & (t < max_dist)

    if geom.hf_enabled and include_heightfield:
        oy = origins[..., 1]
        dy = jnp.broadcast_to(dirs[..., 1], oy.shape)
        cap = jnp.minimum(jnp.asarray(max_dist, jnp.float32),
                          jnp.float32(geom.hf_far))
        lo, hi = _hf_band(geom, oy, dy, cap)
        valid = hi > lo
        def step(i, occ):                  # fori_loop: keep the graph O(1)
            t = lo + (hi - lo) * ((i.astype(jnp.float32) + 0.5)
                                  / geom.hf_steps)
            p = origins + t[..., None] * dirs
            return occ | (p[..., 1]
                          < heightfield_height(geom, p[..., 0], p[..., 2]))

        occ = jax.lax.fori_loop(0, geom.hf_steps, step,
                                jnp.zeros_like(valid))
        hit |= occ & valid

    return hit.astype(jnp.float32)


def _occluded_fractional(geom: Geometry, points: jax.Array,
                         to_light: jax.Array, max_dist: jax.Array,
                         include_heightfield: bool) -> jax.Array:
    """occluded()'s fractional-opacity form (geom.box_fractional): f32
    occlusion amount 1 - prod(1 - box_opacity_i * hit_i) — boxes attenuate
    by their opacity (alpha-tested-foliage stand-in, SPEC "Occluder
    opacity"); planes/spheres/terrain stay solid. Mirrors
    ops/pallas/occlude._any_hit_fractional."""
    origins, dirs = points, to_light
    trans = jnp.ones(points.shape[:-1], jnp.float32)

    for i in range(geom.plane_normal.shape[0]):
        n = geom.plane_normal[i]
        denom = dot3(dirs, n)
        t = -(dot3(origins, n) + geom.plane_d[i]) / jnp.where(
            jnp.abs(denom) < 1e-9, 1e-9, denom)
        hit = (t > EPS) & (t < max_dist) & (jnp.abs(denom) > 1e-9)
        trans = trans * (1.0 - hit.astype(jnp.float32))

    for i in range(geom.sphere_center.shape[0]):
        oc = origins - geom.sphere_center[i]
        b = dot3(oc, dirs)
        cq = dot3(oc, oc) - geom.sphere_radius[i] ** 2
        disc = b * b - cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        t = jnp.where(t0 > EPS, t0, t1)
        hit = (disc > 0.0) & (t > EPS) & (t < max_dist)
        trans = trans * (1.0 - hit.astype(jnp.float32))

    if geom.box_min.shape[0]:
        inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-9, 1e-9, dirs)
        for i in range(geom.box_min.shape[0]):
            t0s = (geom.box_min[i] - origins) * inv
            t1s = (geom.box_max[i] - origins) * inv
            tmin = jnp.max(jnp.minimum(t0s, t1s), axis=-1)
            tmax = jnp.min(jnp.maximum(t0s, t1s), axis=-1)
            t = jnp.where(tmin > EPS, tmin, tmax)
            hit = (tmax >= tmin) & (t > EPS) & (t < max_dist)
            trans = trans * (1.0 - geom.box_opacity[i]
                             * hit.astype(jnp.float32))

    if geom.hf_enabled and include_heightfield:
        oy = origins[..., 1]
        dy = jnp.broadcast_to(dirs[..., 1], oy.shape)
        cap = jnp.minimum(jnp.asarray(max_dist, jnp.float32),
                          jnp.float32(geom.hf_far))
        lo, hi = _hf_band(geom, oy, dy, cap)
        valid = hi > lo

        def step(i, occ):
            t = lo + (hi - lo) * ((i.astype(jnp.float32) + 0.5)
                                  / geom.hf_steps)
            p = origins + t[..., None] * dirs
            return occ | (p[..., 1]
                          < heightfield_height(geom, p[..., 0], p[..., 2]))

        occ = jax.lax.fori_loop(0, geom.hf_steps, step,
                                jnp.zeros_like(valid))
        trans = trans * (1.0 - (occ & valid).astype(jnp.float32))

    return 1.0 - trans


def camera_rays(width: int, height: int, fov_y, aspect, view_to_world
                ) -> Tuple[jax.Array, jax.Array]:
    """Per-pixel world-space ray dirs with unit view-space z, plus screen uv.

    Matches the reference composite's frustum-corner interpolation
    (VolumetricRenderer.cs:660-672, shader:42, 71-76): worldPos =
    camPos + dir * viewDepth. uv origin bottom-left, pixel centers.
    Returns (dirs [H, W, 3], uv [H, W, 2])."""
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    uu, vv = jnp.meshgrid(u, v, indexing="xy")  # both [H, W]
    tan_y = jnp.tan(fov_y / 2.0)
    tan_x = tan_y * aspect
    vx = (2.0 * uu - 1.0) * tan_x
    vy = (2.0 * vv - 1.0) * tan_y
    view_dirs = jnp.stack([vx, vy, jnp.ones_like(vx)], axis=-1)
    world_dirs = transform_dirs(view_to_world, view_dirs)
    uv = jnp.stack([uu, vv], axis=-1)
    return world_dirs, uv


def render_scene(geom: Geometry, camera_pos: jax.Array, ray_dirs: jax.Array,
                 sun_dir: jax.Array, sun_color: jax.Array, ambient: jax.Array,
                 far: jax.Array, skip_proxy_boxes: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
    """Minimal Lambert shading pass producing (color [H, W, 3], view_depth [H, W]).

    view_depth is linear view-space z (ray_dirs have unit view z, so the hit t
    IS the view depth). Pixels with no hit get depth = far and sky color.
    skip_proxy_boxes: primary rays skip the trailing n_proxy_boxes (a
    rasterized mesh will cover them); their shadows still cast."""
    origins = jnp.broadcast_to(camera_pos, ray_dirs.shape)
    t, albedo, normal = intersect(geom, origins, ray_dirs,
                                  include_proxies=not skip_proxy_boxes)
    hit = t < BIG
    depth = jnp.where(hit, t, far)

    hitp = origins + jnp.minimum(t, far)[..., None] * ray_dirs
    ndl = jnp.maximum(jnp.sum(normal * (-sun_dir), axis=-1), 0.0)
    shadow_t, _, _ = intersect(geom, hitp + normal * 1e-3, -sun_dir)
    lit = (shadow_t >= BIG).astype(jnp.float32)
    color = albedo * (ambient + sun_color * (ndl * lit)[..., None])

    sky = jnp.asarray([0.35, 0.45, 0.65], jnp.float32) * jnp.clip(
        ray_dirs[..., 1:2] * 0.5 + 0.7, 0.3, 1.0)
    color = jnp.where(hit[..., None], color, sky)
    return color, depth
