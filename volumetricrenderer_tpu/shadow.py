"""Shadow pipeline: cascade fitting, map baking, and froxel-space sampling.

The reference consumes Unity engine shadow state invisibly: the cascaded shadow
atlas (`_ShadowMapTexture`), split spheres (`unity_ShadowSplitSpheres/SqRadii`),
cascade matrices (`unity_WorldToShadow`), shadow strength (`_LightShadowData.r`)
and the point-light projection params (`_LightProjectionParams`) — consumed at
VolumetricHelper.hlsl:196-259. This module owns equivalent state end-to-end:

- `fit_cascades` replicates Unity's split-sphere cascade fit (sphere per frustum
  slice on the camera axis, Unity-style split fractions) with texel snapping.
- `bake_*` render occluder depth by analytic ray casting (ops/raycast.py): a 2x2
  cascade atlas for directional lights, 6 linear-distance faces for point lights,
  one perspective map for spots. All encodings are linear (we own both bake and
  sample, so no reversed-Z dance — SPEC.md).
- `sample_dir_shadow` mirrors helper:226-235 (split-sphere one-hot select,
  blended atlas coords, 1-tap hardware PCF = 4 point compares bilinearly
  weighted, lerp to strength_r). `sample_cube_shadow` mirrors helper:237-251
  (dominant-axis select + bias), `sample_spot_shadow` mirrors helper:253-259.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu.froxel import dot3
from volumetricrenderer_tpu.models.geometry import Geometry
from volumetricrenderer_tpu.ops import raycast


# --------------------------------------------------------------------------- #
# Data
# --------------------------------------------------------------------------- #

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DirShadowData:
    """Per-directional-light cascaded shadow state (leading axis = light)."""
    atlas: jax.Array            # [N, 2S, 2S] normalized depth in [0,1]; 1 = no occluder
    world_to_uv: jax.Array      # [N, C, 3, 4] affine world -> (u, v, z) in ATLAS coords
    split_spheres: jax.Array    # [N, C, 3]
    split_sq_radii: jax.Array   # [N, C]
    strength_r: jax.Array       # [N] = 1 - shadow_strength (_LightShadowData.r)
    bias: jax.Array             # [N] normalized-depth bias
    # True when baked with the camera-aligned light basis (u independent of
    # froxel y) — the precondition of the fused Pallas PCF sampler.
    aligned: bool = dataclasses.field(default=False, metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CubeShadowData:
    faces: jax.Array            # [N, 6, S, S] dominant-axis distance / range; 1 = none
    light_pos: jax.Array        # [N, 3]
    range: jax.Array            # [N]
    strength_r: jax.Array       # [N]
    bias: jax.Array             # [N] world-units bias on the dominant axis (helper:241)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpotShadowData:
    maps: jax.Array             # [N, S, S] axial distance / range; 1 = none
    light_pos: jax.Array        # [N, 3]
    axes: jax.Array             # [N, 3, 3] rows (lx, ly, lz)
    tan_half_angle: jax.Array   # [N]
    range: jax.Array            # [N]
    strength_r: jax.Array       # [N]
    bias: jax.Array             # [N] normalized-depth bias


def _light_basis(direction: jax.Array, align_up=None
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Orthonormal basis with lz = direction.

    align_up: optional camera up axis (view_to_world column 1). When given,
    lx = normalize(lz x align_up), which makes dot(lx, camera_up) = 0 — the
    froxel->atlas u coordinate then depends on froxel x only (per slice), the
    property the Pallas cascaded-PCF kernel needs (ops/pallas/pcf_shadow.py).
    Sampling is basis-agnostic (data flows through world_to_uv), so the gather
    path and the oracle are unaffected by the choice."""
    lz = direction / jnp.linalg.norm(direction)
    if align_up is not None:
        lx = jnp.cross(lz, align_up)
        n = jnp.linalg.norm(lx)
        # degenerate (light along camera up): any perpendicular will do
        fallback = jnp.cross(lz, jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
        lx = jnp.where(n > 1e-5, lx / jnp.maximum(n, 1e-9),
                       fallback / jnp.maximum(jnp.linalg.norm(fallback), 1e-9))
        ly = jnp.cross(lz, lx)
        return lx, ly, lz
    up = jnp.where(jnp.abs(lz[1]) > 0.99,
                   jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
                   jnp.asarray([0.0, 1.0, 0.0], jnp.float32))
    lx = jnp.cross(up, lz)
    lx = lx / jnp.linalg.norm(lx)
    ly = jnp.cross(lz, lx)
    return lx, ly, lz


# --------------------------------------------------------------------------- #
# Cascade fitting (Unity-style split spheres)
# --------------------------------------------------------------------------- #

def fit_cascades(camera_pos, camera_forward, fov_y, aspect, near,
                 shadow_distance, splits: Tuple[float, ...]):
    """Enclosing sphere per frustum slice, centered on the camera axis.

    Returns (centers [C, 3], radii [C]). splits are cumulative end fractions of
    shadow_distance (Unity 4-cascade default 0.067/0.2/0.467/1.0)."""
    tan_y = jnp.tan(fov_y / 2.0)
    tan_x = tan_y * aspect
    k2 = tan_x * tan_x + tan_y * tan_y   # corner radius^2 per unit z

    centers = []
    radii = []
    prev = near
    for frac in splits:
        f = near + (shadow_distance - near) * frac
        n = prev
        # Solve rho(n)^2 + (n-c)^2 = rho(f)^2 + (f-c)^2 for axis offset c.
        c = ((f * f - n * n) * (1.0 + k2)) / (2.0 * (f - n))
        c = jnp.clip(c, n, f)
        r = jnp.sqrt(f * f * k2 + (f - c) ** 2)
        centers.append(camera_pos + camera_forward * c)
        radii.append(r)
        prev = f
    return jnp.stack(centers), jnp.stack(radii)


def bake_dir_shadows(geom: Geometry, directions, strengths,
                     camera_pos, camera_forward, fov_y, aspect, near,
                     shadow_distance, splits, map_size: int,
                     bias: float = 2e-3, align_up=None) -> DirShadowData:
    """Bake the 2x2 cascade atlas for each directional light.

    align_up: camera up axis — bakes in the camera-aligned light basis (see
    _light_basis), enabling the fused Pallas PCF sampler. Alignment rotates
    the atlas with the camera, so the texel snap stabilizes translation but
    not camera roll/yaw; the default basis keeps Unity's fixed-basis snap."""
    num_lights = directions.shape[0]
    num_c = len(splits)
    s = map_size

    centers, radii = fit_cascades(camera_pos, camera_forward, fov_y, aspect,
                                  near, shadow_distance, splits)

    atlases = []
    mats = []
    for li in range(num_lights):
        lx, ly, lz = _light_basis(directions[li], align_up)
        quads = []
        lmats = []
        for ci in range(num_c):
            r = radii[ci]
            # Texel snap the sphere center in light space for stability.
            texel = 2.0 * r / s
            cx = jnp.floor(dot3(centers[ci], lx) / texel) * texel
            cy = jnp.floor(dot3(centers[ci], ly) / texel) * texel
            cz = dot3(centers[ci], lz)
            center = lx * cx + ly * cy + lz * cz

            backup = 2.0 * r + 10.0        # pull the shadow camera back past occluders
            origin = center - lz * backup
            zfar = backup + 2.0 * r

            u = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
            uu, vv = jnp.meshgrid(u, u, indexing="xy")
            starts = (origin[None, None, :]
                      + lx * ((2.0 * uu - 1.0) * r)[..., None]
                      + ly * ((2.0 * vv - 1.0) * r)[..., None])
            dirs = jnp.broadcast_to(lz, starts.shape)
            t, _, _ = raycast.intersect(geom, starts, dirs)
            depth = jnp.minimum(t, zfar) / zfar
            quads.append(depth)

            # world -> (u, v, z) in this cascade's quadrant of the 2x2 atlas.
            qx, qy = ci % 2, ci // 2
            row_u = jnp.concatenate([lx / (4.0 * r), ((-dot3(origin, lx)) / (4.0 * r)
                                                      + 0.25 + 0.5 * qx)[None]])
            row_v = jnp.concatenate([ly / (4.0 * r), ((-dot3(origin, ly)) / (4.0 * r)
                                                      + 0.25 + 0.5 * qy)[None]])
            row_z = jnp.concatenate([lz / zfar, ((-dot3(origin, lz)) / zfar)[None]])
            lmats.append(jnp.stack([row_u, row_v, row_z]))

        top = jnp.concatenate(quads[0:2], axis=1)
        if num_c > 2:
            bottom = jnp.concatenate(quads[2:4], axis=1)
            atlas = jnp.concatenate([top, bottom], axis=0)
        else:
            atlas = top
        atlases.append(atlas)
        mats.append(jnp.stack(lmats))

    return DirShadowData(
        atlas=jnp.stack(atlases),
        world_to_uv=jnp.stack(mats),
        split_spheres=jnp.broadcast_to(centers, (num_lights, num_c, 3)),
        split_sq_radii=jnp.broadcast_to(radii * radii, (num_lights, num_c)),
        strength_r=1.0 - strengths,
        bias=jnp.full((num_lights,), bias, jnp.float32),
        aligned=align_up is not None,
    )


def bake_cube_shadows(geom: Geometry, positions, ranges, strengths,
                      map_size: int, bias: float = 5e-2) -> CubeShadowData:
    """6 faces per point light; face 2k is +axis k, 2k+1 is -axis k. Texel (u,v)
    of face (k, s) casts dir with dir[k]=s, dir[b]=2u-1, dir[c]=2v-1 where
    (b, c) are the other axes ascending, so the hit t equals the dominant-axis
    distance directly."""
    num_lights = positions.shape[0]
    sres = map_size
    u = (jnp.arange(sres, dtype=jnp.float32) + 0.5) / sres
    uu, vv = jnp.meshgrid(u, u, indexing="xy")
    cu = 2.0 * uu - 1.0
    cv = 2.0 * vv - 1.0

    all_faces = []
    for li in range(num_lights):
        faces = []
        for axis in range(3):
            b, c = [a for a in range(3) if a != axis]
            for sign in (1.0, -1.0):
                comps = [None, None, None]
                comps[axis] = jnp.full_like(cu, sign)
                comps[b] = cu
                comps[c] = cv
                dirs = jnp.stack(comps, axis=-1)
                starts = jnp.broadcast_to(positions[li], dirs.shape)
                t, _, _ = raycast.intersect(geom, starts, dirs)
                faces.append(jnp.minimum(t, ranges[li]) / ranges[li])
        all_faces.append(jnp.stack(faces))

    return CubeShadowData(
        faces=jnp.stack(all_faces),
        light_pos=positions,
        range=ranges,
        strength_r=1.0 - strengths,
        bias=jnp.full((num_lights,), bias, jnp.float32),
    )


def bake_spot_shadows(geom: Geometry, positions, directions, spot_angles,
                      ranges, strengths, map_size: int,
                      bias: float = 2e-3) -> SpotShadowData:
    num_lights = positions.shape[0]
    sres = map_size
    u = (jnp.arange(sres, dtype=jnp.float32) + 0.5) / sres
    uu, vv = jnp.meshgrid(u, u, indexing="xy")

    maps = []
    axes = []
    tans = []
    for li in range(num_lights):
        lx, ly, lz = _light_basis(directions[li])
        tan = jnp.tan(spot_angles[li] / 2.0)
        dirs = (lz[None, None, :]
                + lx * ((2.0 * uu - 1.0) * tan)[..., None]
                + ly * ((2.0 * vv - 1.0) * tan)[..., None])
        starts = jnp.broadcast_to(positions[li], dirs.shape)
        t, _, _ = raycast.intersect(geom, starts, dirs)   # t = axial distance
        maps.append(jnp.minimum(t, ranges[li]) / ranges[li])
        axes.append(jnp.stack([lx, ly, lz]))
        tans.append(tan)

    return SpotShadowData(
        maps=jnp.stack(maps),
        light_pos=positions,
        axes=jnp.stack(axes),
        tan_half_angle=jnp.stack(tans),
        range=ranges,
        strength_r=1.0 - strengths,
        bias=jnp.full((num_lights,), bias, jnp.float32),
    )


# --------------------------------------------------------------------------- #
# Sampling
# --------------------------------------------------------------------------- #

def _pcf_compare_2d(tex: jax.Array, u: jax.Array, v: jax.Array,
                    ref: jax.Array) -> jax.Array:
    """Hardware SampleCmp emulation: bilinear weighting of 4 point compares
    (lit = ref <= stored). tex [H, W]; u, v in [0,1]; ref same shape as u."""
    h, w = tex.shape
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    tflat = tex.reshape(-1)

    def tap(dy, dx):
        yi = jnp.clip(y0 + dy, 0, h - 1)
        xi = jnp.clip(x0 + dx, 0, w - 1)
        stored = jnp.take(tflat, yi * w + xi)
        return (ref <= stored).astype(jnp.float32)

    return (tap(0, 0) * (1 - fy) * (1 - fx) + tap(0, 1) * (1 - fy) * fx
            + tap(1, 0) * fy * (1 - fx) + tap(1, 1) * fy * fx)


def cascade_weights_split_spheres(world_pos: jax.Array, spheres: jax.Array,
                                  sq_radii: jax.Array) -> jax.Array:
    """GetCascadeWeights_SplitSpheres (helper:196-206). world_pos [..., 3],
    spheres [C, 3], sq_radii [C] -> one-hot-ish weights [..., C]."""
    d2 = jnp.sum((world_pos[..., None, :] - spheres) ** 2, axis=-1)
    inside = (d2 < sq_radii).astype(jnp.float32)
    shifted = jnp.concatenate(
        [jnp.zeros_like(inside[..., :1]), inside[..., :-1]], axis=-1)
    return jnp.clip(inside - shifted, 0.0, 1.0)


def sample_dir_shadow(data: DirShadowData, light_idx: int,
                      world_pos: jax.Array) -> jax.Array:
    """SampleDirShadow (helper:226-235): split-sphere cascade pick, blended
    atlas coord, 1-tap PCF, lerp to strength_r. world_pos [..., 3] -> [...]."""
    spheres = data.split_spheres[light_idx]
    sqr = data.split_sq_radii[light_idx]
    weights = cascade_weights_split_spheres(world_pos, spheres, sqr)

    mats = data.world_to_uv[light_idx]          # [C, 3, 4]
    # Blend the per-cascade coords with one-hot weights (helper:212-218).
    # Explicit FMAs (see froxel.dot3): an einsum here would hit the MXU at
    # truncated precision, and shadow-compare depths cannot afford that.
    coord = 0.0
    for ci in range(mats.shape[0]):
        m = mats[ci]
        c = jnp.stack([dot3(world_pos, m[0, :3]) + m[0, 3],
                       dot3(world_pos, m[1, :3]) + m[1, 3],
                       dot3(world_pos, m[2, :3]) + m[2, 3]], axis=-1)
        coord = coord + c * weights[..., ci, None]

    # Outside all cascades the blended coord is 0; force fully lit (the
    # reference's reversed-Z noCascadeWeights trick, helper:219-222).
    any_cascade = jnp.sum(weights, axis=-1) > 0.0

    cmp = _pcf_compare_2d(data.atlas[light_idx], coord[..., 0], coord[..., 1],
                          coord[..., 2] - data.bias[light_idx])
    cmp = jnp.where(any_cascade, cmp, 1.0)
    return data.strength_r[light_idx] + (1.0 - data.strength_r[light_idx]) * cmp


def sample_cube_shadow(data: CubeShadowData, light_idx: int,
                       vec: jax.Array) -> jax.Array:
    """SamplePointShadow (helper:237-251). vec = worldPos - lightPos [..., 3]."""
    av = jnp.abs(vec)
    dominant = jnp.maximum(jnp.maximum(av[..., 0], av[..., 1]), av[..., 2])
    # Bias application mirrors helper:241-242 (subtract on the dominant axis).
    mydist = jnp.maximum(dominant - data.bias[light_idx], 1e-5) / data.range[light_idx]

    x_is = (av[..., 0] >= av[..., 1]) & (av[..., 0] >= av[..., 2])
    y_is = (~x_is) & (av[..., 1] >= av[..., 2])
    axis = jnp.where(x_is, 0, jnp.where(y_is, 1, 2))
    comp = jnp.take_along_axis(vec, axis[..., None], axis=-1)[..., 0]
    sign_neg = comp < 0.0
    face = axis * 2 + sign_neg.astype(jnp.int32)

    dom = jnp.maximum(dominant, 1e-9)
    other = {0: (1, 2), 1: (0, 2), 2: (0, 1)}
    u = jnp.zeros_like(dominant)
    v = jnp.zeros_like(dominant)
    for a in range(3):
        b, c = other[a]
        sel = axis == a
        u = jnp.where(sel, vec[..., b] / dom, u)
        v = jnp.where(sel, vec[..., c] / dom, v)
    u = 0.5 * (u + 1.0)
    v = 0.5 * (v + 1.0)

    faces = data.faces[light_idx]               # [6, S, S]
    sres = faces.shape[-1]
    x = u * sres - 0.5
    y = v * sres - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    fflat = faces.reshape(-1)

    def tap(dy, dx):
        yi = jnp.clip(y0 + dy, 0, sres - 1)
        xi = jnp.clip(x0 + dx, 0, sres - 1)
        stored = jnp.take(fflat, (face * sres + yi) * sres + xi)
        return (mydist <= stored).astype(jnp.float32)

    cmp = (tap(0, 0) * (1 - fy) * (1 - fx) + tap(0, 1) * (1 - fy) * fx
           + tap(1, 0) * fy * (1 - fx) + tap(1, 1) * fy * fx)
    return data.strength_r[light_idx] + (1.0 - data.strength_r[light_idx]) * cmp


def sample_spot_shadow(data: SpotShadowData, light_idx: int,
                       world_pos: jax.Array) -> jax.Array:
    """SampleSpotShadow (helper:253-259): perspective map through the light's
    frame; lit = axial/range <= stored."""
    rel = world_pos - data.light_pos[light_idx]
    lx, ly, lz = (data.axes[light_idx, 0], data.axes[light_idx, 1],
                  data.axes[light_idx, 2])
    axial = dot3(rel, lz)
    safe_axial = jnp.maximum(axial, 1e-5)
    tan = data.tan_half_angle[light_idx]
    u = 0.5 * (dot3(rel, lx) / (safe_axial * tan) + 1.0)
    v = 0.5 * (dot3(rel, ly) / (safe_axial * tan) + 1.0)
    ref = axial / data.range[light_idx] - data.bias[light_idx]
    cmp = _pcf_compare_2d(data.maps[light_idx], u, v, ref)
    cmp = jnp.where(axial > 0.0, cmp, 1.0)
    return data.strength_r[light_idx] + (1.0 - data.strength_r[light_idx]) * cmp
