"""NumPy oracle — the independent sequential reference implementation.

Implements SPEC.md exactly, mirroring the cited reference kernels
(VolumetricHelper.hlsl, VolumetricCompute.compute, VolumetricShadowCompute.compute,
VolumetricRenderer.shader) in straightforward vectorized NumPy with a *sequential*
Z loop for the accumulation (the reference's loop shape, compute:172-200). The
JAX framework must match this to <= 1e-3 (BASELINE.json). No JAX imports here —
total implementation independence is the point.

Inputs are plain numpy arrays / simple dataclasses. Volumes are [D, H, W(, C)].
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import numpy as np

PI = 3.1415926535


# --------------------------------------------------------------------------- #
# Geometry / transforms (VolumetricHelper.hlsl:105-186)
# --------------------------------------------------------------------------- #

@dataclasses.dataclass
class OracleParams:
    px: float
    py: float
    pz: float
    pw: float
    near: float
    grid: Tuple[int, int, int]      # (W, H, D)


def make_params(fov_y_rad, aspect, near, volume_distance, depth_distribution,
                grid) -> OracleParams:
    _, _, d = grid
    py = 1.0 / math.tan(fov_y_rad / 2.0)
    px = py / aspect
    pz = depth_distribution * (d - near * d / volume_distance) + 1.0
    pw = volume_distance / depth_distribution / d
    return OracleParams(px, py, pz, pw, near, tuple(grid))


def froxel_to_view(p: OracleParams, froxel_pos: np.ndarray) -> np.ndarray:
    w, h, d = p.grid
    fx = froxel_pos[..., 0]
    fy = froxel_pos[..., 1]
    fz = froxel_pos[..., 2]
    vz = (np.power(p.pz, fz / d) - 1.0) * p.pw + p.near
    vx = (2.0 * fx / w - 1.0) * vz / p.px
    vy = (2.0 * fy / h - 1.0) * vz / p.py
    return np.stack([vx, vy, vz], axis=-1)


def view_to_froxel(p: OracleParams, view_pos: np.ndarray) -> np.ndarray:
    w, h, d = p.grid
    vx = view_pos[..., 0]
    vy = view_pos[..., 1]
    vz = view_pos[..., 2]
    fz = d * (np.log(np.maximum((vz - p.near) / p.pw + 1.0, 1e-8)) / np.log(p.pz))
    fx = w * (p.px * vx / vz + 1.0) / 2.0
    fy = h * (p.py * vy / vz + 1.0) / 2.0
    return np.stack([fx, fy, fz], axis=-1)


def depth_to_froxel_z(p: OracleParams, depth: np.ndarray) -> np.ndarray:
    _, _, d = p.grid
    return d * (np.log(np.maximum((depth - p.near) / p.pw + 1.0, 1e-8)) / np.log(p.pz))


def apply_mat(mat: np.ndarray, pos: np.ndarray) -> np.ndarray:
    ph = np.concatenate([pos, np.ones_like(pos[..., :1])], axis=-1)
    out = ph @ mat.T
    return out[..., :3] / out[..., 3:4]


def froxel_to_world(p, view_to_world_mat, froxel_pos):
    return apply_mat(view_to_world_mat, froxel_to_view(p, froxel_pos))


def world_to_froxel(p, world_to_view_mat, world_pos):
    return view_to_froxel(p, apply_mat(world_to_view_mat, world_pos))


def look_at_matrix(position, forward, up) -> np.ndarray:
    z = np.asarray(forward, np.float64)
    z = z / np.linalg.norm(z)
    x = np.cross(np.asarray(up, np.float64), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    m = np.eye(4)
    m[:3, 0] = x
    m[:3, 1] = y
    m[:3, 2] = z
    m[:3, 3] = np.asarray(position, np.float64)
    return m


def invert_rigid(m: np.ndarray) -> np.ndarray:
    r = m[:3, :3]
    t = m[:3, 3]
    out = np.eye(4)
    out[:3, :3] = r.T
    out[:3, 3] = -r.T @ t
    return out


def froxel_centers(grid) -> np.ndarray:
    w, h, d = grid
    zz, yy, xx = np.meshgrid(np.arange(d) + 0.5, np.arange(h) + 0.5,
                             np.arange(w) + 0.5, indexing="ij")
    return np.stack([xx, yy, zz], axis=-1).astype(np.float64)


def jitter_sequence() -> np.ndarray:
    r = 0.17054068870105443882
    dd = 2 * r
    s = r * math.sqrt(3.0)
    seq = np.array([
        [0, 0, 3 / 14], [-dd, 0, 11 / 14], [dd, 0, 1 / 14],
        [-r, -s, 9 / 14], [r, s, 7 / 14], [r, -s, 13 / 14], [-r, s, 5 / 14],
    ], dtype=np.float64)
    c15, s15 = 0.96592582628906828675, 0.25881904510252076235
    rot = seq.copy()
    rot[:, 0] = seq[:, 0] * c15 - seq[:, 1] * s15
    rot[:, 1] = seq[:, 0] * s15 + seq[:, 1] * c15
    return rot


# --------------------------------------------------------------------------- #
# Sampling helpers (texture semantics: texel coord = uvw*N - 0.5)
# --------------------------------------------------------------------------- #

def trilinear(vol: np.ndarray, texel: np.ndarray, wrap: bool = False) -> np.ndarray:
    """vol [D,H,W] or [D,H,W,C]; texel [..., 3] = (x, y, z) texel coords."""
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[..., None]
    d, h, w, c = vol.shape
    x, y, z = texel[..., 0], texel[..., 1], texel[..., 2]
    x0f, y0f, z0f = np.floor(x), np.floor(y), np.floor(z)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    fz = (z - z0f)[..., None]
    x0, y0, z0 = x0f.astype(int), y0f.astype(int), z0f.astype(int)

    def fetch(zi, yi, xi):
        if wrap:
            zi, yi, xi = zi % d, yi % h, xi % w
        else:
            zi = np.clip(zi, 0, d - 1)
            yi = np.clip(yi, 0, h - 1)
            xi = np.clip(xi, 0, w - 1)
        return vol[zi, yi, xi]

    out = np.zeros(x.shape + (c,))
    for dz, wz in ((0, 1 - fz), (1, fz)):
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                out = out + fetch(z0 + dz, y0 + dy, x0 + dx) * (wz * wy * wx)
    return out[..., 0] if squeeze else out


def windowed_warp(vol: np.ndarray, texel: np.ndarray, k: int) -> np.ndarray:
    """Separable windowed warp resample (SPEC "Reprojection sampling"): three
    sequential 1D passes (z, y, x), each a (2k+2)-tap tent stencil with the
    per-element offset clamped to [-k, k]. Mirrors ops/warp.py exactly."""
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[..., None]
    d, h, w, c = vol.shape
    tx = np.clip(texel[..., 0], 0.0, w - 1.0)
    ty = np.clip(texel[..., 1], 0.0, h - 1.0)
    tz = np.clip(texel[..., 2], 0.0, d - 1.0)

    def axis_pass(v, target, axis, n):
        base_shape = [1, 1, 1]
        base_shape[axis] = n
        base = np.arange(n, dtype=np.float64).reshape(base_shape)
        off = np.clip(target - base, -k, k)
        pad = [(0, 0)] * 4
        pad[axis] = (k + 1, k + 1)
        pv = np.pad(v, pad, mode="edge")
        out = np.zeros_like(v)
        for dd in range(-k, k + 2):
            wgt = np.maximum(0.0, 1.0 - np.abs(off - dd))
            sl = [slice(None)] * 4
            sl[axis] = slice(k + 1 + dd, k + 1 + dd + n)
            out = out + pv[tuple(sl)] * wgt[..., None]
        return out

    out = axis_pass(vol, tz, 0, d)
    out = axis_pass(out, ty, 1, h)
    out = axis_pass(out, tx, 2, w)
    return out[..., 0] if squeeze else out


def bilinear_compare(tex: np.ndarray, u, v, ref) -> np.ndarray:
    """4 point compares (lit = ref <= stored), bilinearly weighted."""
    h, w = tex.shape
    x = u * w - 0.5
    y = v * h - 0.5
    x0f, y0f = np.floor(x), np.floor(y)
    fx, fy = x - x0f, y - y0f
    x0, y0 = x0f.astype(int), y0f.astype(int)
    out = np.zeros_like(np.asarray(x, np.float64))
    for dy, wy in ((0, 1 - fy), (1, fy)):
        for dx, wx in ((0, 1 - fx), (1, fx)):
            yi = np.clip(y0 + dy, 0, h - 1)
            xi = np.clip(x0 + dx, 0, w - 1)
            out = out + (ref <= tex[yi, xi]).astype(np.float64) * (wy * wx)
    return out


# --------------------------------------------------------------------------- #
# Physics (helper:83-99, 265-303)
# --------------------------------------------------------------------------- #

def phase_hg(g, cos_theta):
    g2 = g * g
    return (1 - g2) / np.power(1 + g2 - 2.0 * g * cos_theta, 1.5) / 4.0 / PI


def rgb2gray(rgb):
    return rgb[..., 0] * 0.3 + rgb[..., 1] * 0.59 + rgb[..., 2] * 0.11


def attenuation_lut(x):
    return np.clip((1.0 - x) * 5.0, 0.0, 1.0) / (1.0 + 25.0 * x)


def smoothstep(e0, e1, x):
    t = np.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def scatter_step(acc_l, acc_t, in_scatter, extinction, step_len):
    """ScatterStep (helper:265-273) with the SPEC safe-divide."""
    od = extinction * step_len
    t_slice = np.exp(-od)
    small = od < 1e-5
    factor = np.where(small,
                      step_len * (1.0 - 0.5 * od),
                      -np.expm1(-od) / np.where(small, 1.0, extinction))
    acc_l = acc_l + in_scatter * factor[..., None] * acc_t[..., None]
    acc_t = acc_t * t_slice
    return acc_l, acc_t


def occluded_raycast(geom: dict, points: np.ndarray, dirs: np.ndarray,
                     max_dist, include_heightfield: bool = True) -> np.ndarray:
    """Any-hit occlusion against analytic primitives (mirror of
    ops/raycast.occluded; the shadow_mode="raycast" froxel visibility path).
    geom keys: plane_normal [P,3], plane_d [P], sphere_center [S,3],
    sphere_radius [S], box_min/box_max [B,3], optional hf (procedural
    heightfield: height_fn(x, z), hmin, hmax, steps, far — band-clamped
    midpoint march, SPEC "Heightfield occluder"). dirs unit."""
    eps = 1e-4
    # transmittance-product form: solid prims multiply by (1 - hit) — for
    # all-solid scenes this equals the any-hit OR exactly (0/1 factors);
    # boxes may carry "box_opacity" < 1 (SPEC "Occluder opacity": voxelized
    # alpha-tested foliage attenuates by its average coverage).
    trans = np.ones(points.shape[:-1], np.float64)
    for i in range(len(geom.get("plane_normal", []))):
        n = geom["plane_normal"][i]
        denom = dirs @ n
        t = -(points @ n + geom["plane_d"][i]) / np.where(np.abs(denom) < 1e-9,
                                                          1e-9, denom)
        hit_i = (t > eps) & (t < max_dist) & (np.abs(denom) > 1e-9)
        trans = trans * (1.0 - hit_i)
    for i in range(len(geom.get("sphere_center", []))):
        oc = points - geom["sphere_center"][i]
        b = np.sum(oc * dirs, axis=-1)
        cq = np.sum(oc * oc, axis=-1) - geom["sphere_radius"][i] ** 2
        disc = b * b - cq
        sq = np.sqrt(np.maximum(disc, 0.0))
        t = np.where(-b - sq > eps, -b - sq, -b + sq)
        hit_i = (disc > 0.0) & (t > eps) & (t < max_dist)
        trans = trans * (1.0 - hit_i)
    n_boxes = len(geom.get("box_min", []))
    box_op = geom.get("box_opacity", np.ones(n_boxes))
    for i in range(n_boxes):
        inv = 1.0 / np.where(np.abs(dirs) < 1e-9, 1e-9, dirs)
        t0s = (geom["box_min"][i] - points) * inv
        t1s = (geom["box_max"][i] - points) * inv
        tmin = np.max(np.minimum(t0s, t1s), axis=-1)
        tmax = np.min(np.maximum(t0s, t1s), axis=-1)
        t = np.where(tmin > eps, tmin, tmax)
        hit_i = (tmax >= tmin) & (t > eps) & (t < max_dist)
        trans = trans * (1.0 - box_op[i] * hit_i)
    hf = geom.get("hf")
    if hf is not None and include_heightfield:
        oy = points[..., 1]
        dy = np.broadcast_to(np.asarray(dirs)[..., 1], oy.shape)
        cap = np.minimum(np.asarray(max_dist, np.float64), hf["far"])
        safe = np.where(np.abs(dy) < 1e-7, 1e-7, dy)
        ta = (hf["hmax"] - oy) / safe
        tb = (hf["hmin"] - oy) / safe
        horiz = np.abs(dy) < 1e-7
        in_band = (oy >= hf["hmin"]) & (oy <= hf["hmax"])
        lo = np.where(horiz, np.where(in_band, eps, cap), np.minimum(ta, tb))
        hi = np.where(horiz, np.where(in_band, cap, 0.0), np.maximum(ta, tb))
        lo = np.clip(lo, eps, cap)
        hi = np.clip(hi, eps, cap)
        valid = hi > lo
        occ = np.zeros_like(valid)
        for i in range(hf["steps"]):
            t = lo + (hi - lo) * ((i + 0.5) / hf["steps"])
            p = points + t[..., None] * dirs
            occ |= p[..., 1] < hf["height_fn"](p[..., 0], p[..., 2])
        trans = trans * (1.0 - (occ & valid))
    return 1.0 - trans


# --------------------------------------------------------------------------- #
# Shadow sampling (helper:196-259) — consumes baked map data as numpy arrays
# --------------------------------------------------------------------------- #

def sample_dir_shadow(world_pos, atlas, world_to_uv, spheres, sq_radii,
                      strength_r, bias):
    """world_pos [...,3]; atlas [A,A]; world_to_uv [C,3,4]; spheres [C,3]."""
    num_c = spheres.shape[0]
    d2 = np.sum((world_pos[..., None, :] - spheres) ** 2, axis=-1)
    inside = (d2 < sq_radii).astype(np.float64)
    weights = inside.copy()
    weights[..., 1:] = np.clip(inside[..., 1:] - inside[..., :-1], 0.0, 1.0)

    wp1 = np.concatenate([world_pos, np.ones_like(world_pos[..., :1])], axis=-1)
    coord = np.zeros(world_pos.shape[:-1] + (3,))
    for ci in range(num_c):
        coord = coord + (wp1 @ world_to_uv[ci].T) * weights[..., ci, None]
    any_c = np.sum(weights, axis=-1) > 0
    cmp = bilinear_compare(atlas, coord[..., 0], coord[..., 1],
                           coord[..., 2] - bias)
    cmp = np.where(any_c, cmp, 1.0)
    return strength_r + (1.0 - strength_r) * cmp


def sample_cube_shadow(vec, faces, rng, strength_r, bias):
    """vec = worldPos - lightPos [...,3]; faces [6,S,S]."""
    av = np.abs(vec)
    dominant = np.max(av, axis=-1)
    mydist = np.maximum(dominant - bias, 1e-5) / rng
    axis = np.argmax(av, axis=-1)
    comp = np.take_along_axis(vec, axis[..., None], axis=-1)[..., 0]
    face = axis * 2 + (comp < 0).astype(int)

    dom = np.maximum(dominant, 1e-9)
    others = {0: (1, 2), 1: (0, 2), 2: (0, 1)}
    u = np.zeros_like(dom)
    v = np.zeros_like(dom)
    for a in range(3):
        b, c = others[a]
        sel = axis == a
        u = np.where(sel, vec[..., b] / dom, u)
        v = np.where(sel, vec[..., c] / dom, v)
    u = 0.5 * (u + 1.0)
    v = 0.5 * (v + 1.0)

    sres = faces.shape[-1]
    x = u * sres - 0.5
    y = v * sres - 0.5
    x0f, y0f = np.floor(x), np.floor(y)
    fx, fy = x - x0f, y - y0f
    x0, y0 = x0f.astype(int), y0f.astype(int)
    out = np.zeros_like(dom)
    for dy, wy in ((0, 1 - fy), (1, fy)):
        for dx, wx in ((0, 1 - fx), (1, fx)):
            yi = np.clip(y0 + dy, 0, sres - 1)
            xi = np.clip(x0 + dx, 0, sres - 1)
            stored = faces[face, yi, xi]
            out = out + (mydist <= stored).astype(np.float64) * (wy * wx)
    return strength_r + (1.0 - strength_r) * out


def sample_spot_shadow(world_pos, smap, light_pos, axes, tan_half, rng,
                       strength_r, bias):
    rel = world_pos - light_pos
    axial = rel @ axes[2]
    safe = np.maximum(axial, 1e-5)
    u = 0.5 * ((rel @ axes[0]) / (safe * tan_half) + 1.0)
    v = 0.5 * ((rel @ axes[1]) / (safe * tan_half) + 1.0)
    cmp = bilinear_compare(smap, u, v, axial / rng - bias)
    cmp = np.where(axial > 0, cmp, 1.0)
    return strength_r + (1.0 - strength_r) * cmp


# --------------------------------------------------------------------------- #
# Full-frame oracle
# --------------------------------------------------------------------------- #

@dataclasses.dataclass
class OracleFrameInput:
    """Everything one frame consumes, as plain numpy. Shadow map *data* comes
    from the framework's bake (sampling/pipeline parity is what's under test;
    bake correctness has its own direct tests)."""
    grid: Tuple[int, int, int]                 # (W, H, D)
    volume_distance: float
    depth_distribution: float
    camera_pos: np.ndarray
    camera_forward: np.ndarray
    camera_up: np.ndarray
    fov_y: float
    aspect: float
    near: float
    frame_count: int
    temporal_blend_alpha: float
    temporal_blend_shadow: bool = True
    temporal_blend_accumulation: bool = True
    temporal_blend_scatter: bool = False
    temporal_blend_material: bool = False
    jitter_dir_scatter: bool = False
    use_current_matrix_for_reproj: bool = False
    reproj_impl: str = "windowed"
    reproj_window: int = 4
    shadow_mode: str = "map"
    geometry: Optional[dict] = None
    time_x: float = 0.0

    # media: list of dicts with keys scattering_coef[3], absorption_coef, phase_g,
    # optional noise_tex [Nz,Ny,Nx], noise_tiling[3], noise_scroll[3],
    # height_falloff, height_base, volume_type, blend_type, box_min, box_max,
    # box_softness.
    media: List[dict] = dataclasses.field(default_factory=list)

    # dir lights: dicts with direction[3], color_packed[3] (already *intensity,
    # gamma 2.2), has_shadow, shadow data (atlas, world_to_uv, spheres,
    # sq_radii, strength_r, bias) or None for raycast-lit=1.
    dir_lights: List[dict] = dataclasses.field(default_factory=list)
    point_lights: List[dict] = dataclasses.field(default_factory=list)
    spot_lights: List[dict] = dataclasses.field(default_factory=list)

    # history
    prev_shadow: Optional[np.ndarray] = None          # [Nd, D, H, W]
    prev_scatter: Optional[np.ndarray] = None         # [D, H, W, 4]
    prev_accumulation: Optional[np.ndarray] = None    # [D, H, W, 4]
    prev_material_a: Optional[np.ndarray] = None      # [D, H, W, 4]
    prev_world_to_view: Optional[np.ndarray] = None   # [4, 4]

    # composite inputs
    scene_color: Optional[np.ndarray] = None          # [IH, IW, 3]
    view_depth: Optional[np.ndarray] = None           # [IH, IW]


def _material_volumes(inp: OracleFrameInput, p: OracleParams, v2w, jitter):
    w, h, d = inp.grid
    mat_a = np.zeros((d, h, w, 4))
    mat_b = np.zeros((d, h, w, 4))
    if not inp.media:
        return mat_a, mat_b
    centers = froxel_centers(inp.grid)
    world_j = froxel_to_world(p, v2w, centers + jitter)
    for m in inp.media:
        a = np.zeros((d, h, w, 4))
        a[..., :3] = m["scattering_coef"]
        a[..., 3] = m["absorption_coef"]
        b = np.zeros((d, h, w, 4))
        b[..., 0] = m["phase_g"]

        factor = np.ones((d, h, w))
        if m.get("noise_fn") is not None:
            # Procedural mode: the adapter supplies the (numpy) noise evaluator;
            # its jax/numpy equivalence has its own test (tests/test_noise.py).
            uvw = world_j * np.asarray(m["noise_tiling"]) \
                + np.asarray(m["noise_scroll"]) * inp.time_x
            factor = factor * m["noise_fn"](uvw)
        elif m.get("noise_tex") is not None:
            tex = m["noise_tex"]
            uvw = world_j * np.asarray(m["noise_tiling"]) \
                + np.asarray(m["noise_scroll"]) * inp.time_x
            nz, ny, nx = tex.shape
            texel = np.stack([uvw[..., 0] * nx - 0.5, uvw[..., 1] * ny - 0.5,
                              uvw[..., 2] * nz - 0.5], axis=-1)
            factor = factor * trilinear(tex, texel, wrap=True)
        hf = m.get("height_falloff", 0.0)
        if hf:
            factor = factor * np.exp(-max(hf, 0.0) * np.maximum(
                world_j[..., 1] - m.get("height_base", 0.0), 0.0))
        a = a * factor[..., None]

        if m.get("volume_type", "constant") == "box":
            soft = max(m.get("box_softness", 0.0), 1e-6)
            bmin = np.asarray(m["box_min"])
            bmax = np.asarray(m["box_max"])
            lo = np.min(smoothstep(bmin, bmin + soft, world_j), axis=-1)
            hi = np.min(smoothstep(-bmax, -(bmax - soft), -world_j), axis=-1)
            mask = lo * hi
        else:
            mask = np.ones((d, h, w))

        if m.get("blend_type", "alpha") == "additive":
            mat_a = mat_a + a * mask[..., None]
            mat_b = mat_b + b * mask[..., None]
        else:
            mat_a = mat_a * (1 - mask[..., None]) + a * mask[..., None]
            mat_b = mat_b * (1 - mask[..., None]) + b * mask[..., None]
    return mat_a, mat_b


def _shadow_volume(inp, p, v2w, jitter):
    w, h, d = inp.grid
    nd = max(len(inp.dir_lights), 1)
    vol = np.ones((nd, d, h, w))
    centers = froxel_centers(inp.grid)
    world_j = froxel_to_world(p, v2w, centers + jitter)
    for i, light in enumerate(inp.dir_lights):
        if not light.get("has_shadow", True):
            continue
        if inp.shadow_mode == "raycast" and inp.geometry is not None:
            occ = occluded_raycast(inp.geometry, world_j,
                                   -np.asarray(light["direction"]), 1e4)
            sr = 1.0 - light.get("shadow_strength", 1.0)
            vis = sr + (1.0 - sr) * (1.0 - occ)
        elif light.get("shadow") is not None:
            sd = light["shadow"]
            vis = sample_dir_shadow(world_j, sd["atlas"], sd["world_to_uv"],
                                    sd["spheres"], sd["sq_radii"],
                                    sd["strength_r"], sd["bias"])
        else:
            continue
        vol[i] = vis * vis          # VolumetricShadowCompute.compute:17
    return vol


def _scatter_volume(inp, p, v2w, jitter, mat_a, mat_b, shadow_vol):
    w, h, d = inp.grid
    sigma_s = mat_a[..., :3]
    sigma_a = mat_a[..., 3]
    g = mat_b[..., 0]
    centers = froxel_centers(inp.grid)
    world_c = froxel_to_world(p, v2w, centers)
    world_j = froxel_to_world(p, v2w, centers + jitter)
    cam = np.asarray(inp.camera_pos, np.float64)

    rgb = np.zeros((d, h, w, 3))
    ext = np.zeros((d, h, w))

    wp_dir = world_j if inp.jitter_dir_scatter else world_c
    vd = wp_dir - cam
    vd = vd / np.linalg.norm(vd, axis=-1, keepdims=True)
    for i, light in enumerate(inp.dir_lights):
        cos_t = vd @ (-np.asarray(light["direction"]))
        hg = phase_hg(g, cos_t)
        rgb += (shadow_vol[i] * hg)[..., None] * np.asarray(light["color_packed"]) * sigma_s
        ext += rgb2gray(sigma_s) + sigma_a

    vdj = world_j - cam
    vdj = vdj / np.linalg.norm(vdj, axis=-1, keepdims=True)
    for light in inp.point_lights:
        to_pos = world_j - np.asarray(light["position"])
        dist = np.linalg.norm(to_pos, axis=-1)
        ldir = to_pos / np.maximum(dist, 1e-9)[..., None]
        fall = attenuation_lut(dist * dist / light["range"] ** 2) \
            * light.get("intensity_multiplier", 1.0)
        cos_t = np.sum(vdj * (-ldir), axis=-1)
        contrib = (phase_hg(g, cos_t) * fall)[..., None] \
            * np.asarray(light["color_packed"]) * sigma_s
        if light.get("has_shadow") and inp.shadow_mode in ("raycast", "map_dir") \
                and inp.geometry is not None:
            occ = occluded_raycast(inp.geometry, world_j, -ldir, dist - 0.05,
                                   include_heightfield=inp.geometry.get("hf_local", False))
            contrib = contrib * (1.0 - occ)[..., None]
        elif light.get("has_shadow") and light.get("shadow") is not None:
            sd = light["shadow"]
            s = sample_cube_shadow(to_pos, sd["faces"], light["range"],
                                   sd["strength_r"], sd["bias"])
            contrib = contrib * s[..., None]
        rgb += contrib * (dist <= light["range"])[..., None]

    for light in inp.spot_lights:
        to_pos = world_j - np.asarray(light["position"])
        dist = np.linalg.norm(to_pos, axis=-1)
        ldir = to_pos / np.maximum(dist, 1e-9)[..., None]
        ldirn = np.asarray(light["direction"])
        cos_a = ldir @ ldirn
        cos_outer = math.cos(light["spot_angle"] / 2.0)
        cos_inner = math.cos(light["inner_angle_percent"] * light["spot_angle"] / 2.0)
        keep = (dist <= light["range"]) & (cos_a >= cos_outer)
        cone = 1.0 - smoothstep(cos_inner, cos_outer, cos_a)
        fall = cone * attenuation_lut(dist * dist / light["range"] ** 2) \
            * light.get("intensity_multiplier", 1.0)
        cos_t = np.sum(vdj * (-ldir), axis=-1)
        contrib = (phase_hg(g, cos_t) * fall)[..., None] \
            * np.asarray(light["color_packed"]) * sigma_s
        if light.get("has_shadow") and inp.shadow_mode in ("raycast", "map_dir") \
                and inp.geometry is not None:
            occ = occluded_raycast(inp.geometry, world_j, -ldir, dist - 0.05,
                                   include_heightfield=inp.geometry.get("hf_local", False))
            contrib = contrib * (1.0 - occ)[..., None]
        elif light.get("has_shadow") and light.get("shadow") is not None:
            sd = light["shadow"]
            s = sample_spot_shadow(world_j, sd["map"], np.asarray(light["position"]),
                                   sd["axes"], sd["tan_half"], light["range"],
                                   sd["strength_r"], sd["bias"])
            contrib = contrib * s[..., None]
        rgb += contrib * keep[..., None]

    return np.concatenate([rgb, ext[..., None]], axis=-1)


def _accumulate(inp, p, jitter, scatter):
    """Sequential per-slice loop (the reference's Accumulation shape with the
    SPEC's clean 0..D-1 indexing)."""
    w, h, d = inp.grid
    acc = np.zeros((d, h, w, 4))
    acc_l = np.zeros((h, w, 3))
    acc_t = np.ones((h, w))
    prev_z = inp.near
    for i in range(d):
        fz = i + 0.5
        z_center = (p.pz ** (fz / d) - 1.0) * p.pw + p.near
        step = z_center - prev_z
        prev_z = z_center
        # jittered trilinear fetch of the scatter volume at this slice
        xs, ys = np.meshgrid(np.arange(w, dtype=np.float64),
                             np.arange(h, dtype=np.float64), indexing="xy")
        texel = np.stack([xs + jitter[0], ys + jitter[1],
                          np.full_like(xs, i + jitter[2])], axis=-1)
        sample = trilinear(scatter, texel)
        acc_l, acc_t = scatter_step(acc_l, acc_t, sample[..., :3],
                                    sample[..., 3], np.float64(step))
        acc[i, ..., :3] = acc_l
        acc[i, ..., 3] = acc_t
    return acc


def _reproject(inp, p, v2w, prev_w2v, jitter, eps):
    w, h, d = inp.grid
    centers = froxel_centers(inp.grid)
    world = froxel_to_world(p, v2w, centers)
    prev_pos = world_to_froxel(p, prev_w2v, world)
    if jitter is not None:
        prev_pos = prev_pos + jitter
    dims = np.array([w, h, d], np.float64)
    uvw = prev_pos / dims + eps
    texel = uvw * dims - 0.5
    ok = ((uvw[..., 0] >= 0) & (uvw[..., 0] <= 1)
          & (uvw[..., 1] >= 0) & (uvw[..., 1] <= 1)).astype(np.float64)
    return texel, ok


def render_frame_oracle(inp: OracleFrameInput) -> dict:
    """Full frame; returns dict of volumes + image, mirroring the frame loop
    order (SURVEY §3.2-3.3)."""
    p = make_params(inp.fov_y, inp.aspect, inp.near, inp.volume_distance,
                    inp.depth_distribution, inp.grid)
    v2w = look_at_matrix(inp.camera_pos, inp.camera_forward, inp.camera_up)
    w2v = invert_rigid(v2w)
    jitter = jitter_sequence()[inp.frame_count % 7]
    history_valid = 1.0 if inp.frame_count > 0 else 0.0
    alpha = inp.temporal_blend_alpha * history_valid
    prev_w2v = w2v if inp.use_current_matrix_for_reproj else (
        inp.prev_world_to_view if inp.prev_world_to_view is not None else np.eye(4))

    def sample_prev(vol, texel):
        if inp.reproj_impl == "gather":
            return trilinear(vol, texel)
        return windowed_warp(vol, texel, inp.reproj_window)

    mat_a, mat_b = _material_volumes(inp, p, v2w, jitter)
    if inp.temporal_blend_material and inp.prev_material_a is not None:
        texel, ok = _reproject(inp, p, v2w, prev_w2v, None, 0.0)
        prev = sample_prev(inp.prev_material_a, texel)
        mat_a = mat_a + (prev - mat_a) * (alpha * ok)[..., None]

    shadow_vol = _shadow_volume(inp, p, v2w, jitter)
    if inp.temporal_blend_shadow and inp.prev_shadow is not None:
        texel, ok = _reproject(inp, p, v2w, prev_w2v, jitter, 1e-4)
        for i in range(shadow_vol.shape[0]):
            prev = sample_prev(inp.prev_shadow[i], texel)
            shadow_vol[i] = shadow_vol[i] + (prev - shadow_vol[i]) * (alpha * ok)

    scatter = _scatter_volume(inp, p, v2w, jitter, mat_a, mat_b, shadow_vol)
    if inp.temporal_blend_scatter and inp.prev_scatter is not None:
        texel, ok = _reproject(inp, p, v2w, prev_w2v, None, 0.0)
        prev = sample_prev(inp.prev_scatter, texel)
        scatter = scatter + (prev - scatter) * (alpha * ok)[..., None]

    acc = _accumulate(inp, p, jitter, scatter)
    if inp.temporal_blend_accumulation and inp.prev_accumulation is not None:
        texel, _ = _reproject(inp, p, v2w, prev_w2v, None, 0.0)
        prev = sample_prev(inp.prev_accumulation, texel)
        ok = (prev[..., 3] != 0.0).astype(np.float64)
        acc = acc + (prev - acc) * (alpha * ok)[..., None]

    out = dict(material_a=mat_a, material_b=mat_b, shadow=shadow_vol,
               scatter=scatter, accumulation=acc, world_to_view=w2v)

    if inp.scene_color is not None and inp.view_depth is not None:
        w, h, d = inp.grid
        ih, iw = inp.view_depth.shape
        u = (np.arange(iw) + 0.5) / iw
        v = (np.arange(ih) + 0.5) / ih
        fx = np.broadcast_to(u * w, (ih, iw)) - 0.5
        fy = np.broadcast_to((v * h)[:, None], (ih, iw)) - 0.5
        fz = depth_to_froxel_z(p, inp.view_depth.astype(np.float64)) - 0.5
        texel = np.stack([fx, fy, fz], axis=-1)
        a = trilinear(acc, texel)
        trans = a[..., 3:4]
        rgb = inp.scene_color * trans + a[..., :3]
        out["image"] = np.concatenate([rgb, trans], axis=-1)
    return out
