"""Bake-time TPU triangle rasterizer for the mesh G-buffer.

The reference gets its G-buffer (scene color + _CameraDepthTexture) from
Unity's rasterizer and deferred pass (Internal-DeferredShading.shader;
VolumetricRenderer.cs:104-121 consumes it). The froxel pipeline treats those
as per-frame INPUTS, so this rasterizer runs at scene-bake rate, not frame
rate — it is deliberately a brute-force, TPU-shaped formulation:

- every triangle is tested against every pixel with screen-space edge
  functions (pure broadcasted FMAs over the [H, W] pixel grid — no gathers,
  no sorting, no variable-length tile lists, nothing data-dependent);
- a `lax.scan` over fixed-size triangle chunks keeps the peak memory at
  [K, H, W] while the z-buffer/attribute carry does the depth resolve;
- perspective-correct depth comes from interpolating 1/z with the
  screen-space barycentrics (exact for the linear-in-screen-space 1/z).

A hierarchical binned rasterizer would be faster per bake but needs
per-tile triangle lists (dynamic shapes / gathers — everything XLA punishes);
at ~1e4 triangles x 2M pixels the dense form is a one-off ~1 s bake on the
v5e and runs identically (slowly) on the CPU test backend at test sizes.

Projection matches ops/raycast.camera_rays exactly (same tan-scaled view
dirs, pixel centers, bottom-left v origin), so `depth` composites 1:1 with
the analytic raycast G-buffer: both report linear view-space z and
`camera_pos + dir * depth` reconstructs the same world point the composite
uses (VolumetricRenderer.cs:660-672).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu import froxel

BIG = 1e9          # no-hit depth, matches ops/raycast.BIG
_Z_EPS = 1e-3      # near-clip guard: triangles with any vertex at/behind the
                   # camera plane are dropped whole (conservative; proper
                   # frustum clipping would split triangles — not needed for
                   # bake-time environment content behind the camera)


def rasterize_mesh(mesh, camera, width: int, height: int, chunk: int = 8
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Rasterize a TriMesh through `camera` at width x height.

    Returns (albedo [H, W, 3], normal [H, W, 3] world-space unit — the face
    normal of the winning triangle, NOT flipped toward the camera — and
    depth [H, W] linear view z, BIG where no triangle covers the pixel).
    Triangles are double-sided (either winding rasterizes: the reference's
    foliage is alpha-tested double-sided, TreeLeaves.shader)."""
    verts = mesh.verts.astype(jnp.float32)
    tris = mesh.tris
    t_alb = mesh.albedo.astype(jnp.float32)
    n_tris = int(tris.shape[0])

    w2v = camera.world_to_view()
    tan_y = jnp.tan(camera.fov_y / 2.0)
    tan_x = tan_y * camera.aspect

    # --- per-triangle setup (vectorized over T; the verts[tris] gather runs
    # once per bake on [T, 3] indices — nowhere near the frame path) ---
    tv = jnp.take(verts, tris.reshape(-1), axis=0).reshape(n_tris, 3, 3)
    pv = froxel.transform_points(w2v, tv.reshape(-1, 3)).reshape(n_tris, 3, 3)
    z = pv[:, :, 2]                                   # [T, 3] view z
    # pixel coords of each vertex (camera_rays inverse: u = (x/(z tanx)+1)/2)
    sx = ((pv[:, :, 0] / (z * tan_x) + 1.0) * 0.5) * width - 0.5
    sy = ((pv[:, :, 1] / (z * tan_y) + 1.0) * 0.5) * height - 0.5
    inv_z = 1.0 / z
    # world-space face normal (shading flips it toward the camera per pixel)
    e1 = tv[:, 1] - tv[:, 0]
    e2 = tv[:, 2] - tv[:, 0]
    nrm = jnp.cross(e1, e2)
    nrm = nrm / jnp.maximum(
        jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
    area2 = ((sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0])
             - (sy[:, 1] - sy[:, 0]) * (sx[:, 2] - sx[:, 0]))
    valid = (jnp.min(z, axis=1) > _Z_EPS) & (jnp.abs(area2) > 1e-8)
    inv_area = jnp.where(valid, 1.0 / jnp.where(valid, area2, 1.0), 0.0)

    # pad to a chunk multiple with invalid triangles
    n_pad = (-n_tris) % chunk
    pad1 = lambda a: jnp.concatenate(
        [a, jnp.zeros((n_pad,) + a.shape[1:], a.dtype)]) if n_pad else a
    sx, sy, inv_z, inv_area = map(pad1, (sx, sy, inv_z, inv_area))
    t_alb, nrm = pad1(t_alb), pad1(nrm)
    valid = jnp.concatenate([valid, jnp.zeros((n_pad,), bool)]) \
        if n_pad else valid
    n_chunks = (n_tris + n_pad) // chunk
    resh = lambda a: a.reshape((n_chunks, chunk) + a.shape[1:])
    xs = tuple(map(resh, (sx, sy, inv_z, inv_area, t_alb, nrm,
                          valid.astype(jnp.float32))))

    px = (jnp.arange(width, dtype=jnp.float32))[None, :]     # [1, W]
    py = (jnp.arange(height, dtype=jnp.float32))[:, None]    # [H, 1]

    def body(carry, x):
        depth_c, alb_c, nrm_c = carry
        csx, csy, ciz, cia, calb, cnrm, cval = x
        b = lambda a: a[:, None, None]                       # [K] -> [K,1,1]
        x0, x1, x2 = b(csx[:, 0]), b(csx[:, 1]), b(csx[:, 2])
        y0, y1, y2 = b(csy[:, 0]), b(csy[:, 1]), b(csy[:, 2])
        # normalized barycentrics (divide by SIGNED area: both windings give
        # all-nonnegative weights inside — double-sided for free)
        ia = b(cia)
        w0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) * ia
        w1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) * ia
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0) & (b(cval) > 0.0)
        izp = (w0 * b(ciz[:, 0]) + w1 * b(ciz[:, 1]) + w2 * b(ciz[:, 2]))
        zp = 1.0 / jnp.maximum(izp, 1.0 / BIG)
        zc = jnp.where(inside, zp, BIG)                      # [K, H, W]
        zmin = jnp.min(zc, axis=0)                           # [H, W]
        sel = (zc <= zmin[None]) & (zc < BIG)
        # break exact-depth ties to the first triangle so sel is one-hot
        sel &= jnp.cumsum(sel.astype(jnp.int32), axis=0) <= 1
        self32 = sel.astype(jnp.float32)
        alb_n = jnp.zeros(zmin.shape + (3,), jnp.float32)
        nrm_n = jnp.zeros(zmin.shape + (3,), jnp.float32)
        for kk in range(chunk):   # K static FMAs — no tiny-dot MXU rounding
            alb_n = alb_n + self32[kk][..., None] * calb[kk]
            nrm_n = nrm_n + self32[kk][..., None] * cnrm[kk]
        win = zmin < depth_c
        depth_c = jnp.where(win, zmin, depth_c)
        alb_c = jnp.where(win[..., None], alb_n, alb_c)
        nrm_c = jnp.where(win[..., None], nrm_n, nrm_c)
        return (depth_c, alb_c, nrm_c), None

    init = (jnp.full((height, width), BIG, jnp.float32),
            jnp.zeros((height, width, 3), jnp.float32),
            jnp.zeros((height, width, 3), jnp.float32))
    (depth, albedo, normal), _ = jax.lax.scan(body, init, xs)
    return albedo, normal, depth


def shade_mesh_gbuffer(albedo, normal, depth, camera_pos, ray_dirs, geom,
                       sun_dir, sun_color, ambient, shadow_bias: float = 1.0
                       ) -> Tuple[jax.Array, jax.Array]:
    """Lambert-shade a rasterized G-buffer the same way the analytic pass
    shades its hits (ops/raycast.render_scene): flat albedo, N.L sun with an
    any-hit shadow ray against the ANALYTIC occluder set — the mesh's own
    shadow comes from its voxelized proxy boxes (models/tree_assets.py), so
    mesh pixels and froxel shadows agree on the same occluders.

    shadow_bias: meters the shadow ray starts toward the sun. A mesh surface
    point sits just INSIDE its own voxel-proxy hull, so an unbiased ray
    always self-hits and the whole canopy goes black; skipping the first
    ~1 m reproduces what alpha-tested shadow maps get from their depth bias
    (sun-facing leaves lit, leaves deeper in the canopy shadowed).

    Returns (color [H, W, 3], hit [H, W] bool)."""
    from volumetricrenderer_tpu.ops import raycast

    hit = depth < BIG
    # double-sided: face the normal toward the camera (foliage planes render
    # from both sides; TreeLeaves.shader is alpha-tested double-sided)
    facing = jnp.sum(normal * ray_dirs, axis=-1, keepdims=True)
    n = normal * jnp.where(facing > 0.0, -1.0, 1.0)
    hitp = camera_pos + jnp.minimum(depth, 1e8)[..., None] * ray_dirs
    # |N.L|: double-sided translucent foliage — a leaf lit from behind
    # transmits (TreeLeaves.shader renders both faces; one-sided Lambert
    # blacks out the half of the canopy whose cards face away from the sun)
    ndl = jnp.abs(jnp.sum(n * (-sun_dir), axis=-1))
    start = hitp + n * 1e-2 - sun_dir * shadow_bias
    shadow_t, _, _ = raycast.intersect(geom, start, -sun_dir)
    lit = (shadow_t >= raycast.BIG).astype(jnp.float32)
    color = albedo * (ambient + sun_color * (ndl * lit)[..., None])
    return color, hit
