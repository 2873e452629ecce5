"""The render passes — TPU-native equivalents of the reference's 14 GPU kernels.

Each pass is a pure function over [D, H, W] froxel arrays; XLA fuses the
elementwise bodies. The reference's dispatch bookkeeping (InitAllVolumes /
SaveHistory, VolumetricCompute.compute:23-40) disappears: volumes are fresh
functional values, history is last frame's pytree.

Kernel map (reference -> here):
  WriteMaterialVolumeConstant[_WITH_NOISE] (compute:45-58) -> write_material_volumes
  WriteShadowVolumeDir (VolumetricShadowCompute.compute:9-19) -> write_shadow_volume_dir
  WriteScatterVolumeDir/Point/Spot (compute:64-167)          -> write_scatter_volume
  Accumulation (compute:172-200)                             -> accumulate
  TemporalBlend* (compute:205-258)                           -> temporal_blend_*
  composite blit (VolumetricRenderer.shader:69-93)           -> composite
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu import froxel, shadow as shadow_lib
from volumetricrenderer_tpu.config import RenderConfig
from volumetricrenderer_tpu.froxel import FroxelParams
from volumetricrenderer_tpu.models.geometry import Geometry
from volumetricrenderer_tpu.models.lights import DirectionalLights, PointLights, SpotLights
from volumetricrenderer_tpu.models.media import ADDITIVE, BOX, Medium
from volumetricrenderer_tpu.ops import raycast
from volumetricrenderer_tpu.ops.falloff import point_light_falloff, spot_light_falloff
from volumetricrenderer_tpu.ops.phase import henyey_greenstein, rgb_to_gray, smoothstep
from volumetricrenderer_tpu.ops.sampling import (shift_sample_3d,
                                                 trilinear_sample_3d)
from volumetricrenderer_tpu.ops.warp import windowed_warp_sample_3d
from volumetricrenderer_tpu.ops.scatter_scan import accumulate_blocked


# --------------------------------------------------------------------------- #
# Shared per-frame geometry
# --------------------------------------------------------------------------- #

def froxel_world_positions(cfg: RenderConfig, params: FroxelParams,
                           view_to_world: jax.Array,
                           jitter: Optional[jax.Array]) -> jax.Array:
    """World position of every froxel center [D, H, W, 3], optionally jittered
    (JitterFroxelPos, helper:115-122).

    cfg.grid gives the LOCAL array shape; params.grid the GLOBAL grid. Under
    H-sharded rendering the local rows map to global rows y0 + i, clamped to
    the grid (halo rows at the global edges replicate the edge row — the same
    values the clamp sampler would produce)."""
    centers = froxel.froxel_centers(cfg.grid)
    if not (isinstance(params.y0, (int, float)) and params.y0 == 0):
        h_glob = params.grid[1]
        cy = jnp.clip(centers[..., 1] + params.y0, 0.5, h_glob - 0.5)
        centers = jnp.concatenate([centers[..., :1], cy[..., None],
                                   centers[..., 2:]], axis=-1)
    if jitter is not None:
        centers = centers + jitter
    return froxel.froxel_to_world(params, view_to_world, centers)


def step_lengths(cfg: RenderConfig, params: FroxelParams) -> jax.Array:
    """Per-slice view-space dz [D]: step_i = view_z(i+0.5) - view_z(i-0.5) for
    i >= 1 (compute:193-195), step_0 = view_z(0.5) - near (SPEC: the reference
    never integrates slice 0)."""
    d = cfg.volume_depth
    centers = jnp.arange(d, dtype=jnp.float32) + 0.5
    zc = froxel.froxel_z_to_view_z(params, centers)
    prev = jnp.concatenate([params.near[None], zc[:-1]])
    return zc - prev


# --------------------------------------------------------------------------- #
# Material volume (media injection)
# --------------------------------------------------------------------------- #

def _sample_noise(medium: Medium, world_pos: jax.Array, time_x) -> jax.Array:
    """Noise factor at jittered world pos: uvw = worldPos*tiling + scroll*time_x
    (compute:51-58). Texture mode wrap-samples noise_tex (gather); procedural
    mode evaluates the same tileable Perlin directly (elementwise, no gather —
    the TPU fast path)."""
    uvw = world_pos * medium.noise_tiling + medium.noise_scroll * time_x
    if medium.noise_mode == "procedural":
        from volumetricrenderer_tpu.ops.noise import perlin_3d
        return perlin_3d(uvw, octaves=medium.noise_octaves,
                         period=medium.noise_period, seed=medium.noise_seed)
    nz, ny, nx = medium.noise_tex.shape
    texel = jnp.stack([uvw[..., 0] * nx - 0.5, uvw[..., 1] * ny - 0.5,
                       uvw[..., 2] * nz - 0.5], axis=-1)
    return trilinear_sample_3d(medium.noise_tex, texel, wrap=True)


def _sample_noise_lowres(cfg: RenderConfig, params: FroxelParams,
                         view_to_world: jax.Array, jitter: jax.Array,
                         medium: Medium, time_x, ss: int) -> jax.Array:
    """Texture-mode noise factor [D, H, W] sampled at 1/ss^3 froxel rate and
    tent-upsampled (exact separable matmuls, MXU) — amortizes the per-froxel
    wrap-trilinear gathers exactly like the baked visibility volumes
    (ops/pallas/visibility.py coordinate contract)."""
    from volumetricrenderer_tpu.ops.pallas.visibility import (
        low_res_world_positions, upsample_mats, upsample_mats_y)

    d, h, w = cfg.grid_dhw
    world = low_res_world_positions(cfg, params, view_to_world, jitter, ss)
    low = _sample_noise(medium, world, time_x)             # [DL, HL, WL]
    az = jnp.asarray(upsample_mats(d, low.shape[0], ss))
    # Y carries the slab phase like the sample positions do (visibility.py
    # module docstring) — identical to the static mats at y0 = 0, and kept
    # in lockstep with low_res_world_positions for any future slab caller.
    ay = upsample_mats_y(h, low.shape[1], ss, params.y0)
    ax = jnp.asarray(upsample_mats(w, low.shape[2], ss))
    up = jnp.einsum("dk,khw->dhw", az, low,
                    precision=jax.lax.Precision.HIGHEST)
    up = jnp.einsum("hk,dkw->dhw", ay, up,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("wk,dhk->dhw", ax, up,
                      precision=jax.lax.Precision.HIGHEST)


def write_material_volumes(cfg: RenderConfig, params: FroxelParams,
                           view_to_world: jax.Array, jitter: jax.Array,
                           time_x, media: Sequence[Medium]
                           ) -> Tuple[jax.Array, jax.Array]:
    """Sequential fold over registered media (WriteMaterialVolume,
    VolumetricRenderer.cs:427-458). Returns (material_a [D,H,W,4] =
    (sigma_s rgb, sigma_a), material_b [D,H,W,4] = (g,0,0,0))."""
    d, h, w = cfg.grid_dhw
    mat_a = jnp.zeros((d, h, w, 4), jnp.float32)
    mat_b = jnp.zeros((d, h, w, 4), jnp.float32)

    world_j = froxel_world_positions(cfg, params, view_to_world, jitter) \
        if media else None
    # low-rate texture sampling needs whole-grid coordinates (no slab rows)
    tex_ss = max(int(cfg.texture_noise_subsample), 1) \
        if h == params.grid[1] else 1

    for medium in media:
        a_new = jnp.broadcast_to(
            jnp.concatenate([medium.scattering_coef,
                             medium.absorption_coef[None]]), (d, h, w, 4))
        b_new = jnp.broadcast_to(
            jnp.concatenate([medium.phase_g[None],
                             jnp.zeros((3,), jnp.float32)]), (d, h, w, 4))

        factor = jnp.ones((d, h, w), jnp.float32)
        if medium.noise_tex is not None or medium.noise_mode == "procedural":
            if (tex_ss > 1 and medium.noise_mode != "procedural"
                    and medium.noise_tex is not None):
                factor = factor * _sample_noise_lowres(
                    cfg, params, view_to_world, jitter, medium, time_x,
                    tex_ss)
            else:
                factor = factor * _sample_noise(medium, world_j, time_x)
        # Exponential height falloff (extension, BASELINE config 2).
        factor = factor * jnp.exp(-jnp.maximum(medium.height_falloff, 0.0)
                                  * jnp.maximum(world_j[..., 1] - medium.height_base, 0.0))
        a_new = a_new * factor[..., None]

        if medium.volume_type == BOX:
            # Soft-edged AABB membership (the reference declares Box but never
            # implements it, VolumetricRenderer.cs:451-452).
            soft = jnp.maximum(medium.box_softness, 1e-6)
            lo = jnp.min(smoothstep(medium.box_min, medium.box_min + soft, world_j), axis=-1)
            hi = jnp.min(smoothstep(-medium.box_max, -(medium.box_max - soft), -world_j), axis=-1)
            mask = lo * hi
        else:
            mask = jnp.ones((d, h, w), jnp.float32)

        if medium.blend_type == ADDITIVE:
            mat_a = mat_a + a_new * mask[..., None]
            mat_b = mat_b + b_new * mask[..., None]
        else:  # alpha/overwrite (the reference's effective behavior)
            mat_a = mat_a * (1.0 - mask[..., None]) + a_new * mask[..., None]
            mat_b = mat_b * (1.0 - mask[..., None]) + b_new * mask[..., None]

    return mat_a, mat_b


# --------------------------------------------------------------------------- #
# Shadow volume
# --------------------------------------------------------------------------- #

def write_shadow_volume_dir(cfg: RenderConfig, params: FroxelParams,
                            view_to_world: jax.Array, jitter: jax.Array,
                            dir_lights: DirectionalLights,
                            dir_shadow: Optional[shadow_lib.DirShadowData],
                            geometry: Optional[Geometry]) -> jax.Array:
    """Per-froxel directional visibility, squared (VolumetricShadowCompute:9-19).
    Returns [Nd, D, H, W] (one channel per dir light; the reference has a single
    volume — SURVEY quirk table)."""
    d, h, w = cfg.grid_dhw
    nd = max(dir_lights.count, 1)

    if (cfg.dir_shadow_impl == "pallas" and cfg.shadow_mode == "raycast"
            and geometry is not None and dir_lights.count > 0):
        from volumetricrenderer_tpu.ops.pallas.dir_shadow import \
            dir_shadow_pallas
        return dir_shadow_pallas(params, view_to_world, jitter, dir_lights,
                                 geometry, cfg.grid,
                                 interpret=jax.default_backend() != "tpu")

    if (cfg.dir_shadow_impl == "pallas"
            and cfg.shadow_mode in ("map", "map_dir")
            and dir_shadow is not None and dir_shadow.aligned
            and dir_lights.count > 0
            and dir_shadow.atlas.shape[-1] % 128 == 0):
        # the reference's cascaded-PCF technique at TPU speed: fused
        # windowed-gather sampler (ops/pallas/pcf_shadow.py); requires the
        # camera-aligned bake (renderer passes align_up when this impl is on)
        from volumetricrenderer_tpu.ops.pallas.pcf_shadow import \
            pcf_dir_shadow_pallas
        interp = jax.default_backend() != "tpu"
        ssd = max(int(cfg.dir_shadow_subsample), 1)
        if ssd > 1 and w % ssd == 0 and d % ssd == 0:
            # low-rate PCF: the SAME kernel + schedule on grid (W/N, H, D/N)
            # with jitter (jx/N, jy, jz/N) and params.grid[2] scaled samples
            # exactly the upsample_mats low-rate positions (config.py
            # dir_shadow_subsample) — then an exact x-tent matmul + z-lerp
            # restores the full-rate volume for the blend/scatter consumers.
            import dataclasses as _dc

            from volumetricrenderer_tpu.ops.pallas.visibility import \
                upsample_mats
            wl, dl = w // ssd, d // ssd
            params_l = _dc.replace(params,
                                   grid=(params.grid[0], params.grid[1], dl))
            jit_l = jitter * jnp.asarray([1.0 / ssd, 1.0, 1.0 / ssd],
                                         jnp.float32)
            low = pcf_dir_shadow_pallas(params_l, view_to_world, jit_l,
                                        dir_lights, dir_shadow, (wl, h, dl),
                                        interpret=interp)   # [Nd, DL, H, WL]
            # z-lerp on the low-x volume first (smaller), then the x-tent
            import numpy as _np
            u = (_np.arange(d) - (ssd - 1) * 0.5) / ssd
            ka = _np.clip(_np.floor(u).astype(_np.int64), 0, dl - 1)
            t = _np.clip(u - ka, 0.0, 1.0).astype(_np.float32)
            kb = _np.minimum(ka + 1, dl - 1)
            la = jnp.take(low, jnp.asarray(ka), axis=1)
            lb = jnp.take(low, jnp.asarray(kb), axis=1)
            full_z = la + jnp.asarray(t)[None, :, None, None] * (lb - la)
            axt = jnp.asarray(upsample_mats(w, wl, ssd).T)     # [WL, W]
            return jnp.matmul(full_z, axt,
                              precision=jax.lax.Precision.HIGHEST)
        return pcf_dir_shadow_pallas(params, view_to_world, jitter,
                                     dir_lights, dir_shadow, cfg.grid,
                                     interpret=interp)

    world_j = froxel_world_positions(cfg, params, view_to_world, jitter)

    channels = []
    for i in range(dir_lights.count):
        if cfg.shadow_mode == "raycast" and geometry is not None:
            occ = raycast.occluded(geometry, world_j, -dir_lights.direction[i],
                                   jnp.asarray(1e4, jnp.float32))
            strength_r = 1.0 - dir_lights.shadow_strength[i]
            vis = strength_r + (1.0 - strength_r) * (1.0 - occ)
        else:
            vis = shadow_lib.sample_dir_shadow(dir_shadow, i, world_j)
        vis = vis * vis                       # shadowCompute:17 — contrast boost
        # gate arithmetic (see shadow_ray): vis -> 1 when has_shadow is False
        g = dir_lights.has_shadow[i].astype(jnp.float32)
        channels.append(1.0 + g * (vis - 1.0))
    while len(channels) < nd:
        channels.append(jnp.ones((d, h, w), jnp.float32))
    return jnp.stack(channels)


# --------------------------------------------------------------------------- #
# Scatter volume (per-light in-scattering, additive)
# --------------------------------------------------------------------------- #

def write_scatter_volume(cfg: RenderConfig, params: FroxelParams,
                         view_to_world: jax.Array, camera_pos: jax.Array,
                         jitter: jax.Array, material_a: jax.Array,
                         material_b: jax.Array, shadow_volume: jax.Array,
                         dir_lights: DirectionalLights,
                         point_lights: PointLights, spot_lights: SpotLights,
                         cube_shadow: Optional[shadow_lib.CubeShadowData],
                         spot_shadow: Optional[shadow_lib.SpotShadowData],
                         geometry: Optional[Geometry] = None,
                         return_planes: bool = False,
                         media: Sequence[Medium] = (), time_x=0.0):
    """Sum of all light contributions -> [D, H, W, 4] (L rgb, sigma_t).

    The reference's one-dispatch-per-light `+=` (compute:64-167) becomes a
    masked sum — same additive decomposition, order-independent."""
    d, h, w = cfg.grid_dhw
    sigma_s = material_a[..., :3]
    sigma_a = material_a[..., 3]
    phase_g = material_b[..., 0]

    world_c = froxel_world_positions(cfg, params, view_to_world, None)
    world_j = froxel_world_positions(cfg, params, view_to_world, jitter)

    # Optional reduced-rate local shadow rays (cfg.raycast_shadow_subsample):
    # occlusion computed on a subsampled XY grid, nearest-upsampled back.
    ss = max(int(cfg.raycast_shadow_subsample), 1)

    def shadow_ray(light_pos, has_shadow):
        wp = world_j[:, ::ss, ::ss] if ss > 1 else world_j
        to_pos = wp - light_pos
        d2s = froxel.dot3(to_pos, to_pos)
        inv = jax.lax.rsqrt(d2s + 1e-18)
        occ = raycast.occluded(geometry, wp, -(to_pos * inv[..., None]),
                               d2s * inv - 0.05,
                               include_heightfield=cfg.heightfield_local_shadows)
        if ss > 1:
            occ = jnp.repeat(jnp.repeat(occ, ss, axis=1), ss, axis=2)
            occ = occ[:, :h, :w]
        # gate arithmetic, not jnp.where: a traced-bool select materializes a
        # full volume per light (~0.46 ms each x 16 lights, traced)
        return 1.0 - occ * has_shadow.astype(jnp.float32)

    light_rgb = jnp.zeros((d, h, w, 3), jnp.float32)
    extinction = jnp.zeros((d, h, w), jnp.float32)

    local_raycast = cfg.shadow_mode in ("raycast", "map_dir")
    n_local = point_lights.count + spot_lights.count

    # Local-light shadow source for the fused kernel (VERDICT r2 #1):
    #   - ss == 1, raycast: exact in-kernel any-hit march (round-2 path).
    #   - ss > 1, raycast: per-light visibility baked at 1/ss^3 rate
    #     (ops/pallas/visibility.py) and tent-upsampled in-kernel — the
    #     TPU-native equivalent of the reference's shadow-map amortization,
    #     and the proper implementation of the raycast_shadow_subsample knob
    #     on the fused path (it previously forced the XLA fallback).
    #   - map mode: the cube/spot MAPS sampled into the same low-res volume
    #     (1/ss^3 of the gathers; full-rate map sampling is the documented
    #     ~2.5 s/frame parity path) — ss floors at 2 here to bound the
    #     gather count and the kernel's VMEM blocks.
    vis_mode = None
    if cfg.scatter_impl == "pallas" and n_local > 0:
        if local_raycast and geometry is not None and ss > 1:
            vis_mode = ("raycast", ss)
        elif (cfg.shadow_mode == "map" and geometry is not None
              and (cube_shadow is not None or spot_shadow is not None)):
            vis_mode = ("map", max(ss, 2))
    use_pallas_scatter = (
        cfg.scatter_impl == "pallas" and n_local > 0
        and ((local_raycast and geometry is not None and ss == 1)
             or vis_mode is not None))
    # Fold the material evaluation into the kernel too (material_impl =
    # "fused"): the material volumes then never touch HBM — XLA DCEs the
    # whole write_material_volumes pass when nothing else consumes it.
    if cfg.material_impl == "fused" and use_pallas_scatter and media \
            and not cfg.temporal_blend_material:
        from volumetricrenderer_tpu.ops.pallas.material import media_foldable
        use_fused_material = media_foldable(media)
    else:
        use_fused_material = False

    # Directional (compute:64-85): NOT jittered by default (quirk, compute:67).
    # The rgb part folds into the fused kernel when it runs; the luma
    # extinction (compute:82) is pure elementwise on the material and stays
    # here unless the material itself is folded in.
    if not use_fused_material:
        for i in range(dir_lights.count):
            extinction = extinction + rgb_to_gray(sigma_s) + sigma_a

    if not use_pallas_scatter:
        wp_dir = world_j if cfg.jitter_dir_scatter else world_c
        dir_colors = dir_lights.packed_color
        vd0 = wp_dir - camera_pos
        view_dir0 = vd0 * jax.lax.rsqrt(froxel.dot3(vd0, vd0) + 1e-18)[..., None]
        for i in range(dir_lights.count):
            cos_theta = froxel.dot3(view_dir0, -dir_lights.direction[i])
            vis = shadow_volume[i]
            hg = henyey_greenstein(phase_g, cos_theta)
            light_rgb = light_rgb + (vis * hg)[..., None] * dir_colors[i] * sigma_s

    if use_pallas_scatter:
        from volumetricrenderer_tpu.ops.pallas.scatter import scatter_local_pallas
        interp = jax.default_backend() != "tpu"
        vis = None
        vis_ss = 1
        # "radiance" bake needs the media model for low-rate phase g; with no
        # media the g source is ambiguous (material volumes may come from
        # elsewhere) -> keep the per-light visibility bake.
        radiance = cfg.scatter_bake == "radiance" and bool(media)
        # the fBm channels only pay off when the scatter evaluates material
        # in-kernel (noise_planes feeds material_planes)
        bk_noise = bool(cfg.bake_procedural_noise and use_fused_material)
        if vis_mode is not None:
            from volumetricrenderer_tpu.ops.pallas import visibility as vis_lib
            source, vis_ss = vis_mode
            if source == "raycast":
                if radiance:
                    vis = vis_lib.bake_radiance_pallas(
                        params, view_to_world, camera_pos, jitter,
                        point_lights, spot_lights, geometry, media, time_x,
                        cfg.grid, vis_ss, interpret=interp,
                        heightfield_shadows=cfg.heightfield_local_shadows,
                        bake_noise=bk_noise)
                else:
                    vis = vis_lib.bake_visibility_pallas(
                        params, view_to_world, camera_pos, jitter,
                        point_lights, spot_lights, geometry, cfg.grid, vis_ss,
                        interpret=interp,
                        heightfield_shadows=cfg.heightfield_local_shadows)
            else:
                if radiance:
                    vis = vis_lib.bake_radiance_from_maps(
                        cfg, params, view_to_world, camera_pos, jitter,
                        point_lights, spot_lights, cube_shadow, spot_shadow,
                        media, time_x, vis_ss, bake_noise=bk_noise)
                else:
                    vis = vis_lib.bake_visibility_from_maps(
                        cfg, params, view_to_world, jitter, point_lights,
                        spot_lights, cube_shadow, spot_shadow, vis_ss)
        outs = scatter_local_pallas(
            params, view_to_world, camera_pos, jitter, material_a, material_b,
            point_lights, spot_lights, geometry, cfg.grid,
            dir_lights=dir_lights, shadow_volume=shadow_volume,
            jitter_dir=cfg.jitter_dir_scatter,
            interpret=interp, return_planes=True,
            media=media if use_fused_material else None, time_x=time_x,
            heightfield_shadows=cfg.heightfield_local_shadows,
            vis=vis, vis_ss=vis_ss,
            vis_radiance=radiance and vis is not None)
        if use_fused_material:
            pr, pg, pb, extinction = outs
        else:
            pr, pg, pb = outs
        vol4 = jnp.concatenate(
            [jnp.stack([pr, pg, pb], axis=-1), extinction[..., None]], axis=-1)
        if return_planes:
            # raw kernel planes: lets accumulate's fused kernel consume them
            # without the channel-interleave copy (vol4 is kept for aux /
            # blends and DCEd when unused)
            return vol4, (pr, pg, pb, extinction)
        return vol4

    # Point (compute:87-126): jittered pos, range cull, LUT falloff, ext = 0.
    # rsqrt-based normalization: jnp.linalg.norm's sqrt+div pair costs more
    # than one rsqrt on the VPU, and this runs per light per froxel.
    vdj = world_j - camera_pos
    view_dir_j = vdj * jax.lax.rsqrt(froxel.dot3(vdj, vdj) + 1e-18)[..., None]
    point_colors = point_lights.packed_color
    for i in range(point_lights.count):
        to_pos = world_j - point_lights.position[i]
        d2 = froxel.dot3(to_pos, to_pos)
        inv_d = jax.lax.rsqrt(d2 + 1e-18)
        dist = d2 * inv_d
        in_range = dist <= point_lights.range[i]
        ldir = to_pos * inv_d[..., None]
        falloff = point_light_falloff(dist, point_lights.range[i],
                                      point_lights.intensity_multiplier[i])
        cos_theta = jnp.sum(view_dir_j * (-ldir), axis=-1)
        hg = henyey_greenstein(phase_g, cos_theta)
        contrib = (hg * falloff)[..., None] * point_colors[i] * sigma_s
        if local_raycast and geometry is not None:
            s = shadow_ray(point_lights.position[i], point_lights.has_shadow[i])
            contrib = contrib * s[..., None]
        elif cube_shadow is not None:
            s = shadow_lib.sample_cube_shadow(cube_shadow, i, to_pos)
            g = point_lights.has_shadow[i].astype(jnp.float32)
            contrib = contrib * (1.0 + g * (s - 1.0))[..., None]
        light_rgb = light_rgb + contrib * in_range[..., None]

    # Spot (compute:128-167): adds cone cull + smoothstep cone falloff, ext = 0.
    spot_colors = spot_lights.packed_color
    for i in range(spot_lights.count):
        to_pos = world_j - spot_lights.position[i]
        d2 = froxel.dot3(to_pos, to_pos)
        inv_d = jax.lax.rsqrt(d2 + 1e-18)
        dist = d2 * inv_d
        ldir = to_pos * inv_d[..., None]
        cos_angle = froxel.dot3(ldir, spot_lights.direction[i])
        keep = (dist <= spot_lights.range[i]) & (cos_angle >= spot_lights.cos_outer_cone[i])
        cos_theta = jnp.sum(view_dir_j * (-ldir), axis=-1)
        falloff = spot_light_falloff(dist, cos_angle, spot_lights.range[i],
                                     spot_lights.cos_outer_cone[i],
                                     spot_lights.cos_inner_cone_rcp[i],
                                     spot_lights.intensity_multiplier[i])
        hg = henyey_greenstein(phase_g, cos_theta)
        contrib = (hg * falloff)[..., None] * spot_colors[i] * sigma_s
        if local_raycast and geometry is not None:
            s = shadow_ray(spot_lights.position[i], spot_lights.has_shadow[i])
            contrib = contrib * s[..., None]
        elif spot_shadow is not None:
            s = shadow_lib.sample_spot_shadow(spot_shadow, i, world_j)
            g = spot_lights.has_shadow[i].astype(jnp.float32)
            contrib = contrib * (1.0 + g * (s - 1.0))[..., None]
        light_rgb = light_rgb + contrib * keep[..., None]

    vol4 = jnp.concatenate([light_rgb, extinction[..., None]], axis=-1)
    if return_planes:
        return vol4, None
    return vol4


# --------------------------------------------------------------------------- #
# Accumulation (the scan)
# --------------------------------------------------------------------------- #

def accumulate(cfg: RenderConfig, params: FroxelParams, jitter: jax.Array,
               scatter: jax.Array, planes=None, return_planes: bool = False):
    """Front-to-back integration (compute:172-200) as an associative scan.

    The in-kernel trilinear fetch at the jittered froxel pos (compute:187-188)
    is a constant-offset stencil -> gather-free shift_sample_3d; with
    `accumulate_impl="pallas"` and scatter planes available, the sample and
    the scan fuse into one sequential Pallas pass (ops/pallas/integrate.py).

    return_planes=True additionally returns the (L_r, L_g, L_b, T) channel
    planes so the fused accumulation blend can consume them without the
    channel-interleave round-trip (the interleaved volume is DCEd if the
    blend's output is what the frame consumes)."""
    if cfg.accumulate_impl == "pallas" and planes is not None:
        from volumetricrenderer_tpu.ops.pallas.integrate import \
            accumulate_fused_pallas
        out_planes = accumulate_fused_pallas(
            planes, jitter, params, cfg.grid,
            interpret=jax.default_backend() != "tpu", return_planes=True)
        vol = jnp.concatenate([jnp.stack(out_planes[:3], axis=-1),
                               out_planes[3][..., None]], axis=-1)
    else:
        # Texel coord of jittered center i+0.5+j is i+j -> offset = jitter.
        sampled = shift_sample_3d(scatter, jitter)
        in_scatter = sampled[..., :3]
        extinction = sampled[..., 3]
        steps = step_lengths(cfg, params)
        vol = accumulate_blocked(in_scatter, extinction, steps)
        out_planes = None
    if return_planes:
        if out_planes is None:
            out_planes = tuple(vol[..., c] for c in range(4))
        return vol, out_planes
    return vol


# --------------------------------------------------------------------------- #
# Temporal blends
# --------------------------------------------------------------------------- #

def _reproject_texel(cfg: RenderConfig, params: FroxelParams,
                     view_to_world: jax.Array, prev_world_to_view: jax.Array,
                     jitter: Optional[jax.Array], uvw_epsilon: float
                     ) -> Tuple[jax.Array, jax.Array]:
    """Current froxel center -> previous-frame froxel pos.

    Returns (texel coords [D,H,W,3], xy reprojection success [D,H,W]).
    Froxel space (and the [0,1] success test) is GLOBAL; the returned texel's
    y is converted to LOCAL rows (minus params.y0) so history-volume sampling
    indexes the local (possibly halo'd) slab directly."""
    w, h, d = params.grid
    world = froxel_world_positions(cfg, params, view_to_world, None)
    prev_pos = froxel.world_to_froxel(params, prev_world_to_view, world)
    if jitter is not None:
        prev_pos = prev_pos + jitter
    dims = jnp.asarray([w, h, d], jnp.float32)
    uvw = prev_pos / dims + uvw_epsilon
    texel = uvw * dims - 0.5
    in01 = (uvw[..., 0] >= 0.0) & (uvw[..., 0] <= 1.0) \
        & (uvw[..., 1] >= 0.0) & (uvw[..., 1] <= 1.0)
    if not (isinstance(params.y0, (int, float)) and params.y0 == 0):
        texel = texel - jnp.stack([jnp.float32(0.0),
                                   jnp.asarray(params.y0, jnp.float32),
                                   jnp.float32(0.0)])
    return texel, in01.astype(jnp.float32)


def _sample_prev(cfg: RenderConfig, vol: jax.Array, texel: jax.Array
                 ) -> jax.Array:
    """History-volume resample at reprojected texel coords [D,H,W,3].

    "windowed": gather-free separable windowed warp (ops/warp.py) — the
    TPU-native path. "gather": joint trilinear via flat takes (reference-exact,
    used by the oracle-parity gather tests and on CPU)."""
    if cfg.reproj_impl == "gather":
        return trilinear_sample_3d(vol, texel)
    tx, ty, tz = texel[..., 0], texel[..., 1], texel[..., 2]
    if cfg.reproj_impl == "pallas":
        from volumetricrenderer_tpu.ops.pallas.warp import windowed_warp_pallas
        return windowed_warp_pallas(vol, tx, ty, tz, cfg.reproj_window,
                                    interpret=jax.default_backend() != "tpu")
    return windowed_warp_sample_3d(vol, tx, ty, tz, cfg.reproj_window)


def temporal_blend_shadow(cfg: RenderConfig, params: FroxelParams,
                          view_to_world: jax.Array, prev_world_to_view: jax.Array,
                          jitter: jax.Array, shadow_volume: jax.Array,
                          prev_shadow: jax.Array, alpha) -> jax.Array:
    """TemporalBlendShadowVolume (compute:205-219): reproject + jitter + the
    reference's 1e-4 uvw nudge; blend weight alpha * reprojSuccess."""
    nd = shadow_volume.shape[0]
    if cfg.reproj_impl == "pallas":
        # fully-fused blend: in-kernel reprojection texels + one-pass ring
        # warp + lerp — no coordinate volumes, one HBM read per history plane
        from volumetricrenderer_tpu.ops.pallas.temporal import \
            fused_temporal_blend
        outs = fused_temporal_blend(
            params, view_to_world, prev_world_to_view, jitter, alpha,
            tuple(prev_shadow[i] for i in range(nd)),
            tuple(shadow_volume[i] for i in range(nd)),
            cfg.grid, cfg.reproj_window, "weight", uvw_epsilon=1e-4,
            interpret=jax.default_backend() != "tpu")
        return jnp.stack(outs)
    texel, success = _reproject_texel(cfg, params, view_to_world,
                                      prev_world_to_view, jitter, 1e-4)
    out = []
    for i in range(nd):
        prev = _sample_prev(cfg, prev_shadow[i], texel)
        out.append(shadow_volume[i] + (prev - shadow_volume[i]) * (alpha * success))
    return jnp.stack(out)


def temporal_blend_scatter(cfg: RenderConfig, params: FroxelParams,
                           view_to_world: jax.Array, prev_world_to_view: jax.Array,
                           scatter: jax.Array, prev_scatter: jax.Array,
                           alpha) -> jax.Array:
    """TemporalBlendScatterVolume (compute:231-244) — a no-op in the reference
    (body commented out); enabled by cfg.temporal_blend_scatter. No jitter."""
    texel, success = _reproject_texel(cfg, params, view_to_world,
                                      prev_world_to_view, None, 0.0)
    prev = _sample_prev(cfg, prev_scatter, texel)
    return scatter + (prev - scatter) * (alpha * success)[..., None]


def temporal_blend_material(cfg: RenderConfig, params: FroxelParams,
                            view_to_world: jax.Array, prev_world_to_view: jax.Array,
                            material_a: jax.Array, prev_material_a: jax.Array,
                            alpha) -> jax.Array:
    """TemporalBlendMaterialVolume (compute:221-229) — reference no-op; enabled
    by cfg.temporal_blend_material."""
    texel, success = _reproject_texel(cfg, params, view_to_world,
                                      prev_world_to_view, None, 0.0)
    prev = _sample_prev(cfg, prev_material_a, texel)
    return material_a + (prev - material_a) * (alpha * success)[..., None]


def temporal_blend_accumulation(cfg: RenderConfig, params: FroxelParams,
                                view_to_world: jax.Array,
                                prev_world_to_view: jax.Array,
                                accumulation: jax.Array,
                                prev_accumulation: jax.Array, alpha,
                                planes=None, return_planes: bool = False,
                                padded_for=None):
    """TemporalBlendAccumulationVolume (compute:246-258): success test is
    prev.a != 0 (not the uv bound test). planes: the accumulation's channel
    planes (from accumulate(return_planes=True)) — lets the fused blend skip
    the pre-blend channel interleave. return_planes=True additionally
    returns the BLENDED channel planes (for the zgather composite);
    padded_for=(hp, wstride) makes those planes come out in the zgather
    padded layout (in-kernel edge fill; pallas path only)."""
    if cfg.reproj_impl == "pallas":
        from volumetricrenderer_tpu.ops.pallas.temporal import \
            fused_temporal_blend
        w, h, d = cfg.grid
        cur = planes if planes is not None \
            else tuple(accumulation[..., c] for c in range(4))
        prev = tuple(prev_accumulation[..., c] for c in range(4))
        outs = fused_temporal_blend(
            params, view_to_world, prev_world_to_view, None, alpha,
            prev, cur, cfg.grid, cfg.reproj_window, "alpha",
            interpret=jax.default_backend() != "tpu", padded_out=padded_for)
        if padded_for is not None:
            un = [o[:d, 1:h + 1, 1:w + 1] for o in outs]
        else:
            un = list(outs)
        vol = jnp.concatenate([jnp.stack(un[:3], axis=-1),
                               un[3][..., None]], axis=-1)
        return (vol, tuple(outs)) if return_planes else vol
    texel, _ = _reproject_texel(cfg, params, view_to_world,
                                prev_world_to_view, None, 0.0)
    prev = _sample_prev(cfg, prev_accumulation, texel)
    success = (prev[..., 3] != 0.0).astype(jnp.float32)
    vol = accumulation + (prev - accumulation) * (alpha * success)[..., None]
    if return_planes:
        return vol, tuple(vol[..., c] for c in range(4))
    return vol


# --------------------------------------------------------------------------- #
# Composite
# --------------------------------------------------------------------------- #

def zgather_eligible(cfg: RenderConfig) -> bool:
    """Whether the zgather composite kernel handles this config (8x8 px
    cells, or any multiple-of-8 cell size via sub-image decomposition;
    D <= 128, integer ratios, a 3- or 5-divisible grid height for the
    unshuffle batching)."""
    w, h, d = cfg.grid
    if not (cfg.composite_impl == "zgather"
            and cfg.image_width % w == 0 and cfg.image_height % h == 0
            and d <= 128 and (h % 3 == 0 or h % 5 == 0)):
        return False
    py, px = cfg.image_height // h, cfg.image_width // w
    return py * px == 64 or (py % 8 == 0 and px % 8 == 0)


def zgather_slab_eligible(cfg: RenderConfig, halo: int) -> bool:
    """Whether an H-sharded slab (cfg = the LOCAL halo-extended config,
    volume_height = h_out + 2*halo, image_height = the shard's band) can run
    the zgather composite straight off halo-EXTENDED padded planes
    (composite_zgather row_off) — the renderer then emits padded planar
    history in slabs too, killing the per-frame re-pad concats."""
    from volumetricrenderer_tpu.ops.pallas.zg_composite import (HB, WSTRIDE,
                                                                padded_dims)
    w, h, d = cfg.grid
    h_out = h - 2 * halo
    ih, iw = cfg.image_height, cfg.image_width
    if not (cfg.composite_impl == "zgather" and h_out > 0 and d <= 128
            and w + 2 <= WSTRIDE and iw % w == 0 and ih % h_out == 0
            and ih == (ih // h_out) * h_out
            and (h_out % 3 == 0 or h_out % 5 == 0)):
        return False
    py, px = ih // h_out, iw // w
    if not (py * px == 64 or (py % 8 == 0 and px % 8 == 0)):
        return False
    # the out-rows window (blocks bb..bb+nwin-1 past each step) must fit the
    # extended plane's padded rows
    bb, sub = divmod(halo, HB)
    nwin = 2 if sub == 0 else 3
    nblk = -(-h_out // HB)
    return (nblk - 1 + bb + nwin) * HB <= padded_dims(h)[0]


def _upsample_rows_cosited(p: jax.Array, us: int) -> jax.Array:
    """[h, w] -> [us*h, w] co-sited bilinear row upsample: low sample i sits
    at full row us*i, so out[us*i + k] lerps rows i and i+1 at t = k/us
    (edge-clamped). The us phases interleave with ONE stack+reshape on the
    ROW axis — [h, us, w] -> [us*h, w] is a contiguous merge, no relayout."""
    n = p.shape[0]
    nxt = jnp.concatenate([p[1:], p[-1:]], axis=0)
    phases = [p + (k / us) * (nxt - p) for k in range(us)]
    return jnp.stack(phases, axis=1).reshape(n * us, p.shape[1])


def _upsample_cosited(p: jax.Array, us: int) -> jax.Array:
    """[h, w] -> [us*h, us*w] co-sited bilinear upsample, gather-free.

    Rows interleave directly (layout-free merge); columns go through a
    transpose -> row-interleave -> transpose — a phase stack on the MINOR
    axis would materialize a [..., us] array whose us-wide lane dim tiles
    to 128 (the tiny-minor trap, CLAUDE.md): measured 54 ms for the 4K
    ms_4k_half scope vs ~1 ms via transposes."""
    p = _upsample_rows_cosited(p, us)
    p = _upsample_rows_cosited(p.T, us)
    return p.T


def composite(cfg: RenderConfig, params: FroxelParams, accumulation: jax.Array,
              scene_color: jax.Array, view_depth: jax.Array,
              slab=None, planes=None,
              planes_prepadded: bool = False,
              return_planes: bool = False) -> jax.Array:
    """Fullscreen composite (VolumetricRenderer.shader:69-93).

    Screen u,v map to froxel x = W*u, y = H*v analytically (the reference's
    depth->world->froxel round trip collapses because the froxel grid is
    screen-aligned); z from the linear view depth. Returns [H, W, 4] rgba with
    rgb = scene*T + L, a = T (shader:85-91).

    When the image dims are integer multiples of the froxel XY dims and
    cfg.composite_impl == "pallas", the fused gather-free MXU kernel is used
    (ops/pallas/composite.py) — numerically identical trilinear. Non-integer
    IH/H ratios (any screen size, like the reference's hardware trilinear)
    take the pixel-row tent-matmul path (ops/rowmm_composite.py); only a
    non-integer IW/W ratio still falls back to the per-pixel gather."""
    w, h, d = cfg.grid
    ih, iw = view_depth.shape
    if return_planes and not (slab is None and zgather_eligible(cfg)):
        # only the zgather kernel emits planes natively; other impls pack
        # [H, W, 4] anyway, so planar callers just slice it
        if isinstance(scene_color, (tuple, list)):
            scene_color = jnp.stack(scene_color, axis=-1)
        img = composite(cfg, params, accumulation, scene_color, view_depth,
                        slab=slab, planes=planes,
                        planes_prepadded=planes_prepadded)
        return tuple(img[..., c] for c in range(4))
    if slab is not None:
        # H-sharded slab (parallel/shard_render.py): accumulation is the
        # halo'd local block; pixel rows map to cell rows by a shard-invariant
        # static pattern offset by the halo.
        assert iw % w == 0, "sharded composite needs IW % W == 0"
        h_out = h - 2 * slab.halo
        py_s = ih // max(h_out, 1)
        px_s = iw // w
        if planes_prepadded:
            # planes are the halo-EXTENDED padded layout straight from the
            # megakernel (renderer emits them when zgather_slab_eligible):
            # the kernel reads the out-rows window at row_off = halo — no
            # per-frame slice/re-pad of the 4 planes (was ~1.4 ms of XLA
            # concats, the dominant slab-path overhead)
            assert zgather_slab_eligible(cfg, int(slab.halo))
            from volumetricrenderer_tpu.ops.pallas.zg_composite import \
                composite_zgather
            fz = froxel.depth_to_froxel_z(params, view_depth) - 0.5
            return composite_zgather(
                planes, scene_color, fz, (w, h_out, d),
                interpret=jax.default_backend() != "tpu", prepadded=True,
                row_off=int(slab.halo), return_planes=return_planes)
        if (cfg.composite_impl == "zgather" and h_out > 0 and d <= 128
                and int(slab.halo) >= 1        # slice below reads row p0-1
                and ih == py_s * h_out and (h_out % 3 == 0 or h_out % 5 == 0)
                and (py_s * px_s == 64
                     or (py_s % 8 == 0 and px_s % 8 == 0))):
            # the production zgather kernel, slab-wise: slicing the halo'd
            # planes at rows [halo-1, halo+h_out+1) IS the kernel's padded
            # row layout — with REAL neighbor rows where the unsharded pad
            # would edge-clamp (exact cross-shard y-tent). Each shard then
            # composites its own image band at the 0.75 ms-class cost
            # instead of the tentmm-class rowmm fallback (bench slab1_ms
            # 15.5 -> see PERF.md).
            from volumetricrenderer_tpu.ops.pallas.zg_composite import \
                composite_zgather
            p0 = int(slab.halo)
            pl4 = planes if planes is not None \
                else tuple(accumulation[..., c] for c in range(4))
            pl4 = tuple(p[:, p0 - 1:p0 + h_out + 1] for p in pl4)
            fz = froxel.depth_to_froxel_z(params, view_depth) - 0.5
            return composite_zgather(
                pl4, scene_color, fz, (w, h_out, d),
                interpret=jax.default_backend() != "tpu", halo_rows=True,
                return_planes=return_planes)
        import numpy as np
        h_glob = params.grid[1]
        from volumetricrenderer_tpu.ops.rowmm_composite import composite_rowmm
        fz = froxel.depth_to_froxel_z(params, view_depth) - 0.5
        fy = ((np.arange(ih) + 0.5) * (h_glob / slab.image_height_global)
              - 0.5 + slab.halo)
        return composite_rowmm(accumulation, scene_color, fz, params.grid,
                               fy=fy, row_off=0,
                               precision=cfg.composite_precision)
    us = max(int(cfg.composite_upsample), 1)
    if us > 1 and ih % us == 0 and iw % us == 0:
        # fractional-resolution volumetrics (config.composite_upsample):
        # trilinear (L, T) at 1/us screen res on CO-SITED samples (low pixel
        # (i, j) = full pixel (us*i, us*j), so every us-th output pixel is
        # exact), interleaved-bilinear upsample, then the scene blend at
        # FULL res. The upsample is stack+reshape interleaves of shifted
        # averages — no gathers, no strided relayout on the row axis.
        import dataclasses as _dc
        cfg_lo = _dc.replace(cfg, image_width=iw // us,
                             image_height=ih // us, composite_upsample=1)
        if zgather_eligible(cfg_lo):
            import numpy as np
            from volumetricrenderer_tpu.ops.pallas.composite import \
                _cell_weights_at
            from volumetricrenderer_tpu.ops.pallas.zg_composite import \
                composite_zgather_planes
            # stride the MINOR axis via a transpose round trip: a direct
            # [::us] lane-strided slice of a 4K plane is a serial-gather
            # class op (measured ~tens of ms); row strides + transposes are
            # plain DMA traffic
            vd_lo = view_depth[::us].T[::us].T
            fz = froxel.depth_to_froxel_z(params, vd_lo) - 0.5
            pl4 = planes if planes is not None \
                else tuple(accumulation[..., c] for c in range(4))
            # CO-SITED XY weights: low pixel i stands for FULL pixel us*i
            # (that is what vd_lo and _upsample_cosited assume), whose
            # in-cell froxel offset is (us*i + 0.5)/(us*p_lo) - 0.5 — NOT
            # the low-res pixel center (i + 0.5)/p_lo - 0.5 the default
            # weights would use (a 0.25/p_lo froxel skew that broke the
            # every-us-th-pixel-exact contract; round-5 advisor finding)
            py_lo = (ih // us) // h
            px_lo = (iw // us) // w
            w9 = _cell_weights_at(
                (us * np.arange(py_lo) + 0.5) / (us * py_lo) - 0.5,
                (us * np.arange(px_lo) + 0.5) / (us * px_lo) - 0.5)
            lo = composite_zgather_planes(
                pl4, fz, cfg.grid, interpret=jax.default_backend() != "tpu",
                prepadded=planes_prepadded, w9_override=w9)
            up = [_upsample_cosited(p, us) for p in lo]
            if isinstance(scene_color, (tuple, list)):
                sc_p = list(scene_color)
            else:
                sc_p = [scene_color[..., c] for c in range(3)]
            out = [sc_p[c] * up[3] + up[c] for c in range(3)] + [up[3]]
            if return_planes:
                return tuple(out)
            return jnp.stack(out, axis=-1)
        # low-res shape not kernel-eligible: fall through to the exact path
    if zgather_eligible(cfg):
        # cells-as-rows take_along_axis kernel (ops/pallas/zg_composite.py);
        # consumes the accumulation channel planes directly (pre-padded ones
        # straight from the fused temporal blend when available)
        from volumetricrenderer_tpu.ops.pallas.zg_composite import \
            composite_zgather
        fz = froxel.depth_to_froxel_z(params, view_depth) - 0.5
        pl4 = planes if planes is not None \
            else tuple(accumulation[..., c] for c in range(4))
        return composite_zgather(pl4, scene_color, fz, cfg.grid,
                                 interpret=jax.default_backend() != "tpu",
                                 prepadded=planes_prepadded,
                                 return_planes=return_planes)
    if cfg.composite_impl in ("pallas", "tentmm", "rowmm", "zgather") \
            and iw % w == 0:
        fz = froxel.depth_to_froxel_z(params, view_depth) - 0.5
        # an ineligible-zgather config falls back to tentmm here
        if ih % h == 0 and cfg.composite_impl != "rowmm":
            if cfg.composite_impl == "pallas":
                from volumetricrenderer_tpu.ops.pallas.composite import \
                    composite_pallas
                interpret = jax.default_backend() != "tpu"
                return composite_pallas(accumulation, scene_color, fz,
                                        cfg.grid, interpret=interpret)
            from volumetricrenderer_tpu.ops.tent_composite import \
                composite_tentmm
            return composite_tentmm(accumulation, scene_color, fz, cfg.grid,
                                    precision=cfg.composite_precision)
        from volumetricrenderer_tpu.ops.rowmm_composite import composite_rowmm
        acc_p = jnp.concatenate([accumulation[:, :1], accumulation,
                                 accumulation[:, -1:]], axis=1)
        return composite_rowmm(acc_p, scene_color, fz, cfg.grid, row_off=1,
                               precision=cfg.composite_precision)
    if cfg.composite_impl in ("pallas", "tentmm", "rowmm", "zgather"):
        # non-integer IW/W (any screen size, like the reference's hardware
        # trilinear): BOTH axes as static tent selection matmuls — the last
        # shape class that used to fall to the per-pixel gather (round 5).
        # The gather survives only as the composite_impl="xla" parity path.
        from volumetricrenderer_tpu.ops.rowmm_composite import \
            composite_anyres
        fz = froxel.depth_to_froxel_z(params, view_depth) - 0.5
        return composite_anyres(accumulation, scene_color, fz, cfg.grid,
                                precision=cfg.composite_precision)
    u = (jnp.arange(iw, dtype=jnp.float32) + 0.5) / iw
    v = (jnp.arange(ih, dtype=jnp.float32) + 0.5) / ih
    fx = (u * w)[None, :] - 0.5
    fy = (v * h)[:, None] - 0.5
    fz = froxel.depth_to_froxel_z(params, view_depth) - 0.5
    texel = jnp.stack([jnp.broadcast_to(fx, (ih, iw)),
                       jnp.broadcast_to(fy, (ih, iw)), fz], axis=-1)
    acc = trilinear_sample_3d(accumulation, texel)
    trans = acc[..., 3:4]
    rgb = scene_color * trans + acc[..., :3]
    return jnp.concatenate([rgb, trans], axis=-1)
