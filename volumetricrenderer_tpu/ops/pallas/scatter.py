"""Fused Pallas local-light scatter kernel (raycast shadow mode).

The XLA path unrolls 16 point/spot lights into per-light fusion groups, each
materializing several [D,H,W] temporaries in HBM (~1.8 ms/light measured).
This kernel processes one froxel z-slice per grid step with a fori_loop over
lights — loop-carried, so the per-light working set is reused in VMEM and the
only HBM traffic is one read of the material planes and one write of the
light-accumulation planes.

Everything is computed in-register: froxel -> view -> world positions from the
packed scalar params, Henyey-Greenstein phase, the analytic falloff LUT, cone
attenuation, and any-hit shadow rays against the packed primitive tables (all
in SMEM; scalars stream through the scalar core while the VPU does the [H, W]
plane math).

Covers point+spot lights with raycast shadows at full resolution; the renderer
falls back to the XLA path for map-mode shadows or raycast_shadow_subsample>1.
Semantics identical to pipeline.write_scatter_volume's local-light section
(VolumetricCompute.compute:87-167 + SPEC), enforced by equivalence tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volumetricrenderer_tpu.ops.phase import PI


def pack_lights(point_lights, spot_lights) -> np.ndarray | jax.Array:
    """[NL, 16] f32 rows: pos(3) color(3) range mult is_spot sdir(3)
    cos_outer cos_inner_rcp shadow_gate pad."""
    rows = []
    pc = point_lights.packed_color
    for i in range(point_lights.count):
        rows.append(jnp.concatenate([
            point_lights.position[i], pc[i],
            point_lights.range[i][None],
            point_lights.intensity_multiplier[i][None],
            jnp.zeros((1,), jnp.float32),                 # is_spot
            jnp.zeros((3,), jnp.float32),                 # spot dir
            jnp.ones((1,), jnp.float32),                  # cos_outer (unused)
            jnp.ones((1,), jnp.float32),                  # cos_inner_rcp
            point_lights.has_shadow[i].astype(jnp.float32)[None],
            jnp.zeros((1,), jnp.float32)]))
    sc = spot_lights.packed_color
    for i in range(spot_lights.count):
        rows.append(jnp.concatenate([
            spot_lights.position[i], sc[i],
            spot_lights.range[i][None],
            spot_lights.intensity_multiplier[i][None],
            jnp.ones((1,), jnp.float32),
            spot_lights.direction[i],
            spot_lights.cos_outer_cone[i][None],
            spot_lights.cos_inner_cone_rcp[i][None],
            spot_lights.has_shadow[i].astype(jnp.float32)[None],
            jnp.zeros((1,), jnp.float32)]))
    return jnp.stack(rows)


def slice_light_order(params, view_to_world, positions, ranges,
                      grid_whd: Tuple[int, int, int]):
    """Per-slice active-light schedule for the fused kernel.

    Conservative sphere-vs-slice test: the world AABB of the frustum slab
    [z-1, z+2] (one-voxel pad covers the +-0.5 jitter) against each light's
    range sphere. Skipping a culled light is EXACT — the in-kernel range
    cull (`dist <= rng`, compute:97-100) already zeroes its contribution.
    Returns (order [D, NL] int32 — active-light indices first, count [D, 1]
    int32)."""
    from volumetricrenderer_tpu import froxel as froxel_lib

    w, h, d = grid_whd
    h_glob = params.grid[1]
    y0 = jnp.asarray(params.y0, jnp.float32)
    zs = jnp.arange(d, dtype=jnp.float32)
    z0 = jnp.clip(zs - 1.0, 0.0, float(d))
    z1 = jnp.clip(zs + 2.0, 0.0, float(d))
    xs = jnp.asarray([0.0, float(w)])
    # slab-local y extent in GLOBAL rows (tighter per-shard culling)
    ys = jnp.stack([jnp.clip(y0, 0.0, float(h_glob)),
                    jnp.clip(y0 + h, 0.0, float(h_glob))])
    fx, fy = jnp.meshgrid(xs, ys, indexing="ij")          # [2, 2]
    fx = jnp.broadcast_to(fx.reshape(1, 4), (d, 4))
    fy = jnp.broadcast_to(fy.reshape(1, 4), (d, 4))
    corners = []
    for fz in (z0, z1):
        fzc = jnp.broadcast_to(fz[:, None], (d, 4))
        corners.append(jnp.stack([fx, fy, fzc], axis=-1))  # [D, 4, 3]
    fro = jnp.concatenate(corners, axis=1)                 # [D, 8, 3]
    world = froxel_lib.transform_points(view_to_world,
                                        froxel_lib.froxel_to_view(params, fro))
    lo = jnp.min(world, axis=1)                            # [D, 3]
    hi = jnp.max(world, axis=1)
    nearest = jnp.clip(positions[None], lo[:, None], hi[:, None])  # [D,NL,3]
    diff = nearest - positions[None]
    d2 = jnp.sum(diff * diff, axis=-1)
    active = d2 <= (ranges[None] ** 2)                     # [D, NL]
    # [D, 1, NL] / [D, 1, 1]: the slice pick is a leading block dim — the
    # (8,128)-divisible-or-full rule constrains the last two dims even in SMEM
    order = jnp.argsort(~active, axis=1, stable=True).astype(jnp.int32)
    count = jnp.sum(active, axis=1, dtype=jnp.int32)
    return order[:, None, :], count[:, None, None]


def light_factor(q, wx, wy, wz, vdx, vdy, vdz, phg, g2, hg_num):
    """Per-light scatter physics without the shadow term: HG phase x falloff
    LUT x spot cone x range cull (VolumetricCompute.compute:87-167 semantics).

    q is a row accessor over a pack_lights row (SMEM ref row in-kernel, or a
    plain array row in XLA — the same formulas serve the full-rate fori body,
    the low-rate radiance bake (ops/pallas/visibility.py), and the XLA
    map-mode radiance bake). Returns (hg * fall, ldx, ldy, ldz, dist,
    shadow_gate, cr, cg, cb)."""
    lx_, ly_, lz_ = q(0), q(1), q(2)
    cr, cg, cb = q(3), q(4), q(5)
    rng, mult, is_spot = q(6), q(7), q(8)
    sdx, sdy, sdz = q(9), q(10), q(11)
    cos_outer, cos_inner_rcp, shadow_gate = q(12), q(13), q(14)

    tx = wx - lx_
    ty = wy - ly_
    tz = wz - lz_
    d2 = tx * tx + ty * ty + tz * tz
    inv_d = jax.lax.rsqrt(d2 + 1e-18)
    dist = d2 * inv_d
    ldx, ldy, ldz = tx * inv_d, ty * inv_d, tz * inv_d

    # falloff LUT (ops/falloff.py) + spot cone (helper:289-303)
    x = d2 / (rng * rng)
    fall = jnp.clip((1.0 - x) * 5.0, 0.0, 1.0) / (1.0 + 25.0 * x) * mult
    cos_angle = ldx * sdx + ldy * sdy + ldz * sdz
    # cos_outer < cos_inner for real spots; point-light rows have both = 1,
    # so guard the 0-denominator (the result is gated off by is_spot).
    cone_den = jnp.minimum(cos_outer - 1.0 / cos_inner_rcp, -1e-9)
    t_cone = jnp.clip((cos_angle - 1.0 / cos_inner_rcp) / cone_den,
                      0.0, 1.0)
    cone = 1.0 - t_cone * t_cone * (3.0 - 2.0 * t_cone)
    keep_spot = (cos_angle >= cos_outer).astype(jnp.float32)
    fall = fall * (1.0 - is_spot + is_spot * cone * keep_spot)
    fall = fall * (dist <= rng).astype(jnp.float32)

    # HG phase at cos(view, -lightToPos); b^-1.5 as rsqrt^3 — one rsqrt +
    # 2 muls instead of sqrt + divide (runs per light per froxel)
    cos_t = -(vdx * ldx + vdy * ldy + vdz * ldz)
    b = 1.0 + g2 - 2.0 * phg * cos_t
    rb = jax.lax.rsqrt(b)
    return hg_num * rb * rb * rb * fall, ldx, ldy, ldz, dist, shadow_gate, \
        cr, cg, cb


def pack_dir_lights(dir_lights) -> jax.Array:
    """[Nd, 8] f32 rows: direction(3) packed_color(3) pad(2). Used when the
    directional scatter (compute:64-85, rgb part) is folded into the fused
    kernel; visibility comes from the (blended) shadow volume planes."""
    rows = []
    pc = dir_lights.packed_color
    for i in range(dir_lights.count):
        rows.append(jnp.concatenate([
            dir_lights.direction[i], pc[i], jnp.zeros((2,), jnp.float32)]))
    return jnp.stack(rows)


def pack_params(params, view_to_world, camera_pos, jitter) -> jax.Array:
    """[1, 24] f32: v2w rows (12), fp.x fp.y fp.z fp.w near, jitter(3),
    cam(3), y0 (slab row offset, 0 for whole-grid)."""
    m = view_to_world
    vals = [m[0, 0], m[0, 1], m[0, 2], m[0, 3],
            m[1, 0], m[1, 1], m[1, 2], m[1, 3],
            m[2, 0], m[2, 1], m[2, 2], m[2, 3],
            params.x, params.y, params.z, params.w, params.near,
            jitter[0], jitter[1], jitter[2],
            camera_pos[0], camera_pos[1], camera_pos[2],
            params.y0]
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in vals])[None]


def scatter_slice(par_ref, lights_ref, dirs_ref, order_ref, count_ref,
                  planes_ref, spheres_ref, boxes_ref, hf_ref, material_src,
                  vis_refs, zi, shadow_planes, *,
                  grid_whd: Tuple[int, int, int], n_dir: int,
                  jitter_dir: bool, n_planes: int, n_spheres: int,
                  n_boxes: int, h_glob: int, media_static: tuple = None,
                  hf_static: tuple = None, vis_lowres: tuple = None,
                  fractional: bool = False, radiance: bool = False,
                  n_noise: int = 0):
    """One z-slice of the fused local+dir in-scatter (the body shared by the
    standalone kernel and the whole-volume megakernel, ops/pallas/
    frame_fused.py). material_src: ("fused", med_ref) to evaluate media
    in-kernel, or ("planes", (sr, sg, sb, phg)) plane values.
    shadow_planes: per-dir-light blended visibility planes (values). Returns
    (ar, ag, ab, ext) — ext None unless material is fused.

    radiance=True: the low-res volume behind vis_refs holds the 3 rgb
    radiance channels (bake_radiance_*) instead of NL per-light visibility
    planes — sampled once, no per-light loop."""
    fuse_material = media_static is not None
    w, h, d = grid_whd                  # local block shape (h may be a slab)

    p = lambda i: par_ref[0, i]
    fpx, fpy, fpz, fpw, near = p(12), p(13), p(14), p(15), p(16)
    jx, jy, jz = p(17), p(18), p(19)
    camx, camy, camz = p(20), p(21), p(22)
    y0 = p(23)                          # global row of local row 0 (slab)

    # froxel -> view -> world at the jittered slice center (scalar z math).
    fz = zi.astype(jnp.float32) + 0.5 + jz
    vz = (jnp.exp(jnp.log(fpz) * fz / d) - 1.0) * fpw + near

    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    # global rows, clamped to the grid (halo rows replicate the edge row)
    ys = jnp.clip(ys + y0, 0.0, h_glob - 1.0)
    vx = (2.0 * (xs + 0.5 + jx) / w - 1.0) * vz / fpx
    vy = (2.0 * (ys + 0.5 + jy) / h_glob - 1.0) * vz / fpy

    wx = p(0) * vx + p(1) * vy + p(2) * vz + p(3)
    wy = p(4) * vx + p(5) * vy + p(6) * vz + p(7)
    wz = p(8) * vx + p(9) * vy + p(10) * vz + p(11)

    vdx = wx - camx
    vdy = wy - camy
    vdz = wz - camz
    inv_vd = jax.lax.rsqrt(vdx * vdx + vdy * vdy + vdz * vdz + 1e-18)
    vdx, vdy, vdz = vdx * inv_vd, vdy * inv_vd, vdz * inv_vd

    if vis_lowres is not None:
        # z-lerp weight for the baked visibility volume: full slice zi sits at
        # u = (zi - (ss-1)/2)/ss between low slices floor(u), floor(u)+1
        # (clamp-to-edge; matches the index maps in scatter_local_pallas).
        # 3 refs = the megakernel's inline-bake VMEM ring (visibility slices
        # live at ring row light*ring_n + m % ring_n — inline_bake_schedule
        # guarantees no live slice aliases); 4 refs = HBM volume blocks.
        if len(vis_refs) == 3:
            ring_ref, ay_ref, axt_ref = vis_refs
            vss, vdl, ring_n = vis_lowres
        else:
            vis_a_ref, vis_b_ref, ay_ref, axt_ref = vis_refs
            vss, vdl = vis_lowres[:2]
            ring_n = None
        vu = (zi.astype(jnp.float32) - (vss - 1) * 0.5) / vss
        vkf = jnp.clip(jnp.floor(vu), 0.0, vdl - 1.0)
        vt = jnp.clip(vu - vkf, 0.0, 1.0)
        if ring_n is not None:
            ka_i = vkf.astype(jnp.int32)
            slot_a = jnp.mod(ka_i, ring_n)
            slot_b = jnp.mod(jnp.minimum(ka_i + 1, vdl - 1), ring_n)

        def upsample_low(c):
            """z-lerp + exact separable tent upsample of low-rate channel c
            (ring rows c*ring_n+slot, or HBM volume channel c)."""
            if ring_n is not None:
                va = ring_ref[pl.ds(c * ring_n + slot_a, 1)][0]
                vb = ring_ref[pl.ds(c * ring_n + slot_b, 1)][0]
            else:
                va = vis_a_ref[c, 0]
                vb = vis_b_ref[c, 0]
            low = va + vt * (vb - va)                      # [HL, WL]
            return jax.lax.dot(ay_ref[...], jax.lax.dot(low, axt_ref[...]))

    ext = None
    if fuse_material:
        # WriteMaterialVolume evaluated in-kernel at the jittered world pos
        # (the same wx/wy/wz planes): no material volume ever touches HBM.
        # n_noise > 0 (radiance mode): the per-medium fBm factors were baked
        # at the low rate (channels 3..3+n_noise of the radiance volume) —
        # upsample them instead of evaluating the Perlin per froxel.
        from volumetricrenderer_tpu.ops.pallas.material import material_planes
        med_ref = material_src[1]
        noise_planes = [upsample_low(3 + c) for c in range(n_noise)] \
            if (radiance and n_noise) else None
        sr, sg, sb, s_a, phg = material_planes(med_ref, media_static,
                                               wx, wy, wz,
                                               noise_planes=noise_planes)
        # dir-light luma extinction (compute:82) — one Rgb2Gray(sigma_s) +
        # sigma_a per dir light; was XLA elementwise on the material volume
        ext = (0.3 * sr + 0.59 * sg + 0.11 * sb + s_a) * float(n_dir)
    else:
        sr, sg, sb, phg = material_src[1]
    g2 = phg * phg
    hg_num = (1.0 - g2) / (4.0 * PI)

    def light_body(li, acc):
        ar, ag, ab = acc
        # per-slice schedule: only range-intersecting lights are visited
        # (order/count from slice_light_order; skipping is exact)
        idx = order_ref[0, 0, li]
        q = lambda i: lights_ref[idx, i]
        # phase x falloff x cone x range cull (shared physics, light_factor)
        factor, ldx, ldy, ldz, dist, shadow_gate, cr, cg, cb = light_factor(
            q, wx, wy, wz, vdx, vdy, vdz, phg, g2, hg_num)

        if vis_lowres is not None:
            # baked-visibility sampling: z-lerp the light's two low-res
            # neighbor planes, then the exact separable tent upsample as two
            # small matmuls (weights and lerped values are dyadic at ss=2, so
            # the default-precision MXU dots are exact; has_shadow is already
            # baked in — culled/no-shadow planes are 1.0). TRIED AND
            # REVERTED: hoisting the upsample out of the fori as two batched
            # 16-light dots into VMEM scratch measured 2.76 vs 2.55 ms
            # in-kernel — the batch upsamples every light while the culled
            # fori only visits ~11, and the scratch staging adds traffic.
            if ring_n is not None:
                va = ring_ref[pl.ds(idx * ring_n + slot_a, 1)][0]
                vb = ring_ref[pl.ds(idx * ring_n + slot_b, 1)][0]
            else:
                va = vis_a_ref[idx, 0]
                vb = vis_b_ref[idx, 0]
            low = va + vt * (vb - va)                      # [HL, WL]
            shadow = jax.lax.dot(ay_ref[...], jax.lax.dot(low, axt_ref[...]))
        else:
            # any-hit shadow ray towards the light (prims from SMEM; shared
            # implementation, ops/pallas/occlude.py — bit-identical to the
            # previous inline block: sum/negation symmetry is IEEE-exact)
            from volumetricrenderer_tpu.ops.pallas.occlude import any_hit
            occ = any_hit(planes_ref, spheres_ref, boxes_ref, hf_ref,
                          wx, wy, wz, -ldx, -ldy, -ldz, dist - 0.05,
                          n_planes=n_planes, n_spheres=n_spheres,
                          n_boxes=n_boxes, hf_static=hf_static,
                          fractional=fractional)
            shadow = 1.0 - occ.astype(jnp.float32) * shadow_gate

        base = factor * shadow
        return (ar + base * cr * sr, ag + base * cg * sg, ab + base * cb * sb)

    if radiance:
        # Baked-RADIANCE mode (ops/pallas/visibility.py bake_radiance_*): the
        # ENTIRE local-light sum (vis x falloff x cone x HG phase, weighted by
        # light color and summed over lights) was baked at low rate, so the
        # full-rate work is three tent upsamples + the sigma_s product —
        # independent of light count. The per-light fori disappears.
        ups = [upsample_low(c) for c in range(3)]
        ar, ag, ab = ups[0] * sr, ups[1] * sg, ups[2] * sb
    else:
        zero = jnp.zeros((h, w), jnp.float32)
        n_act = count_ref[0, 0, 0]
        ar, ag, ab = jax.lax.fori_loop(0, n_act, light_body,
                                       (zero, zero, zero))

    # Directional scatter rgb (compute:64-85), folded in: visibility is the
    # (temporally blended) shadow-volume plane; NOT jittered by default
    # (quirk, compute:67) so the world pos / view dir are recomputed at the
    # unjittered slice center. Nd is small: unrolled.
    if n_dir:
        if jitter_dir:
            cwx, cwy, cwz = wx, wy, wz
        else:
            fzc = zi.astype(jnp.float32) + 0.5
            vzc = (jnp.exp(jnp.log(fpz) * fzc / d) - 1.0) * fpw + near
            vxc = (2.0 * (xs + 0.5) / w - 1.0) * vzc / fpx
            vyc = (2.0 * (ys + 0.5) / h_glob - 1.0) * vzc / fpy
            cwx = p(0) * vxc + p(1) * vyc + p(2) * vzc + p(3)
            cwy = p(4) * vxc + p(5) * vyc + p(6) * vzc + p(7)
            cwz = p(8) * vxc + p(9) * vyc + p(10) * vzc + p(11)
        dvx = cwx - camx
        dvy = cwy - camy
        dvz = cwz - camz
        inv_dv = jax.lax.rsqrt(dvx * dvx + dvy * dvy + dvz * dvz + 1e-18)
        dvx, dvy, dvz = dvx * inv_dv, dvy * inv_dv, dvz * inv_dv
        for li in range(n_dir):
            q = lambda i: dirs_ref[li, i]
            cos_t = -(dvx * q(0) + dvy * q(1) + dvz * q(2))
            b = 1.0 + g2 - 2.0 * phg * cos_t
            rb = jax.lax.rsqrt(b)
            hg = hg_num * rb * rb * rb
            base = shadow_planes[li] * hg
            ar = ar + base * q(3) * sr
            ag = ag + base * q(4) * sg
            ab = ab + base * q(5) * sb

    return ar, ag, ab, ext


def _kernel(*refs,
            grid_whd: Tuple[int, int, int], n_dir: int,
            jitter_dir: bool, n_planes: int, n_spheres: int, n_boxes: int,
            h_glob: int, media_static: tuple = None, hf_static: tuple = None,
            vis_lowres: tuple = None, fractional: bool = False,
            radiance: bool = False, n_noise: int = 0):
    fuse_material = media_static is not None
    vis_refs = ()
    if vis_lowres is not None:
        # baked-visibility mode (ops/pallas/visibility.py): the first 4 refs
        # are the two low-res z-neighbor plane stacks + the tent matrices
        vis_refs, refs = refs[:4], refs[4:]
    if fuse_material:
        # material evaluated in-kernel (ops/pallas/material.py): the sigma_s /
        # phase-g plane inputs are replaced by the packed media table, and the
        # directional-extinction plane becomes a 4th output
        (par_ref, lights_ref, dirs_ref, order_ref, count_ref,
         planes_ref, spheres_ref, boxes_ref, hf_ref, med_ref, shadow_ref,
         out_r, out_g, out_b, out_e) = refs
        material_src = ("fused", med_ref)
    else:
        (par_ref, lights_ref, dirs_ref, order_ref, count_ref,
         planes_ref, spheres_ref, boxes_ref, hf_ref,
         ss_r, ss_g, ss_b, pg_ref, shadow_ref, out_r, out_g, out_b) = refs
        material_src = ("planes", (ss_r[0], ss_g[0], ss_b[0], pg_ref[0]))
    zi = pl.program_id(0)
    shadow_planes = [shadow_ref[li, 0] for li in range(n_dir)]
    ar, ag, ab, ext = scatter_slice(
        par_ref, lights_ref, dirs_ref, order_ref, count_ref, planes_ref,
        spheres_ref, boxes_ref, hf_ref, material_src, vis_refs, zi,
        shadow_planes, grid_whd=grid_whd, n_dir=n_dir, jitter_dir=jitter_dir,
        n_planes=n_planes, n_spheres=n_spheres, n_boxes=n_boxes,
        h_glob=h_glob, media_static=media_static, hf_static=hf_static,
        vis_lowres=vis_lowres, fractional=fractional, radiance=radiance,
        n_noise=n_noise)
    out_r[0] = ar
    out_g[0] = ag
    out_b[0] = ab
    if fuse_material:
        out_e[0] = ext


def scatter_local_pallas(params, view_to_world, camera_pos, jitter,
                         material_a, material_b, point_lights, spot_lights,
                         geometry, grid_whd: Tuple[int, int, int],
                         dir_lights=None, shadow_volume=None,
                         jitter_dir: bool = False,
                         interpret: bool = False,
                         return_planes: bool = False,
                         media=None, time_x=None,
                         heightfield_shadows: bool = False,
                         vis=None, vis_ss: int = 2,
                         vis_radiance: bool = False) -> jax.Array:
    """Light in-scatter rgb [D, H, W, 3] (extinction is 0 for local lights,
    SPEC; the dir-light luma extinction stays in XLA — pure elementwise).
    material_a/b are [D, H, W, 4]. Pass dir_lights + the blended shadow
    volume [Nd, D, H, W] to fold the directional rgb scatter in too.

    Pass media (+ time_x) to ALSO fold the material evaluation in
    (ops/pallas/material.py): material_a/b are then ignored, and the return
    gains the dir-extinction plane — planes (r, g, b, ext) with return_planes,
    else the full [D, H, W, 4] scatter volume.

    Pass vis ([NL, DL, HL, WL] from ops/pallas/visibility.py, light order =
    pack_lights) to replace the in-kernel any-hit shadow march with the baked
    low-res visibility sample (z-lerp + exact tent upsample); geometry is then
    only used for packing empty tables. vis_ss is the bake's subsample
    factor. With vis_radiance=True, vis is instead the [3, DL, HL, WL] rgb
    radiance volume (bake_radiance_*): the whole per-light sum is baked, and
    the kernel's local-light work is three upsamples + the sigma_s product."""
    w, h, d = grid_whd
    fuse_material = media is not None
    lights = pack_lights(point_lights, spot_lights)
    par = pack_params(params, view_to_world, camera_pos, jitter)
    positions = jnp.concatenate([point_lights.position, spot_lights.position])
    ranges = jnp.concatenate([point_lights.range, spot_lights.range])
    order, count = slice_light_order(params, view_to_world, positions, ranges,
                                     grid_whd)

    n_dir = dir_lights.count if (dir_lights is not None
                                 and shadow_volume is not None) else 0
    if n_dir:
        dirs = pack_dir_lights(dir_lights)
        shadow_in = shadow_volume
    else:
        dirs = jnp.zeros((1, 8), jnp.float32)
        # 1-deep dummy + a constant index map below: the unread placeholder
        # is never re-streamed into VMEM per grid step (a full [1, D, H, W]
        # dummy with the per-slice map cost ~D*H*W*4 bytes/frame of waste)
        shadow_in = jnp.ones((1, 1, h, w), jnp.float32)

    planes = jnp.concatenate([geometry.plane_normal,
                              geometry.plane_d[:, None]], axis=-1)
    spheres = jnp.concatenate([geometry.sphere_center,
                               geometry.sphere_radius[:, None]], axis=-1)
    from volumetricrenderer_tpu.ops.pallas.occlude import pack_boxes
    boxes = pack_boxes(geometry)
    n_planes = planes.shape[0]
    n_spheres = spheres.shape[0]
    n_boxes = boxes.shape[0]
    planes = planes if n_planes else jnp.zeros((1, 4), jnp.float32)
    spheres = spheres if n_spheres else jnp.zeros((1, 4), jnp.float32)
    boxes = boxes if n_boxes else jnp.zeros((1, 8), jnp.float32)

    if fuse_material:
        from volumetricrenderer_tpu.ops.pallas.material import pack_media
        med, media_static = pack_media(media, time_x)
    else:
        med, media_static = None, None
    from volumetricrenderer_tpu.ops.pallas.material import pack_heightfield
    hf = pack_heightfield(geometry)
    hf_static = (geometry.hf_octaves, geometry.hf_period, geometry.hf_seed,
                 geometry.hf_steps, geometry.hf_far) \
        if (geometry.hf_enabled and heightfield_shadows) else None

    vis_lowres = None
    vis_inputs = ()
    vis_specs = []
    if vis is not None:
        from volumetricrenderer_tpu.ops.pallas.visibility import (
            upsample_mats, upsample_mats_y)
        nl_v, dl, hl, wl = vis.shape
        vis_lowres = (vis_ss, dl)
        # y tent carries the slab phase (visibility.py module docstring)
        ay = upsample_mats_y(h, hl, vis_ss, params.y0)            # [H, HL]
        axt = jnp.asarray(upsample_mats(w, wl, vis_ss).T)         # [WL, W]

        def ka(i):
            return jnp.clip((2 * i - (vis_ss - 1)) // (2 * vis_ss), 0, dl - 1)

        vis_specs = [
            pl.BlockSpec((nl_v, 1, hl, wl), lambda i: (0, ka(i), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nl_v, 1, hl, wl),
                         lambda i: (0, jnp.clip(ka(i) + 1, 0, dl - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, hl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wl, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        vis_inputs = (vis, vis, ay, axt)

    kernel = functools.partial(
        _kernel, grid_whd=grid_whd, n_dir=n_dir,
        jitter_dir=jitter_dir, n_planes=n_planes, n_spheres=n_spheres,
        n_boxes=n_boxes, h_glob=params.grid[1], media_static=media_static,
        hf_static=hf_static, vis_lowres=vis_lowres,
        fractional=bool(geometry.box_fractional),
        radiance=bool(vis_radiance and vis is not None),
        n_noise=max(vis.shape[0] - 3, 0)
        if (vis_radiance and vis is not None and fuse_material) else 0)

    smem = lambda shape: pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                                      memory_space=pltpu.SMEM)
    plane_spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    shadow_spec = pl.BlockSpec((shadow_in.shape[0], 1, h, w),
                               (lambda i: (0, i, 0, 0)) if n_dir
                               else (lambda i: (0, 0, 0, 0)),
                               memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((d, h, w), jnp.float32)

    in_specs = vis_specs + [
        smem(par.shape),
        smem(lights.shape),
        smem(dirs.shape),
        pl.BlockSpec((1, 1, order.shape[2]), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        smem(planes.shape),
        smem(spheres.shape),
        smem(boxes.shape),
        smem(hf.shape),
    ]
    if fuse_material:
        in_specs += [smem(med.shape), shadow_spec]
        inputs = vis_inputs + (par, lights, dirs, order, count, planes,
                               spheres, boxes, hf, med, shadow_in)
        n_out = 4
    else:
        in_specs += [plane_spec, plane_spec, plane_spec, plane_spec,
                     shadow_spec]
        inputs = vis_inputs + (par, lights, dirs, order, count, planes,
                               spheres, boxes, hf,
                               material_a[..., 0], material_a[..., 1],
                               material_a[..., 2], material_b[..., 0],
                               shadow_in)
        n_out = 3

    outs = pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=in_specs,
        out_specs=tuple([plane_spec] * n_out),
        out_shape=tuple([out_shape] * n_out),
        interpret=interpret,
    )(*inputs)

    if return_planes:
        return outs
    if fuse_material:
        return jnp.concatenate([jnp.stack(outs[:3], axis=-1),
                                outs[3][..., None]], axis=-1)
    return jnp.stack(outs, axis=-1)
