"""Whole-volume megakernel: shadow -> shadow blend -> scatter -> integrate ->
accumulation blend in ONE pallas_call.

Round 3's pairwise fusions (shadow_blend.py, integrate_blend.py) still leave
three sequential-z kernels joined by launch gaps and HBM hand-offs (the
blended shadow volume and the scatter planes). Every stage is per-z-slice
with bounded z-support, so the whole volume phase software-pipelines into a
single staggered grid:

  step j:  raycast shadow slice j                 -> cur ring (k+2)
  step j:  shadow-blend slice zb = j-k-1           (history ring 2k+2)
           -> shadow OUT[zb], and feeds scatter IN-REGISTER
  step j:  scatter slice zb (material fused, baked-visibility or march)
           -> xy-blend, integrate slice zb-1 via the cached previous
           xy-blend + the (L, T) carry
  step j:  accumulation-blend slice za = j-k-2     (history ring 2k+3 — one
           slot more than temporal.py's proof: this stage runs one step
           later relative to the history stream) -> padded OUT[za]

No intermediate volume ever touches HBM: the un-blended shadow, the scatter
planes, and the pre-blend accumulation exist only as registers/rings. Grid =
d + k + 2 steps. Integrate's clamp-to-edge top tap reproduces exactly: the
final step reuses the cached xy-blend of plane d-1, which equals the
original's re-read of plane d-1.

Semantics == dir_shadow+temporal(weight) then scatter then
integrate+temporal(alpha), pinned by tests/test_frame_fused.py; the renderer
uses it when every production impl knob is on (see render_frame)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INLINE_VIS = True   # bake local-light visibility INSIDE the megakernel
                    # (stage 0 + VMEM ring) instead of a separate pallas_call
                    # + HBM volume; probe knob (tools/probe_inline_vis.py)
ALIAS_STATE = True  # input_output_aliases: write the blended shadow/acc
                    # volumes IN PLACE over their own history inputs. Safe by
                    # the grid's stagger — input slice s is read (ring fill) at
                    # step s while output slice s is written at step s+k+1
                    # (shadow) / s+k+2 (acc), so every read completes >= k+1
                    # sequential steps before the write; the clamped re-reads
                    # of slice d-1 at steps > d feed ring slots no later tap
                    # reads. Kills the XLA state-plumbing copies (PERF.md
                    # copies/glue tail).

from volumetricrenderer_tpu.ops.pallas.dir_shadow import dir_shadow_slice
from volumetricrenderer_tpu.ops.pallas.integrate import make_xy_blend
from volumetricrenderer_tpu.ops.pallas.scatter import scatter_slice
from volumetricrenderer_tpu.ops.pallas.temporal import (_pad_plane,
                                                        _reproj_offsets,
                                                        _tent_pass,
                                                        _tent_weights,
                                                        pack_blend_params)


DYN_Z_TAPS = False  # data-dependent z-tap culling: loop only the taps whose
                    # tent weight can be nonzero this slice (dd in
                    # [floor(min off_z), ceil(max off_z)] — 2-3 of 2k+1 for a
                    # slow/static camera) instead of the static unroll.
                    # Bitwise-equal (skipped taps add exactly 0.0; probe
                    # tools/probe_dynwarp.py verified the fori_loop pattern
                    # compiles + matches on the real TPU) but MEASURED SLOWER
                    # at FULL config even with a static camera: megakernel
                    # trace 2.343 -> 2.577 ms. The dynamic-trip fori_loop
                    # serializes against Mosaic's static-unroll scheduling
                    # and the per-tap weight recompute (vs the hoisted
                    # _warp_taps planes) eats the rest. Kept as a knob; the
                    # static unroll stays the production path.


def _warp_z_multi(rings, ring_n, z, off_z, k, d):
    """Dynamic-tap z tent warp of SEVERAL channels sharing one offset plane
    (the 4 accumulation / Nd shadow rings of a blend site): one fori_loop
    over the live taps, the weight plane computed once per tap for all
    channels. Returns the per-channel z-warped planes."""
    lo = jnp.maximum(jnp.floor(jnp.min(off_z)).astype(jnp.int32), -k)
    hi = jnp.minimum(jnp.ceil(jnp.max(off_z)).astype(jnp.int32), k)
    zero = jnp.zeros(off_z.shape, jnp.float32)

    def body(dd, accs):
        s = jnp.clip(z + dd, 0, d - 1)
        slot = jnp.mod(s, ring_n)
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(off_z - dd.astype(jnp.float32)))
        return tuple(a + r[pl.ds(slot, 1)][0] * wz
                     for a, r in zip(accs, rings))

    return jax.lax.fori_loop(lo, hi + 1, body,
                             tuple(zero for _ in rings))


def _warp_taps(z, off_z, k, ring_n, d):
    """(ring slot, z-tent weight) per tap — hoisted once per blend site so
    the per-channel warps (4 accumulation + Nd shadow channels share the
    same reprojection offsets) don't re-derive the weight planes. Static
    fallback for DYN_Z_TAPS=False."""
    taps = []
    # dd spans [-k, k] only: off_z is clipped to [-k, k], so the k+1 tap's
    # tent weight is identically zero (temporal._tent_weights)
    for dd in range(-k, k + 1):
        s = jnp.clip(z + dd, 0, d - 1)
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(off_z - dd))
        taps.append((jnp.mod(s, ring_n), wz))
    return taps


def _warp(ring, taps, wys, wxs, k):
    """Tent-warp one channel from its history ring (temporal.py z/y/x tents).
    wys/wxs: hoisted _tent_weights of the blend site's y/x offsets — shared
    across the 4 accumulation + Nd shadow channels."""
    acc = jnp.zeros(wys[0].shape, jnp.float32)
    for slot, wz in taps:
        acc = acc + ring[pl.ds(slot, 1)][0] * wz
    acc = _tent_pass(acc, None, 0, k, ws=wys)
    return _tent_pass(acc, None, 1, k, ws=wxs)


def _kernel(spar_ref, sbpar_ref, abpar_ref, slights_ref, lights_ref,
            dirs_ref, order_ref, count_ref, planes_ref, spheres_ref,
            boxes_ref, hf_ref, med_ref, *refs,
            grid_whd: Tuple[int, int, int], k: int, n_dir: int,
            h_glob: int, shadow_statics: dict, scatter_statics: dict,
            vis_lowres, padded_out, prev_padded: bool, inline_vis=None):
    w, h, d = grid_whd
    n_vis = 4 if vis_lowres is not None else 0
    vis_refs = refs[:n_vis]
    refs = refs[n_vis:]
    prev_sh = refs[:n_dir]
    prev_acc = refs[n_dir:n_dir + 4]
    out_sh = refs[n_dir + 4:2 * n_dir + 4]
    out_acc = refs[2 * n_dir + 4:2 * n_dir + 8]
    scratch = refs[2 * n_dir + 8:]
    s_ring = scratch[:n_dir]                     # [2k+2, h, w]
    s_cur = scratch[n_dir:2 * n_dir]             # [k+2, h, w]
    a_ring = scratch[2 * n_dir:2 * n_dir + 4]    # [2k+3, h, w]
    xy_cache = scratch[2 * n_dir + 4:2 * n_dir + 8]
    carry = scratch[2 * n_dir + 8:2 * n_dir + 12]
    sh_last = scratch[2 * n_dir + 12:3 * n_dir + 12]
    if inline_vis is not None:
        # vis_refs = (bake_m, bact, ay, axt) SMEM/VMEM inputs; the baked
        # low-res visibility slices live in a VMEM ring (scratch), written
        # here on the inline_bake_schedule and read back by scatter_slice
        # (ring row = light*ring_n + m % ring_n)
        nl_v, ring_n, bgroup, hlp = inline_vis
        bkm_ref, bact_ref, ay_ref, axt_ref = vis_refs
        vis_ring = scratch[3 * n_dir + 12]       # [rows*ring_n, hl, wl]
        bake_acc = scratch[3 * n_dir + 13] \
            if scatter_statics.get("radiance", False) else None
        vis_refs = (vis_ring, ay_ref, axt_ref)

    j = pl.program_id(0)
    rn_s = 2 * k + 2
    rn_a = 2 * k + 3

    # history streams -> rings (padded-layout history: the interior of the
    # zgather padded plane is rows/cols [1, n+1) — state.py)
    for c in range(n_dir):
        s_ring[c][pl.ds(jnp.mod(j, rn_s), 1)] = prev_sh[c][:]
    for c in range(4):
        a_ring[c][pl.ds(jnp.mod(j, rn_a), 1)] = \
            prev_acc[c][:, 1:h + 1, 1:w + 1] if prev_padded \
            else prev_acc[c][:]

    # stage 0: inline visibility/radiance bake — low-res slices
    # bake_m[j]..bake_m[j]+bgroup-1 for every group-active local light, at
    # the latest step that still precedes the group's first read
    # (visibility.inline_bake_schedule). Same per-sample math as the
    # standalone bake kernels (shared helpers) — the separate pallas_call,
    # its HBM volume and the per-step block refetches are gone. Slices are
    # baked `bgroup` at a time as one [bgroup, hlp, wl] stack: the planes
    # are tiny ([68, 120] at FULL/ss=2), so the bake is issue-bound and
    # batching cuts its instruction count ~bgroup-fold, bit-exactly.
    if inline_vis is not None:
        from volumetricrenderer_tpu.ops.pallas.visibility import (
            bake_light_plane, bake_radiance_plane, bake_world_planes_stacked,
            low_res_dims, radiance_view_dirs)
        vss, dl = vis_lowres[0], vis_lowres[1]
        wl, hl, _ = low_res_dims(grid_whd, vss)
        radiance = scatter_statics.get("radiance", False)
        m0 = bkm_ref[0, 0, 0]
        # dl % bgroup != 0: the last group has tail slices past dl-1 whose
        # ring writes must be skipped (their data is clamped slice dl-1)
        has_tail = (dl % bgroup) != 0

        def _tail_guard(bi, body):
            if has_tail:
                pl.when(m0 + bi <= dl - 1)(body)
            else:
                body()

        @pl.when(m0 >= 0)
        def _bake_vis():
            bwx, bwy, bwz = bake_world_planes_stacked(
                spar_ref, m0, grid_whd, vss, h_glob, bgroup, hlp)
            if radiance:
                # rgb radiance accumulated over active lights into a stacked
                # scratch accumulator (RMW under pl.when keeps culling live),
                # then distributed to the ring rows per group member
                from volumetricrenderer_tpu.ops.pallas.material import (
                    noise_factor_planes, phase_g_plane)
                from volumetricrenderer_tpu.ops.phase import PI
                bvx, bvy, bvz = radiance_view_dirs(spar_ref, bwx, bwy, bwz)
                bphg = phase_g_plane(med_ref,
                                     scatter_statics["media_static"],
                                     bwx, bwy, bwz)
                bg2 = bphg * bphg
                bhg_num = (1.0 - bg2) / (4.0 * PI)
                bake_acc[...] = jnp.zeros((3, bgroup, hlp, wl), jnp.float32)
                for li in range(nl_v):
                    @pl.when(bact_ref[0, 0, li] != 0)
                    def _one(li=li):
                        r, g, b = bake_radiance_plane(
                            lights_ref, li, bwx, bwy, bwz, bvx, bvy, bvz,
                            bphg, bg2, bhg_num, planes_ref, spheres_ref,
                            boxes_ref, hf_ref,
                            n_planes=scatter_statics["n_planes"],
                            n_spheres=scatter_statics["n_spheres"],
                            n_boxes=scatter_statics["n_boxes"],
                            hf_static=scatter_statics["hf_static"],
                            fractional=scatter_statics["fractional"])
                        for c, p in enumerate((r, g, b)):
                            bake_acc[c] = bake_acc[c] + p
                # per-medium fBm factors at the same low-rate samples
                # (unconditional — noise is per-medium, not per-light)
                n_noise = scatter_statics.get("n_noise", 0)
                nz = noise_factor_planes(
                    med_ref, scatter_statics["media_static"],
                    bwx, bwy, bwz) if n_noise else []
                for bi in range(bgroup):
                    def _write(bi=bi):
                        slot = jnp.mod(m0 + bi, ring_n)
                        for c in range(3):
                            vis_ring[pl.ds(c * ring_n + slot, 1)] = \
                                bake_acc[c, bi, 0:hl][None]
                        for c in range(n_noise):
                            vis_ring[pl.ds((3 + c) * ring_n + slot, 1)] = \
                                nz[c][bi, 0:hl][None]
                    _tail_guard(bi, _write)
            else:
                for li in range(nl_v):
                    @pl.when(bact_ref[0, 0, li] != 0)
                    def _one(li=li):
                        plane = bake_light_plane(
                            lights_ref, li, bwx, bwy, bwz, planes_ref,
                            spheres_ref, boxes_ref, hf_ref,
                            n_planes=scatter_statics["n_planes"],
                            n_spheres=scatter_statics["n_spheres"],
                            n_boxes=scatter_statics["n_boxes"],
                            hf_static=scatter_statics["hf_static"],
                            fractional=scatter_statics["fractional"])
                        for bi in range(bgroup):
                            def _write(bi=bi, li=li):
                                slot = jnp.mod(m0 + bi, ring_n)
                                vis_ring[pl.ds(li * ring_n + slot, 1)] = \
                                    plane[bi, 0:hl][None]
                            _tail_guard(bi, _write)

    # stage 1: raycast shadow slice j
    @pl.when(j < d)
    def _shadow():
        cur = dir_shadow_slice(spar_ref, slights_ref, planes_ref,
                               spheres_ref, boxes_ref, hf_ref, j,
                               grid_whd=grid_whd, n_lights=n_dir,
                               h_glob=h_glob, **shadow_statics)
        cslot = jnp.mod(j, k + 2)
        for c in range(n_dir):
            s_cur[c][pl.ds(cslot, 1)] = cur[c][None]

    ap = lambda i: abpar_ref[0, i]
    fpz, fpw, near = ap(14), ap(15), ap(16)
    alpha_a = ap(20)
    ox, oy, oz = ap(24), ap(25), ap(26)
    xy_blend = make_xy_blend(ox, oy, h, w)

    def integrate_and_blend(zi2, xyb):
        """Integrate output slice zi2 from xy_cache (plane zi2's xy-blend)
        and xyb (plane zi2+1's), then accumulation-blend and emit it."""
        zf = zi2.astype(jnp.float32)
        sampled = [xy_cache[c][...] + oz * (xyb[c] - xy_cache[c][...])
                   for c in range(4)]
        vz_hi = (jnp.exp(jnp.log(fpz) * (zf + 0.5) / d) - 1.0) * fpw + near
        vz_lo = jnp.where(
            zf > 0.0,
            (jnp.exp(jnp.log(fpz) * (zf - 0.5) / d) - 1.0) * fpw + near,
            near)
        dz = vz_hi - vz_lo
        od = sampled[3] * dz
        t = jnp.exp(-od)
        small = od < 1e-2
        safe_sigma = jnp.where(small, 1.0, sampled[3])
        factor = jnp.where(small,
                           dz * (1.0 - 0.5 * od * (1.0 - od / 3.0)),
                           (1.0 - t) / safe_sigma)
        tc = carry[3][...]
        vals = [carry[c][...] + tc * sampled[c] * factor for c in range(3)]
        vals.append(tc * t)
        for c in range(4):
            carry[c][...] = vals[c]
        # accumulation blend (mode "alpha": success = warped T != 0)
        aox, aoy, aoz_, _ = _reproj_offsets(abpar_ref, zi2, grid_whd, h_glob,
                                            k, with_jitter=False)
        awy = _tent_weights(aoy, k)
        awx = _tent_weights(aox, k)
        if DYN_Z_TAPS:
            zw = _warp_z_multi([a_ring[c] for c in range(4)], rn_a, zi2,
                               aoz_, k, d)
            warped = [_tent_pass(_tent_pass(z_, None, 0, k, ws=awy),
                                 None, 1, k, ws=awx) for z_ in zw]
        else:
            a_taps = _warp_taps(zi2, aoz_, k, rn_a, d)
            warped = [_warp(a_ring[c], a_taps, awy, awx, k)
                      for c in range(4)]
        wgt = alpha_a * (warped[3] != 0.0).astype(jnp.float32)
        for c in range(4):
            res = vals[c] + wgt * (warped[c] - vals[c])
            if padded_out is not None:
                res = _pad_plane(res, *padded_out)
            out_acc[c][0] = res

    # stage 2+3: shadow blend zb -> scatter zb -> integrate/acc-blend zb-1
    @pl.when((j > k) & (j <= d + k))
    def _main():
        zb = j - (k + 1)
        sp = lambda i: sbpar_ref[0, i]
        alpha_s = sp(20)
        sox, soy, soz, ssucc = _reproj_offsets(sbpar_ref, zb, grid_whd,
                                               h_glob, k, with_jitter=True)
        swgt = alpha_s * ssucc
        swy = _tent_weights(soy, k)
        swx = _tent_weights(sox, k)
        if DYN_Z_TAPS:
            s_zw = _warp_z_multi([s_ring[c] for c in range(n_dir)], rn_s,
                                 zb, soz, k, d)
        else:
            s_taps = _warp_taps(zb, soz, k, rn_s, d)
        cslot = jnp.mod(zb, k + 2)
        blended = []
        for c in range(n_dir):
            if DYN_Z_TAPS:
                warped = _tent_pass(_tent_pass(s_zw[c], None, 0, k, ws=swy),
                                    None, 1, k, ws=swx)
            else:
                warped = _warp(s_ring[c], s_taps, swy, swx, k)
            cur = s_cur[c][pl.ds(cslot, 1)][0]
            b = cur + swgt * (warped - cur)
            out_sh[c][0] = b
            # the final grid step's out_sh block maps (clamped) to slice d-1
            # but isn't written there — its alternating buffer would flush
            # STALE data over the real slice. Stash the last slice and
            # re-write it at the top step.
            sh_last[c][...] = b
            blended.append(b)

        ar, ag, ab, ext = scatter_slice(
            spar_ref, lights_ref, dirs_ref, order_ref, count_ref,
            planes_ref, spheres_ref, boxes_ref, hf_ref, ("fused", med_ref),
            vis_refs, zb, blended, grid_whd=grid_whd, n_dir=n_dir,
            h_glob=h_glob, vis_lowres=vis_lowres, **scatter_statics)
        xyb = [xy_blend(p) for p in (ar, ag, ab, ext)]

        @pl.when(zb == 0)
        def _init():
            carry[0][...] = jnp.zeros((h, w), jnp.float32)
            carry[1][...] = jnp.zeros((h, w), jnp.float32)
            carry[2][...] = jnp.zeros((h, w), jnp.float32)
            carry[3][...] = jnp.ones((h, w), jnp.float32)

        @pl.when(zb > 0)
        def _mid():
            integrate_and_blend(zb - 1, xyb)

        for c in range(4):
            xy_cache[c][...] = xyb[c]

    # final step: integrate slice d-1 — the original integrate re-reads
    # plane d-1 for its top tap, i.e. xyb_top == xy_cache exactly
    @pl.when(j == d + k + 1)
    def _top():
        for c in range(n_dir):
            out_sh[c][0] = sh_last[c][...]
        integrate_and_blend(jnp.int32(d - 1),
                            [xy_cache[c][...] for c in range(4)])


def frame_volume_fused(params, view_to_world, prev_world_to_view, jitter,
                       alpha, dir_lights, point_lights, spot_lights,
                       geometry, media, time_x, camera_pos, prev_shadow,
                       prev_acc_planes, grid_whd: Tuple[int, int, int],
                       k: int, prev_acc_padded: bool = False,
                       vis=None, vis_ss: int = 2,
                       vis_radiance: bool = False,
                       bake_noise: bool = False,
                       inline_vis_bake: bool = False,
                       bake_group: int = 1,
                       jitter_dir: bool = False,
                       heightfield_shadows: bool = False,
                       interpret: bool = False, padded_out=None):
    """Run the whole volume phase in one kernel. Returns (shadow_volume
    [Nd, D, H, W] blended, acc_planes tuple of 4 blended accumulation
    planes — [D, H, W] or the zgather padded layout with padded_out).

    prev_acc_planes: 4 history planes, [D, H, W] each — or, with
    prev_acc_padded=True, the previous frame's padded_out-layout planes
    ([DLANES, hp, wstride]; the interior is sliced in-kernel), so the
    renderer can feed history back without any repack."""
    from volumetricrenderer_tpu.ops.pallas.dir_shadow import pack_dir_lights \
        as pack_shadow_lights
    from volumetricrenderer_tpu.ops.pallas.material import (pack_heightfield,
                                                            pack_media)
    from volumetricrenderer_tpu.ops.pallas.scatter import (pack_dir_lights,
                                                           pack_lights,
                                                           pack_params,
                                                           slice_light_order)

    w, h, d = grid_whd
    nd = dir_lights.count
    assert nd > 0
    spar = pack_params(params, view_to_world, camera_pos, jitter)
    sbpar = pack_blend_params(params, view_to_world, prev_world_to_view,
                              jitter, alpha, 1e-4)
    abpar = pack_blend_params(params, view_to_world, prev_world_to_view,
                              jnp.zeros((3,), jnp.float32), alpha, 0.0)
    abpar = jnp.concatenate([abpar, jnp.stack([
        jitter[0], jitter[1], jitter[2], jnp.float32(0.0)])[None]], axis=1)

    slights = pack_shadow_lights(dir_lights)
    lights = pack_lights(point_lights, spot_lights)
    dirs = pack_dir_lights(dir_lights)
    positions = jnp.concatenate([point_lights.position, spot_lights.position])
    ranges = jnp.concatenate([point_lights.range, spot_lights.range])
    order, count = slice_light_order(params, view_to_world, positions, ranges,
                                     grid_whd)

    planes = jnp.concatenate([geometry.plane_normal,
                              geometry.plane_d[:, None]], axis=-1)
    spheres = jnp.concatenate([geometry.sphere_center,
                               geometry.sphere_radius[:, None]], axis=-1)
    from volumetricrenderer_tpu.ops.pallas.occlude import \
        pack_boxes
    boxes = pack_boxes(geometry)
    n_planes, n_spheres, n_boxes = (planes.shape[0], spheres.shape[0],
                                    boxes.shape[0])
    planes = planes if n_planes else jnp.zeros((1, 4), jnp.float32)
    spheres = spheres if n_spheres else jnp.zeros((1, 4), jnp.float32)
    boxes = boxes if n_boxes else jnp.zeros((1, 8), jnp.float32)
    hf = pack_heightfield(geometry)
    med, media_static = pack_media(media, time_x)
    hf_sh = (geometry.hf_octaves, geometry.hf_period, geometry.hf_seed,
             geometry.hf_steps, geometry.hf_far) if geometry.hf_enabled \
        else None
    hf_sc = hf_sh if heightfield_shadows else None
    frac = bool(geometry.box_fractional)
    shadow_statics = dict(n_planes=n_planes, n_spheres=n_spheres,
                          n_boxes=n_boxes, max_dist=1e4, hf_static=hf_sh,
                          fractional=frac)
    use_radiance = bool(vis_radiance and (vis is not None or inline_vis_bake))
    # low-rate fBm channels ride the radiance volume/ring after rgb: from the
    # passed volume's shape, or baked inline per noise-bearing medium
    n_noise = 0
    if use_radiance:
        if vis is not None:
            n_noise = max(vis.shape[0] - 3, 0)
        elif bake_noise:
            n_noise = sum(1 for st in media_static if st[0])
    scatter_statics = dict(jitter_dir=jitter_dir, n_planes=n_planes,
                           n_spheres=n_spheres, n_boxes=n_boxes,
                           media_static=media_static, hf_static=hf_sc,
                           fractional=frac, radiance=use_radiance,
                           n_noise=n_noise)

    vis_lowres = None
    vis_specs = []
    vis_inputs = ()
    inline_vis = None
    vis_scratch = []
    if inline_vis_bake and vis is None:
        from volumetricrenderer_tpu.ops.pallas.visibility import (
            inline_bake_schedule, low_res_dims, low_slice_active,
            upsample_mats, upsample_mats_y)
        import numpy as np
        wl, hl, dl = low_res_dims(grid_whd, vis_ss)
        nl_v = lights.shape[0]
        n_steps = d + k + 2
        bg = max(1, min(int(bake_group), dl))
        hlp = -(-hl // 8) * 8     # pad to a sublane multiple: the in-kernel
        #                           per-member block extraction stays aligned
        bake_m_np, ring_n = inline_bake_schedule(d, dl, vis_ss, k, n_steps,
                                                 group=bg)
        active = low_slice_active(params, view_to_world, positions, ranges,
                                  grid_whd, vis_ss).astype(jnp.int32)
        # group-level culling: a light active in ANY member slice is baked
        # for the whole stack (exact — out-of-range samples get falloff 0)
        ng = -(-dl // bg)
        act_pad = jnp.concatenate(
            [active.T, jnp.zeros((ng * bg - dl, nl_v), jnp.int32)], axis=0)
        act_grp = act_pad.reshape(ng, bg, nl_v).max(axis=1)   # [NG, NL]
        bm_clip = np.clip(bake_m_np, 0, dl - 1)
        bact = act_grp[bm_clip // bg] \
            * jnp.asarray((bake_m_np >= 0).astype(np.int32))[:, None]
        bake_m = jnp.asarray(bake_m_np[:, None, None])       # [G, 1, 1]
        bact = bact[:, None, :]                              # [G, 1, NL]
        # y tent carries the slab phase (visibility.py module docstring)
        ay = upsample_mats_y(h, hl, vis_ss, params.y0)
        axt = jnp.asarray(upsample_mats(w, wl, vis_ss).T)
        vis_lowres = (vis_ss, dl, ring_n)
        inline_vis = (nl_v, ring_n, bg, hlp)
        vis_specs = [
            pl.BlockSpec((1, 1, 1), lambda j: (j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nl_v), lambda j: (j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((h, hl), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wl, w), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
        vis_inputs = (bake_m, bact, ay, axt)
        ring_rows = (3 + n_noise if use_radiance else nl_v) * ring_n
        vis_scratch = [pltpu.VMEM((ring_rows, hl, wl), jnp.float32)]
        if use_radiance:
            # stacked rgb accumulator for the grouped bake (stage 0)
            vis_scratch.append(pltpu.VMEM((3, bg, hlp, wl), jnp.float32))
    elif vis is not None:
        from volumetricrenderer_tpu.ops.pallas.visibility import (
            upsample_mats, upsample_mats_y)
        nl_v, dl, hl, wl = vis.shape
        vis_lowres = (vis_ss, dl)
        ay = upsample_mats_y(h, hl, vis_ss, params.y0)
        axt = jnp.asarray(upsample_mats(w, wl, vis_ss).T)

        def ka(j):
            zb = jnp.clip(j - (k + 1), 0, d - 1)
            return jnp.clip((2 * zb - (vis_ss - 1)) // (2 * vis_ss), 0, dl - 1)

        vis_specs = [
            pl.BlockSpec((nl_v, 1, hl, wl), lambda j: (0, ka(j), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nl_v, 1, hl, wl),
                         lambda j: (0, jnp.clip(ka(j) + 1, 0, dl - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, hl), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wl, w), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
        vis_inputs = (vis, vis, ay, axt)

    kernel = functools.partial(
        _kernel, grid_whd=grid_whd, k=k, n_dir=nd, h_glob=params.grid[1],
        shadow_statics=shadow_statics, scatter_statics=scatter_statics,
        vis_lowres=vis_lowres, padded_out=padded_out,
        prev_padded=prev_acc_padded, inline_vis=inline_vis)

    smem = lambda shape: pl.BlockSpec(shape, lambda j: tuple([0] * len(shape)),
                                      memory_space=pltpu.SMEM)
    zb_idx = lambda j: (jnp.clip(j - (k + 1), 0, d - 1), 0, 0)
    za_idx = lambda j: (jnp.clip(j - (k + 2), 0, d - 1), 0, 0)
    stream_spec = pl.BlockSpec((1, h, w),
                               lambda j: (jnp.minimum(j, d - 1), 0, 0),
                               memory_space=pltpu.VMEM)
    if prev_acc_padded:
        php, pws = prev_acc_planes[0].shape[1:]
        assert php >= h + 1 and pws >= w + 1, (php, pws, h, w)
        acc_in_spec = pl.BlockSpec((1, php, pws),
                                   lambda j: (jnp.minimum(j, d - 1), 0, 0),
                                   memory_space=pltpu.VMEM)
    else:
        acc_in_spec = stream_spec
    sh_out_spec = pl.BlockSpec((1, h, w), zb_idx, memory_space=pltpu.VMEM)
    if padded_out is not None:
        from volumetricrenderer_tpu.ops.pallas.zg_composite import DLANES
        hp, wstride = padded_out
        acc_out_spec = pl.BlockSpec((1, hp, wstride), za_idx,
                                    memory_space=pltpu.VMEM)
        acc_out_shape = jax.ShapeDtypeStruct((DLANES, hp, wstride),
                                             jnp.float32)
    else:
        acc_out_spec = pl.BlockSpec((1, h, w), za_idx,
                                    memory_space=pltpu.VMEM)
        acc_out_shape = jax.ShapeDtypeStruct((d, h, w), jnp.float32)

    scratch = ([pltpu.VMEM((2 * k + 2, h, w), jnp.float32)] * nd
               + [pltpu.VMEM((k + 2, h, w), jnp.float32)] * nd
               + [pltpu.VMEM((2 * k + 3, h, w), jnp.float32)] * 4
               + [pltpu.VMEM((h, w), jnp.float32)] * (8 + nd)
               + vis_scratch)

    # in-place state update (see ALIAS_STATE): operand index of the first
    # history stream is the 13 packed tables + the vis inputs
    aliases = {}
    if ALIAS_STATE and not interpret:
        base = 13 + len(vis_inputs)
        for c in range(nd):
            aliases[base + c] = c
        if prev_acc_padded and padded_out is not None \
                and prev_acc_planes[0].shape == acc_out_shape.shape \
                and prev_acc_planes[0].dtype == jnp.float32:
            for c in range(4):
                aliases[base + nd + c] = nd + c

    outs = pl.pallas_call(
        kernel,
        grid=(d + k + 2,),
        input_output_aliases=aliases,
        in_specs=([smem(spar.shape), smem(sbpar.shape), smem(abpar.shape),
                   smem(slights.shape), smem(lights.shape), smem(dirs.shape),
                   pl.BlockSpec((1, 1, order.shape[2]),
                                lambda j: (jnp.clip(j - (k + 1), 0, d - 1),
                                           0, 0), memory_space=pltpu.SMEM),
                   pl.BlockSpec((1, 1, 1),
                                lambda j: (jnp.clip(j - (k + 1), 0, d - 1),
                                           0, 0), memory_space=pltpu.SMEM),
                   smem(planes.shape), smem(spheres.shape), smem(boxes.shape),
                   smem(hf.shape), smem(med.shape)]
                  + vis_specs + [stream_spec] * nd + [acc_in_spec] * 4),
        out_specs=tuple([sh_out_spec] * nd + [acc_out_spec] * 4),
        out_shape=tuple([jax.ShapeDtypeStruct((d, h, w), jnp.float32)] * nd
                        + [acc_out_shape] * 4),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(spar, sbpar, abpar, slights, lights, dirs, order, count, planes,
      spheres, boxes, hf, med, *vis_inputs,
      *(prev_shadow[i] for i in range(nd)), *prev_acc_planes)
    shadow_vol = jnp.stack(outs[:nd])
    return shadow_vol, tuple(outs[nd:])
