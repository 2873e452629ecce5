"""Fused Pallas cascaded-PCF shadow-volume kernel (shadow_mode="map").

The reference's core shadowing technique is 1-tap PCF on a cascaded shadow
atlas (VolumetricShadowCompute.compute:9-19 sampling via SampleDirShadow,
VolumetricHelper.hlsl:196-235). The XLA/gather port is oracle-exact but
~8 ns/element serial on TPU (~2.5 s/frame at FULL size) — unusable. This
kernel reformulates the per-froxel atlas taps with the two Mosaic-supported
gather forms (take_along_axis at src/idx width EXACTLY 128, and in-VMEM
transposes — tools/probe_taa.py):

- With the camera-ALIGNED light basis (shadow._light_basis(align_up=...)),
  the froxel->atlas map per z-slice is affine with u depending on froxel x
  ONLY: u = a_u*x + c_u, v = a_v*x + b_v*y + c_v, ref = a_r*x + b_r*y + c_r.
  The host packs these per-(slice, cascade) coefficients into SMEM.
- Column pass: the atlas window rows share one u-index row -> 128-wide
  take_along_axis per (output chunk, column block), masked block select.
- Transpose, then row pass: per-(x, y) v-indices gather along the v window,
  same 128-chunking. Two traversals replace the unsupported 2D gather.
- The 4 PCF taps (dx via a doubled x' lane layout, dy via two index sets),
  bilinear compare weights, split-sphere one-hot cascade select (exact:
  one-hot makes select-then-sample == sample-then-select), strength lerp,
  visibility^2 and the has_shadow gate are all elementwise in-kernel.
- A conservative per-slice cascade schedule (slice AABB vs split spheres,
  like the scatter kernel's light culling) bounds the work to the 1-2
  cascades a slice can actually select.

Window caveat: each (slice, cascade) visit gathers from a 512x512 atlas
window centered on the slice's footprint (host-computed, 128-aligned). A
footprint wider than 512 texels (extreme shear/scale) would clamp to the
window edge — _schedule detects any active (slice, cascade) whose corner tap
indices exceed its window and the caller NaN-poisons the output, so an
out-of-envelope config fails loudly instead of rendering wrong shadows.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_WIN = 512      # atlas window cap (rows and cols), 4 blocks of 128


def _ceil128(n: int) -> int:
    return -(-n // 128) * 128


def _schedule(params, view_to_world, jitter, data, li, grid_whd, win: int):
    """Host-side per-(slice, cascade) affine coefs + windows + cascade cull.

    Returns (coef [D, C, 8] f32, win [D, C, 2] i32 block starts (v, u),
    order [D, 1, C] i32, count [D, 1, 1] i32)."""
    from volumetricrenderer_tpu import froxel as froxel_lib

    w, h, d = grid_whd
    h_glob = params.grid[1]
    s2 = data.atlas.shape[-1]
    r3 = view_to_world[:3, :3]
    t3 = view_to_world[:3, 3]
    jx, jy, jz = jitter[0], jitter[1], jitter[2]

    zs = jnp.arange(d, dtype=jnp.float32)
    vz = froxel_lib.froxel_z_to_view_z(params, zs + 0.5 + jz)        # [D]

    # world(x, y; z) = C0[z] + x*X[z] + y*Y[z]
    xdir = r3[:, 0][None] * (2.0 * vz / (w * params.x))[:, None]     # [D, 3]
    ydir = r3[:, 1][None] * (2.0 * vz / (h_glob * params.y))[:, None]
    c0 = (r3[:, 0][None] * ((2.0 * (0.5 + jx) / w - 1.0) * vz / params.x)[:, None]
          + r3[:, 1][None] * ((2.0 * (0.5 + jy) / h_glob - 1.0) * vz / params.y)[:, None]
          + r3[:, 2][None] * vz[:, None] + t3[None])

    mats = data.world_to_uv[li]                                       # [C, 3, 4]
    dot = lambda m, v: jnp.einsum("cx,dx->dc", m, v,
                                  precision=jax.lax.Precision.HIGHEST)
    coefs = []
    for row, scale, off in ((0, float(s2), -0.5), (1, float(s2), -0.5),
                            (2, 1.0, 0.0)):
        m3 = mats[:, row, :3]
        a = scale * dot(m3, xdir)                                     # [D, C]
        b = scale * dot(m3, ydir)
        c = scale * (dot(m3, c0) + mats[None, :, row, 3]) + off
        coefs.append((a, b, c))
    (a_u, b_u, c_u), (a_v, b_v, c_v), (a_r, b_r, c_r) = coefs
    c_r = c_r - data.bias[li]

    y0 = jnp.asarray(params.y0, jnp.float32)   # slab row offset (0 whole-grid)

    # Only froxels INSIDE cascade ci's split sphere contribute (the in-kernel
    # one-hot mask zeroes the rest), and the bake maps the sphere into its own
    # s2/2-wide atlas quad: clip the slice footprint to the sphere's quad
    # bounds (from the sphere center, layout-agnostic) so the window centers
    # on the region that matters. Margin covers the texel snap + the +1 tap.
    sph_c = data.split_spheres[li]                                    # [C, 3]
    margin = 4.0
    quad = []
    qctr = []
    for row in (0, 1):                                                # u, v
        m3 = mats[:, row, :3]
        ctr = s2 * (jnp.sum(m3 * sph_c, axis=1) + mats[:, row, 3]) - 0.5
        qctr.append(ctr)
        quad.append((ctr - s2 / 4 - margin, ctr + s2 / 4 + margin))   # [C] lo/hi

    def footprint(a, b, c, qlo, qhi):
        cy = c + b * y0
        corners = jnp.stack([cy, cy + a * (w - 1), cy + b * (h - 1),
                             cy + a * (w - 1) + b * (h - 1)])          # [4,D,C]
        raw_lo = jnp.min(corners, 0)
        raw_hi = jnp.max(corners, 0)
        lo = jnp.maximum(raw_lo, qlo[None])
        hi = jnp.minimum(raw_hi, qhi[None])
        lo = jnp.clip(jnp.floor(lo), 0, s2 - 1)
        hi = jnp.clip(jnp.floor(jnp.maximum(hi, lo)) + 1, 0, s2 - 1)
        return lo, hi, raw_lo, raw_hi

    qblk = (s2 // 2) // 128
    wblk = win // 128

    def window(lo, hi, ctr_q):
        # footprint-centered, then clamped INSIDE the cascade's quad: every
        # contributing tap lives in quad content, so block-rounding slop must
        # never push the window past a quad edge (it would trade covered
        # content texels for never-sampled neighbor-quad ones)
        ctr = 0.5 * (lo + hi)
        st = jnp.round(ctr / 128.0).astype(jnp.int32) - win // 256
        if qblk >= wblk:
            q0 = jnp.round((ctr_q - s2 / 4) / 128.0).astype(jnp.int32)
            st = jnp.clip(st, q0[None], q0[None] + (qblk - wblk))
        return jnp.clip(st, 0, s2 // 128 - wblk)                      # blocks

    lo_u, hi_u, raw_lo_u, raw_hi_u = footprint(a_u, jnp.zeros_like(b_u), c_u,
                                               *quad[0])
    lo_v, hi_v, raw_lo_v, raw_hi_v = footprint(a_v, b_v, c_v, *quad[1])
    winb = jnp.stack([window(lo_v, hi_v, qctr[1]),
                      window(lo_u, hi_u, qctr[0])], axis=-1)

    # conservative slice-vs-split-sphere cascade cull (cf. slice_light_order)
    z0 = jnp.clip(zs - 0.5, 0.0, float(d))
    z1 = jnp.clip(zs + 1.5, 0.0, float(d))
    xs = jnp.asarray([0.0, float(w)])
    ys = jnp.stack([y0, y0 + h])               # this slab's global row extent
    fx, fy = jnp.meshgrid(xs, ys, indexing="ij")
    fx = jnp.broadcast_to(fx.reshape(1, 4), (d, 4))
    fy = jnp.broadcast_to(fy.reshape(1, 4), (d, 4))
    corners = [jnp.stack([fx, fy, jnp.broadcast_to(fz[:, None], (d, 4))], -1)
               for fz in (z0, z1)]
    fro = jnp.concatenate(corners, axis=1)                            # [D, 8, 3]
    world = froxel_lib.transform_points(
        view_to_world, froxel_lib.froxel_to_view(params, fro))
    lo = jnp.min(world, axis=1)
    hi = jnp.max(world, axis=1)
    sph = data.split_spheres[li]                                      # [C, 3]
    sqr = data.split_sq_radii[li]                                     # [C]
    nearest = jnp.clip(sph[None], lo[:, None], hi[:, None])
    d2min = jnp.sum((nearest - sph[None]) ** 2, axis=-1)              # [D, C]
    farthest = jnp.where(jnp.abs(lo[:, None] - sph[None])
                         > jnp.abs(hi[:, None] - sph[None]),
                         lo[:, None], hi[:, None])
    d2max = jnp.sum((farthest - sph[None]) ** 2, axis=-1)
    may_inside = d2min < sqr[None]
    may_outside_prev = jnp.concatenate(
        [jnp.ones((d, 1), bool), d2max[:, :-1] >= sqr[None, :-1]], axis=1)
    active = may_inside & may_outside_prev
    order = jnp.argsort(~active, axis=1, stable=True).astype(jnp.int32)
    count = jnp.sum(active, axis=1, dtype=jnp.int32)

    # Window-overflow guard: the kernel clamps gathered indices to the win-
    # texel window; a (slice, cascade) whose CONTRIBUTING footprint exceeds
    # it would render wrong shadows SILENTLY. Contribution is bounded by the
    # quad CONTENT (ctr +/- s2/4, no margin): the split sphere maps exactly
    # into its s2/2-wide quad and the in-kernel mask vanishes outside it, so
    # a <=1-texel bilinear-tap spill past the quad edge only clamps taps of
    # mask~0 froxels (tol covers the tap + floor rounding — measured spills
    # at s2=1024, where quad width == win, are <= margin+1 and harmless).
    # Flag any ACTIVE cascade whose content footprint falls outside its
    # chosen window; the caller NaN-poisons the output so an out-of-envelope
    # config (possible once s2/2 > win, i.e. atlas > 1024) fails loudly
    # instead of clamping (VERDICT r2 weak #4).
    if win < s2:
        tol = 2.0
        def oob(raw_lo, raw_hi, ctr, blk):
            lo_f = jnp.maximum(raw_lo, (ctr - s2 / 4)[None])
            hi_f = jnp.minimum(raw_hi, (ctr + s2 / 4)[None])
            st = (blk * 128).astype(jnp.float32)
            spill = (lo_f < st - tol) | (hi_f + 1.0 > st + win + tol)
            return spill & (hi_f >= lo_f)      # no quad overlap = no taps
        over = (oob(raw_lo_u, raw_hi_u, qctr[0], winb[..., 1])
                | oob(raw_lo_v, raw_hi_v, qctr[1], winb[..., 0]))
        overflow = jnp.any(over & active)
    else:  # the window covers the whole atlas: the clamp IS the atlas clamp
        overflow = jnp.asarray(False)

    coef = jnp.stack([a_u, c_u, a_v, b_v, c_v, a_r, b_r, c_r], axis=-1)
    par = jnp.stack([
        jnp.asarray(v, jnp.float32) for v in
        [params.x, params.y, params.z, params.w, params.near,
         jitter[0], jitter[1], jitter[2],
         view_to_world[0, 0], view_to_world[0, 1], view_to_world[0, 2],
         view_to_world[0, 3], view_to_world[1, 0], view_to_world[1, 1],
         view_to_world[1, 2], view_to_world[1, 3], view_to_world[2, 0],
         view_to_world[2, 1], view_to_world[2, 2], view_to_world[2, 3],
         data.strength_r[li], y0, 0.0, 0.0]])[None]
    spheres = jnp.concatenate([sph, sqr[:, None]], axis=-1)           # [C, 4]
    return (par, coef, winb, order[:, None, :], count[:, None, None], spheres,
            overflow)


def _taa_windowed(src, idx, win: int):
    """Gather src[r, idx[r, l]] where src is [R, win]: 128-wide block select
    (Mosaic take_along_axis is only correct at src/idx width exactly 128)."""
    out = jnp.zeros(idx.shape, jnp.float32)
    for k in range(win // 128):
        local = jnp.clip(idx - 128 * k, 0, 127)
        g = jnp.take_along_axis(src[:, 128 * k:128 * (k + 1)], local, axis=1)
        out = jnp.where(idx // 128 == k, g, out)
    return out


def _kernel(par_ref, coef_ref, win_ref, order_ref, count_ref, sph_ref,
            atlas_ref, out_ref, *, grid_whd: Tuple[int, int, int],
            s2: int, win: int, h_glob: int, num_c: int, unroll: bool):
    w, h, d = grid_whd
    xp = 2 * _ceil128(w)               # x' lanes: dx tap blocks [0..] [xp/2..]
    yp = _ceil128(h)
    zi = pl.program_id(0)
    p = lambda i: par_ref[0, i]
    fpx, fpy, fpz, fpw, near = p(0), p(1), p(2), p(3), p(4)
    jx, jy, jz = p(5), p(6), p(7)
    strength_r = p(20)
    y0 = p(21)                         # slab row offset (0 when whole-grid)

    # jittered world position planes (for the split-sphere cascade pick)
    fz = zi.astype(jnp.float32) + 0.5 + jz
    vz = (jnp.exp(jnp.log(fpz) * fz / d) - 1.0) * fpw + near
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    # global rows, clamped (halo rows replicate the edge row, cf. dir_shadow)
    ys = jnp.clip(ys + y0, 0.0, h_glob - 1.0)
    vx = (2.0 * (xs + 0.5 + jx) / w - 1.0) * vz / fpx
    vy = (2.0 * (ys + 0.5 + jy) / h_glob - 1.0) * vz / fpy
    wx = p(8) * vx + p(9) * vy + p(10) * vz + p(11)
    wy = p(12) * vx + p(13) * vy + p(14) * vz + p(15)
    wz = p(16) * vx + p(17) * vy + p(18) * vz + p(19)

    def inside(ci):
        dx_ = wx - sph_ref[ci, 0]
        dy_ = wy - sph_ref[ci, 1]
        dz_ = wz - sph_ref[ci, 2]
        return dx_ * dx_ + dy_ * dy_ + dz_ * dz_ < sph_ref[ci, 3]

    # x' lane layout geometry for the gathers
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (xp, 128), 0)
    x_of_r = jnp.where(rows2 >= xp // 2, rows2 - xp // 2, rows2) \
        .astype(jnp.float32)

    def cascade_body(k, carry, gate=None):
        acc_cmp, acc_mask = carry
        ci = order_ref[0, 0, k]
        q = lambda i: coef_ref[0, ci, i]
        a_u, c_u = q(0), q(1)
        a_v, b_v, c_v = q(2), q(3), q(4)
        a_r, b_r, c_r = q(5), q(6), q(7)
        vblk = win_ref[0, ci, 0]
        ublk = win_ref[0, ci, 1]
        vst = vblk * 128
        ust = pl.multiple_of(ublk * 128, 128)

        # --- column pass: C[vrow, x'] = atlas[vst+vrow, u0(x)+dx] ---
        # each 128-lane index chunk is BUILT at width 128 (slicing a wide
        # computed index array into chunks trips Mosaic's layout pass:
        # vector_extract_strided_slice "limits 64 vs dim 1", probe_pcf_ops g6)
        awin = atlas_ref[pl.ds(vst, win), pl.ds(ust, win)]    # [win, win]
        cols = []
        for qk in range(xp // 128):
            rowq = jax.lax.broadcasted_iota(jnp.int32, (win, 128), 1) \
                + 128 * qk
            xq = jnp.where(rowq >= xp // 2, rowq - xp // 2, rowq)
            dxq = (rowq >= xp // 2).astype(jnp.int32)
            u_q = a_u * xq.astype(jnp.float32) + c_u
            gu = jnp.clip(jnp.floor(u_q).astype(jnp.int32) + dxq, 0, s2 - 1)
            idx_u = jnp.clip(gu - ust, 0, win - 1)            # [win, 128]
            cols.append(_taa_windowed(awin, idx_u, win))
        cmat = jnp.concatenate(cols, axis=1)                  # [win, xp]
        ct = cmat.T                                           # [xp, win]

        # --- row pass: G[x', y] = C[v0(x, y)+dy - vst, x'] ---
        taps = []
        for dy in (0, 1):
            chunks = []
            for m in range(yp // 128):
                y_l = (jax.lax.broadcasted_iota(jnp.int32, (xp, 128), 1)
                       + 128 * m).astype(jnp.float32)
                y_l = jnp.clip(y_l + y0, 0.0, h_glob - 1.0)   # global rows
                v_t = a_v * x_of_r + b_v * y_l + c_v
                gv = jnp.clip(jnp.floor(v_t).astype(jnp.int32) + dy, 0, s2 - 1)
                idx_v = jnp.clip(gv - vst, 0, win - 1)
                chunks.append(_taa_windowed(ct, idx_v, win))
            taps.append(jnp.concatenate(chunks, axis=1))      # [xp, yp]

        # back to froxel layout: tap(dy, dx) [h, w]
        def plane(g, dx):
            return g[dx * (xp // 2):dx * (xp // 2) + w, :h].T
        t00 = plane(taps[0], 0)
        t01 = plane(taps[0], 1)
        t10 = plane(taps[1], 0)
        t11 = plane(taps[1], 1)

        # bilinear-compare weights at the froxel layout (helper:232)
        u_t = a_u * xs + c_u
        v_t = a_v * xs + b_v * ys + c_v
        ref = a_r * xs + b_r * ys + c_r
        fu = u_t - jnp.floor(u_t)
        fv = v_t - jnp.floor(v_t)
        le = lambda t: (ref <= t).astype(jnp.float32)
        cmp = ((1.0 - fv) * ((1.0 - fu) * le(t00) + fu * le(t01))
               + fv * ((1.0 - fu) * le(t10) + fu * le(t11)))

        # one-hot split-sphere select (helper:196-206)
        # scalar-condition select over vectors fails to legalize in Mosaic
        # (arith.select) — gate the prev-sphere test arithmetically instead
        ins = inside(ci).astype(jnp.float32)
        prev = inside(jnp.maximum(ci - 1, 0)).astype(jnp.float32) \
            * (ci > 0).astype(jnp.float32)
        mask = ins * (1.0 - prev)
        if gate is not None:
            mask = mask * gate
        return acc_cmp + mask * cmp, acc_mask + mask

    zero = jnp.zeros((h, w), jnp.float32)
    n_act = count_ref[0, 0, 0]
    if unroll:
        # Python-unrolled cascades (k < n_act gated arithmetically). The
        # fori_loop path below is the VERIFIED production default on this
        # jaxlib (compiled + traced on the TPU, PERF.md 1.55 ms); the unroll
        # is kept as a bring-up fallback in case a future Mosaic regresses on
        # this body's gathers/transposes as loop-carried region values.
        carry = (zero, zero)
        for k in range(num_c):
            gate = (k < n_act).astype(jnp.float32)
            carry = cascade_body(k, carry, gate=gate)
        acc_cmp, acc_mask = carry
    else:
        acc_cmp, acc_mask = jax.lax.fori_loop(0, n_act, cascade_body,
                                              (zero, zero))

    # outside all cascades: fully lit (helper:219-222)
    cmp = acc_cmp + (1.0 - jnp.minimum(acc_mask, 1.0))
    vis = strength_r + (1.0 - strength_r) * cmp
    out_ref[0] = vis * vis                    # shadowCompute:17 (host gates)


def pcf_dir_shadow_pallas(params, view_to_world, jitter, dir_lights, data,
                          grid_whd: Tuple[int, int, int],
                          interpret: bool = False,
                          unroll: bool = False) -> jax.Array:
    """[Nd, D, H, W] map-mode directional shadow volume (visibility squared,
    gated) — the fused equivalent of shadow.sample_dir_shadow + the squaring
    in pipeline.write_shadow_volume_dir. Requires data.aligned (camera-aligned
    bake); H-sharded slabs supported via params.y0 (global-row offsets enter
    the affine atlas coords and the split-sphere world positions)."""
    w, h, d = grid_whd
    s2 = data.atlas.shape[-1]
    assert data.aligned, "pcf kernel needs the camera-aligned bake"
    assert s2 % 128 == 0, f"atlas size {s2} must be a multiple of 128"
    win = min(MAX_WIN, s2)

    outs = []
    for li in range(dir_lights.count):
        par, coef, winb, order, count, spheres, overflow = _schedule(
            params, view_to_world, jitter, data, li, grid_whd, win)

        kernel = functools.partial(_kernel, grid_whd=grid_whd, s2=s2,
                                   win=win, h_glob=params.grid[1],
                                   num_c=int(order.shape[2]), unroll=unroll)
        smem = lambda shape: pl.BlockSpec(
            shape, lambda i: tuple([0] * len(shape)), memory_space=pltpu.SMEM)
        out = pl.pallas_call(
            kernel,
            grid=(d,),
            in_specs=[
                smem(par.shape),
                pl.BlockSpec((1,) + coef.shape[1:], lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1,) + winb.shape[1:], lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, order.shape[2]), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                smem(spheres.shape),
                pl.BlockSpec((s2, s2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((d, h, w), jnp.float32),
            interpret=interpret,
        )(par, coef, winb, order, count, spheres, data.atlas[li])
        # has_shadow gate (gate arithmetic, matching the XLA path)
        g = dir_lights.has_shadow[li].astype(jnp.float32)
        res = 1.0 + g * (out - 1.0)
        # fail LOUDLY on window overflow (only when this light's shadow is
        # actually consumed): NaN-poison instead of silently clamped shadows
        res = res + jnp.where(overflow & (g > 0.0),
                              jnp.float32(jnp.nan), jnp.float32(0.0))
        outs.append(res)
    return jnp.stack(outs)
