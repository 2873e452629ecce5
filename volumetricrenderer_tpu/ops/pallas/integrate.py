"""Fused Pallas jittered-sample + front-to-back integration kernel.

Replaces `shift_sample_3d(scatter, jitter)` + `accumulate_blocked` (the
reference's Accumulation kernel, VolumetricCompute.compute:172-200) with one
sequential pass over Z:

- the constant-offset trilinear fetch at the jittered froxel center
  (compute:187-188) is done in VMEM: the XY taps are static +-1 `pltpu.roll`s
  blended with traced weights (clamp-to-edge via column/row fixups), and the
  Z tap reuses last step's XY-blended plane from scratch — each scatter plane
  is read from HBM exactly once;
- the (L, T) recurrence (helper:265-273) is carried across grid steps in VMEM
  scratch (TPU grids run sequentially), with the same expm1/Taylor-guarded
  slice integral as ops.scatter_scan.slice_integral;
- the grid runs d+1 steps with the output delayed one step (out[j-1] needs
  plane j for the upper Z tap); step d re-reads plane d-1, which reproduces
  shift_sample_3d's clamp-to-edge top plane exactly.

Requires the jitter Z offset in [0, 1) and XY offsets in (-1, 1) — true for
the close-packing jitter sequence (jitter.py; SPEC "Jitter"). Equivalence vs
the XLA path is pinned by tests/test_integrate_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_xy_blend(ox, oy, h: int, w: int):
    """3-tap clamped XY tent for a single-cell constant jitter offset (the
    in-VMEM form of shift_sample_3d's stencil): wraps pltpu.roll with
    iota-mask edge clamps (roll is a rotate; Mosaic crash list). SINGLE
    SOURCE shared by this kernel, integrate_blend.py, and frame_fused.py."""
    wxm, wx0, wxp = (jnp.maximum(-ox, 0.0), 1.0 - jnp.abs(ox),
                     jnp.maximum(ox, 0.0))
    wym, wy0, wyp = (jnp.maximum(-oy, 0.0), 1.0 - jnp.abs(oy),
                     jnp.maximum(oy, 0.0))
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)

    def xy_blend(plane):
        xm = jnp.where(cols == 0, plane, pltpu.roll(plane, 1, 1))
        xp = jnp.where(cols == w - 1, plane, pltpu.roll(plane, w - 1, 1))
        px = wxm * xm + wx0 * plane + wxp * xp
        ym = jnp.where(rows == 0, px, pltpu.roll(px, 1, 0))
        yp = jnp.where(rows == h - 1, px, pltpu.roll(px, h - 1, 0))
        return wym * ym + wy0 * px + wyp * yp

    return xy_blend


def _kernel(par_ref, r_ref, g_ref, b_ref, e_ref,
            o_r, o_g, o_b, o_t,
            xy_r, xy_g, xy_b, xy_e, c_lr, c_lg, c_lb, c_t,
            *, d: int, h: int, w: int):
    j = pl.program_id(0)
    p = lambda i: par_ref[0, i]
    ox, oy, oz = p(0), p(1), p(2)
    fpz, fpw, near = p(3), p(4), p(5)

    xy_blend = make_xy_blend(ox, oy, h, w)
    cur = [xy_blend(ref[0]) for ref in (r_ref, g_ref, b_ref, e_ref)]

    @pl.when(j == 0)
    def _():
        # no output yet: seed the plane cache and the (L, T) carry
        c_lr[...] = jnp.zeros((h, w), jnp.float32)
        c_lg[...] = jnp.zeros((h, w), jnp.float32)
        c_lb[...] = jnp.zeros((h, w), jnp.float32)
        c_t[...] = jnp.ones((h, w), jnp.float32)
        # overwritten at j=1
        o_r[0] = jnp.zeros((h, w), jnp.float32)
        o_g[0] = jnp.zeros((h, w), jnp.float32)
        o_b[0] = jnp.zeros((h, w), jnp.float32)
        o_t[0] = jnp.ones((h, w), jnp.float32)

    @pl.when(j > 0)
    def _():
        zi = (j - 1).astype(jnp.float32)
        # sampled value for slice j-1: lerp(xy[j-1], xy[j], oz)
        sr = xy_r[...] + oz * (cur[0] - xy_r[...])
        sg = xy_g[...] + oz * (cur[1] - xy_g[...])
        sb = xy_b[...] + oz * (cur[2] - xy_b[...])
        se = xy_e[...] + oz * (cur[3] - xy_e[...])

        # step_0 = vz(0.5) - near; step_i = vz(i+0.5) - vz(i-0.5)  (SPEC)
        vz_hi = (jnp.exp(jnp.log(fpz) * (zi + 0.5) / d) - 1.0) * fpw + near
        vz_lo = jnp.where(
            zi > 0.0,
            (jnp.exp(jnp.log(fpz) * (zi - 0.5) / d) - 1.0) * fpw + near,
            near)
        dz = vz_hi - vz_lo

        # slice_integral with Mosaic-safe accuracy: expm1 has no TPU Pallas
        # lowering, so use a 2nd-order Taylor below od=1e-2 (rel err ~od^3/24
        # <= 4e-8) and (1 - exp(-od)) above (rel err ~6e-8/od <= 6e-6) —
        # both tighter than the XLA path's 1e-5-cutoff 1st-order Taylor.
        od = se * dz
        t = jnp.exp(-od)
        small = od < 1e-2
        safe_sigma = jnp.where(small, 1.0, se)
        factor = jnp.where(small,
                           dz * (1.0 - 0.5 * od * (1.0 - od / 3.0)),
                           (1.0 - t) / safe_sigma)
        tc = c_t[...]
        lr = c_lr[...] + tc * sr * factor
        lg = c_lg[...] + tc * sg * factor
        lb = c_lb[...] + tc * sb * factor
        tt = tc * t
        c_lr[...] = lr
        c_lg[...] = lg
        c_lb[...] = lb
        c_t[...] = tt
        # separate plane outputs: a [1,h,w,4] block would tile its (w, 4)
        # trailing dims as (8,128) -> the 4-wide minor dim pads to 128 lanes
        # (32x VMEM, measured as a 33 MB scoped OOM); XLA interleaves the
        # planes afterwards in one fused copy
        o_r[0] = lr
        o_g[0] = lg
        o_b[0] = lb
        o_t[0] = tt

    xy_r[...] = cur[0]
    xy_g[...] = cur[1]
    xy_b[...] = cur[2]
    xy_e[...] = cur[3]


def accumulate_fused_pallas(planes, jitter, params,
                            grid_whd: Tuple[int, int, int],
                            interpret: bool = False,
                            return_planes: bool = False) -> jax.Array:
    """planes: (r, g, b, extinction) each [D, H, W]; jitter (3,) with
    z-offset in [0, 1). Returns the accumulation volume [D, H, W, 4], or the
    raw (L_r, L_g, L_b, T) planes with return_planes (skips the interleave —
    for the fused temporal blend)."""
    w, h, d = grid_whd
    r, g, b, e = planes
    par = jnp.stack([jitter[0], jitter[1], jitter[2],
                     jnp.asarray(params.z, jnp.float32),
                     jnp.asarray(params.w, jnp.float32),
                     jnp.asarray(params.near, jnp.float32),
                     jnp.float32(0.0), jnp.float32(0.0)])[None]

    kernel = functools.partial(_kernel, d=d, h=h, w=w)
    in_plane = pl.BlockSpec((1, h, w), lambda j: (jnp.minimum(j, d - 1), 0, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(par.shape, lambda j: (0, 0), memory_space=pltpu.SMEM)
    scratch = [pltpu.VMEM((h, w), jnp.float32)] * 8

    lr, lg, lb, tt = pl.pallas_call(
        kernel,
        grid=(d + 1,),
        in_specs=[smem, in_plane, in_plane, in_plane, in_plane],
        out_specs=tuple(pl.BlockSpec((1, h, w),
                                     lambda j: (jnp.maximum(j - 1, 0), 0, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(4)),
        out_shape=tuple(jax.ShapeDtypeStruct((d, h, w), jnp.float32)
                        for _ in range(4)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(par, r, g, b, e)
    if return_planes:
        return lr, lg, lb, tt
    return jnp.concatenate([jnp.stack([lr, lg, lb], axis=-1),
                            tt[..., None]], axis=-1)
