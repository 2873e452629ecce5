"""Fused jittered-sample + integration + accumulation temporal blend.

ops/pallas/integrate.py (sample+scan) and ops/pallas/temporal.py (the
accumulation blend) are BOTH sequential passes over z, glued by a full
[D, H, W] x4-plane HBM round trip (~132 MB/frame) plus a kernel launch. This
kernel runs them as one pass: integrate slice j-1 at step j into a small VMEM
ring, and blend slice z = j-k-1 the moment its integrated plane and the
history ring are both available. Each scatter plane and each history plane is
read from HBM exactly once; the integrated (pre-blend) accumulation volume
never exists.

Ring proof (k = reproj_window): the blend of slice z runs at step z+k+1.
Integrated slice z is written to cur-ring slot z % (k+2) at step z+1 and is
not overwritten until slice z+k+2 at step z+k+3 > z+k+1. History slice s
lives in its (2k+2)-slot ring from step s to s+2k+2, covering every tap
z-k..z+k+1 the blend needs (same proof as ops/pallas/temporal.py).

Semantics == accumulate_fused_pallas followed by fused_temporal_blend
(mode "alpha", the prev.a != 0 success test, compute:246-258), pinned by
tests/test_integrate_blend.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volumetricrenderer_tpu.ops.pallas.integrate import make_xy_blend
from volumetricrenderer_tpu.ops.pallas.temporal import (_pad_plane,
                                                        _reproj_offsets,
                                                        _tent_pass,
                                                        _tent_weights,
                                                        pack_blend_params)


def _kernel(par_ref, *refs, grid_whd: Tuple[int, int, int], k: int,
            h_glob: int, padded_out=None):
    w, h, d = grid_whd
    n_ch = 4
    scat = refs[:n_ch]                       # scatter planes (r, g, b, ext)
    prevs = refs[n_ch:2 * n_ch]              # history planes
    outs = refs[2 * n_ch:3 * n_ch]
    scratch = refs[3 * n_ch:]
    xy_cache = scratch[:n_ch]                # integrate: prev step's XY blend
    carry = scratch[n_ch:2 * n_ch]           # integrate: (L r g b, T) carry
    cur_ring = scratch[2 * n_ch:3 * n_ch]    # integrated slices [k+2, h, w]
    prev_ring = scratch[3 * n_ch:]           # history slices [2k+2, h, w]
    j = pl.program_id(0)
    ring_n = 2 * k + 2
    p = lambda i: par_ref[0, i]
    fpz, fpw, near = p(14), p(15), p(16)
    alpha = p(20)
    ox, oy, oz = p(24), p(25), p(26)

    # ---- history ring load (every step; plane min(j, d-1) via BlockSpec) ----
    slot = jnp.mod(j, ring_n)
    for c in range(n_ch):
        prev_ring[c][pl.ds(slot, 1)] = prevs[c][:]

    # ---- integrate part (ops/pallas/integrate.py body) ----
    xy_blend = make_xy_blend(ox, oy, h, w)

    @pl.when(j <= d)
    def _integrate():
        cur = [xy_blend(ref[0]) for ref in scat]

        @pl.when(j == 0)
        def _():
            carry[0][...] = jnp.zeros((h, w), jnp.float32)
            carry[1][...] = jnp.zeros((h, w), jnp.float32)
            carry[2][...] = jnp.zeros((h, w), jnp.float32)
            carry[3][...] = jnp.ones((h, w), jnp.float32)

        @pl.when(j > 0)
        def _():
            zi = (j - 1).astype(jnp.float32)
            sr = xy_cache[0][...] + oz * (cur[0] - xy_cache[0][...])
            sg = xy_cache[1][...] + oz * (cur[1] - xy_cache[1][...])
            sb = xy_cache[2][...] + oz * (cur[2] - xy_cache[2][...])
            se = xy_cache[3][...] + oz * (cur[3] - xy_cache[3][...])

            vz_hi = (jnp.exp(jnp.log(fpz) * (zi + 0.5) / d) - 1.0) * fpw + near
            vz_lo = jnp.where(
                zi > 0.0,
                (jnp.exp(jnp.log(fpz) * (zi - 0.5) / d) - 1.0) * fpw + near,
                near)
            dz = vz_hi - vz_lo

            od = se * dz
            t = jnp.exp(-od)
            small = od < 1e-2
            safe_sigma = jnp.where(small, 1.0, se)
            factor = jnp.where(small,
                               dz * (1.0 - 0.5 * od * (1.0 - od / 3.0)),
                               (1.0 - t) / safe_sigma)
            tc = carry[3][...]
            lr = carry[0][...] + tc * sr * factor
            lg = carry[1][...] + tc * sg * factor
            lb = carry[2][...] + tc * sb * factor
            tt = tc * t
            carry[0][...] = lr
            carry[1][...] = lg
            carry[2][...] = lb
            carry[3][...] = tt
            cslot = jnp.mod(j - 1, k + 2)
            cur_ring[0][pl.ds(cslot, 1)] = lr[None]
            cur_ring[1][pl.ds(cslot, 1)] = lg[None]
            cur_ring[2][pl.ds(cslot, 1)] = lb[None]
            cur_ring[3][pl.ds(cslot, 1)] = tt[None]

        for c in range(n_ch):
            xy_cache[c][...] = cur[c]

    # ---- blend part (ops/pallas/temporal.py body, mode "alpha") ----
    @pl.when(j > k)
    def _blend():
        z = j - (k + 1)
        off_x, off_y, off_z, _ = _reproj_offsets(
            par_ref, z, grid_whd, h_glob, k, with_jitter=False)

        warped = []
        # weight planes shared across channels (hoisted, temporal._tent_weights)
        ztaps = [(jnp.mod(jnp.clip(z + dd, 0, d - 1), ring_n),
                  jnp.maximum(0.0, 1.0 - jnp.abs(off_z - dd)))
                 for dd in range(-k, k + 1)]
        wys = _tent_weights(off_y, k)
        wxs = _tent_weights(off_x, k)
        for c in range(n_ch):
            acc = jnp.zeros((h, w), jnp.float32)
            for slot, wz in ztaps:
                acc = acc + prev_ring[c][pl.ds(slot, 1)][0] * wz
            acc = _tent_pass(acc, None, 0, k, ws=wys)
            acc = _tent_pass(acc, None, 1, k, ws=wxs)
            warped.append(acc)

        wgt = alpha * (warped[3] != 0.0).astype(jnp.float32)
        cslot = jnp.mod(z, k + 2)
        for c in range(n_ch):
            cur = cur_ring[c][pl.ds(cslot, 1)][0]
            res = cur + wgt * (warped[c] - cur)
            if padded_out is not None:
                res = _pad_plane(res, *padded_out)
            outs[c][0] = res


def integrate_blend_fused(scatter_planes, prev_planes, jitter, params,
                          view_to_world, prev_world_to_view, alpha,
                          grid_whd: Tuple[int, int, int], k: int,
                          interpret: bool = False,
                          padded_out=None):
    """scatter_planes: (r, g, b, ext) [D, H, W]; prev_planes: history
    accumulation channel planes (L_r, L_g, L_b, T) [D, H, W]. Returns the 4
    BLENDED accumulation planes ([D, H, W], or the zgather padded layout with
    padded_out=(hp, wstride))."""
    w, h, d = grid_whd
    par = pack_blend_params(params, view_to_world, prev_world_to_view,
                            jnp.zeros((3,), jnp.float32), alpha, 0.0)
    par = jnp.concatenate([par, jnp.stack([
        jitter[0], jitter[1], jitter[2], jnp.float32(0.0)])[None]], axis=1)

    kernel = functools.partial(_kernel, grid_whd=grid_whd, k=k,
                               h_glob=params.grid[1], padded_out=padded_out)

    in_plane = pl.BlockSpec((1, h, w), lambda j: (jnp.minimum(j, d - 1), 0, 0),
                            memory_space=pltpu.VMEM)
    out_idx = lambda j: (jnp.maximum(j - (k + 1), 0), 0, 0)
    if padded_out is not None:
        from volumetricrenderer_tpu.ops.pallas.zg_composite import DLANES
        hp, wstride = padded_out
        out_spec = pl.BlockSpec((1, hp, wstride), out_idx,
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((DLANES, hp, wstride), jnp.float32)
    else:
        out_spec = pl.BlockSpec((1, h, w), out_idx, memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((d, h, w), jnp.float32)
    smem = pl.BlockSpec(par.shape, lambda j: (0, 0), memory_space=pltpu.SMEM)

    scratch = ([pltpu.VMEM((h, w), jnp.float32)] * 8
               + [pltpu.VMEM((k + 2, h, w), jnp.float32)] * 4
               + [pltpu.VMEM((2 * k + 2, h, w), jnp.float32)] * 4)

    return pl.pallas_call(
        kernel,
        grid=(d + k + 1,),
        in_specs=[smem] + [in_plane] * 8,
        out_specs=tuple([out_spec] * 4),
        out_shape=tuple([out_shape] * 4),
        scratch_shapes=scratch,
        # ~4.7 MB of ring/carry scratch + 8 in / 4 padded-out pipeline
        # buffers + the blend's unrolled warp taps: measured 19.2 MB scoped
        # peak at FULL size — over the 16 MB default, well under v5e's
        # 128 MB (same raise as ops/pallas/zg_composite.py)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(par, *scatter_planes, *prev_planes)
