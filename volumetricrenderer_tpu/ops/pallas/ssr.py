"""Pallas SSR march (the VMEM-resident form of post._ssr_p's loop).

The XLA SSR march measures ~1.2 ms at 1080p (PERF.md round 5): its ~96
(direction, radius) iterations each shift the quarter-res depth plane and
three color planes through HBM pad/slice materializations. At quarter res
the ENTIRE working set is a few MB — this kernel keeps every plane in VMEM
and turns all ~384 shifted reads into static slices of edge-padded arrays
(the megakernel warp pattern: padded-copy + shifted-slices, CLAUDE.md),
so the march runs at VMEM bandwidth.

Layout: planes arrive PRE-PADDED by PAD on each side ([hq+2*PAD, wq+2*PAD],
lane dim padded by the caller to a 128 multiple), PAD >= the largest march
radius; a shift is then `padded[PAD+oy : .., PAD+ox : ..]`. Out-of-screen
contributions are zeroed by iota masks exactly like the XLA path (the pad
CONTENT never matters, but edge replication keeps it finite).

The hit test, 1/z line, first-hit mask and accumulators mirror post._ssr_p
term for term (equivalence-tested in tests/test_post.py); the fresnel /
distance-fade / intensity scaling and the upsample stay in XLA.

Reference: ScreenSpaceReflections.hlsl:137 (March), .cs:90 (presets).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(dq_ref, cr_ref, cg_ref, cb_ref, invz0_ref, g_ref, bin_ref,
            valid_ref, rr_ref, rg_ref, rb_ref, aw_ref, at_ref, *,
            hq: int, wq: int, hq_real: int, wq_real: int, pad: int,
            offsets: tuple, thickness: float, max_px: float):
    """offsets: per-bin tuple of (t_prev, t, oy, ox) march taps."""
    def win(ref, oy=0, ox=0):
        return ref[pad + oy:pad + oy + hq, pad + ox:pad + ox + wq]

    dq = win(dq_ref)
    invz0 = win(invz0_ref)
    g = win(g_ref)
    bin_idx = win(bin_ref)
    valid = win(valid_ref)
    yy = jax.lax.broadcasted_iota(jnp.int32, (hq, wq), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (hq, wq), 1)

    rr = jnp.zeros((hq, wq), jnp.float32)
    rg = jnp.zeros((hq, wq), jnp.float32)
    rb = jnp.zeros((hq, wq), jnp.float32)
    awt = jnp.zeros((hq, wq), jnp.float32)
    att = jnp.zeros((hq, wq), jnp.float32)
    for b, taps in enumerate(offsets):
        sel = (bin_idx == float(b)).astype(jnp.float32) * valid
        not_hit = jnp.ones((hq, wq), jnp.float32)
        acc_r = jnp.zeros((hq, wq), jnp.float32)
        acc_g = jnp.zeros((hq, wq), jnp.float32)
        acc_b = jnp.zeros((hq, wq), jnp.float32)
        aw = jnp.zeros((hq, wq), jnp.float32)
        at = jnp.zeros((hq, wq), jnp.float32)
        for (t_prev, t, oy, ox) in taps:
            zs = win(dq_ref, oy, ox)
            invz = invz0 + g * t
            z_ray = jnp.where(invz > 1e-4,
                              1.0 / jnp.maximum(invz, 1e-4), 1e9)
            invz_p = invz0 + g * t_prev
            z_prev = jnp.where(invz_p > 1e-4,
                               1.0 / jnp.maximum(invz_p, 1e-4), 1e9)
            # REAL screen bounds (hq/wq are the padded compute window;
            # pixels past hq_real/wq_real are alignment junk, cropped by
            # the caller, and must neither hit nor be hit)
            onscreen = ((yy + oy >= 0) & (yy + oy < hq_real)
                        & (xx + ox >= 0)
                        & (xx + ox < wq_real)).astype(jnp.float32)
            hit = ((z_ray >= zs)
                   & (z_prev <= zs + thickness)).astype(jnp.float32) \
                * onscreen
            wgt = not_hit * hit
            acc_r = acc_r + wgt * win(cr_ref, oy, ox)
            acc_g = acc_g + wgt * win(cg_ref, oy, ox)
            acc_b = acc_b + wgt * win(cb_ref, oy, ox)
            aw = aw + wgt
            at = at + wgt * (t / max_px)
            not_hit = not_hit * (1.0 - hit)
        rr = rr + sel * acc_r
        rg = rg + sel * acc_g
        rb = rb + sel * acc_b
        awt = awt + sel * aw
        att = att + sel * at
    rr_ref[...] = rr
    rg_ref[...] = rg
    rb_ref[...] = rb
    aw_ref[...] = awt
    at_ref[...] = att


def ssr_march_pallas(dq, colors: Sequence, invz0, g, bin_idx, valid,
                     offsets: tuple, thickness: float, max_px: float,
                     interpret: bool = False
                     ) -> Tuple[jax.Array, ...]:
    """All inputs [hq, wq] f32 (quarter-res planes from post._ssr_p's
    geometry stage); offsets as produced by post._ssr_offsets. Returns
    (refl_r, refl_g, refl_b, hit_w, hit_t)."""
    hq, wq = dq.shape
    pad = 8 * (-(-int(max_px) // 8))
    hq_al = 8 * (-(-hq // 8))
    wq_al = 128 * (-(-wq // 128))

    def prep(p):
        # edge-replicate by pad (+ tile alignment on the bottom/right)
        bot = pad + (hq_al - hq)
        p = jnp.concatenate([p[:1]] * pad + [p] + [p[-1:]] * bot, axis=0)
        right = pad + (wq_al - wq)
        return jnp.concatenate([p[:, :1]] * pad + [p]
                               + [p[:, -1:]] * right, axis=1)

    ins = [prep(p) for p in (dq, colors[0], colors[1], colors[2],
                             invz0, g, bin_idx, valid)]
    kernel = functools.partial(_kernel, hq=hq_al, wq=wq_al, hq_real=hq,
                               wq_real=wq, pad=pad,
                               offsets=offsets, thickness=float(thickness),
                               max_px=float(max_px))
    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 5),
        out_shape=tuple([jax.ShapeDtypeStruct((hq_al, wq_al), jnp.float32)]
                        * 5),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins)
    return tuple(o[:hq, :wq] for o in outs)
