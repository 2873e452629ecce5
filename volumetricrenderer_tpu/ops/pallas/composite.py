"""Fused Pallas composite kernel.

The composite (VolumetricRenderer.shader:69-93) trilinearly samples the
accumulation volume at (W*u, H*v, fz(depth)) per pixel. A per-pixel gather is
~8 ns/element on the TPU scalar core (measured) — 2M pixels x 8 taps ~ 0.5 s.
This kernel removes every gather AND keeps f32-exact results on the bf16 MXU:

- Screen XY maps to the froxel grid *regularly* (integer pixels-per-froxel), so
  the XY taps are static shifts with static per-pixel-in-cell weights.
- The per-pixel Z lerp is done with 0/1 *selection* matrices S0/S1
  (S0[p, z] = [z == floor(fz_p)]) — exactly representable in bf16 — contracted
  against a hi/lo bf16 split of the accumulation rows (concatenated on the
  channel axis, split after the dot): the f32 slice values are reconstructed to
  ~2^-17 and the fractional lerp runs in f32 on the VPU. Exact trilinear
  without Precision.HIGHEST (which crashes Mosaic, PERF.md).
- The 9 XY corners run as an inner grid dimension accumulating into the same
  output block (Mosaic crashed on kernels holding many batched dots; one or two
  per grid step compile fine — PERF.md).

Requires image dims to be integer multiples of the froxel XY dims; the renderer
falls back to the XLA paths otherwise (pipeline.composite).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cell_weights_at(fy: np.ndarray, fx: np.ndarray) -> np.ndarray:
    """Static bilinear XY weights for pixels at in-cell fractional offsets
    fy[py], fx[px] (froxel units from the cell center, each in (-1, 1) so the
    two taps per axis land on shifts {-1,0} or {0,+1}).
    Returns w[3*3, py*px] for dy,dx in (-1,0,1)."""
    py, px = len(fy), len(fx)
    out = np.zeros((3, 3, py, px), np.float32)
    for d in (-1, 0, 1):
        wy = np.maximum(0.0, 1.0 - np.abs(fy - d))
        for e in (-1, 0, 1):
            wx = np.maximum(0.0, 1.0 - np.abs(fx - e))
            out[d + 1, e + 1] = np.outer(wy, wx)
    return out.reshape(9, py * px)


def _cell_weights(py: int, px: int) -> np.ndarray:
    """Static bilinear XY weights per pixel-in-cell for the 3x3 corner shifts.

    Pixel (iy, ix) inside its froxel cell sits at fractional offset
    ((i+0.5)/p - 0.5) from the cell center. Returns w[3*3, py*px]."""
    fy = (np.arange(py) + 0.5) / py - 0.5
    fx = (np.arange(px) + 0.5) / px - 0.5
    return _cell_weights_at(fy, fx)


def _kernel(wmat_ref, fz_ref, row_ref, out_ref, acc_s, *, d: int, d_blk: int,
            w: int, chunk: int, nz: int):
    """Grid (h, cellpx/chunk, 9, D/d_blk): froxel row x pixel chunk x
    XY-corner x Z-block. row_ref is the dy- and zb-selected, x-pre-padded
    hi||lo row piece [1, W+2, d_blk, 2C]; the dx shift is a dynamic slice.
    The corner AND z-block dims accumulate into the same output block — the
    z-lerp is linear in the two selection dots, so per-z-block partial
    contributions sum exactly. Both splits exist because Mosaic's 16 MB
    scoped VMEM limit counts every unrolled temp (CLAUDE.md). The (k, jc)
    weight / fz chunk picks live in the BlockSpec index maps: dynamic lane
    slices must be 128-aligned (Mosaic 'multiple of 128' error), block
    selection is free."""
    k = pl.program_id(2)
    zb = pl.program_id(3)
    dx = k % 3

    row = row_ref[0, pl.ds(dx, w)]               # [W, d_blk, 2C] bf16
    wrow = wmat_ref[0, 0, 0][None]               # [1, chunk]

    fz = fz_ref[0, 0]                            # [W, chunk]
    z0 = jnp.floor(fz)
    frac = (fz - z0)[..., None]
    zi = jax.lax.broadcasted_iota(jnp.int32, (w, chunk, d_blk), 2) \
        + zb * d_blk
    z0i = z0.astype(jnp.int32)[..., None]
    s0 = (zi == z0i).astype(jnp.bfloat16)        # exact 0/1 selection
    s1 = (zi == jnp.minimum(z0i + 1, d - 1)).astype(jnp.bfloat16)

    def sel(s):
        o = jax.lax.dot_general(
            s, row, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [W, chunk, 2C]
        c = o.shape[-1] // 2
        return o[..., :c] + o[..., c:]           # hi + lo -> f32 slice value

    a0 = sel(s0)
    a1 = sel(s1)
    corner = a0 + frac * (a1 - a0)               # f32 z-lerp (partial in zb)
    contrib = corner * wrow.T[None]

    # accumulate across the (k, zb) inner grid dims in PERSISTENT VMEM
    # scratch and write the output block ONCE at the last step — avoids the
    # read-modify-write of a revisited out_ref block, the pattern whose
    # alternating double buffer flushed stale data in frame_fused (sh_last
    # workaround). Verified equivalent to the RMW form here, kept as the
    # robust shape.
    @pl.when((k == 0) & (zb == 0))
    def _():
        acc_s[...] = contrib

    @pl.when((k > 0) | (zb > 0))
    def _():
        acc_s[...] = acc_s[...] + contrib

    @pl.when((k == 8) & (zb == nz - 1))
    def _():
        out_ref[0, 0] = acc_s[...]


def composite_pallas(accumulation: jax.Array, scene_color: jax.Array,
                     fz_texel: jax.Array, grid_whd: Tuple[int, int, int],
                     interpret: bool = False, max_chunk: int = 8) -> jax.Array:
    """accumulation [D,H,W,4]; scene_color [IH,IW,3]; fz_texel [IH,IW] (already
    depth_to_froxel_z - 0.5, unclamped). Returns [IH,IW,4]."""
    w, h, d = grid_whd
    ih, iw = fz_texel.shape
    assert ih % h == 0 and iw % w == 0, "image dims must be froxel multiples"
    py, px = ih // h, iw // w
    cellpx = py * px

    def group(img):
        g = img.reshape(h, py, w, px)
        return jnp.moveaxis(g, 1, 2).reshape(h, w, cellpx)

    fz_c = group(jnp.clip(fz_texel, 0.0, d - 1.0))
    acc_t = jnp.transpose(accumulation, (1, 2, 0, 3))   # [H, W, D, C] f32
    acc_t = jnp.concatenate([acc_t[:, :1], acc_t, acc_t[:, -1:]], axis=1)
    # ROOT CAUSE of the long-standing ~2e-3 "MXU discrepancy" (PERF.md
    # composite post-mortem): computing lo as acc_t - f32(bf16(acc_t)) lets
    # XLA:TPU elide the bf16 round trip as a no-op under its
    # excess-precision rules, so acc_lo compiled to ZEROS and only the hi
    # half ever reached the kernel — a plain-bf16-sized error that was
    # bit-identical across kernel restructures and exact in interpret mode
    # (CPU XLA keeps the convert). lax.reduce_precision performs the bf16
    # rounding un-elidably in f32.
    acc_hi_f = jax.lax.reduce_precision(acc_t, 8, 7)
    acc_hi = acc_hi_f.astype(jnp.bfloat16)             # exact convert
    acc_lo = (acc_t - acc_hi_f).astype(jnp.bfloat16)
    acc_cat = jnp.concatenate([acc_hi, acc_lo], axis=-1)  # [H, W+2, D, 2C]

    # small chunks keep the unrolled s0/s1/iota temps inside Mosaic's 16 MB
    # scoped-VMEM limit (every temp counts, CLAUDE.md)
    chunk = cellpx if cellpx <= max_chunk else max_chunk
    while cellpx % chunk:
        chunk -= 1
    nc = cellpx // chunk
    d_blk = 64 if d % 64 == 0 and d > 64 else d
    nz = d // d_blk
    weights = jnp.asarray(_cell_weights(py, px)).reshape(9, nc, 1, chunk)
    fz_c = fz_c.reshape(h, w, nc, chunk).transpose(0, 2, 1, 3)  # [H,nc,W,chunk]
    kernel = functools.partial(_kernel, d=d, d_blk=d_blk, w=w, chunk=chunk,
                               nz=nz)

    out_c = pl.pallas_call(
        kernel,
        grid=(h, nc, 9, nz),
        in_specs=[
            pl.BlockSpec((1, 1, 1, chunk), lambda i, jc, k, zb: (k, jc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, chunk),
                         lambda i, jc, k, zb: (i, jc, 0, 0),
                         memory_space=pltpu.VMEM),
            # dy = k // 3 - 1, clamped: the y-corner row pick happens in the
            # index map so the kernel holds one row at a time.
            pl.BlockSpec((1, w + 2, d_blk, 8),
                         lambda i, jc, k, zb: (
                             jnp.clip(i + k // 3 - 1, 0, h - 1), 0, zb, 0),
                         memory_space=pltpu.VMEM),
        ],
        # chunk as its own full trailing pair (chunk, 4) keeps the out block
        # legal for any chunk size (the (8,128)-divisible-or-full rule).
        out_specs=pl.BlockSpec((1, 1, w, chunk, 4),
                               lambda i, jc, k, zb: (i, jc, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, nc, w, chunk, 4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((w, chunk, 4), jnp.float32)],
        # the row block's 4-wide minor dim tile-pads to 128 lanes (32x VMEM,
        # CLAUDE.md tiny-minor trap) — fine for this non-default kernel with
        # the scoped limit raised (v5e has 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(weights, fz_c, acc_cat)

    out_c = out_c.transpose(0, 2, 1, 3, 4).reshape(h, w, cellpx, 4)
    out = out_c.reshape(h, w, py, px, 4)
    out = jnp.moveaxis(out, 2, 1).reshape(ih, iw, 4)
    trans = out[..., 3:4]
    rgb = scene_color * trans + out[..., :3]
    return jnp.concatenate([rgb, trans], axis=-1)
