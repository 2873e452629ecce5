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


def _cell_weights(py: int, px: int) -> np.ndarray:
    """Static bilinear XY weights per pixel-in-cell for the 3x3 corner shifts.

    Pixel (iy, ix) inside its froxel cell sits at fractional offset
    ((i+0.5)/p - 0.5) from the cell center; its two taps per axis land on
    shifts {-1,0} or {0,+1}. Returns w[3*3, py*px] for dy,dx in (-1,0,1)."""
    out = np.zeros((3, 3, py, px), np.float32)
    fy = (np.arange(py) + 0.5) / py - 0.5
    fx = (np.arange(px) + 0.5) / px - 0.5
    for d in (-1, 0, 1):
        wy = np.maximum(0.0, 1.0 - np.abs(fy - d))
        for e in (-1, 0, 1):
            wx = np.maximum(0.0, 1.0 - np.abs(fx - e))
            out[d + 1, e + 1] = np.outer(wy, wx)
    return out.reshape(9, py * px)


def _kernel(wmat_ref, fz_ref, row_ref, out_ref, *, d: int, w: int,
            chunk: int):
    """Grid (h, cellpx/chunk, 9): froxel row x pixel chunk x XY-corner.
    row_ref is the dy-selected, x-pre-padded hi||lo row [1, W+2, D, 2C]; the
    dx shift is a dynamic slice. The corner dim accumulates into the same
    output block; the chunk lives in the GRID because Mosaic's 16 MB scoped
    VMEM limit counts every unrolled temp (CLAUDE.md)."""
    jc = pl.program_id(1)
    k = pl.program_id(2)
    dx = k % 3

    row = row_ref[0, pl.ds(dx, w)]               # [W, D, 2C] bf16
    # full-width blocks + in-kernel dynamic lane slices: chunk-sized blocks
    # violate Mosaic's (8, 128)-divisible-or-full block rule
    wrow = wmat_ref[pl.ds(k, 1), pl.ds(jc * chunk, chunk)]   # [1, chunk]

    fz = fz_ref[0, :, pl.ds(jc * chunk, chunk)]  # [W, chunk]
    z0 = jnp.floor(fz)
    frac = (fz - z0)[..., None]
    zi = jax.lax.broadcasted_iota(jnp.int32, (w, chunk, d), 2)
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
    corner = a0 + frac * (a1 - a0)               # f32 z-lerp
    contrib = corner * wrow.T[None]

    @pl.when(k == 0)
    def _():
        out_ref[0] = contrib

    @pl.when(k > 0)
    def _():
        out_ref[0] = out_ref[0] + contrib


def composite_pallas(accumulation: jax.Array, scene_color: jax.Array,
                     fz_texel: jax.Array, grid_whd: Tuple[int, int, int],
                     interpret: bool = False) -> jax.Array:
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
    acc_hi = acc_t.astype(jnp.bfloat16)
    acc_lo = (acc_t - acc_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    acc_cat = jnp.concatenate([acc_hi, acc_lo], axis=-1)  # [H, W+2, D, 2C]

    weights = jnp.asarray(_cell_weights(py, px))
    chunk = cellpx if cellpx <= 16 else 16
    while cellpx % chunk:
        chunk -= 1
    kernel = functools.partial(_kernel, d=d, w=w, chunk=chunk)

    out_c = pl.pallas_call(
        kernel,
        grid=(h, cellpx // chunk, 9),
        in_specs=[
            pl.BlockSpec((9, cellpx), lambda i, jc, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, cellpx), lambda i, jc, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # dy = k // 3 - 1, clamped: the y-corner row pick happens in the
            # index map so the kernel holds one row at a time.
            pl.BlockSpec((1, w + 2, d, 8),
                         lambda i, jc, k: (jnp.clip(i + k // 3 - 1, 0, h - 1),
                                           0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w, chunk, 4),
                               lambda i, jc, k: (i, 0, jc, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, cellpx, 4), jnp.float32),
        interpret=interpret,
    )(weights, fz_c, acc_cat)

    out = out_c.reshape(h, w, py, px, 4)
    out = jnp.moveaxis(out, 2, 1).reshape(ih, iw, 4)
    trans = out[..., 3:4]
    rgb = scene_color * trans + out[..., :3]
    return jnp.concatenate([rgb, trans], axis=-1)
