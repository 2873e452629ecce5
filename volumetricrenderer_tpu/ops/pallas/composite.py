"""Fused Pallas composite kernel.

The composite (VolumetricRenderer.shader:69-93) trilinearly samples the
accumulation volume at (W*u, H*v, fz(depth)) per pixel. A per-pixel gather is
~8 ns/element on the TPU scalar core (measured) — 2M pixels x 8 taps ~ 0.5 s.
This kernel removes every gather AND keeps f32-exact results on the bf16 MXU:

- Screen XY maps to the froxel grid *regularly* (integer pixels-per-froxel), so
  the XY taps are static shifts with static per-pixel-in-cell weights.
- The per-pixel Z lerp is done with 0/1 *selection* matrices S0/S1
  (S0[p, z] = [z == floor(fz_p)]) — exactly representable in bf16 — contracted
  against a hi/lo bf16 split of the accumulation rows: S@A_hi + S@A_lo
  reconstructs the f32 slice values to ~2^-17, and the fractional lerp runs in
  f32 on the VPU. Exact trilinear without Precision.HIGHEST (which crashes
  Mosaic, PERF.md).

Mosaic constraints honored (PERF.md): no integer row indexing, no lane-split
reshapes, cellpx chunked for VMEM, int32 iota.

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


def _kernel(wmat_ref, fz_ref, rm_hi, r0_hi, rp_hi, rm_lo, r0_lo, rp_lo,
            out_ref, *, d: int, w: int, cellpx: int, chunk: int):
    rows_hi = [rm_hi[0], r0_hi[0], rp_hi[0]]     # [W, D, C] bf16
    rows_lo = [rm_lo[0], r0_lo[0], rp_lo[0]]
    c = rows_hi[0].shape[-1]
    wmat = wmat_ref[:]                           # [9, cellpx] f32

    def pad(r):
        return jnp.concatenate([r[:1], r, r[-1:]], axis=0)

    padded_hi = [pad(r) for r in rows_hi]
    padded_lo = [pad(r) for r in rows_lo]

    chunks = []
    for c0 in range(0, cellpx, chunk):
        fz = fz_ref[0][:, c0:c0 + chunk]         # [W, chunk]
        z0 = jnp.floor(fz)
        frac = (fz - z0)[..., None]              # [W, chunk, 1]
        zi = jax.lax.broadcasted_iota(jnp.int32, (w, chunk, d), 2)
        z0i = z0.astype(jnp.int32)[..., None]
        s0 = (zi == z0i).astype(jnp.bfloat16)    # exact 0/1 selection
        s1 = (zi == jnp.minimum(z0i + 1, d - 1)).astype(jnp.bfloat16)

        out = jnp.zeros((w, chunk, c), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                k = dy * 3 + dx

                def sel(s, a):
                    return jax.lax.dot_general(
                        s, a[dx:dx + w],
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)

                a0 = sel(s0, padded_hi[dy]) + sel(s0, padded_lo[dy])
                a1 = sel(s1, padded_hi[dy]) + sel(s1, padded_lo[dy])
                corner = a0 + frac * (a1 - a0)   # f32 z-lerp
                out = out + corner * wmat[k:k + 1, c0:c0 + chunk].T[None]
        chunks.append(out)
    out_ref[0] = jnp.concatenate(chunks, axis=1) if len(chunks) > 1 else chunks[0]


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
    acc_hi = acc_t.astype(jnp.bfloat16)
    acc_lo = (acc_t - acc_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    weights = jnp.asarray(_cell_weights(py, px))
    chunk = cellpx if cellpx <= 32 else 32
    while cellpx % chunk:
        chunk -= 1
    kernel = functools.partial(_kernel, d=d, w=w, cellpx=cellpx, chunk=chunk)

    def clamp_idx(off):
        return lambda i: (jnp.clip(i + off, 0, h - 1), 0, 0, 0)

    acc_spec = [pl.BlockSpec((1, w, d, 4), clamp_idx(off),
                             memory_space=pltpu.VMEM) for off in (-1, 0, 1)]
    out_c = pl.pallas_call(
        kernel,
        grid=(h,),
        in_specs=[
            pl.BlockSpec((9, cellpx), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, cellpx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + acc_spec + acc_spec,
        out_specs=pl.BlockSpec((1, w, cellpx, 4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, cellpx, 4), jnp.float32),
        interpret=interpret,
    )(weights, fz_c, acc_hi, acc_hi, acc_hi, acc_lo, acc_lo, acc_lo)

    out = out_c.reshape(h, w, py, px, 4)
    out = jnp.moveaxis(out, 2, 1).reshape(ih, iw, 4)
    trans = out[..., 3:4]
    rgb = scene_color * trans + out[..., :3]
    return jnp.concatenate([rgb, trans], axis=-1)
