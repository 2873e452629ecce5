"""Fused Pallas composite kernel.

The composite (VolumetricRenderer.shader:69-93) trilinearly samples the
accumulation volume at (W*u, H*v, fz(depth)) per pixel. A per-pixel gather is
~8 ns/element on the TPU scalar core (measured) — 2M pixels x 8 taps ~ 0.5 s.
This kernel removes every gather:

- Screen XY maps to the froxel grid *regularly* (integer pixels-per-froxel), so
  the XY taps are static shifts with static per-pixel-in-cell weights.
- The per-pixel Z interpolation becomes a tent-weight matrix contracted against
  the accumulation slab on the MXU: for each froxel row y, pixels grouped by
  froxel cell form T [W_cells, px_per_cell^2, D] which multiplies the
  (pre-transposed) accumulation rows — batched matmuls whose contraction masks
  out all but the two z-slices each pixel's tent touches. Exactly trilinear,
  zero gathers, MXU throughput.

Layout notes (Mosaic constraints, found empirically): every ref keeps a
lane-friendly minor dim — the accumulation is pre-transposed to [H, W, C, D]
(z in lanes) and pixel-grouped arrays keep cellpx minor; lane-splitting
reshapes and tiny (3/4-wide) minor dims are avoided.

Requires image dims to be integer multiples of the froxel XY dims (the
BASELINE configs are 8x); the renderer falls back to the XLA gather path
otherwise (pipeline.composite).
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


def _kernel(wmat_ref, fz_ref, rowm_ref, row0_ref, rowp_ref,
            out_ref, *, d: int, w: int, cellpx: int, chunk: int):
    # Mosaic notes (all found empirically): precision=HIGHEST crashes the
    # compiler; integer row indexing lowers to an unsupported gather (use
    # 1-wide slices); lane-dim concats of many pieces crash — fold the static
    # XY weights into the tent instead and sum the 9 corner dots; contract
    # t's minor dim against rhs's sublane dim (the fast matmul orientation);
    # chunk cellpx so the tent tensor fits VMEM.
    rows = [rowm_ref[0], row0_ref[0], rowp_ref[0]]   # [W, D, C] each
    c = rows[0].shape[-1]
    wmat = wmat_ref[:]                               # [9, cellpx]
    padded = [jnp.concatenate([r[:1], r, r[-1:]], axis=0) for r in rows]

    chunks = []
    for c0 in range(0, cellpx, chunk):
        fz = fz_ref[0][:, c0:c0 + chunk]             # [W, chunk]
        # Tent weights over z mask all but each pixel's two z-slices, so the
        # batched matmuls below ARE the per-pixel z-lerp (exact trilinear).
        zi = jax.lax.broadcasted_iota(
            jnp.int32, (w, chunk, d), 2).astype(jnp.float32)
        t = jnp.maximum(0.0, 1.0 - jnp.abs(fz[..., None] - zi))

        out = jnp.zeros((w, chunk, c), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                k = dy * 3 + dx
                tw = t * wmat[k:k + 1, c0:c0 + chunk].T[None]
                out = out + jax.lax.dot_general(
                    tw, padded[dy][dx:dx + w],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # [W, chunk, C]

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
        """[IH, IW(, C)] -> [h, w(, C), cellpx] with channels ahead of pixels."""
        chans = img.shape[2:]
        g = img.reshape((h, py, w, px) + chans)
        g = jnp.moveaxis(g, 1, 2)                # [h, w, py, px, ...]
        g = g.reshape((h, w, cellpx) + chans)
        if chans:
            g = jnp.moveaxis(g, -1, 2)           # [h, w, C, cellpx]
        return g

    fz_c = group(jnp.clip(fz_texel, 0.0, d - 1.0))
    acc_t = jnp.transpose(accumulation, (1, 2, 0, 3))   # [H, W, D, C]

    weights = jnp.asarray(_cell_weights(py, px))
    chunk = cellpx if cellpx <= 32 else 32
    while cellpx % chunk:
        chunk -= 1
    kernel = functools.partial(_kernel, d=d, w=w, cellpx=cellpx, chunk=chunk)

    def clamp_idx(off):
        return lambda i: (jnp.clip(i + off, 0, h - 1), 0, 0, 0)


    out_c = pl.pallas_call(
        kernel,
        grid=(h,),
        in_specs=[
            pl.BlockSpec((9, cellpx), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, cellpx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, d, 4), clamp_idx(-1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, d, 4), clamp_idx(0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, d, 4), clamp_idx(1), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w, cellpx, 4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, cellpx, 4), jnp.float32),
        interpret=interpret,
    )(weights, fz_c, acc_t, acc_t, acc_t)

    # Ungroup and blend over the scene color in XLA (fused elementwise).
    out = out_c.reshape(h, w, py, px, 4)
    out = jnp.moveaxis(out, 2, 1).reshape(ih, iw, 4)
    trans = out[..., 3:4]
    rgb = scene_color * trans + out[..., :3]
    return jnp.concatenate([rgb, trans], axis=-1)
