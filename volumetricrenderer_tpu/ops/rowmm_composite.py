"""Gather-free composite for ARBITRARY image/grid ratios (pixel-row tent matmuls).

The tentmm path (ops/tent_composite.py) iterates froxel-cell rows and needs the
image dims to be integer multiples of the grid XY dims; when they are not (the
reference composites at any screen size — hardware trilinear,
VolumetricRenderer.shader:69-93), the renderer used to fall back to the
~8 ns/element per-pixel gather path. This formulation iterates PIXEL rows
instead, exploiting that the XY mapping pixel -> froxel cell is pure static
geometry (only the z coordinate is data-dependent, via scene depth):

- per pixel ROW v, the froxel y coordinate fy(v) is a compile-time constant:
  the y-lerp collapses to a static 2-row blend, expressed per row-block as a
  constant selection-weight matmul;
- per pixel COLUMN, the x taps are the same 3-shift trick as tentmm (requires
  IW % W == 0, true for every reference config; otherwise the gather path
  remains);
- the z-lerp at per-pixel depth is the tent-weight matmul contracted on the
  MXU at HIGHEST precision (exact trilinear).

Also the building block for the H-sharded composite (parallel/shard_render.py):
`fy` may describe a local slab pattern and `row_off` indexes into a halo-padded
accumulation block.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.ops.tent_composite import PRECISIONS


def _pick_block(ih: int) -> int:
    for nb in (8, 10, 9, 6, 5, 4, 3, 2):
        if ih % nb == 0:
            return nb
    return 1


def composite_rowmm(acc_padded: jax.Array, scene_color: jax.Array,
                    fz_texel: jax.Array, grid_whd: Tuple[int, int, int],
                    fy: Optional[np.ndarray] = None,
                    row_off: int = 1, precision: str = "highest") -> jax.Array:
    """acc_padded [Hc, ...]-rows of the accumulation volume as [D, Hc, W, 4]
    where Hc covers every cell row any pixel row's y-tent touches (the
    pipeline wrapper passes the volume clamp-padded by one row per side,
    row_off=1; the sharded renderer passes a halo'd slab and its offset).

    scene_color [IH, IW, 3]; fz_texel [IH, IW] (continuous froxel z - 0.5).
    fy: static per-pixel-row froxel y texel coord (default: the full-image
    mapping (v + 0.5) * H / IH - 0.5), expressed in GLOBAL cell rows; cell row
    g maps to acc_padded row g + row_off. Requires IW % W == 0.
    Returns [IH, IW, 4] with rgb = scene * T + L, a = T.
    """
    w, h, d = grid_whd
    ih, iw = fz_texel.shape
    assert iw % w == 0, "x fast path needs IW % W == 0 (else use gather)"
    px = iw // w
    hc = acc_padded.shape[1]

    if fy is None:
        fy = (np.arange(ih) + 0.5) * (h / ih) - 0.5
    fy = np.asarray(fy, np.float64)
    cy = np.floor(fy).astype(np.int64)
    wy = (fy - cy).astype(np.float32)
    # The 2-row y-tent taps cy, cy+1 land inside acc_padded without clipping:
    # fy in (-0.5, H-0.5) puts cy in [-1, H-1], and the pad/halo rows replicate
    # the edges (exactly the GPU clamp sampler's semantics, shader:79-80).
    r0 = cy + row_off
    r1 = cy + 1 + row_off
    assert r0.min() >= 0 and r1.max() <= hc - 1, \
        f"y taps [{r0.min()}, {r1.max()}] outside padded rows [0, {hc - 1}]"

    nb = _pick_block(ih)
    nblk = ih // nb
    # Per block: rows fetched = dynamic slice [base, base+nrows); the in-block
    # offsets are static, so the y-lerp is a constant [nb, nrows] weight matrix.
    base = r0[::nb].copy()
    nrows = int(max((np.maximum(r1, r0).reshape(nblk, nb)
                     - base[:, None]).max() + 1, 2))
    base = np.minimum(base, hc - nrows)            # keep the slice in range
    wsel = np.zeros((nblk, nb, nrows), np.float32)
    for blk in range(nblk):
        for u in range(nb):
            v = blk * nb + u
            wsel[blk, u, r0[v] - base[blk]] += 1.0 - wy[v]
            wsel[blk, u, r1[v] - base[blk]] += wy[v]

    # [Hc, W, D, C] with one-column x clamp padding.
    acc_t = jnp.transpose(acc_padded, (1, 2, 0, 3))
    acc_t = jnp.concatenate([acc_t[:, :1], acc_t, acc_t[:, -1:]], axis=1)

    # Static x tent weights per in-cell pixel phase: offset (u+0.5)/px - 0.5.
    ox = (np.arange(px) + 0.5) / px - 0.5
    wx = np.stack([np.maximum(-ox, 0.0), 1.0 - np.abs(ox),
                   np.maximum(ox, 0.0)], axis=-1).astype(np.float32)  # [px, 3]

    fz = jnp.clip(fz_texel, 0.0, d - 1.0).reshape(nblk, nb, w, px)
    zi = jnp.arange(d, dtype=jnp.float32)
    wsel_j = jnp.asarray(wsel)
    base_j = jnp.asarray(base, jnp.int32)
    wx_j = jnp.asarray(wx)
    hi = PRECISIONS[precision]

    def block(args):
        b_i, wsel_i, fz_i = args
        rows = jax.lax.dynamic_slice_in_dim(acc_t, b_i, nrows, 0)
        # y-lerp: [nb, nrows] @ [nrows, (W+2) D C]
        yb = jnp.einsum("br,rwdc->bwdc", wsel_i, rows, precision=hi)
        rhs = jnp.concatenate([yb[:, dx:dx + w] for dx in range(3)], axis=-1)
        t = jnp.maximum(0.0, 1.0 - jnp.abs(fz_i[..., None] - zi))
        out = jax.lax.dot_general(
            t, rhs, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32, precision=hi)
        out = out.reshape(nb, w, px, 3, 4)
        return jnp.sum(out * wx_j[None, None, :, :, None], axis=3)

    out = jax.lax.map(block, (base_j, wsel_j, fz))     # [nblk, nb, W, px, 4]
    out = out.reshape(ih, w, px, 4).reshape(ih, iw, 4)
    trans = out[..., 3:4]
    rgb = scene_color * trans + out[..., :3]
    return jnp.concatenate([rgb, trans], axis=-1)


def _tap_blocks(f: np.ndarray, n_pad: int, nb: int):
    """Static 2-tap selection blocks for one axis: coordinate f[i] (in PADDED
    cells: tap rows floor(f), floor(f)+1 index the clamp-padded axis) blocked
    by nb. Returns (base [n/nb] int, sel [n/nb, nb, ncols] f32)."""
    c0 = np.floor(f).astype(np.int64)
    t = (f - c0).astype(np.float32)
    nblk = len(f) // nb
    base = c0[::nb].copy()
    ncols = int(max(int(((c0.reshape(nblk, nb).max(1) - base) + 2).max()), 2))
    base = np.minimum(base, n_pad - ncols)
    sel = np.zeros((nblk, nb, ncols), np.float32)
    for blk in range(nblk):
        for u in range(nb):
            i = blk * nb + u
            sel[blk, u, c0[i] - base[blk]] += 1.0 - t[i]
            sel[blk, u, c0[i] + 1 - base[blk]] += t[i]
    return base, sel


def composite_anyres(accumulation: jax.Array, scene_color: jax.Array,
                     fz_texel: jax.Array, grid_whd: Tuple[int, int, int],
                     precision: str = "highest") -> jax.Array:
    """Gather-free composite for ARBITRARY image dims — BOTH screen axes as
    static 2-tap selection matmuls (the pixel -> froxel-cell XY mapping is
    pure static geometry at any resolution), z as the per-pixel tent-weight
    MXU contraction. Covers the reference's any-screen-size hardware
    trilinear (VolumetricRenderer.shader:79-80) without the ~8 ns/element
    per-pixel gather the old fallback paid (round-5 item: non-integer IW/W
    used to be the one shape class left on the gather path).

    accumulation [D, H, W, 4]; scene_color [IH, IW, 3]; fz_texel [IH, IW]
    (continuous froxel z - 0.5). Returns [IH, IW, 4], rgb = scene*T + L."""
    w, h, d = grid_whd
    ih, iw = fz_texel.shape

    # clamp-pad one cell per side on both axes (the GPU clamp sampler)
    acc_t = jnp.transpose(accumulation, (1, 2, 0, 3))        # [H, W, D, C]
    acc_t = jnp.concatenate([acc_t[:1], acc_t, acc_t[-1:]], axis=0)
    acc_t = jnp.concatenate([acc_t[:, :1], acc_t, acc_t[:, -1:]], axis=1)

    # padded-axis texel coords: pixel center -> froxel - 0.5, +1 for the pad
    fy = (np.arange(ih) + 0.5) * (h / ih) - 0.5 + 1.0
    fx = (np.arange(iw) + 0.5) * (w / iw) - 0.5 + 1.0
    nb = _pick_block(ih)
    cb = _pick_block(iw)
    base_y, ysel = _tap_blocks(fy, h + 2, nb)
    base_x, xsel = _tap_blocks(fx, w + 2, cb)
    nrows, ncols = ysel.shape[2], xsel.shape[2]
    nblk, cblk = ih // nb, iw // cb

    fz = jnp.clip(fz_texel, 0.0, d - 1.0)
    # [nblk, cblk, nb, cb] pixel tiles
    fz_t = fz.reshape(nblk, nb, cblk, cb).transpose(0, 2, 1, 3)
    zi = jnp.arange(d, dtype=jnp.float32)
    hi = PRECISIONS[precision]
    ysel_j, xsel_j = jnp.asarray(ysel), jnp.asarray(xsel)
    base_yj = jnp.asarray(base_y, jnp.int32)
    base_xj = jnp.asarray(base_x, jnp.int32)

    def rowblock(args):
        by, ysel_i, fz_i = args                       # fz_i [cblk, nb, cb]
        rows = jax.lax.dynamic_slice_in_dim(acc_t, by, nrows, 0)
        yb = jnp.einsum("br,rwdc->bwdc", ysel_i, rows,
                        precision=hi)                 # [nb, W+2, D, C]

        def colblock(cargs):
            bx, xsel_ij, fz_ij = cargs
            cols = jax.lax.dynamic_slice_in_dim(yb, bx, ncols, 1)
            xb = jnp.einsum("uk,bkdc->budc", xsel_ij, cols,
                            precision=hi)             # [nb, cb, D, C]
            t = jnp.maximum(0.0, 1.0 - jnp.abs(fz_ij[..., None] - zi))
            return jax.lax.dot_general(
                t, xb, dimension_numbers=(((2,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32, precision=hi)

        return jax.lax.map(colblock, (base_xj, xsel_j, fz_i))

    out = jax.lax.map(rowblock, (base_yj, ysel_j,
                                 fz_t))               # [nblk, cblk, nb, cb, 4]
    out = out.transpose(0, 2, 1, 3, 4).reshape(ih, iw, 4)
    trans = out[..., 3:4]
    rgb = scene_color * trans + out[..., :3]
    return jnp.concatenate([rgb, trans], axis=-1)
