"""Pallas z-gather composite (composite_impl="zgather").

The tentmm composite (ops/tent_composite.py) expresses the per-pixel z-lerp
as [cp, D] x [D, 36] MXU dots — 4.59 ms/frame in-kernel at FULL size, ~60%
of it rhs concatenation traffic and idle MXU lanes (PERF.md). This kernel
replaces the dots with the gather Mosaic is actually good at:

- Cells are SUBLANE rows, the full D axis is the 128 LANES: each froxel
  cell's depth profile is one row of a [cells, 128] matrix (built by one
  in-VMEM transpose of the D-major input block).
- Per cell, ONE `take_along_axis` of width exactly 128 (the only width
  Mosaic supports, CLAUDE.md) gathers all 64 pixels' two z-taps at once:
  lane l < 64 is pixel l's floor(fz) tap, lane l >= 64 is its +1 tap.
- The 3x3 XY neighbor taps are STATIC row-offset slices of the same
  transposed matrix (cells enumerate y-major x-minor with a fixed row
  stride of 256 columns, so neighbor (dy, dx) is a flat offset of
  dy*256 + dx rows) — the x/y edge clamps are baked by host-side padding.
- The z-lerp folds into per-lane weights; the two tap halves combine with
  one `pltpu.roll` by 64 lanes (lane-slicing a computed array into 128-wide
  chunks is the g6 layout crash, CLAUDE.md — roll+add avoids it).
- Layouts are chosen for the (8, 128) tiling rule: planes are reshaped to
  2D [128, Hp*256] so row blocks are [128, 2048] (16x128 lanes); one
  pallas_call per channel keeps the pipelined block VMEM under the 16 MB
  scoped budget.
- Output stays in cell-blocked planes [H, W, cp]; a small batched XLA map
  does the (x <-> py) unshuffle fused (the same trick that removed the
  1.6 ms whole-image copy from tentmm), and the scene blend is elementwise
  on the free-bitcast screen planes.

Constraints: integer pixel/cell ratios with py*px == 64 (the FULL 1080p
config: 8x8) and D <= 128 (padded to the 128 lanes). pipeline.composite
falls back to tentmm otherwise. Reference: VolumetricRenderer.shader:69-93.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volumetricrenderer_tpu.ops.pallas.composite import _cell_weights

DLANES = 128
HB = 8          # froxel rows per grid step (8 x 256 = a (8,128)-clean block)
WSTRIDE = 256   # padded cell-row stride (1 left edge col + W + right pads)
UNSHUFFLE = "map"   # cell->screen layout variant (probe knob): map|bf16|whole
NB = int(os.environ.get("ZG_NB", "0"))  # unshuffle rows/map step (0 = auto)
# multiple-of-8 decomposition (4K): run all ky*kx sub-images in ONE kernel
# with a (nblk, n_sub) grid — the plane blocks' index map ignores the sub
# index, so the pipeline does not refetch them across the inner dim, and the
# per-channel in-VMEM transpose is computed once per row block into scratch
# (persistent across grid steps) and reused by the other sub-images. False =
# one kernel pass per sub-image (the round-3 form, kept for A/B).
MULTISUB = True


def padded_dims(h: int) -> Tuple[int, int]:
    """(hp, wstride) of the padded-plane layout — producers (the fused
    temporal blend) can emit planes pre-padded to skip the XLA pad concats."""
    nblk = -(-h // HB)
    return (nblk + 1) * HB, WSTRIDE


def _rows_per_step(h: int) -> int:
    """Unshuffle rows per lax.map step: swept on TPU
    (tools/probe_unshuffle_nb.py) — monotone win up to nb=45 at h=135
    (8.88 -> 7.92 ms/frame: fewer steps amortize the per-step
    broadcast/copy overhead), single-step (nb=h) regresses to the
    whole-image strided transpose (9.17). Auto = largest divisor of h
    <= 45 that keeps >= 3 map steps; NB (probe knob) overrides."""
    if NB and h % NB == 0:
        return NB
    cap = max(1, min(45, h // 3))
    return max(n for n in range(1, cap + 1) if h % n == 0)


def _kernel(*refs, w: int, d: int, cp: int, n_planes: int, nwin: int = 2,
            sub: int = 0):
    """fz_ref [HB, WSTRIDE, cp]; w9_ref [9, 128]; then per plane nwin block
    refs [128, HB*256] (padded rows [(i+bb)*HB, (i+bb+nwin)*HB)); outs
    [HB, W, cp]. All n_planes channels share one launch (and one fetch of
    fz/w9) — the z taps and weights are channel-independent. nwin/sub: with
    a sub-block row offset (row_off % HB != 0 — the slab path reading the
    out-rows window of a halo-EXTENDED padded plane), a third block covers
    the tail and every tap shifts by sub rows."""
    fz_ref, w9_ref = refs[0], refs[1]
    cells = HB * WSTRIDE

    fzc = fz_ref[...].reshape(cells, cp)                 # leading-dim merge
    z0f = jnp.floor(fzc)
    f = fzc - z0f
    z0 = jnp.clip(z0f.astype(jnp.int32), 0, d - 1)
    z1 = jnp.clip(z0 + 1, 0, d - 1)
    idx = jnp.concatenate([z0, z1], axis=1)              # [cells, 128]
    wz = jnp.concatenate([1.0 - f, f], axis=1)           # z-lerp per lane

    for c in range(n_planes):
        blks = refs[2 + nwin * c:2 + nwin * (c + 1)]
        out_ref = refs[2 + nwin * n_planes + c]
        stack = jnp.concatenate([b[...] for b in blks], axis=1)
        t = stack.T                                      # [nwin*cells, 128]
        acc = jnp.zeros((cells, DLANES), jnp.float32)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                # out cell (rb, xp) = actual (row i*HB + rb, col xp); src row
                # (rb + sub + dy)*WSTRIDE + xp + dx = padded (row + dy-1,
                # col + dx-1) (the +1 paddings bake the neighbor offsets and
                # edge clamps; sub shifts into the extended plane's window)
                start = (sub + dy) * WSTRIDE + dx
                src = jax.lax.slice_in_dim(t, start, start + cells, axis=0)
                g = jnp.take_along_axis(src, idx, axis=1)
                n = dy * 3 + dx
                acc = acc + g * w9_ref[n:n + 1, :]       # [1,128] broadcast
        accw = acc * wz
        comb = accw + pltpu.roll(accw, 64, 1)            # tap0+tap1 in 0-63
        comb3 = comb.reshape(HB, WSTRIDE, DLANES)
        out_ref[...] = comb3[:, :w, :cp]


def _kernel_multisub(*refs, w: int, d: int, cp: int, n_planes: int,
                     nwin: int = 2, sub: int = 0):
    """_kernel over a (nblk, n_sub) grid: fz_ref [1, HB, WSTRIDE, cp] and
    w9_ref [1, 9, 2cp] select the sub-image via their index maps; the plane
    block refs ignore the sub index (no refetch across the inner grid dim)
    and each channel's [nwin*cells, 128] transpose is built ONCE per row
    block (at sub 0) into persistent VMEM scratch — the sub-image-invariant
    ~40% of the single-sub kernel (fetch + transpose) stops being paid
    ky*kx times. Verified Mosaic patterns only: @pl.when on a grid index,
    scratch persisting across sequential grid steps."""
    fz_ref, w9_ref = refs[0], refs[1]
    n_in = 2 + nwin * n_planes
    out_refs = refs[n_in:n_in + n_planes]
    t_refs = refs[n_in + n_planes:n_in + 2 * n_planes]
    cells = HB * WSTRIDE
    s_id = pl.program_id(1)

    fzc = fz_ref[...].reshape(cells, cp)
    z0f = jnp.floor(fzc)
    f = fzc - z0f
    z0 = jnp.clip(z0f.astype(jnp.int32), 0, d - 1)
    z1 = jnp.clip(z0 + 1, 0, d - 1)
    idx = jnp.concatenate([z0, z1], axis=1)
    wz = jnp.concatenate([1.0 - f, f], axis=1)
    w9k = w9_ref[...].reshape(9, 2 * cp)

    for c in range(n_planes):
        blks = refs[2 + nwin * c:2 + nwin * (c + 1)]
        out_ref = out_refs[c]
        t_ref = t_refs[c]

        @pl.when(s_id == 0)
        def _(blks=blks, t_ref=t_ref):
            stack = jnp.concatenate([b[...] for b in blks], axis=1)
            t_ref[...] = stack.T

        t = t_ref[...]
        acc = jnp.zeros((cells, DLANES), jnp.float32)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                start = (sub + dy) * WSTRIDE + dx
                src = jax.lax.slice_in_dim(t, start, start + cells, axis=0)
                g = jnp.take_along_axis(src, idx, axis=1)
                n = dy * 3 + dx
                acc = acc + g * w9k[n:n + 1, :]
        accw = acc * wz
        comb = accw + pltpu.roll(accw, 64, 1)
        comb3 = comb.reshape(HB, WSTRIDE, DLANES)
        out_ref[...] = comb3[:, :w, :cp].reshape(1, HB, w, cp)


def _fz_cells(fz_texel: jax.Array, h: int, w: int, d: int,
              hout: int) -> jax.Array:
    """Cell-blocked fz at the WSTRIDE cell stride (cell xp = actual column
    xp; pad cells junk, sliced away in-kernel); rows padded to hout."""
    py, px = fz_texel.shape[0] // h, fz_texel.shape[1] // w
    cp = py * px
    fz = jnp.clip(fz_texel, 0.0, d - 1.0)
    fz_c = fz.reshape(h, py, w, px).transpose(0, 2, 1, 3).reshape(h, w, cp)
    fz_c = jnp.concatenate([fz_c] + [fz_c[:, -1:]] * (WSTRIDE - w), axis=1)
    if hout > h:
        fz_c = jnp.concatenate([fz_c] + [fz_c[-1:]] * (hout - h), axis=0)
    return fz_c


def composite_zgather_planes(planes, fz_texel: jax.Array,
                             grid_whd: Tuple[int, int, int],
                             interpret: bool = False,
                             prepadded: bool = False,
                             halo_rows: bool = False,
                             row_off: int = 0,
                             w9_override=None,
                             _return_cells: bool = False):
    """planes: per-channel [D, H, W] froxel volumes (accumulation L_r/g/b, T)
    — or, with prepadded=True, [DLANES, hp, wstride] planes already in the
    padded cell layout (padded_dims; the fused temporal blend emits these).
    halo_rows=True: planes are [D, H+2, W] with REAL neighbor rows at 0 and
    H+1 (an H-sharded slab's halo) standing in for the edge-clamp pads —
    the y-tent then reads true cross-shard neighbors (pipeline.composite's
    slab branch). fz_texel [IH, IW] froxel-z per pixel. Returns per-channel
    SCREEN planes [IH, IW] (trilinear accumulation sample per pixel,
    shader:69-93).

    row_off (with prepadded=True): planes are the halo-EXTENDED padded
    layout of an H-sharded slab ([DLANES, hp_ext, wstride], interior =
    halo + out rows + halo); the kernel reads the out-rows window starting
    at padded row `row_off` (= the slab halo: padded row row_off is the
    real row ABOVE out row 0) directly from the extended plane — no
    per-frame slice or re-pad. Taps shift by whole blocks (row_off // HB)
    in the index maps and by row_off % HB in-kernel (a third block covers
    the tail when the sub-offset is nonzero).

    _return_cells=True (internal) skips the unshuffle and returns the raw
    cell-layout outputs [H, W, 64] — the multi-of-8 decomposition below
    unshuffles all its sub-images in one combined map."""
    w, h, d = grid_whd
    ih, iw = fz_texel.shape
    py, px = ih // h, iw // w
    assert d <= DLANES and ih % h == 0 and iw % w == 0
    # dx=2 tap of output column w-1 reads padded column w+1: the padded row
    # needs 1 left edge col + w data cols + >=1 right edge col
    assert w + 2 <= WSTRIDE
    assert row_off == 0 or prepadded, "row_off needs prepadded planes"

    nblk = -(-h // HB)
    hout = nblk * HB
    # padded plane rows: padded row r = global clamp(r - 1, 0, h - 1); the
    # two-block window of step i reads rows [i*HB, (i+2)*HB) -> Hp rows
    hp = (nblk + 1) * HB
    bb, sub = divmod(row_off, HB)
    nwin = 2 if sub == 0 else 3
    if prepadded:
        # extended planes carry their own hp (>= the unsharded layout's)
        hp = planes[0].shape[1]
        assert planes[0].shape[0] == DLANES \
            and planes[0].shape[2] == WSTRIDE, planes[0].shape
        assert (nblk - 1 + bb + nwin) * HB <= hp, \
            (nblk, bb, nwin, hp, "extended plane too short for the window")

    def prep(p):
        p = jnp.pad(p, ((0, DLANES - d), (0, 0), (0, 0)))
        # cols: 1 left edge + W + right edge pads to WSTRIDE
        p = jnp.concatenate([p[:, :, :1], p]
                            + [p[:, :, -1:]] * (WSTRIDE - w - 1), axis=2)
        if halo_rows:
            # rows arrive as padded rows 0..h+1 already (slab halo rows);
            # extend the bottom edge to hp
            p = jnp.concatenate([p] + [p[:, -1:]] * (hp - h - 2), axis=1)
        else:
            # rows: 1 top edge + H + bottom edge pads to hp
            p = jnp.concatenate([p[:, :1], p] + [p[:, -1:]] * (hp - h - 1),
                                axis=1)
        return p.reshape(DLANES, hp * WSTRIDE)

    if py * px != 64:
        # larger cells (e.g. 4K over the FULL grid: 16x16 px) decompose into
        # ky*kx sub-images of 8x8-px cells — each sub-image is one plain
        # zgather KERNEL pass over the SAME (padded-once) froxel planes; the
        # cell->screen unshuffle AND the 8-row/8-col band interleaves then
        # run as ONE fused map over all sub-results (the earlier
        # per-sub-unshuffle + stack/reshape reassembly was ~5x the kernel
        # time in strided relayout copies — PERF.md round 3, 4K scope).
        assert py % 8 == 0 and px % 8 == 0, (py, px)
        ky, kx = py // 8, px // 8
        if not prepadded:
            planes = [prep(p).reshape(DLANES, hp, WSTRIDE) for p in planes]
        n_ch = len(planes)
        fz4 = fz_texel.reshape(h, ky, 8, w, kx, 8)
        # tent weights stay those of the PARENT py x px cell: sub-image
        # (a, b)'s pixels sit at in-cell offsets (a*8 + i + 0.5)/py - 0.5.
        # A caller-supplied w9_override (e.g. the co-sited fractional-res
        # composite) replaces the full-cell weights before the sub split.
        w_full = (np.asarray(w9_override) if w9_override is not None
                  else _cell_weights(py, px)).reshape(3, 3, py, px)
        if MULTISUB:
            # all sub-images in ONE kernel (see the MULTISUB knob comment)
            n_sub = ky * kx
            hp_ext = planes[0].shape[1]
            assert (nblk - 1 + bb + nwin) * HB <= hp_ext, \
                (nblk, bb, nwin, hp_ext)
            sub_cp = 64
            fz_all = jnp.stack([
                _fz_cells(fz4[:, a, :, :, b, :].reshape(h * 8, w * 8),
                          h, w, d, hout)
                for a in range(ky) for b in range(kx)])
            w9_all = []
            for a in range(ky):
                for b in range(kx):
                    w9s = w_full[:, :, a * 8:(a + 1) * 8,
                                 b * 8:(b + 1) * 8].reshape(9, sub_cp)
                    w9_all.append(np.concatenate([w9s, w9s], axis=1))
            w9_all = jnp.asarray(np.stack(w9_all), jnp.float32)
            planes_p = [p.reshape(DLANES, hp_ext * WSTRIDE) for p in planes]
            kernel = functools.partial(_kernel_multisub, w=w, d=d,
                                       cp=sub_cp, n_planes=n_ch,
                                       nwin=nwin, sub=sub)
            plane_specs = [
                pl.BlockSpec((DLANES, HB * WSTRIDE),
                             functools.partial(
                                 lambda i, s, o=0: (0, i + o), o=bb + o),
                             memory_space=pltpu.VMEM)
                for o in range(nwin)]
            plane_inputs = []
            for p in planes_p:
                plane_inputs += [p] * nwin
            pcells = HB * WSTRIDE
            outs4 = pl.pallas_call(
                kernel,
                grid=(nblk, n_sub),
                in_specs=[
                    pl.BlockSpec((1, HB, WSTRIDE, sub_cp),
                                 lambda i, s: (s, i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 9, 2 * sub_cp), lambda i, s: (s, 0, 0),
                                 memory_space=pltpu.VMEM),
                ] + plane_specs * n_ch,
                out_specs=tuple([pl.BlockSpec((1, HB, w, sub_cp),
                                              lambda i, s: (s, i, 0, 0),
                                              memory_space=pltpu.VMEM)]
                                * n_ch),
                out_shape=tuple([jax.ShapeDtypeStruct(
                    (n_sub, hout, w, sub_cp), jnp.float32)] * n_ch),
                scratch_shapes=[pltpu.VMEM((nwin * pcells, DLANES),
                                           jnp.float32)] * n_ch,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
                interpret=interpret,
            )(fz_all, w9_all, *plane_inputs)
            nb = _rows_per_step(h)

            def rows4(y0):
                # slice the stacked [n_sub, hout, w, cp] outputs INSIDE the
                # map: pre-slicing per sub-image materialized 4 copies of
                # every channel (slice_bitcast fusions, ~0.36 ms at 4K)
                outs_r = []
                for c in range(n_ch):
                    bands = []
                    for a in range(ky):
                        per_b = [jax.lax.dynamic_slice(
                            outs4[c], (a * kx + b, y0 * nb, 0, 0),
                            (1, nb, w, sub_cp)).reshape(nb, w, 8, 8)
                            for b in range(kx)]
                        t = jnp.stack(per_b, axis=3)     # [nb, w, iy, b, ix]
                        t = t.transpose(0, 2, 1, 3, 4)   # [nb, iy, w, b, ix]
                        bands.append(t.reshape(nb, 8, w * px))
                    band = jnp.stack(bands, axis=1)      # [nb, a, iy, W]
                    outs_r.append(band.reshape(nb * py, iw))
                return tuple(outs_r)

            shuffled = jax.lax.map(rows4, jnp.arange(h // nb))
            return tuple(s.reshape(ih, iw) for s in shuffled)
        else:
            cells = []
            for a in range(ky):
                row = []
                for b in range(kx):
                    sub_fz = fz4[:, a, :, :, b, :].reshape(h * 8, w * 8)
                    w9_sub = w_full[:, :, a * 8:(a + 1) * 8,
                                    b * 8:(b + 1) * 8].reshape(9, 64)
                    row.append(composite_zgather_planes(
                        planes, sub_fz, grid_whd, interpret=interpret,
                        prepadded=True, row_off=row_off, w9_override=w9_sub,
                        _return_cells=True))
                cells.append(row)

        nb = _rows_per_step(h)

        def rows(y0):
            outs_r = []
            for c in range(n_ch):
                bands = []
                for a in range(ky):
                    per_b = [jax.lax.dynamic_slice_in_dim(
                        cells[a][b][c], y0 * nb, nb, 0).reshape(nb, w, 8, 8)
                        for b in range(kx)]
                    t = jnp.stack(per_b, axis=3)       # [nb, w, iy, b, ix]
                    t = t.transpose(0, 2, 1, 3, 4)     # [nb, iy, w, b, ix]
                    bands.append(t.reshape(nb, 8, w * px))
                band = jnp.stack(bands, axis=1)        # [nb, a, iy, W]
                outs_r.append(band.reshape(nb * py, iw))
            return tuple(outs_r)

        shuffled = jax.lax.map(rows, jnp.arange(h // nb))
        return tuple(s.reshape(ih, iw) for s in shuffled)

    cp = py * px

    if prepadded:
        planes_p = [p.reshape(DLANES, hp * WSTRIDE) for p in planes]
    else:
        planes_p = [prep(p) for p in planes]

    fz_c = _fz_cells(fz_texel, h, w, d, hout)

    w9 = _cell_weights(py, px) if w9_override is None else w9_override
    w9d = jnp.asarray(np.concatenate([w9, w9], axis=1), jnp.float32)

    n_planes = len(planes_p)
    kernel = functools.partial(_kernel, w=w, d=d, cp=cp, n_planes=n_planes,
                               nwin=nwin, sub=sub)
    plane_specs = [
        pl.BlockSpec((DLANES, HB * WSTRIDE),
                     functools.partial(lambda i, o=0: (0, i + o), o=bb + o),
                     memory_space=pltpu.VMEM)
        for o in range(nwin)]
    plane_inputs = []
    for p in planes_p:
        plane_inputs += [p] * nwin
    outs_all = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((HB, WSTRIDE, cp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 2 * cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + plane_specs * n_planes,
        out_specs=tuple([pl.BlockSpec((HB, w, cp), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)] * n_planes),
        out_shape=tuple([jax.ShapeDtypeStruct((hout, w, cp), jnp.float32)]
                        * n_planes),
        # all 4 channels in one launch: ~10.5 MB of blocks per step, double-
        # buffered by the pipeline — v5e has 128 MB of VMEM; the raised limit
        # gives the scheduler headroom (single-channel peak already sat
        # flakily at the 16 MB default)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(fz_c, w9d, *plane_inputs)
    outs = [o[:h] for o in outs_all]
    if _return_cells:
        return tuple(outs)

    # cell -> screen unshuffle for all channels in ONE batched map (the
    # per-step transposes fuse; a whole-image moveaxis is a ~1.6 ms strided
    # copy, PERF.md). UNSHUFFLE is a probe knob (tools/probe_unshuffle.py).
    if UNSHUFFLE == "whole":
        return tuple(o.reshape(h, w, py, px).transpose(0, 2, 1, 3)
                     .reshape(ih, iw) for o in outs)
    nb = _rows_per_step(h)
    cast = (lambda x: x.astype(jnp.bfloat16)) if UNSHUFFLE == "bf16" \
        else (lambda x: x)

    def rows(y0):
        outs_r = []
        for o in outs:
            b = jax.lax.dynamic_slice_in_dim(cast(o), y0 * nb, nb, 0)
            b = b.reshape(nb, w, py, px).transpose(0, 2, 1, 3)
            outs_r.append(b.reshape(nb, py, w * px))
        return tuple(outs_r)

    shuffled = jax.lax.map(rows, jnp.arange(h // nb))
    return tuple(s.reshape(ih, iw).astype(jnp.float32) for s in shuffled)


def composite_zgather(planes, scene_color: jax.Array, fz_texel: jax.Array,
                      grid_whd: Tuple[int, int, int],
                      interpret: bool = False,
                      prepadded: bool = False,
                      halo_rows: bool = False,
                      row_off: int = 0,
                      return_planes: bool = False) -> jax.Array:
    """Full composite: per-pixel trilinear accumulation sample + scene blend
    (scene*T + L, shader:90-92). planes = (L_r, L_g, L_b, T) [D, H, W].

    return_planes=True keeps the result channel-planar ((r, g, b, T) screen
    planes) for the planar frame+post chain — no [H, W, 4] interleave.
    scene_color may then itself be a 3-tuple of [H, W] planes (pre-split
    once outside the frame loop: a per-frame [H, W, 3] minor-dim slice is a
    strided ~0.7 ms/channel read, measured slower than the packed chain)."""
    lr, lg, lb, tt = composite_zgather_planes(planes, fz_texel, grid_whd,
                                              interpret=interpret,
                                              prepadded=prepadded,
                                              halo_rows=halo_rows,
                                              row_off=row_off)
    if return_planes:
        scp = scene_color if isinstance(scene_color, (tuple, list)) \
            else tuple(scene_color[..., c] for c in range(3))
        return tuple(s * tt + l
                     for s, l in zip(scp, (lr, lg, lb))) + (tt,)
    rgb = scene_color * tt[..., None] + jnp.stack([lr, lg, lb], axis=-1)
    return jnp.concatenate([rgb, tt[..., None]], axis=-1)
