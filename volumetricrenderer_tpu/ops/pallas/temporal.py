"""Fully-fused temporal blend kernels (reprojection + windowed warp + lerp).

The reproj_impl="pallas" path used to run, per blended volume: an XLA texel
computation (three full [D, H, W] coordinate volumes through froxel->world->
prev-view->froxel), then THREE sequential Pallas warp passes (z, y, x — one
HBM read+write each), then the lerp (fused into the x pass). This kernel does
the whole blend in ONE sequential pass over z:

- the reprojection texel coords are recomputed in-register from the packed
  scalar params (froxel -> view is slice-local math; world->prev-view
  collapses into ONE combined 3x4 matrix on the host) — no coordinate volume
  ever exists;
- the z tent taps come from a VMEM ring buffer of the previous 2k+2 history
  slices (TPU grids run sequentially; each history plane is read from HBM
  exactly once);
- the y/x tents are in-VMEM static-shift stencils (ops/pallas/warp.py's
  scheme), applied per channel plane (no [.., W*C] interleaving, no channel
  repeat of the targets);
- the temporal lerp (weight mode for the shadow volume, prev.a != 0 alpha
  mode for accumulation, compute:205-219 / 246-258) happens before the single
  output write.

Semantics identical to pipeline._reproject_texel + ops/warp.py's separable
windowed warp + the blend formulas (SPEC "Reprojection sampling"), pinned by
tests/test_temporal_fused.py against the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_blend_params(params, view_to_world, prev_world_to_view, jitter,
                      alpha, uvw_epsilon: float) -> jax.Array:
    """[1, 24]: combined prev-view matrix (12), fp x/y/z/w/near (5),
    jitter (3), alpha, eps, y0, pad."""
    m = jnp.matmul(prev_world_to_view, view_to_world,
                   precision=jax.lax.Precision.HIGHEST)
    vals = [m[0, 0], m[0, 1], m[0, 2], m[0, 3],
            m[1, 0], m[1, 1], m[1, 2], m[1, 3],
            m[2, 0], m[2, 1], m[2, 2], m[2, 3],
            params.x, params.y, params.z, params.w, params.near,
            jitter[0], jitter[1], jitter[2],
            alpha, jnp.float32(uvw_epsilon), params.y0, jnp.float32(0.0)]
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in vals])[None]


def _edge_pad(x, axis, k):
    lo = [slice(None)] * x.ndim
    hi = [slice(None)] * x.ndim
    lo[axis] = slice(0, 1)
    hi[axis] = slice(x.shape[axis] - 1, x.shape[axis])
    return jnp.concatenate([x[tuple(lo)]] * k + [x] + [x[tuple(hi)]] * k,
                           axis=axis)


def _tent_weights(off, k):
    """Per-tap tent weight planes for _tent_pass — hoist these when several
    channels share one offset plane (the megakernel warps 4 accumulation +
    Nd shadow channels per blend site; the weight math would otherwise be
    re-emitted per channel, ops/pallas/frame_fused._warp). Taps span [-k, k]:
    off is pre-clipped to [-k, k], so a k+1 tap's weight is identically 0."""
    return [jnp.maximum(0.0, 1.0 - jnp.abs(off - dd))
            for dd in range(-k, k + 1)]


def _tent_pass(plane, off, axis, k, ws=None):
    """1D windowed tent along `axis` of an [H, W] plane; off pre-clipped.
    ws: precomputed _tent_weights(off, k) (off is then ignored).

    TRIED AND REVERTED (round 3): replacing the edge-padded copy + shifted
    slices with clamped pltpu.roll chains (the xy_blend pattern) measured
    2.716 vs 2.630 ms in the megakernel trace — Mosaic compiles the padded
    slices to cheap offset reads, while roll+edge-select pays a real
    rotate + select per tap. The materialized pad is the fast form here."""
    padded = _edge_pad(plane, axis, k)
    n = plane.shape[axis]
    acc = jnp.zeros_like(plane)
    if ws is None:
        ws = _tent_weights(off, k)
    for t, dd in enumerate(range(-k, k + 1)):
        idx = [slice(None)] * 2
        idx[axis] = slice(k + dd, k + dd + n)
        acc = acc + padded[tuple(idx)] * ws[t]
    return acc


def _pad_plane(res, hp: int, wstride: int):
    """Edge-extend an [H, W] plane to the zgather composite's padded cell
    layout [hp, wstride] (padded row/col = clamp(r-1) — ops/pallas/
    zg_composite.py): 3-piece concats with broadcast edge blocks."""
    h, w = res.shape
    res = jnp.concatenate(
        [res[0:1], res,
         jnp.broadcast_to(res[h - 1:h], (hp - h - 1, w))], axis=0)
    return jnp.concatenate(
        [res[:, 0:1], res,
         jnp.broadcast_to(res[:, w - 1:w], (hp, wstride - w - 1))], axis=1)


def _reproj_offsets(bpar_ref, z, grid_whd, h_glob, k, with_jitter: bool):
    """Reprojection blend geometry for slice z: froxel -> view -> prev-view
    -> prev froxel (pack_blend_params layout), slab-local texel coords, and
    the GLOBAL-uvw xy success mask. Returns (off_x, off_y, off_z, success)
    with offsets pre-clipped to the +-k warp window. SINGLE SOURCE for the
    coordinate block — this kernel, frame_fused.py's two blend sites, and
    integrate_blend.py all inline it; SPEC "Reprojection sampling" pins the
    semantics (the eps*dims - 0.5 texel convention, the clip order, the
    1e-8 pfz floor)."""
    w, h, d = grid_whd
    p = lambda i: bpar_ref[0, i]
    fpx, fpy, fpz, fpw, near = p(12), p(13), p(14), p(15), p(16)
    jx, jy, jz = p(17), p(18), p(19)
    eps, y0 = p(21), p(22)

    # current froxel center (UNJITTERED, _reproject_texel) -> view
    zf = z.astype(jnp.float32)
    vz = (jnp.exp(jnp.log(fpz) * (zf + 0.5) / d) - 1.0) * fpw + near
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    ys = jnp.clip(ys + y0, 0.0, h_glob - 1.0)
    vx = (2.0 * (xs + 0.5) / w - 1.0) * vz / fpx
    vy = (2.0 * (ys + 0.5) / h_glob - 1.0) * vz / fpy

    # combined view -> prev-view (rigid: no w divide)
    pvx = p(0) * vx + p(1) * vy + p(2) * vz + p(3)
    pvy = p(4) * vx + p(5) * vy + p(6) * vz + p(7)
    pvz = p(8) * vx + p(9) * vy + p(10) * vz + p(11)

    # prev-view -> prev froxel (GLOBAL grid coords, helper:142-151)
    pfz = d * jnp.log(jnp.maximum((pvz - near) / fpw + 1.0, 1e-8)) \
        / jnp.log(fpz)
    pfx = w * (fpx * pvx / pvz + 1.0) / 2.0
    pfy = h_glob * (fpy * pvy / pvz + 1.0) / 2.0
    if with_jitter:
        pfx = pfx + jx
        pfy = pfy + jy
        pfz = pfz + jz

    # texel = (prev_pos/dims + eps)*dims - 0.5, y made slab-local
    tx = pfx + eps * w - 0.5
    ty = pfy + eps * h_glob - 0.5 - y0
    tz = pfz + eps * d - 0.5

    # xy reprojection success on the GLOBAL uvw (helper:165-171)
    ux = pfx / w + eps
    uy = pfy / h_glob + eps
    success = ((ux >= 0.0) & (ux <= 1.0) & (uy >= 0.0)
               & (uy <= 1.0)).astype(jnp.float32)

    # warp clamps (windowed_warp: targets clipped to the LOCAL volume)
    tz = jnp.clip(tz, 0.0, d - 1.0)
    ty = jnp.clip(ty, 0.0, h - 1.0)
    tx = jnp.clip(tx, 0.0, w - 1.0)
    base_y = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    base_x = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    off_z = jnp.clip(tz - zf, -k, k)
    off_y = jnp.clip(ty - base_y, -k, k)
    off_x = jnp.clip(tx - base_x, -k, k)
    return off_x, off_y, off_z, success


def _kernel(par_ref, *refs, grid_whd: Tuple[int, int, int], k: int,
            n_ch: int, mode: str, h_glob: int, use_jitter: bool,
            padded_out=None):
    prevs = refs[:n_ch]
    curs = refs[n_ch:2 * n_ch]
    outs = refs[2 * n_ch:3 * n_ch]
    rings = refs[3 * n_ch:]
    w, h, d = grid_whd
    j = pl.program_id(0)
    ring_n = 2 * k + 2

    # load this step's history slice into the ring (slice min(j, d-1) via the
    # BlockSpec index map; slot j mod ring_n — see the slot proof in the
    # module tests)
    slot = jnp.mod(j, ring_n)
    for c in range(n_ch):
        rings[c][pl.ds(slot, 1)] = prevs[c][:]

    @pl.when(j > k)
    def _():
        z = j - (k + 1)
        alpha = par_ref[0, 20]
        off_x, off_y, off_z, success = _reproj_offsets(
            par_ref, z, grid_whd, h_glob, k, use_jitter)

        warped = []
        # weight planes shared across channels (hoisted once per blend site)
        ztaps = [(jnp.mod(jnp.clip(z + dd, 0, d - 1), ring_n),
                  jnp.maximum(0.0, 1.0 - jnp.abs(off_z - dd)))
                 for dd in range(-k, k + 1)]
        wys = _tent_weights(off_y, k)
        wxs = _tent_weights(off_x, k)
        for c in range(n_ch):
            # z tent from the ring: tap slice clip(z+dd, 0, d-1), slot proof:
            # slice s lives in slot s % ring_n from step s until s + ring_n,
            # and every tap needed at step j = z+k+1 is within that window
            acc = jnp.zeros((h, w), jnp.float32)
            for slot, wz in ztaps:
                acc = acc + rings[c][pl.ds(slot, 1)][0] * wz
            acc = _tent_pass(acc, None, 0, k, ws=wys)
            acc = _tent_pass(acc, None, 1, k, ws=wxs)
            warped.append(acc)

        if mode == "weight":
            wgt = alpha * success
        else:  # "alpha": success = warped alpha channel != 0 (compute:257)
            wgt = alpha * (warped[n_ch - 1] != 0.0).astype(jnp.float32)
        for c in range(n_ch):
            cur = curs[c][0]
            res = cur + wgt * (warped[c] - cur)
            if padded_out is not None:
                res = _pad_plane(res, *padded_out)
            outs[c][0] = res


def fused_temporal_blend(params, view_to_world, prev_world_to_view, jitter,
                         alpha, prev_planes: Sequence[jax.Array],
                         cur_planes: Sequence[jax.Array],
                         grid_whd: Tuple[int, int, int], k: int, mode: str,
                         uvw_epsilon: float = 0.0,
                         interpret: bool = False,
                         padded_out=None) -> Tuple[jax.Array, ...]:
    """Blend cur with the reprojection-warped prev, one fused pass.

    prev_planes / cur_planes: per-channel [D, H, W] volumes (same length).
    mode "weight": out = cur + alpha*success*(warped - cur) (shadow blend;
    pass jitter + uvw_epsilon=1e-4). mode "alpha": weight =
    alpha*(warped_last != 0) with the LAST plane as the success alpha
    (accumulation blend; zero jitter, eps 0). Returns blended planes.

    padded_out=(hp, wstride): emit planes edge-extended to the zgather
    composite's padded cell layout [DLANES, hp, wstride] (slices >= d stay
    unwritten and are never gathered — the composite's z-taps clamp to
    d-1); the edge fill happens in VMEM per slice, replacing ~1.3 ms of
    XLA pad concats (PERF.md)."""
    w, h, d = grid_whd
    n_ch = len(prev_planes)
    use_jitter = mode == "weight"
    jit = jitter if use_jitter else jnp.zeros((3,), jnp.float32)
    par = pack_blend_params(params, view_to_world, prev_world_to_view, jit,
                            alpha, uvw_epsilon)

    kernel = functools.partial(_kernel, grid_whd=grid_whd, k=k, n_ch=n_ch,
                               mode=mode, h_glob=params.grid[1],
                               use_jitter=use_jitter, padded_out=padded_out)

    prev_spec = pl.BlockSpec((1, h, w), lambda j: (jnp.minimum(j, d - 1), 0, 0),
                             memory_space=pltpu.VMEM)
    out_idx = lambda j: (jnp.maximum(j - (k + 1), 0), 0, 0)
    cur_spec = pl.BlockSpec((1, h, w), out_idx, memory_space=pltpu.VMEM)
    if padded_out is not None:
        from volumetricrenderer_tpu.ops.pallas.zg_composite import DLANES
        hp, wstride = padded_out
        out_spec = pl.BlockSpec((1, hp, wstride), out_idx,
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((DLANES, hp, wstride), jnp.float32)
    else:
        out_spec = cur_spec
        out_shape = jax.ShapeDtypeStruct((d, h, w), jnp.float32)
    smem = pl.BlockSpec(par.shape, lambda j: (0, 0), memory_space=pltpu.SMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(d + k + 1,),
        in_specs=[smem] + [prev_spec] * n_ch + [cur_spec] * n_ch,
        out_specs=tuple([out_spec] * n_ch),
        out_shape=tuple([out_shape] * n_ch),
        scratch_shapes=[pltpu.VMEM((2 * k + 2, h, w), jnp.float32)] * n_ch,
        interpret=interpret,
    )(par, *prev_planes, *cur_planes)
    return outs if isinstance(outs, tuple) else (outs,)
