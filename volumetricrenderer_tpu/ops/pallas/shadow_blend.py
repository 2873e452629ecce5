"""Fused directional shadow volume + shadow temporal blend (raycast mode).

ops/pallas/dir_shadow.py and the shadow temporal blend (ops/pallas/
temporal.py, mode "weight") are both sequential passes over z joined by a
[Nd, D, H, W] HBM round trip and a launch. Same fusion as
ops/pallas/integrate_blend.py: compute the raycast shadow slice at step j
into a small VMEM ring, blend slice z = j-k-1 as soon as the history ring
covers its taps. The un-blended shadow volume never exists; the blended
output is ALSO the next frame's history (pipeline semantics preserved:
TemporalBlendShadowVolume writes in place, compute:205-219).

Equivalence vs dir_shadow_pallas + fused_temporal_blend pinned by
tests/test_shadow_blend.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volumetricrenderer_tpu.ops.pallas.dir_shadow import dir_shadow_slice
from volumetricrenderer_tpu.ops.pallas.temporal import (_tent_pass,
                                                        _tent_weights,
                                                        pack_blend_params)


def _kernel(par_ref, bpar_ref, lights_ref, planes_ref, spheres_ref,
            boxes_ref, hf_ref, *refs, grid_whd: Tuple[int, int, int],
            k: int, n_lights: int, h_glob: int, statics: dict):
    w, h, d = grid_whd
    prevs = refs[:n_lights]
    outs = refs[n_lights:2 * n_lights]
    scratch = refs[2 * n_lights:]
    cur_ring = scratch[:n_lights]            # [k+2, h, w] each
    prev_ring = scratch[n_lights:]           # [2k+2, h, w] each
    j = pl.program_id(0)
    ring_n = 2 * k + 2

    # history ring load (plane min(j, d-1) via BlockSpec)
    slot = jnp.mod(j, ring_n)
    for c in range(n_lights):
        prev_ring[c][pl.ds(slot, 1)] = prevs[c][:]

    # raycast shadow for slice min(j, d-1) -> cur ring
    @pl.when(j < d)
    def _shadow():
        cur = dir_shadow_slice(par_ref, lights_ref, planes_ref, spheres_ref,
                               boxes_ref, hf_ref, j, grid_whd=grid_whd,
                               n_lights=n_lights, h_glob=h_glob, **statics)
        cslot = jnp.mod(j, k + 2)
        for c in range(n_lights):
            cur_ring[c][pl.ds(cslot, 1)] = cur[c][None]

    # blend slice z = j - (k+1) (ops/pallas/temporal.py mode "weight":
    # jittered reprojection + the reference's 1e-4 uvw nudge)
    @pl.when(j > k)
    def _blend():
        z = j - (k + 1)
        p = lambda i: bpar_ref[0, i]
        fpx, fpy, fpz, fpw, near = p(12), p(13), p(14), p(15), p(16)
        jx, jy, jz = p(17), p(18), p(19)
        alpha, eps, y0 = p(20), p(21), p(22)

        zf = z.astype(jnp.float32)
        vz = (jnp.exp(jnp.log(fpz) * (zf + 0.5) / d) - 1.0) * fpw + near
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
        ys = jnp.clip(ys + y0, 0.0, h_glob - 1.0)
        vx = (2.0 * (xs + 0.5) / w - 1.0) * vz / fpx
        vy = (2.0 * (ys + 0.5) / h_glob - 1.0) * vz / fpy

        pvx = p(0) * vx + p(1) * vy + p(2) * vz + p(3)
        pvy = p(4) * vx + p(5) * vy + p(6) * vz + p(7)
        pvz = p(8) * vx + p(9) * vy + p(10) * vz + p(11)

        pfz = d * jnp.log(jnp.maximum((pvz - near) / fpw + 1.0, 1e-8)) \
            / jnp.log(fpz)
        pfx = w * (fpx * pvx / pvz + 1.0) / 2.0
        pfy = h_glob * (fpy * pvy / pvz + 1.0) / 2.0
        pfx = pfx + jx
        pfy = pfy + jy
        pfz = pfz + jz

        tx = pfx + eps * w - 0.5
        ty = pfy + eps * h_glob - 0.5 - y0
        tz = pfz + eps * d - 0.5

        ux = pfx / w + eps
        uy = pfy / h_glob + eps
        success = ((ux >= 0.0) & (ux <= 1.0) & (uy >= 0.0)
                   & (uy <= 1.0)).astype(jnp.float32)

        tz = jnp.clip(tz, 0.0, d - 1.0)
        ty = jnp.clip(ty, 0.0, h - 1.0)
        tx = jnp.clip(tx, 0.0, w - 1.0)
        off_z = jnp.clip(tz - zf, -k, k)
        base_y = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) \
            .astype(jnp.float32)
        base_x = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) \
            .astype(jnp.float32)
        off_y = jnp.clip(ty - base_y, -k, k)
        off_x = jnp.clip(tx - base_x, -k, k)

        wgt = alpha * success
        cslot = jnp.mod(z, k + 2)
        # weight planes shared across channels (hoisted, temporal._tent_weights)
        ztaps = [(jnp.mod(jnp.clip(z + dd, 0, d - 1), ring_n),
                  jnp.maximum(0.0, 1.0 - jnp.abs(off_z - dd)))
                 for dd in range(-k, k + 1)]
        wys = _tent_weights(off_y, k)
        wxs = _tent_weights(off_x, k)
        for c in range(n_lights):
            acc = jnp.zeros((h, w), jnp.float32)
            for slot, wz in ztaps:
                acc = acc + prev_ring[c][pl.ds(slot, 1)][0] * wz
            acc = _tent_pass(acc, None, 0, k, ws=wys)
            acc = _tent_pass(acc, None, 1, k, ws=wxs)
            cur = cur_ring[c][pl.ds(cslot, 1)][0]
            outs[c][0] = cur + wgt * (acc - cur)


def dir_shadow_blend_fused(params, view_to_world, prev_world_to_view,
                           jitter, alpha, dir_lights, geometry, prev_shadow,
                           grid_whd: Tuple[int, int, int], k: int,
                           interpret: bool = False) -> jax.Array:
    """[Nd, D, H, W] BLENDED raycast shadow volume in one kernel.
    prev_shadow: [Nd, D, H, W] history (the previous blended output)."""
    from volumetricrenderer_tpu.ops.pallas.dir_shadow import pack_dir_lights
    from volumetricrenderer_tpu.ops.pallas.material import pack_heightfield
    from volumetricrenderer_tpu.ops.pallas.scatter import pack_params

    w, h, d = grid_whd
    nd = dir_lights.count
    lights = pack_dir_lights(dir_lights)
    par = pack_params(params, view_to_world, jnp.zeros((3,), jnp.float32),
                      jitter)
    bpar = pack_blend_params(params, view_to_world, prev_world_to_view,
                             jitter, alpha, 1e-4)

    planes = jnp.concatenate([geometry.plane_normal,
                              geometry.plane_d[:, None]], axis=-1)
    spheres = jnp.concatenate([geometry.sphere_center,
                               geometry.sphere_radius[:, None]], axis=-1)
    from volumetricrenderer_tpu.ops.pallas.occlude import \
        pack_boxes
    boxes = pack_boxes(geometry)
    n_planes, n_spheres, n_boxes = (planes.shape[0], spheres.shape[0],
                                    boxes.shape[0])
    planes = planes if n_planes else jnp.zeros((1, 4), jnp.float32)
    spheres = spheres if n_spheres else jnp.zeros((1, 4), jnp.float32)
    boxes = boxes if n_boxes else jnp.zeros((1, 8), jnp.float32)
    hf = pack_heightfield(geometry)
    hf_static = (geometry.hf_octaves, geometry.hf_period, geometry.hf_seed,
                 geometry.hf_steps, geometry.hf_far) \
        if geometry.hf_enabled else None
    statics = dict(n_planes=n_planes, n_spheres=n_spheres, n_boxes=n_boxes,
                   max_dist=1e4, hf_static=hf_static,
                   fractional=bool(geometry.box_fractional))

    kernel = functools.partial(_kernel, grid_whd=grid_whd, k=k, n_lights=nd,
                               h_glob=params.grid[1], statics=statics)

    smem = lambda shape: pl.BlockSpec(shape, lambda j: tuple([0] * len(shape)),
                                      memory_space=pltpu.SMEM)
    prev_spec = pl.BlockSpec((1, h, w), lambda j: (jnp.minimum(j, d - 1), 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, h, w),
                            lambda j: (jnp.maximum(j - (k + 1), 0), 0, 0),
                            memory_space=pltpu.VMEM)
    scratch = ([pltpu.VMEM((k + 2, h, w), jnp.float32)] * nd
               + [pltpu.VMEM((2 * k + 2, h, w), jnp.float32)] * nd)

    outs = pl.pallas_call(
        kernel,
        grid=(d + k + 1,),
        in_specs=[smem(par.shape), smem(bpar.shape), smem(lights.shape),
                  smem(planes.shape), smem(spheres.shape), smem(boxes.shape),
                  smem(hf.shape)] + [prev_spec] * nd,
        out_specs=tuple([out_spec] * nd),
        out_shape=tuple([jax.ShapeDtypeStruct((d, h, w), jnp.float32)] * nd),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(par, bpar, lights, planes, spheres, boxes, hf,
      *(prev_shadow[i] for i in range(nd)))
    return jnp.stack(outs if isinstance(outs, tuple) else (outs,))
