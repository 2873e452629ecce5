"""Fused Pallas directional shadow-volume kernel (raycast mode).

Same per-z-slice skeleton as ops/pallas/scatter.py: froxel -> world positions
in-register, any-hit occlusion against the SMEM primitive tables, one output
plane per directional light. Mirrors pipeline.write_shadow_volume_dir's
raycast branch exactly (visibility squared per VolumetricShadowCompute:17,
strength floor, has_shadow gate).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_dir_lights(dir_lights) -> jax.Array:
    """[Nd, 8]: direction(3), strength_r, shadow_gate, pad(3)."""
    rows = []
    for i in range(dir_lights.count):
        rows.append(jnp.concatenate([
            dir_lights.direction[i],
            (1.0 - dir_lights.shadow_strength[i])[None],
            dir_lights.has_shadow[i].astype(jnp.float32)[None],
            jnp.zeros((3,), jnp.float32)]))
    return jnp.stack(rows)


def dir_shadow_slice(par_ref, lights_ref, planes_ref, spheres_ref, boxes_ref,
                     hf_ref, zi, *, grid_whd: Tuple[int, int, int],
                     n_lights: int, n_planes: int, n_spheres: int,
                     n_boxes: int, max_dist: float, h_glob: int,
                     hf_static: tuple = None, fractional: bool = False):
    """One z-slice's gated visibility^2 planes, one per dir light (the body
    shared by the plain kernel and the fused shadow+blend kernel). The
    any-hit tests come from ops/pallas/occlude.py (negation symmetry is
    IEEE-exact vs the original inline block)."""
    from volumetricrenderer_tpu.ops.pallas.occlude import any_hit, pack_boxes

    w, h, d = grid_whd                  # local block shape (h may be a slab)
    p = lambda i: par_ref[0, i]
    fpx, fpy, fpz, fpw, near = p(12), p(13), p(14), p(15), p(16)
    jx, jy, jz = p(17), p(18), p(19)
    y0 = p(23)                          # global row of local row 0 (slab)

    fz = zi.astype(jnp.float32) + 0.5 + jz
    vz = (jnp.exp(jnp.log(fpz) * fz / d) - 1.0) * fpw + near
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    ys = jnp.clip(ys + y0, 0.0, h_glob - 1.0)
    vx = (2.0 * (xs + 0.5 + jx) / w - 1.0) * vz / fpx
    vy = (2.0 * (ys + 0.5 + jy) / h_glob - 1.0) * vz / fpy
    wx = p(0) * vx + p(1) * vy + p(2) * vz + p(3)
    wy = p(4) * vx + p(5) * vy + p(6) * vz + p(7)
    wz = p(8) * vx + p(9) * vy + p(10) * vz + p(11)

    planes_out = []
    for li in range(n_lights):          # Nd is small (usually 1): unroll
        q = lambda i: lights_ref[li, i]
        ldx, ldy, ldz = -q(0), -q(1), -q(2)   # towards the light
        strength_r, gate = q(3), q(4)
        occ = any_hit(planes_ref, spheres_ref, boxes_ref, hf_ref,
                      wx, wy, wz, ldx, ldy, ldz, jnp.float32(max_dist),
                      n_planes=n_planes, n_spheres=n_spheres,
                      n_boxes=n_boxes, hf_static=hf_static,
                      fractional=fractional)
        vis = strength_r + (1.0 - strength_r) * (1.0 - occ.astype(jnp.float32))
        vis = vis * vis                  # shadowCompute:17
        planes_out.append(1.0 + gate * (vis - 1.0))
    return planes_out


def _kernel(par_ref, lights_ref, planes_ref, spheres_ref, boxes_ref, hf_ref,
            out_ref, *, grid_whd: Tuple[int, int, int], **statics):
    zi = pl.program_id(0)
    outs = dir_shadow_slice(par_ref, lights_ref, planes_ref, spheres_ref,
                            boxes_ref, hf_ref, zi, grid_whd=grid_whd,
                            **statics)
    for li, plane in enumerate(outs):
        out_ref[li, 0] = plane


def dir_shadow_pallas(params, view_to_world, jitter, dir_lights, geometry,
                      grid_whd: Tuple[int, int, int],
                      interpret: bool = False) -> jax.Array:
    """[Nd, D, H, W] per-dir-light visibility (squared, gated)."""
    from volumetricrenderer_tpu.ops.pallas.scatter import pack_params

    w, h, d = grid_whd
    nd = dir_lights.count
    lights = pack_dir_lights(dir_lights)
    par = pack_params(params, view_to_world, jnp.zeros((3,), jnp.float32),
                      jitter)

    planes = jnp.concatenate([geometry.plane_normal,
                              geometry.plane_d[:, None]], axis=-1)
    spheres = jnp.concatenate([geometry.sphere_center,
                               geometry.sphere_radius[:, None]], axis=-1)
    from volumetricrenderer_tpu.ops.pallas.occlude import pack_boxes
    boxes = pack_boxes(geometry)
    n_planes, n_spheres, n_boxes = (planes.shape[0], spheres.shape[0],
                                    boxes.shape[0])
    planes = planes if n_planes else jnp.zeros((1, 4), jnp.float32)
    spheres = spheres if n_spheres else jnp.zeros((1, 4), jnp.float32)
    boxes = boxes if n_boxes else jnp.zeros((1, 8), jnp.float32)

    from volumetricrenderer_tpu.ops.pallas.material import pack_heightfield
    hf = pack_heightfield(geometry)
    hf_static = (geometry.hf_octaves, geometry.hf_period, geometry.hf_seed,
                 geometry.hf_steps, geometry.hf_far) \
        if geometry.hf_enabled else None

    kernel = functools.partial(
        _kernel, grid_whd=grid_whd, n_lights=nd, n_planes=n_planes,
        n_spheres=n_spheres, n_boxes=n_boxes, max_dist=1e4,
        h_glob=params.grid[1], hf_static=hf_static,
        fractional=bool(geometry.box_fractional))

    smem = lambda shape: pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                                      memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=[smem(par.shape), smem(lights.shape), smem(planes.shape),
                  smem(spheres.shape), smem(boxes.shape), smem(hf.shape)],
        out_specs=pl.BlockSpec((nd, 1, h, w), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nd, d, h, w), jnp.float32),
        interpret=interpret,
    )(par, lights, planes, spheres, boxes, hf)
