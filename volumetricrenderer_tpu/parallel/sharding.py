"""Multi-chip scale-out.

The reference is single-GPU (SURVEY §2.8); its only parallel structure is
(a) froxel rays independent in XY and (b) lights additive. Both map directly
onto a TPU mesh:

- **Screen-space sharding** ("y" axis): froxel volumes [.., D, H, W] and images
  [IH, IW] shard along H. Every froxel pass is elementwise per ray, so the only
  cross-shard traffic is (1) the 1-froxel stencil of the jittered scatter fetch
  and (2) temporal-reprojection gathers — both handled automatically by the
  GSPMD partitioner from sharding annotations (the volumes are ~7 MB; a halo or
  gather across ICI is microseconds).
- **Light sharding** ("lights" axis): each device computes the scatter sum of a
  light subset, then one psum merges them (the additive decomposition the
  reference expresses as per-light `+=` dispatches, VolumetricCompute.compute:84).
- **Data parallel** ("batch" axis over frames/views, for multi-host DCN):
  see inverse.py's sharded training step.

This module uses jit + NamedSharding (GSPMD) rather than hand-written
collectives: the pipeline is bandwidth-light, and XLA's partitioner already
emits the minimal halo exchanges.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from volumetricrenderer_tpu.renderer import VolumetricRenderer
from volumetricrenderer_tpu.state import FrameState


def make_mesh(devices=None, axis_name: str = "y") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices).reshape(-1), (axis_name,))


def _vol_spec(ndim: int, axis_name: str) -> P:
    """Shard the H axis (third-from-last of [.., D, H, W])."""
    spec = [None] * ndim
    spec[ndim - 2] = axis_name
    return P(*spec)


def shard_state(state: FrameState, mesh: Mesh, axis_name: str = "y") -> FrameState:
    """Place the froxel history volumes with H sharded across the mesh."""
    def place(x):
        if x.ndim >= 3:
            sh = NamedSharding(mesh, _vol_spec(x.ndim, axis_name))
        else:
            sh = NamedSharding(mesh, P())
        return jax.device_put(x, sh)
    return jax.tree_util.tree_map(place, state)


def make_sharded_render(renderer: VolumetricRenderer, mesh: Mesh,
                        axis_name: str = "y"):
    """jit-ed render_frame whose volumes/images stay H-sharded across the mesh.

    Returns fn(state, scene, time_x) -> (image, new_state). Constraining the
    image and the new state is enough: GSPMD propagates the sharding backward
    through the elementwise pipeline and inserts halo exchanges only where the
    stencil/reprojection demand them.
    """
    img_sharding = NamedSharding(mesh, P(axis_name, None, None))

    def fn(state: FrameState, scene, time_x):
        image, _, new_state = renderer.render_frame(state, scene, time_x)
        image = jax.lax.with_sharding_constraint(image, img_sharding)
        new_state = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, _vol_spec(x.ndim, axis_name)))
            if x.ndim >= 3 else x, new_state)
        return image, new_state

    return jax.jit(fn, donate_argnums=0)


def accumulate_zsharded(in_scatter: jax.Array, extinction: jax.Array,
                        step_lengths: jax.Array, mesh: Mesh,
                        axis_name: str = "z") -> jax.Array:
    """Front-to-back integration with the froxel Z axis sharded across devices.

    The blockwise-scan analog of ring attention for transmittance (SURVEY
    section 5): the per-slice integral (L, T) composes associatively as
    (L1, T1) + (L2, T2) = (L1 + T1*L2, T1*T2), so each device scans its local
    Z block, all-gathers the tiny per-block (L_total, T_total) summaries over
    ICI, computes its exclusive prefix in-register, and composes it into the
    local result. Cross-device traffic: one all_gather of [n, ..., 4] block
    summaries per call — independent of D.

    Same signature/semantics as ops.scatter_scan.accumulate_scan
    (VolumetricCompute.compute:172-200). D must divide the mesh size.
    """
    from volumetricrenderer_tpu.ops.scatter_scan import accumulate_blocked

    n = mesh.devices.size
    d = in_scatter.shape[0]
    assert d % n == 0, f"D={d} must divide the mesh size {n}"
    vol_spec = P(axis_name)          # shard dim 0 (Z); all others replicated

    def block(scat, ext, steps):
        # local inclusive scan over this device's Z block
        acc = accumulate_blocked(scat, ext, steps)
        l_loc, t_loc = acc[..., :3], acc[..., 3]
        # exclusive prefix of the per-block totals across devices
        l_tot = l_loc[-1]
        t_tot = t_loc[-1]
        l_all = jax.lax.all_gather(l_tot, axis_name)     # [n, ..., 3]
        t_all = jax.lax.all_gather(t_tot, axis_name)     # [n, ...]
        idx = jax.lax.axis_index(axis_name)
        l_pre = jnp.zeros_like(l_tot)
        t_pre = jnp.ones_like(t_tot)
        for k in range(n - 1):       # tiny: n summaries, unrolled
            take = (k < idx).astype(t_pre.dtype)
            l_pre = l_pre + t_pre[..., None] * l_all[k] * take[..., None]
            t_pre = t_pre * (1.0 - take + take * t_all[k])
        l_out = l_pre + t_pre[..., None] * l_loc
        t_out = t_pre * t_loc
        return jnp.concatenate([l_out, t_out[..., None]], axis=-1)

    fn = jax.shard_map(block, mesh=mesh,
                       in_specs=(vol_spec, vol_spec, vol_spec),
                       out_specs=vol_spec)
    return fn(in_scatter, extinction, step_lengths)


def light_sharded_scatter(cfg, params, view_to_world, camera_pos, jitter,
                          material_a, material_b, shadow_volume, dir_lights,
                          point_lights, spot_lights, mesh: Mesh,
                          geometry=None, axis_name: str = "lights"
                          ) -> jax.Array:
    """Local-light scatter with the lights sharded across devices + one psum.

    The reference's per-light additive `+=` dispatches
    (VolumetricCompute.compute:84, 124, 165) are an embarrassingly parallel
    decomposition (SURVEY section 2.8): each device computes the scatter of a
    light subset over the full (replicated) froxel grid, and a single psum
    merges the partial volumes. Point and spot counts must each divide the
    mesh size (pad with zero-intensity lights to align). Dir lights and
    extinction ride on device 0's partial (they are not per-local-light).
    Returns [D, H, W, 4] like pipeline.write_scatter_volume.
    """
    import dataclasses as _dc

    from volumetricrenderer_tpu import pipeline
    from volumetricrenderer_tpu.models.lights import (DirectionalLights,
                                                      PointLights, SpotLights)

    n = mesh.devices.size
    assert point_lights.count % n == 0 and spot_lights.count % n == 0, \
        "pad point/spot light arrays to a multiple of the mesh size"

    spec_l = P(axis_name)

    def block(pl_arrs, sl_arrs):
        pl_local = PointLights(**{k: v for k, v in pl_arrs.items()})
        sl_local = SpotLights(**{k: v for k, v in sl_arrs.items()})
        partial = pipeline.write_scatter_volume(
            _dc.replace(cfg, scatter_impl="xla"), params, view_to_world,
            camera_pos, jitter, material_a, material_b, shadow_volume,
            DirectionalLights.empty(), pl_local, sl_local, None, None,
            geometry)
        partial = jax.lax.psum(partial, axis_name)
        return partial

    def soa_dict(l):
        return {f.name: getattr(l, f.name) for f in _dc.fields(l)}

    in_specs = (
        {k: (spec_l if getattr(v, "ndim", 0) >= 1 else P())
         for k, v in soa_dict(point_lights).items()},
        {k: (spec_l if getattr(v, "ndim", 0) >= 1 else P())
         for k, v in soa_dict(spot_lights).items()},
    )
    fn = jax.shard_map(block, mesh=mesh, in_specs=in_specs, out_specs=P())
    local_sum = fn(soa_dict(point_lights), soa_dict(spot_lights))

    # dir lights + extinction once, on the replicated path
    base = pipeline.write_scatter_volume(
        _dc.replace(cfg, scatter_impl="xla"), params, view_to_world,
        camera_pos, jitter, material_a, material_b, shadow_volume,
        dir_lights, PointLights.empty(), SpotLights.empty(), None, None,
        geometry)
    return base + jnp.concatenate(
        [local_sum[..., :3], jnp.zeros_like(local_sum[..., 3:])], axis=-1)
