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
