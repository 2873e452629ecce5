"""Differentiable inverse rendering — the framework's "training" path.

The whole pipeline is pure JAX, so medium/light parameters are optimizable by
gradient descent for free (something the reference's HLSL kernels fundamentally
cannot do). `train_step` fits a medium's scattering color / absorption / phase
to target images; `make_sharded_train_step` runs it data-parallel over a device
mesh (per-device view batches, psum-averaged grads over ICI) — the multi-chip
training step exercised by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from volumetricrenderer_tpu.models.media import Medium
from volumetricrenderer_tpu.models.scene import Scene
from volumetricrenderer_tpu.renderer import VolumetricRenderer
from volumetricrenderer_tpu.state import FrameState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FogParams:
    """Log-space parameterization keeps the physical params positive."""
    log_scattering: jax.Array   # [3]
    log_absorption: jax.Array   # []
    atanh_phase_g: jax.Array    # []

    @staticmethod
    def from_medium(m: Medium) -> "FogParams":
        return FogParams(
            log_scattering=jnp.log(jnp.maximum(m.scattering_color, 1e-4)),
            log_absorption=jnp.log(jnp.maximum(m.absorption, 1e-4)),
            atanh_phase_g=jnp.arctanh(jnp.clip(m.phase_g, -0.98, 0.98)),
        )

    def apply(self, m: Medium) -> Medium:
        return dataclasses.replace(
            m,
            scattering_color=jnp.exp(self.log_scattering),
            absorption=jnp.exp(self.log_absorption),
            phase_g=jnp.tanh(self.atanh_phase_g) * 0.99,
        )


def _scene_with_params(scene: Scene, params: FogParams) -> Scene:
    media = (params.apply(scene.media[0]),) + tuple(scene.media[1:])
    return dataclasses.replace(scene, media=media)


def render_loss(renderer: VolumetricRenderer, params: FogParams, scene: Scene,
                state: FrameState, target: jax.Array, scene_color, view_depth
                ) -> jax.Array:
    img, _, _ = renderer.render_frame(state, _scene_with_params(scene, params),
                                      0.0, scene_color, view_depth)
    return jnp.mean((img[..., :3] - target) ** 2)


def train_step(renderer: VolumetricRenderer, params: FogParams, opt_state,
               optimizer, scene: Scene, state: FrameState, target: jax.Array,
               scene_color, view_depth):
    """One Adam step on the fog parameters. Jit this with optimizer static."""
    loss, grads = jax.value_and_grad(render_loss, argnums=1)(
        renderer, params, scene, state, target, scene_color, view_depth)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_sharded_train_step(renderer: VolumetricRenderer, mesh: Mesh,
                            optimizer, axis_name: str = "batch"):
    """Data-parallel training step via shard_map: each device renders its own
    batch slice of (camera) views against its target slice; gradients are
    psum-averaged across the mesh (pure ICI traffic).

    batch inputs: cam_positions [B, 3], targets [B, IH, IW, 3],
    scene_colors [B, IH, IW, 3], view_depths [B, IH, IW], B % n_devices == 0.
    """
    def per_device(params, opt_state, scene, state, cam_pos, targets,
                   scene_colors, view_depths):
        def one_view(p, cp, tgt, sc, vd):
            cam = dataclasses.replace(scene.camera, position=cp)
            sc_view = dataclasses.replace(scene, camera=cam)
            return render_loss(renderer, p, sc_view, state, tgt, sc, vd)

        def batch_loss(p):
            losses = jax.vmap(lambda cp, tgt, sc, vd: one_view(p, cp, tgt, sc, vd)
                              )(cam_pos, targets, scene_colors, view_depths)
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(batch_loss)(params)
        # Average across the data-parallel axis (the only cross-chip collective).
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss

    pspec_batch = P(axis_name)
    sharded = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(), P(), pspec_batch, pspec_batch, pspec_batch,
                  pspec_batch),
        out_specs=(P(), P(), P()),
        check_vma=False)

    @jax.jit
    def step(params, opt_state, scene, state, cam_pos, targets, scene_colors,
             view_depths):
        return sharded(params, opt_state, scene, state, cam_pos, targets,
                       scene_colors, view_depths)

    return step
