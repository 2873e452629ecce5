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


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OpacityParams:
    """Optimizable occluder density: per-box shadow opacity in logit space
    (keeps it in (0, 1); SPEC "Occluder opacity"). Visibility is LINEAR in
    each opacity, so gradients are exact — inverse rendering of foliage
    density from observed shadowing (tests/test_box_opacity.py). Requires
    geometry.box_fractional (build the scene with any opacity < 1, or
    dataclasses.replace the static flag)."""
    logit_opacity: jax.Array    # [B]

    @staticmethod
    def from_scene(scene: Scene) -> "OpacityParams":
        o = jnp.clip(scene.geometry.box_opacity, 1e-3, 1.0 - 1e-3)
        return OpacityParams(logit_opacity=jnp.log(o / (1.0 - o)))

    def apply(self, scene: Scene) -> Scene:
        g = dataclasses.replace(scene.geometry,
                                box_opacity=jax.nn.sigmoid(self.logit_opacity))
        return dataclasses.replace(scene, geometry=g)


def _scene_with_params(scene: Scene, params: FogParams) -> Scene:
    media = (params.apply(scene.media[0]),) + tuple(scene.media[1:])
    return dataclasses.replace(scene, media=media)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LightParams:
    """Optimizable light appearance: positions free-space, color*intensity
    jointly in log-space (positive; the reference's gamma-2.2 packing is
    monotonic so the decomposition into color vs intensity is irrelevant to
    the image). Gradients w.r.t. positions flow through falloff, phase, and
    cone terms; the boolean any-hit shadow test contributes none (a correct
    subgradient — visibility is piecewise constant)."""
    point_position: jax.Array   # [P, 3]
    point_log_ci: jax.Array     # [P, 3]
    spot_position: jax.Array    # [S, 3]
    spot_log_ci: jax.Array      # [S, 3]
    dir_log_ci: jax.Array       # [Nd, 3]

    @staticmethod
    def from_scene(scene: Scene) -> "LightParams":
        lci = lambda lights: jnp.log(jnp.maximum(
            lights.color * lights.intensity[:, None], 1e-6))
        return LightParams(
            point_position=scene.point_lights.position,
            point_log_ci=lci(scene.point_lights),
            spot_position=scene.spot_lights.position,
            spot_log_ci=lci(scene.spot_lights),
            dir_log_ci=lci(scene.dir_lights),
        )

    def apply(self, scene: Scene) -> Scene:
        ones = lambda n: jnp.ones((n,), jnp.float32)
        pl = dataclasses.replace(
            scene.point_lights, position=self.point_position,
            color=jnp.exp(self.point_log_ci),
            intensity=ones(scene.point_lights.count))
        sl = dataclasses.replace(
            scene.spot_lights, position=self.spot_position,
            color=jnp.exp(self.spot_log_ci),
            intensity=ones(scene.spot_lights.count))
        dl = dataclasses.replace(
            scene.dir_lights, color=jnp.exp(self.dir_log_ci),
            intensity=ones(scene.dir_lights.count))
        return dataclasses.replace(scene, point_lights=pl, spot_lights=sl,
                                   dir_lights=dl)


def make_train_step(renderer: VolumetricRenderer, optimizer, apply_fn):
    """Generic single-device inverse step over ANY parameter pytree.

    apply_fn(params, scene) -> Scene reconfigures the scene from the
    parameters (e.g. FogParams/_scene_with_params, LightParams.apply).
    Returns a jittable step(params, opt_state, scene, state, target,
    scene_color, view_depth) -> (params, opt_state, loss)."""
    def loss_fn(params, scene, state, target, scene_color, view_depth):
        img, _, _ = renderer.render_frame(state, apply_fn(params, scene), 0.0,
                                          scene_color, view_depth)
        return jnp.mean((img[..., :3] - target) ** 2)

    @jax.jit
    def step(params, opt_state, scene, state, target, scene_color, view_depth):
        loss, grads = jax.value_and_grad(loss_fn)(params, scene, state,
                                                  target, scene_color,
                                                  view_depth)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


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
