"""Scene animation utilities — the demo-support layer.

Equivalents of the reference's third-party demo helpers (SURVEY §2.7):
- Klak BrownianMotion (Klak/Motion/BrownianMotion.cs): fBm noise wobble applied
  to position/rotation, rebuilt on ops/noise.perlin fBm.
- Klak ConstantMotion (Klak/Motion/ConstantMotion.cs): constant translate/rotate.
- SimpleCameraController (Assets/ThirdParty/SimpleCameraController.cs): a WASD
  fly camera is meaningless headless, so this provides the same exponential
  position/rotation smoothing toward a scripted target path.

All functions are pure: (t, params) -> Camera / offsets, jit-friendly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu.models.camera import Camera
from volumetricrenderer_tpu.ops.noise import perlin_3d


def _fbm_vec3(t: jax.Array, seed: int, octaves: int) -> jax.Array:
    """3 decorrelated fBm samples along a 1D time axis, in [-1, 1]."""
    pts = jnp.stack([
        jnp.stack([t * 0.1, jnp.full_like(t, 7.7 + seed), jnp.full_like(t, 1.3)], -1),
        jnp.stack([jnp.full_like(t, 3.1), t * 0.1 + seed, jnp.full_like(t, 9.2)], -1),
        jnp.stack([jnp.full_like(t, 5.9), jnp.full_like(t, 2.4), t * 0.1 + 2 * seed], -1),
    ])
    return (perlin_3d(pts, octaves=octaves, period=8, seed=seed) - 0.5) * 2.0


@dataclasses.dataclass(frozen=True)
class BrownianMotion:
    """fBm wobble (BrownianMotion.cs fields: position/rotation amplitude,
    frequency, octaves)."""
    position_amplitude: float = 0.1
    rotation_amplitude: float = 2.0       # degrees
    frequency: float = 1.0
    octaves: int = 2
    seed: int = 11

    def position_offset(self, t) -> jax.Array:
        t = jnp.asarray(t, jnp.float32) * self.frequency
        return _fbm_vec3(t[None], self.seed, self.octaves)[:, 0] \
            * self.position_amplitude

    def rotation_offset_deg(self, t) -> jax.Array:
        t = jnp.asarray(t, jnp.float32) * self.frequency
        return _fbm_vec3(t[None], self.seed + 101, self.octaves)[:, 0] \
            * self.rotation_amplitude


@dataclasses.dataclass(frozen=True)
class ConstantMotion:
    """Constant translate/rotate (ConstantMotion.cs)."""
    velocity: tuple = (0.0, 0.0, 0.0)         # units/sec
    angular_velocity_deg: tuple = (0.0, 0.0, 0.0)

    def position_offset(self, t) -> jax.Array:
        return jnp.asarray(self.velocity, jnp.float32) * jnp.asarray(t, jnp.float32)

    def rotation_offset_deg(self, t) -> jax.Array:
        return jnp.asarray(self.angular_velocity_deg, jnp.float32) \
            * jnp.asarray(t, jnp.float32)


def _rotate_forward(forward: jax.Array, yaw_pitch_roll_deg: jax.Array) -> jax.Array:
    """Apply small yaw/pitch offsets (degrees) to a forward vector."""
    yaw = jnp.deg2rad(yaw_pitch_roll_deg[1])
    pitch = jnp.deg2rad(yaw_pitch_roll_deg[0])
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    x, y, z = forward[0], forward[1], forward[2]
    # yaw about +y
    x, z = cy * x + sy * z, -sy * x + cy * z
    # pitch about +x (applied in the yawed frame, adequate for small wobbles)
    y, z = cp * y - sp * z, sp * y + cp * z
    v = jnp.stack([x, y, z])
    return v / jnp.linalg.norm(v)


def animate_camera(base: Camera, t, motion: BrownianMotion | ConstantMotion
                   ) -> Camera:
    """Apply a motion component to a camera, like attaching the Unity behaviour
    to the camera object (the demo scene has a disabled BrownianMotion on the
    main camera, scene:547-685)."""
    pos = base.position + motion.position_offset(t)
    fwd = _rotate_forward(base.forward, motion.rotation_offset_deg(t))
    return dataclasses.replace(base, position=pos, forward=fwd)


@dataclasses.dataclass(frozen=True)
class SmoothFollowController:
    """Exponential smoothing toward a target path (SimpleCameraController's
    position/rotation lerp, SimpleCameraController.cs)."""
    position_lerp_time: float = 0.2
    rotation_lerp_time: float = 0.01

    def step(self, cam: Camera, target_pos, target_fwd, dt) -> Camera:
        kp = 1.0 - jnp.exp(jnp.log(0.01) * dt / self.position_lerp_time)
        kr = 1.0 - jnp.exp(jnp.log(0.01) * dt / self.rotation_lerp_time)
        pos = cam.position + (jnp.asarray(target_pos, jnp.float32) - cam.position) * kp
        fwd = cam.forward + (jnp.asarray(target_fwd, jnp.float32) - cam.forward) * kr
        fwd = fwd / jnp.linalg.norm(fwd)
        return dataclasses.replace(cam, position=pos, forward=fwd)
