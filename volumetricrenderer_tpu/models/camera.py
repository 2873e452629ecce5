"""Camera model.

Replaces the Unity Camera + transform consumed by the reference
(VolumetricRenderer.cs:176-187). All fields are arrays so a moving camera can be
fed through jit without recompilation; the froxel view matrix is rebuilt from
(position, forward, up) via LookAt, mirroring cs:180-181.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu import froxel


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    position: jax.Array            # [3]
    forward: jax.Array             # [3] unit
    up: jax.Array                  # [3] unit
    fov_y: jax.Array               # vertical field of view, radians
    aspect: jax.Array              # width / height
    near: jax.Array                # near clip plane (demo scene: 0.3, scene:570)
    far: jax.Array                 # far clip plane (demo scene: 100)

    @staticmethod
    def create(position, forward, up=(0.0, 1.0, 0.0), fov_y_deg=60.0, aspect=16.0 / 9.0,
               near=0.3, far=100.0) -> "Camera":
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        fwd = f32(forward)
        fwd = fwd / jnp.linalg.norm(fwd)
        upv = f32(up)
        return Camera(
            position=f32(position),
            forward=fwd,
            up=upv / jnp.linalg.norm(upv),
            fov_y=f32(fov_y_deg) * jnp.pi / 180.0,
            aspect=f32(aspect),
            near=f32(near),
            far=f32(far),
        )

    def view_to_world(self) -> jax.Array:
        return froxel.look_at_matrix(self.position, self.forward, self.up)

    def world_to_view(self) -> jax.Array:
        return froxel.invert_rigid(self.view_to_world())
