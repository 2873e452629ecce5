"""Light models, struct-of-arrays with static counts.

Replaces VolumetricLight.cs (per-light MonoBehaviour adapter) + the engine light
globals. Per-light registration lists (VolumetricRenderer.cs:484-523) become
fixed-size arrays vmapped/scanned over; the per-light additive decomposition of
the reference (each light `+=`s into the scatter volume, VolumetricCompute.compute:84,
124, 165) becomes a masked sum — associative, so light order is irrelevant and
lights shard cleanly across devices with a psum.

Field semantics follow VolumetricLight.cs:10-14 (has_volumetric_shadow,
inner_angle_percent, intensity_multiplier) and the Unity Light component
(color, intensity, range, spot_angle). `shadow_strength` replicates
_LightShadowData.r = 1 - strength (VolumetricHelper.hlsl:233).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _f32(v):
    return jnp.asarray(v, jnp.float32)


def gamma22(color_times_intensity: jax.Array) -> jax.Array:
    """The reference applies pow 2.2 to color*intensity CPU-side before upload
    (VolumetricRenderer.cs:541-544, 584-587, 615-618). Kept for parity."""
    return jnp.power(jnp.maximum(color_times_intensity, 0.0), 2.2)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DirectionalLights:
    direction: jax.Array         # [N, 3] unit, pointing from the light (transform.forward)
    color: jax.Array             # [N, 3]
    intensity: jax.Array         # [N]
    has_shadow: jax.Array        # [N] bool — hasVolumetricShadow
    shadow_strength: jax.Array   # [N] in [0,1]

    @property
    def count(self) -> int:
        return self.direction.shape[0]

    @property
    def packed_color(self) -> jax.Array:
        return gamma22(self.color * self.intensity[:, None])

    @staticmethod
    def create(direction, color, intensity, has_shadow=None, shadow_strength=None):
        d = _f32(direction).reshape(-1, 3)
        n = d.shape[0]
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return DirectionalLights(
            direction=d,
            color=_f32(color).reshape(n, 3),
            intensity=_f32(intensity).reshape(n),
            has_shadow=jnp.asarray(has_shadow if has_shadow is not None else [True] * n, bool).reshape(n),
            shadow_strength=_f32(shadow_strength if shadow_strength is not None else [1.0] * n).reshape(n),
        )

    @staticmethod
    def empty():
        z = jnp.zeros((0, 3), jnp.float32)
        return DirectionalLights(z, z, jnp.zeros((0,), jnp.float32),
                                 jnp.zeros((0,), bool), jnp.zeros((0,), jnp.float32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointLights:
    position: jax.Array              # [N, 3]
    color: jax.Array                 # [N, 3]
    intensity: jax.Array             # [N]
    range: jax.Array                 # [N]
    intensity_multiplier: jax.Array  # [N] — _LightAttenuationMultiplier
    has_shadow: jax.Array            # [N] bool
    shadow_strength: jax.Array       # [N]

    @property
    def count(self) -> int:
        return self.position.shape[0]

    @property
    def packed_color(self) -> jax.Array:
        return gamma22(self.color * self.intensity[:, None])

    @staticmethod
    def create(position, color, intensity, range, intensity_multiplier=None,
               has_shadow=None, shadow_strength=None):
        p = _f32(position).reshape(-1, 3)
        n = p.shape[0]
        return PointLights(
            position=p,
            color=_f32(color).reshape(n, 3),
            intensity=_f32(intensity).reshape(n),
            range=_f32(range).reshape(n),
            intensity_multiplier=_f32(
                intensity_multiplier if intensity_multiplier is not None else [1.0] * n).reshape(n),
            has_shadow=jnp.asarray(has_shadow if has_shadow is not None else [False] * n, bool).reshape(n),
            shadow_strength=_f32(shadow_strength if shadow_strength is not None else [1.0] * n).reshape(n),
        )

    @staticmethod
    def empty():
        z3 = jnp.zeros((0, 3), jnp.float32)
        z1 = jnp.zeros((0,), jnp.float32)
        return PointLights(z3, z3, z1, z1, z1, jnp.zeros((0,), bool), z1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpotLights:
    position: jax.Array              # [N, 3]
    direction: jax.Array             # [N, 3] unit — _SpotLightDir (transform.forward)
    color: jax.Array                 # [N, 3]
    intensity: jax.Array             # [N]
    range: jax.Array                 # [N]
    spot_angle: jax.Array            # [N] full outer cone angle, radians
    inner_angle_percent: jax.Array   # [N] in [0,1]
    intensity_multiplier: jax.Array  # [N]
    has_shadow: jax.Array            # [N] bool
    shadow_strength: jax.Array       # [N]

    @property
    def count(self) -> int:
        return self.position.shape[0]

    @property
    def packed_color(self) -> jax.Array:
        return gamma22(self.color * self.intensity[:, None])

    @property
    def cos_outer_cone(self) -> jax.Array:
        """_SpotCosOuterCone = cos(spotAngle/2) (VolumetricRenderer.cs:609)."""
        return jnp.cos(self.spot_angle / 2.0)

    @property
    def cos_inner_cone_rcp(self) -> jax.Array:
        """_SpotCosInnerConeRcp = 1/cos(innerAnglePercent*spotAngle/2) (cs:610)."""
        return 1.0 / jnp.cos(self.inner_angle_percent * self.spot_angle / 2.0)

    @staticmethod
    def create(position, direction, color, intensity, range, spot_angle_deg,
               inner_angle_percent=None, intensity_multiplier=None,
               has_shadow=None, shadow_strength=None):
        p = _f32(position).reshape(-1, 3)
        n = p.shape[0]
        d = _f32(direction).reshape(n, 3)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return SpotLights(
            position=p,
            direction=d,
            color=_f32(color).reshape(n, 3),
            intensity=_f32(intensity).reshape(n),
            range=_f32(range).reshape(n),
            spot_angle=_f32(spot_angle_deg).reshape(n) * jnp.pi / 180.0,
            inner_angle_percent=_f32(
                inner_angle_percent if inner_angle_percent is not None else [0.5] * n).reshape(n),
            intensity_multiplier=_f32(
                intensity_multiplier if intensity_multiplier is not None else [1.0] * n).reshape(n),
            has_shadow=jnp.asarray(has_shadow if has_shadow is not None else [False] * n, bool).reshape(n),
            shadow_strength=_f32(shadow_strength if shadow_strength is not None else [1.0] * n).reshape(n),
        )

    @staticmethod
    def empty():
        z3 = jnp.zeros((0, 3), jnp.float32)
        z1 = jnp.zeros((0,), jnp.float32)
        return SpotLights(z3, z3, z3, z1, z1, z1, z1, z1, jnp.zeros((0,), bool), z1)
