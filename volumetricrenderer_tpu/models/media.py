"""Participating-media description.

Replaces VolumetricMaterialVolume.cs: scattering color, absorption, phase g,
optional animated 3D noise (tiling + scroll), Constant/Box volume types and
Additive/AlphaBlend blend types (cs:12-22). The reference declares Box and the
blend enum but never implements them (VolumetricRenderer.cs:451-452); here both
work. The exponential height falloff is an extension required by BASELINE
config 2 (the reference has no equivalent).

Coefficient scaling matches VolumetricMaterialVolume.cs:9-10:
scatter = color * 0.00692, absorption = a * 0.00077 (per-meter coefficients).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

SCATTER_SCALE = 0.00692   # VolumetricMaterialVolume.cs:9
ABSORPT_SCALE = 0.00077   # VolumetricMaterialVolume.cs:10

CONSTANT = "constant"
BOX = "box"
ALPHA_BLEND = "alpha"     # overwrite — the reference's effective behavior (compute:45-58)
ADDITIVE = "additive"


def _f32(v):
    return jnp.asarray(v, jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Medium:
    scattering_color: jax.Array          # [3] HDR color
    absorption: jax.Array                # scalar
    phase_g: jax.Array                   # scalar in [0, 0.99]

    # Animated 3D noise (WriteMaterialVolumeConstant _WITH_NOISE, compute:51-58).
    noise_tex: Optional[jax.Array]       # [Nz, Ny, Nx] density texture, wrap-sampled, or None
    noise_tiling: jax.Array              # [3] world-pos -> uvw scale
    noise_scroll: jax.Array              # [3] uvw per time_x unit

    # Box volume bounds (volume_type == BOX); soft edge width in world units.
    box_min: jax.Array                   # [3]
    box_max: jax.Array                   # [3]
    box_softness: jax.Array              # scalar >= 0

    # Exponential height falloff: density *= exp(-height_falloff * (y - height_base))
    # for y > height_base (extension; 0 disables).
    height_falloff: jax.Array            # scalar
    height_base: jax.Array               # scalar

    volume_type: str = dataclasses.field(default=CONSTANT, metadata=dict(static=True))
    blend_type: str = dataclasses.field(default=ALPHA_BLEND, metadata=dict(static=True))
    # "texture": wrap-sample noise_tex (gather — reference parity, compute:51-58).
    # "procedural": evaluate the same tileable Perlin fBm directly per froxel —
    # pure elementwise math, the TPU-native path (no gather).
    noise_mode: str = dataclasses.field(default="texture", metadata=dict(static=True))
    noise_octaves: int = dataclasses.field(default=3, metadata=dict(static=True))
    noise_period: int = dataclasses.field(default=4, metadata=dict(static=True))
    noise_seed: int = dataclasses.field(default=7, metadata=dict(static=True))

    @property
    def scattering_coef(self) -> jax.Array:
        """ScatteringCoef = color * scatterScale (cs:49-52)."""
        return self.scattering_color * SCATTER_SCALE

    @property
    def absorption_coef(self) -> jax.Array:
        """AbsorptionCoef = absorption * absorptScale (cs:54-57)."""
        return self.absorption * ABSORPT_SCALE

    @staticmethod
    def create(scattering_color=(0.58, 0.58, 0.58), absorption=0.58, phase_g=0.002,
               noise_tex=None, noise_tiling=(0.0, 0.0, 0.0), noise_scroll=(0.0, 0.0, 0.0),
               volume_type=CONSTANT, blend_type=ALPHA_BLEND,
               box_min=(0.0, 0.0, 0.0), box_max=(0.0, 0.0, 0.0), box_softness=0.0,
               height_falloff=0.0, height_base=0.0, noise_mode="texture",
               noise_octaves=3, noise_period=4, noise_seed=7) -> "Medium":
        return Medium(
            scattering_color=_f32(scattering_color),
            absorption=_f32(absorption),
            phase_g=_f32(phase_g),
            noise_tex=None if noise_tex is None else _f32(noise_tex),
            noise_tiling=_f32(noise_tiling),
            noise_scroll=_f32(noise_scroll),
            box_min=_f32(box_min),
            box_max=_f32(box_max),
            box_softness=_f32(box_softness),
            height_falloff=_f32(height_falloff),
            height_base=_f32(height_base),
            volume_type=volume_type,
            blend_type=blend_type,
            noise_mode=noise_mode,
            noise_octaves=noise_octaves,
            noise_period=noise_period,
            noise_seed=noise_seed,
        )
