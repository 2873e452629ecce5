"""Light distance/cone falloffs (VolumetricHelper.hlsl:280-303).

The reference samples Unity's engine attenuation LUT `_LightTextureB0` at
x = d^2/range^2 (helper:283, 298; `_LightPos.w` is 1/range^2). The engine texture
is replaced by the analytic curve it encodes:

    lut(x) = saturate((1 - x) * 5) / (1 + 25 x)

i.e. Unity's 1/(1+25x) attenuation with a linear fade to zero over the last 20%
of the range so the light reaches exactly zero at range (documented stand-in,
see SPEC.md; the oracle uses the same curve).
"""

from __future__ import annotations

import jax.numpy as jnp

from volumetricrenderer_tpu.ops.phase import smoothstep


def attenuation_lut(x):
    return jnp.clip((1.0 - x) * 5.0, 0.0, 1.0) / (1.0 + 25.0 * x)


def point_light_falloff(distance, range, attenuation_multiplier):
    """PointLightFalloff (helper:280-287)."""
    x = distance * distance / (range * range)
    return attenuation_lut(x) * attenuation_multiplier


def spot_light_falloff(distance, cos_angle, range, cos_outer_cone,
                       cos_inner_cone_rcp, attenuation_multiplier):
    """SpotLightFalloff (helper:289-303): LUT distance attenuation times
    1 - smoothstep(cosInner, cosOuter, cosAngle)."""
    x = distance * distance / (range * range)
    dist_atten = attenuation_lut(x)
    cone_atten = 1.0 - smoothstep(1.0 / cos_inner_cone_rcp, cos_outer_cone, cos_angle)
    return cone_atten * dist_atten * attenuation_multiplier
