"""Fused Pallas dir shadow volume == the XLA raycast path."""

import dataclasses

import jax
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry, Medium,
                                    PointLights, RenderConfig, Scene, SpotLights,
                                    VolumetricRenderer)

CFG = RenderConfig(volume_width=16, volume_height=16, volume_depth=8,
                   image_width=32, image_height=32, shadow_mode="raycast")


def _scene():
    return Scene.create(
        camera=Camera.create(position=(0.0, 2.0, -10.0),
                             forward=(0.05, -0.02, 1), aspect=1.0),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5), (-0.4, -0.5, 0.2)],
            color=[(1, 1, 1), (0.9, 0.6, 0.3)], intensity=[2.0, 1.0],
            has_shadow=[True, False], shadow_strength=[0.8, 0.6]),
        media=(Medium.create(phase_g=0.3),),
        geometry=Geometry.create(
            planes=[((0, 1, 0), 0.0, (0.2, 0.2, 0.2))],
            spheres=[((0.0, 2.0, 3.0), 1.2, (0.5, 0.5, 0.5))],
            boxes=[((-3.0, 0.0, 1.0), (-1.0, 2.5, 3.0), (0.4, 0.4, 0.4))]))


def test_pallas_dir_shadow_matches_xla():
    scene = _scene()
    r_x = VolumetricRenderer(CFG)
    r_p = VolumetricRenderer(dataclasses.replace(CFG, dir_shadow_impl="pallas"))
    _, aux_x, _ = jax.jit(lambda s, sc: r_x.render_frame(s, sc, 0.0))(
        r_x.init_state(1), scene)
    _, aux_p, _ = jax.jit(lambda s, sc: r_p.render_frame(s, sc, 0.0))(
        r_p.init_state(1), scene)
    a = np.asarray(aux_x["shadow"])
    b = np.asarray(aux_p["shadow"])
    # any-hit boundaries are step functions; allow isolated texel flips
    mism = np.abs(a - b) > 1e-5
    assert mism.mean() < 2e-3, (mism.mean(), np.abs(a - b).max())
    # the no-shadow light's channel must be exactly 1 in both
    np.testing.assert_array_equal(b[1], 1.0)


def test_pallas_dir_shadow_map_mode_falls_back():
    scene = _scene()
    cfg = dataclasses.replace(CFG, shadow_mode="map",
                              dir_shadow_impl="pallas")
    r = VolumetricRenderer(cfg)
    shadow_data = r.bake_shadow_data(scene)
    img, _, _ = jax.jit(lambda s, sc: r.render_frame(
        s, sc, 0.0, shadow_data=shadow_data))(r.init_state(1), scene)
    assert np.isfinite(np.asarray(img)).all()
