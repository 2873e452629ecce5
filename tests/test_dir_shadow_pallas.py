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


def test_pcf_window_overflow_guard():
    """A cascade quad wider than the 512-texel gather window (atlas > 1024)
    must trip the overflow flag when a slice footprint exceeds the window —
    fail-loud instead of silently clamped shadows (pcf_shadow._schedule)."""
    import jax.numpy as jnp

    from volumetricrenderer_tpu import froxel
    from volumetricrenderer_tpu.ops.pallas import pcf_shadow as P

    scene = _scene()

    def overflow_any(cfg):
        r = VolumetricRenderer(cfg)
        dir_shadow, _, _ = r.bake_shadow_data(scene)
        params = froxel.make_froxel_params(
            scene.camera.fov_y, scene.camera.aspect, scene.camera.near,
            cfg.volume_distance, cfg.depth_distribution, cfg.grid)
        v2w = scene.camera.view_to_world()
        grid = (cfg.volume_width, cfg.volume_height, cfg.volume_depth)
        win = min(P.MAX_WIN, dir_shadow.atlas.shape[-1])
        return any(
            bool(P._schedule(params, v2w, jnp.zeros(3), dir_shadow, li,
                             grid, win)[-1])
            for li in range(scene.dir_lights.count))

    base = dataclasses.replace(CFG, shadow_mode="map",
                               dir_shadow_impl="pallas")
    # production envelope (quad width == window): guard must stay quiet
    assert not overflow_any(base)
    # atlas 2048 -> 1024-wide quads vs the 512 window: slices whose footprint
    # spans more than the window must be flagged
    assert overflow_any(dataclasses.replace(base, shadow_map_size=1024))
