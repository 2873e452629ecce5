"""shadow_mode="raycast" (the TPU-native benched path) vs the oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from oracle import adapter, oracle
from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry, Medium,
                                    PointLights, RenderConfig, Scene, SpotLights,
                                    VolumetricRenderer)
from volumetricrenderer_tpu.ops.noise import interleaved_gradient_noise

CFG = RenderConfig(volume_width=16, volume_height=12, volume_depth=16,
                   image_width=64, image_height=36, volume_distance=100.0,
                   shadow_mode="raycast", reproj_impl="gather",
                   composite_impl="xla")


def _scene():
    return Scene.create(
        camera=Camera.create(position=(-0.4, 1.9, -15.8), forward=(0.1, -0.05, 1.0),
                             fov_y_deg=60.0, aspect=64 / 36, near=0.3, far=100.0),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(0.99, 0.96, 0.8)],
            intensity=[2.5], has_shadow=[True]),
        point_lights=PointLights.create(
            position=[(-2.0, 3.0, 2.0)], color=[(1.0, 0.2, 0.2)],
            intensity=[7.0], range=[25.0], has_shadow=[True]),
        spot_lights=SpotLights.create(
            position=[(-6.0, 5.0, 6.0)], direction=[(0.5, -0.7, 0.3)],
            color=[(1.0, 0.0, 0.0)], intensity=[6.0], range=[34.42],
            spot_angle_deg=[66.0], has_shadow=[True]),
        media=(Medium.create(scattering_color=(1.0, 1.0, 1.0), absorption=0.19,
                             phase_g=0.3),),
        geometry=Geometry.create(
            planes=[((0.0, 1.0, 0.0), 0.0, (0.2, 0.25, 0.2))],
            spheres=[((2.0, 2.0, 5.0), 1.5, (0.6, 0.5, 0.5))],
            boxes=[((-5.0, 0.0, 8.0), (-2.0, 3.0, 11.0), (0.5, 0.5, 0.4))]))


def test_raycast_mode_matches_oracle():
    r = VolumetricRenderer(CFG)
    scene = _scene()
    state = r.init_state(1)
    img, aux, _ = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0))(state, scene)

    inp = adapter.to_oracle_input(CFG, scene, state, None, None, None,
                                  aux["scene_color"], aux["view_depth"], 0.0)
    ref = oracle.render_frame_oracle(inp)

    for key in ("shadow", "scatter", "accumulation"):
        a = np.asarray(aux[key])
        b = np.asarray(ref[key])
        rel = np.abs(a - b) / (1.0 + np.abs(b))
        # raycast hits are step functions; f32 vs f64 can flip boundary froxels
        frac_bad = (rel > 1.5e-3).mean()
        assert frac_bad <= 3e-3, f"{key}: {frac_bad:.2%} over tolerance"


def test_raycast_mode_shadows_darken():
    r = VolumetricRenderer(CFG)
    scene = _scene()
    state = r.init_state(1)
    _, aux, _ = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0))(state, scene)
    shadow = np.asarray(aux["shadow"][0])
    assert shadow.min() < 0.5 and shadow.max() == 1.0


def test_interleaved_gradient_noise_range_and_variation():
    xx, yy = np.meshgrid(np.arange(16.0), np.arange(16.0))
    pix = jnp.asarray(np.stack([xx, yy], -1), jnp.float32)
    v0 = np.asarray(interleaved_gradient_noise(pix, 0))
    v1 = np.asarray(interleaved_gradient_noise(pix, 1))
    assert v0.min() >= 0.0 and v0.max() < 1.0
    assert v0.std() > 0.2
    assert np.abs(v0 - v1).max() > 0.1
    vn = interleaved_gradient_noise(np.stack([xx, yy], -1), 0, xp=np)
    np.testing.assert_allclose(v0, vn, atol=1e-5)


def test_raycast_subsample_close_to_full():
    import dataclasses
    r_full = VolumetricRenderer(CFG)
    r_half = VolumetricRenderer(dataclasses.replace(CFG, raycast_shadow_subsample=2))
    scene = _scene()
    _, aux_f, _ = jax.jit(lambda s, sc: r_full.render_frame(s, sc, 0.0))(
        r_full.init_state(1), scene)
    _, aux_h, _ = jax.jit(lambda s, sc: r_half.render_frame(s, sc, 0.0))(
        r_half.init_state(1), scene)
    a = np.asarray(aux_f["scatter"])
    b = np.asarray(aux_h["scatter"])
    assert np.isfinite(b).all()
    # same lighting except shadow-edge froxels
    assert np.mean(np.abs(a - b) / (1 + np.abs(a))) < 0.05
