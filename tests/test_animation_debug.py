"""Animation helpers (Klak equivalents) + debug utilities."""

import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.animation import (BrownianMotion, ConstantMotion,
                                              SmoothFollowController,
                                              animate_camera)
from volumetricrenderer_tpu.models.camera import Camera
from volumetricrenderer_tpu.utils.debug import (channel_stats, debug_composite,
                                                volume_slice)


def _cam():
    return Camera.create(position=(0, 2, -10), forward=(0, 0, 1))


def test_brownian_motion_bounded_and_smooth():
    m = BrownianMotion(position_amplitude=0.5, rotation_amplitude=3.0,
                       frequency=1.0)
    offs = np.stack([np.asarray(m.position_offset(t))
                     for t in np.linspace(0, 10, 40)])
    assert np.abs(offs).max() <= 0.5 + 1e-6
    assert np.abs(np.diff(offs, axis=0)).max() < 0.3   # no jumps
    assert offs.std() > 1e-3                           # actually moves


def test_constant_motion_linear():
    m = ConstantMotion(velocity=(1.0, 0.0, 2.0))
    np.testing.assert_allclose(np.asarray(m.position_offset(2.0)), [2, 0, 4])


def test_animate_camera_keeps_unit_forward():
    cam = _cam()
    m = BrownianMotion(rotation_amplitude=10.0)
    cam2 = animate_camera(cam, 1.7, m)
    assert np.isclose(np.linalg.norm(np.asarray(cam2.forward)), 1.0, atol=1e-5)
    assert not np.allclose(np.asarray(cam2.position), np.asarray(cam.position))


def test_smooth_follow_converges():
    cam = _cam()
    ctrl = SmoothFollowController(position_lerp_time=0.2)
    target = jnp.asarray([5.0, 2.0, -10.0])
    fwd = jnp.asarray([0.0, 0.0, 1.0])
    for _ in range(50):
        cam = ctrl.step(cam, target, fwd, 0.1)
    np.testing.assert_allclose(np.asarray(cam.position), np.asarray(target),
                               atol=0.05)


def test_debug_helpers():
    vol = jnp.asarray(np.random.default_rng(0).random((8, 6, 10, 4)),
                      jnp.float32)
    sl = volume_slice(vol, 3)
    assert sl.shape == (6, 10, 4)
    scene = jnp.ones((24, 40, 3), jnp.float32) * 0.5
    out = debug_composite(scene, sl)
    assert out.shape == (24, 40, 3)
    stats = channel_stats({"acc": vol})
    assert stats["acc"]["nans"] == 0 and stats["acc"]["shape"] == (8, 6, 10, 4)


def test_render_debug_slice():
    import jax
    from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry,
                                        Medium, RenderConfig, Scene,
                                        VolumetricRenderer)
    cfg = RenderConfig(volume_width=16, volume_height=12, volume_depth=8,
                       image_width=32, image_height=24, shadow_map_size=32,
                       shadow_mode="raycast")
    scene = Scene.create(
        camera=Camera.create(position=(0, 2, -10), forward=(0, 0, 1),
                             aspect=32 / 24),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1, 1, 1)], intensity=[2.0],
            has_shadow=[False]),
        media=(Medium.create(),),
        geometry=Geometry.create(planes=[((0, 1, 0), 0.0, (0.2, 0.2, 0.2))]))
    r = VolumetricRenderer(cfg)
    out = jax.jit(lambda s, sc: r.render_debug_slice(s, sc, 4))(
        r.init_state(1), scene)
    assert out.shape == (24, 32, 3)
    out2 = jax.jit(lambda s, sc: r.render_debug_slice(s, sc, 4, "shadow"))(
        r.init_state(1), scene)
    assert out2.shape == (24, 32, 3)
