"""Light-parameter inverse rendering (inverse.LightParams + make_train_step)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry,
                                    Medium, PointLights, RenderConfig, Scene,
                                    VolumetricRenderer)
from volumetricrenderer_tpu.inverse import LightParams, make_train_step

CFG = RenderConfig(volume_width=16, volume_height=12, volume_depth=8,
                   image_width=48, image_height=36, shadow_mode="raycast")


def _scene(light_pos=(-2.0, 4.0, 3.0), light_ci=6.0):
    return Scene.create(
        camera=Camera.create(position=(0.0, 2.0, -10.0),
                             forward=(0.0, 0.0, 1.0), aspect=48 / 36),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1, 1, 1)], intensity=[1.5]),
        point_lights=PointLights.create(
            position=[light_pos], color=[(1.0, 0.8, 0.6)],
            intensity=[light_ci], range=[25.0], has_shadow=[True]),
        media=(Medium.create(scattering_color=(1, 1, 1), absorption=0.2,
                             phase_g=0.3),),
        geometry=Geometry.create(
            planes=[((0.0, 1.0, 0.0), 0.0, (0.2, 0.2, 0.2))]))


def _inputs(r):
    scene = _scene()
    state = r.init_state(1)
    sc = jnp.full((CFG.image_height, CFG.image_width, 3), 0.1, jnp.float32)
    vd = jnp.full((CFG.image_height, CFG.image_width), 40.0, jnp.float32)
    return scene, state, sc, vd


def test_roundtrip_preserves_image():
    r = VolumetricRenderer(CFG)
    scene, state, sc, vd = _inputs(r)
    img_ref, _, _ = jax.jit(lambda s, x: r.render_frame(s, x, 0.0, sc, vd))(
        state, scene)
    lp = LightParams.from_scene(scene)
    img_rt, _, _ = jax.jit(lambda s, x: r.render_frame(s, x, 0.0, sc, vd))(
        state, lp.apply(scene))
    np.testing.assert_allclose(np.asarray(img_rt), np.asarray(img_ref),
                               rtol=1e-5, atol=1e-6)


def test_position_gradients_nonzero_and_finite():
    r = VolumetricRenderer(CFG)
    scene, state, sc, vd = _inputs(r)
    target = jnp.full((CFG.image_height, CFG.image_width, 3), 0.3, jnp.float32)
    lp = LightParams.from_scene(scene)

    def loss(p):
        img, _, _ = r.render_frame(state, p.apply(scene), 0.0, sc, vd)
        return jnp.mean((img[..., :3] - target) ** 2)

    g = jax.jit(jax.grad(loss))(lp)
    gp = np.asarray(g.point_position)
    assert np.isfinite(gp).all() and (np.abs(gp) > 0).any()
    gc = np.asarray(g.point_log_ci)
    assert np.isfinite(gc).all() and (np.abs(gc) > 0).any()


def test_optimization_recovers_brighter_light():
    r = VolumetricRenderer(CFG)
    scene, state, sc, vd = _inputs(r)
    # target rendered with a brighter, shifted light
    target_scene = _scene(light_pos=(-1.0, 4.5, 4.0), light_ci=9.0)
    target, _, _ = jax.jit(lambda s, x: r.render_frame(s, x, 0.0, sc, vd))(
        state, target_scene)
    target = target[..., :3]

    params = LightParams.from_scene(scene)
    optimizer = optax.adam(5e-2)
    opt_state = optimizer.init(params)
    step = make_train_step(r, optimizer, lambda p, s: p.apply(s))

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, scene, state,
                                       target, sc, vd)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0]
