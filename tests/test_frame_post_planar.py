"""Planar frame+post chain == packed frame then post.

render_frame_post threads the zgather composite's screen planes straight
into post.apply_post_planes (no [H, W, 4] interleave / split round trip);
this must be bit-identical to compositing the packed image and running
apply_post on it, on both the zgather path and the packed fallback."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry,
                                    Medium, PointLights, RenderConfig, Scene,
                                    SpotLights, VolumetricRenderer)
from volumetricrenderer_tpu.post import PostConfig, apply_post

# zgather-eligible: 8x8 pixel cells, h % 3 == 0
CFG = RenderConfig(volume_width=16, volume_height=12, volume_depth=16,
                   image_width=128, image_height=96, volume_distance=100.0,
                   shadow_mode="raycast", composite_impl="zgather")

POST = PostConfig(exposure=1.1, bloom_strength=0.2, vignette=0.25,
                  chromatic_aberration=1.0, grain=0.02, saturation=1.1,
                  dof_focus_distance=12.0)


def _scene():
    return Scene.create(
        camera=Camera.create(position=(-0.4, 1.9, -15.8),
                             forward=(0.1, -0.05, 1.0), fov_y_deg=60.0,
                             aspect=128 / 96, near=0.3, far=100.0),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(0.99, 0.96, 0.8)],
            intensity=[2.5], has_shadow=[True], shadow_strength=[0.8]),
        point_lights=PointLights.create(
            position=[(-2.0, 3.0, 2.0)], color=[(1.0, 0.2, 0.2)],
            intensity=[7.0], range=[25.0], has_shadow=[True]),
        spot_lights=SpotLights.create(
            position=[(0.0, 6.0, 4.0)], direction=[(0, -1, 0.1)],
            color=[(0.9, 0.9, 1.0)], range=[20.0], intensity=[5.0],
            spot_angle_deg=[45.0], has_shadow=[True]),
        media=(Medium.create(phase_g=0.3, noise_mode="procedural",
                             noise_tiling=(0.05, 0.05, 0.05)),),
        geometry=Geometry.create(
            planes=[((0, 1, 0), 0.0, (0.2, 0.2, 0.2))],
            spheres=[((0.0, 2.0, 3.0), 1.2, (0.5, 0.5, 0.5))]))


def _check(cfg):
    from volumetricrenderer_tpu import pipeline
    r = VolumetricRenderer(cfg)
    scene = _scene()
    state = r.init_state(scene.dir_lights.count)
    # two frames so the temporal history path is live
    img = None
    for t in (0.0, 0.35):
        img, aux, state2 = r.render_frame(state, scene, t)
        out, aux_p, state_p = r.render_frame_post(state, scene, POST, t)
        ref = apply_post(img, POST, view_depth=aux["view_depth"])
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        np.testing.assert_array_equal(
            np.asarray(state_p.prev_accumulation),
            np.asarray(state2.prev_accumulation))
        state = state2
    return img


def test_frame_post_planar_zgather():
    assert __import__("volumetricrenderer_tpu.pipeline", fromlist=["x"]) \
        .zgather_eligible(CFG)
    _check(CFG)


def test_frame_post_planar_presplit_scene():
    # scene color pre-split into planes outside the frame (the production
    # bench path) must match passing it packed
    r = VolumetricRenderer(CFG)
    scene = _scene()
    state = r.init_state(scene.dir_lights.count)
    sc, vd = r.render_scene_inputs(scene)
    scp = tuple(sc[..., c] for c in range(3))
    out_ref, _, _ = r.render_frame_post(state, scene, POST, 0.1, sc, vd)
    out_pre, _, _ = r.render_frame_post(state, scene, POST, 0.1, scp, vd)
    np.testing.assert_array_equal(np.asarray(out_pre), np.asarray(out_ref))


def test_frame_post_planar_fallback():
    # ineligible image ratio -> packed composite + slice fallback
    cfg = dataclasses.replace(CFG, image_width=64, image_height=36,
                              composite_impl="xla", reproj_impl="gather")
    _check(cfg)
