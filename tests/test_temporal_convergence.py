"""Temporal-filter behavior over a full 7-frame jitter cycle.

The reference's whole point of jitter + history blending (SURVEY §2.5) is that
per-frame sampling noise integrates out over the 7-offset cycle. These tests
check that system-level property rather than a single transition."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry, Medium,
                                    RenderConfig, Scene, VolumetricRenderer)
from volumetricrenderer_tpu.ops.noise import perlin_texture_3d

CFG = RenderConfig(volume_width=16, volume_height=12, volume_depth=16,
                   image_width=64, image_height=36, shadow_map_size=32,
                   shadow_mode="raycast", temporal_blend_alpha=0.8)


def _scene():
    tex = perlin_texture_3d(8, octaves=2, period=2)
    return Scene.create(
        camera=Camera.create(position=(0.0, 2.0, -12.0), forward=(0, 0, 1),
                             aspect=64 / 36),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1.0, 1.0, 1.0)],
            intensity=[2.5], has_shadow=[True]),
        media=(Medium.create(noise_tex=tex, noise_tiling=(0.08, 0.08, 0.08)),),
        geometry=Geometry.create(
            planes=[((0, 1, 0), 0.0, (0.2, 0.2, 0.2))],
            spheres=[((0, 3, 2), 1.5, (0.5, 0.5, 0.5))]))


def _run(cfg, frames):
    r = VolumetricRenderer(cfg)
    scene = _scene()
    state = r.init_state(1)
    step = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0))
    imgs = []
    for _ in range(frames):
        img, _, state = step(state, scene)
        imgs.append(np.asarray(img[..., :3]))
    return imgs


def test_static_scene_converges_over_jitter_cycle():
    imgs = _run(CFG, 22)
    # compare whole jitter cycles (deltas are periodic mod 7): the converged
    # cycle must oscillate less than the first cycle
    early = np.mean([np.abs(imgs[i] - imgs[i - 1]).mean() for i in range(1, 8)])
    late = np.mean([np.abs(imgs[i] - imgs[i - 1]).mean()
                    for i in range(15, 22)])
    assert late < early, (early, late)


def test_history_blend_reduces_jitter_noise():
    # with blending off, frames oscillate with the jitter; with blending on,
    # the converged sequence is steadier
    cfg_off = dataclasses.replace(CFG, temporal_blend_shadow=False,
                                  temporal_blend_accumulation=False)
    imgs_on = _run(CFG, 15)
    imgs_off = _run(cfg_off, 15)
    osc_on = np.mean([np.abs(imgs_on[i] - imgs_on[i - 1]).mean()
                      for i in range(10, 15)])
    osc_off = np.mean([np.abs(imgs_off[i] - imgs_off[i - 1]).mean()
                       for i in range(10, 15)])
    assert osc_on < osc_off


def test_quirk_mode_84pct_history_is_stable():
    # demo preset: alpha=0.84 with the reference's current-matrix quirk
    cfg = dataclasses.replace(CFG, temporal_blend_alpha=0.84,
                              use_current_matrix_for_reproj=True)
    imgs = _run(cfg, 10)
    assert np.isfinite(imgs[-1]).all()
    assert np.abs(imgs[-1] - imgs[-2]).mean() < 0.05
