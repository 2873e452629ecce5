"""Low-rate texture-mode noise (cfg.texture_noise_subsample) vs the full-rate
wrap-trilinear parity path (pipeline._sample_noise_lowres)."""

import dataclasses

import jax
import numpy as np

from volumetricrenderer_tpu import (Camera, Medium, RenderConfig, Scene,
                                    VolumetricRenderer)
from volumetricrenderer_tpu.ops.noise import perlin_texture_3d

CFG = RenderConfig(volume_width=32, volume_height=24, volume_depth=16,
                   image_width=64, image_height=48, shadow_mode="raycast")


def _scene(noise_tex):
    return Scene.create(
        camera=Camera.create(position=(0.0, 2.0, -10.0),
                             forward=(0.05, -0.02, 1), aspect=1.0),
        media=(Medium.create(phase_g=0.3, noise_tex=noise_tex,
                             noise_tiling=(0.006, 0.006, 0.006),
                             noise_scroll=(0.5, 0.0, 0.0)),))


def _material(cfg, scene):
    from volumetricrenderer_tpu import froxel
    from volumetricrenderer_tpu.pipeline import write_material_volumes
    cam = scene.camera
    params = froxel.make_froxel_params(cam.fov_y, cam.aspect, cam.near,
                                       cfg.volume_distance,
                                       cfg.depth_distribution, cfg.grid)
    import jax.numpy as jnp
    ma, _ = jax.jit(lambda: write_material_volumes(
        cfg, params, cam.view_to_world(), jnp.asarray([0.1, -0.05, 0.2]),
        0.3, scene.media))()
    return np.asarray(ma)


def test_lowres_texture_noise_close_to_full_rate():
    tex = perlin_texture_3d(16)
    scene = _scene(tex)
    full = _material(CFG, scene)
    for ss in (2, 4):
        low = _material(dataclasses.replace(CFG, texture_noise_subsample=ss),
                        scene)
        err = np.abs(full - low)
        rel = err.mean() / max(np.abs(full).mean(), 1e-9)
        # valid regime: the frustum spans well under one texture period
        # (FULL config: ~100 m x 0.01 tiling), so the low-rate grid stays
        # above the texture content's Nyquist and tent resampling is tight.
        # (A tiling that wraps several periods across the grid DOES alias —
        # that's a content/config contract, same as any texture mip choice.)
        assert rel < 0.08, (ss, rel)
        assert np.isfinite(low).all()


def test_lowres_texture_noise_render_finite():
    scene = _scene(perlin_texture_3d(16))
    cfg = dataclasses.replace(CFG, texture_noise_subsample=4)
    r = VolumetricRenderer(cfg)
    img, _, _ = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0))(
        r.init_state(1), scene)
    assert np.isfinite(np.asarray(img)).all()
