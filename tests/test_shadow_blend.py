"""Fused dir-shadow+blend kernel == the two-kernel pipeline
(ops/pallas/shadow_blend.py vs dir_shadow.py + temporal.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry,
                                    Medium, RenderConfig, Scene,
                                    VolumetricRenderer, froxel)
from volumetricrenderer_tpu.ops.pallas.dir_shadow import dir_shadow_pallas
from volumetricrenderer_tpu.ops.pallas.shadow_blend import \
    dir_shadow_blend_fused
from volumetricrenderer_tpu.ops.pallas.temporal import fused_temporal_blend

GRID = (24, 16, 12)


def _setup():
    cam = Camera.create(position=(0.2, 1.5, -8.0), forward=(0.05, -0.02, 1.0),
                        aspect=1.5)
    cam2 = Camera.create(position=(0.5, 1.4, -8.2), forward=(0.02, 0.0, 1.0),
                         aspect=1.5)
    params = froxel.make_froxel_params(cam.fov_y, cam.aspect, cam.near,
                                       60.0, 2.0, GRID)
    lights = DirectionalLights.create(
        direction=[(0.3, -0.7, 0.5), (-0.4, -0.5, 0.2)],
        color=[(1, 1, 1), (1, 1, 1)], intensity=[2.0, 1.0],
        has_shadow=[True, False], shadow_strength=[0.8, 0.6])
    geom = Geometry.create(
        planes=[((0, 1, 0), 0.0, (0.2, 0.2, 0.2))],
        spheres=[((0.0, 2.0, 3.0), 1.2, (0.5, 0.5, 0.5))],
        boxes=[((-3.0, 0.0, 1.0), (-1.0, 2.5, 3.0), (0.4, 0.4, 0.4))])
    jitter = jnp.asarray([0.1, -0.05, 0.2], jnp.float32)
    rng = np.random.default_rng(3)
    w, h, d = GRID
    prev = jnp.asarray(rng.uniform(0, 1, (2, d, h, w)), jnp.float32)
    return (params, cam.view_to_world(),
            froxel.invert_rigid(cam2.view_to_world()), jitter, lights, geom,
            prev)


def test_fused_matches_two_kernel():
    params, v2w, prev_w2v, jitter, lights, geom, prev = _setup()
    for k in (1, 2):
        cur = dir_shadow_pallas(params, v2w, jitter, lights, geom, GRID,
                                interpret=True)
        ref = fused_temporal_blend(
            params, v2w, prev_w2v, jitter, jnp.float32(0.7),
            tuple(prev[i] for i in range(2)),
            tuple(cur[i] for i in range(2)), GRID, k, "weight",
            uvw_epsilon=1e-4, interpret=True)
        out = dir_shadow_blend_fused(params, v2w, prev_w2v, jitter,
                                     jnp.float32(0.7), lights, geom, prev,
                                     GRID, k, interpret=True)
        for c in range(2):
            np.testing.assert_allclose(np.asarray(out[c]), np.asarray(ref[c]),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f"k={k} ch={c}")


def test_renderer_fused_shadow_blend_matches_unfused():
    cfg = RenderConfig(volume_width=16, volume_height=16, volume_depth=8,
                       image_width=32, image_height=32,
                       shadow_mode="raycast", scatter_impl="pallas",
                       accumulate_impl="pallas", reproj_impl="pallas",
                       dir_shadow_impl="pallas", temporal_blend_alpha=0.6)
    scene = Scene.create(
        camera=Camera.create(position=(0.0, 2.0, -10.0),
                             forward=(0.05, -0.02, 1), aspect=1.0),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1, 1, 1)], intensity=[2.0],
            has_shadow=[True], shadow_strength=[0.8]),
        media=(Medium.create(phase_g=0.3),),
        geometry=Geometry.create(
            planes=[((0, 1, 0), 0.0, (0.2, 0.2, 0.2))],
            spheres=[((0.0, 2.0, 3.0), 1.2, (0.5, 0.5, 0.5))]))
    cfg_ref = dataclasses.replace(cfg, dir_shadow_impl="xla",
                                  reproj_impl="windowed")

    def frames(c):
        r = VolumetricRenderer(c)
        st = r.init_state(1)
        f = jax.jit(lambda s, sc, t: r.render_frame(s, sc, t)[::2])
        img, st = f(st, scene, 0.0)
        img, st = f(st, scene, 0.1)
        return np.asarray(img)

    a = frames(cfg_ref)
    b = frames(cfg)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
