"""Fused integrate+accumulation-blend kernel == the two-kernel pipeline
(ops/pallas/integrate_blend.py vs integrate.py + temporal.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry,
                                    Medium, RenderConfig, Scene,
                                    VolumetricRenderer, froxel)
from volumetricrenderer_tpu.ops.pallas.integrate import accumulate_fused_pallas
from volumetricrenderer_tpu.ops.pallas.integrate_blend import \
    integrate_blend_fused
from volumetricrenderer_tpu.ops.pallas.temporal import fused_temporal_blend

GRID = (24, 16, 12)          # (W, H, D)


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    w, h, d = GRID
    scat = tuple(jnp.asarray(rng.uniform(0, 1, (d, h, w)), jnp.float32)
                 for _ in range(4))
    prev = tuple(jnp.asarray(rng.uniform(0, 1, (d, h, w)), jnp.float32)
                 for _ in range(4))
    params = froxel.make_froxel_params(1.0, 1.5, 0.3, 60.0, 2.0, GRID)
    cam = Camera.create(position=(0.2, 1.5, -8.0), forward=(0.05, -0.02, 1.0),
                        aspect=1.5)
    v2w = cam.view_to_world()
    cam2 = Camera.create(position=(0.5, 1.4, -8.2), forward=(0.02, 0.0, 1.0),
                         aspect=1.5)
    prev_w2v = froxel.invert_rigid(cam2.view_to_world())
    jitter = jnp.asarray([0.25, -0.3, 0.4], jnp.float32)
    return scat, prev, params, v2w, prev_w2v, jitter


def _two_kernel(scat, prev, params, v2w, prev_w2v, jitter, alpha, k,
                padded_out=None):
    acc = accumulate_fused_pallas(scat, jitter, params, GRID, interpret=True,
                                  return_planes=True)
    return fused_temporal_blend(params, v2w, prev_w2v, None,
                                jnp.float32(alpha), prev, acc, GRID, k,
                                "alpha", interpret=True,
                                padded_out=padded_out)


def test_fused_matches_two_kernel():
    scat, prev, params, v2w, prev_w2v, jitter = _setup()
    for k in (1, 2):
        ref = _two_kernel(scat, prev, params, v2w, prev_w2v, jitter, 0.7, k)
        out = integrate_blend_fused(scat, prev, jitter, params, v2w, prev_w2v,
                                    jnp.float32(0.7), GRID, k,
                                    interpret=True)
        for c in range(4):
            np.testing.assert_allclose(np.asarray(out[c]), np.asarray(ref[c]),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f"k={k} ch={c}")


def test_fused_matches_two_kernel_padded():
    from volumetricrenderer_tpu.ops.pallas.zg_composite import padded_dims
    scat, prev, params, v2w, prev_w2v, jitter = _setup(1)
    w, h, d = GRID
    padded = padded_dims(h)
    ref = _two_kernel(scat, prev, params, v2w, prev_w2v, jitter, 0.84, 1,
                      padded_out=padded)
    out = integrate_blend_fused(scat, prev, jitter, params, v2w, prev_w2v,
                                jnp.float32(0.84), GRID, 1, interpret=True,
                                padded_out=padded)
    for c in range(4):
        np.testing.assert_allclose(np.asarray(out[c][:d]),
                                   np.asarray(ref[c][:d]),
                                   rtol=1e-6, atol=1e-6, err_msg=f"ch={c}")


def test_renderer_fused_path_matches_unfused():
    """render_frame with the fused integrate+blend == accumulate_impl='xla'
    + XLA windowed blend reference (equivalence-class across 2 frames)."""
    cfg = RenderConfig(volume_width=16, volume_height=16, volume_depth=8,
                       image_width=32, image_height=32,
                       shadow_mode="raycast", scatter_impl="pallas",
                       accumulate_impl="pallas", reproj_impl="pallas",
                       dir_shadow_impl="pallas",
                       temporal_blend_alpha=0.6)
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
    cfg_ref = dataclasses.replace(cfg, accumulate_impl="xla",
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
