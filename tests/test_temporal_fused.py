"""Fused temporal-blend kernel (ops/pallas/temporal.py) == the XLA path.

Frame-level: reproj_impl="pallas" (fused blends) vs "windowed" (XLA texels +
separable warp) must agree — same SPEC semantics, different schedules. Small
float drift is allowed at reprojection-success boundaries and the clamped
window edge (the fused path computes texels via one combined matrix)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry, Medium,
                                    PointLights, RenderConfig, Scene,
                                    VolumetricRenderer)

CFG = RenderConfig(volume_width=16, volume_height=16, volume_depth=8,
                   image_width=32, image_height=32, shadow_mode="raycast",
                   reproj_impl="windowed")


def _scene(cam_pos=(0.0, 2.0, -10.0), fwd=(0.05, -0.02, 1.0)):
    return Scene.create(
        camera=Camera.create(position=cam_pos, forward=fwd, aspect=1.0),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1, 1, 1)], intensity=[2.0],
            has_shadow=[True]),
        point_lights=PointLights.create(
            position=[(-2.0, 3.0, 2.0)], color=[(1.0, 0.2, 0.2)],
            intensity=[7.0], range=[25.0], has_shadow=[True]),
        media=(Medium.create(phase_g=0.3),),
        geometry=Geometry.create(
            planes=[((0, 1, 0), 0.0, (0.2, 0.2, 0.2))],
            spheres=[((0.0, 2.0, 3.0), 1.2, (0.5, 0.5, 0.5))]))


def _frames(cfg, n=3):
    """Render n frames with a moving camera (exercises real reprojection)."""
    r = VolumetricRenderer(cfg)
    state = r.init_state(1)
    f = jax.jit(lambda s, sc, t: r.render_frame(s, sc, t))
    aux = None
    for i in range(n):
        scene = _scene(cam_pos=(0.1 * i, 2.0 + 0.05 * i, -10.0 + 0.2 * i),
                       fwd=(0.05 + 0.01 * i, -0.02, 1.0))
        img, aux, state = f(state, scene, jnp.float32(0.1 * i))
    return img, aux


def _compare(cfg_a, cfg_b, keys=("shadow", "accumulation")):
    _, aux_a = _frames(cfg_a)
    _, aux_b = _frames(cfg_b)
    for key in keys:
        a = np.asarray(aux_a[key])
        b = np.asarray(aux_b[key])
        rel = np.abs(a - b) / (1e-3 + np.abs(a))
        # success-boundary / window-edge flips are isolated single texels
        assert (rel > 1e-3).mean() < 5e-3, (key, rel.max(), (rel > 1e-3).mean())


def test_fused_blends_match_windowed():
    _compare(CFG, dataclasses.replace(CFG, reproj_impl="pallas"))


def test_fused_blends_match_windowed_fullpallas():
    """Production composition: fused blends consuming the integrate planes."""
    full = dataclasses.replace(CFG, reproj_impl="pallas",
                               scatter_impl="pallas", dir_shadow_impl="pallas",
                               accumulate_impl="pallas", material_impl="fused")
    _compare(CFG, full)


def test_fused_blend_identity_reproj_is_plain_lerp():
    """Static camera + use_current_matrix_for_reproj: reprojection is the
    identity warp, so the blend must reduce to lerp(cur, prev, alpha)."""
    from volumetricrenderer_tpu.froxel import make_froxel_params
    from volumetricrenderer_tpu.ops.pallas.temporal import fused_temporal_blend

    rng = np.random.default_rng(0)
    d, h, w = 8, 16, 16
    params = make_froxel_params(1.0, 1.0, 0.3, 100.0, 0.5, (w, h, d))
    eye = jnp.eye(4, dtype=jnp.float32)
    prev = jnp.asarray(rng.random((d, h, w)), jnp.float32) + 0.5
    cur = jnp.asarray(rng.random((d, h, w)), jnp.float32)
    outs = fused_temporal_blend(params, eye, eye, None, jnp.float32(0.3),
                                (prev,), (cur,), (w, h, d), k=4, mode="alpha",
                                interpret=True)
    ref = cur + 0.3 * (prev - cur)     # prev > 0 everywhere => success = 1
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
