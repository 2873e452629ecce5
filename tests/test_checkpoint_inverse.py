"""Checkpoint/resume roundtrip + differentiable inverse rendering (SURVEY §5
aux subsystems the reference lacks)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from volumetricrenderer_tpu import (Camera, DirectionalLights, Medium,
                                    RenderConfig, Scene, VolumetricRenderer)
from volumetricrenderer_tpu.checkpoint import load_state, save_state
from volumetricrenderer_tpu.inverse import FogParams, train_step

CFG = RenderConfig(volume_width=16, volume_height=16, volume_depth=8,
                   image_width=32, image_height=32, shadow_mode="raycast",
                   temporal_blend_accumulation=True, temporal_blend_alpha=0.5)


def _scene(absorption=0.19):
    return Scene.create(
        camera=Camera.create(position=(0.0, 2.0, -10.0), forward=(0, 0, 1),
                             aspect=1.0),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1, 1, 1)], intensity=[2.0],
            has_shadow=[False]),
        media=(Medium.create(phase_g=0.3, absorption=absorption),))


def test_checkpoint_roundtrip_resumes_identically(tmp_path):
    scene = _scene()
    r = VolumetricRenderer(CFG)
    f = jax.jit(lambda s, sc, t: r.render_frame(s, sc, t))
    state = r.init_state(1)
    for i in range(3):
        _, _, state = f(state, scene, jnp.float32(0.1 * i))

    path = str(tmp_path / "state.npz")
    save_state(path, state)
    restored = load_state(path, r.init_state(1))

    img_a, _, _ = f(state, scene, jnp.float32(0.5))
    img_b, _, _ = f(restored, scene, jnp.float32(0.5))
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
    assert int(restored.frame_count) == int(state.frame_count)


def test_checkpoint_shape_mismatch_raises(tmp_path):
    r = VolumetricRenderer(CFG)
    path = str(tmp_path / "state.npz")
    save_state(path, r.init_state(1))
    r2 = VolumetricRenderer(dataclasses.replace(CFG, volume_depth=4))
    try:
        load_state(path, r2.init_state(1))
        assert False, "expected shape mismatch"
    except ValueError:
        pass


def test_inverse_rendering_fits_absorption():
    """Gradient descent on fog params reduces the loss toward a target
    rendered with different absorption (impossible in the HLSL reference)."""
    cfg = dataclasses.replace(CFG, temporal_blend_accumulation=False)
    r = VolumetricRenderer(cfg)
    scene_t = _scene(absorption=0.6)
    scene_0 = _scene(absorption=0.1)
    state = r.init_state(1)
    sc_col, vd = jax.jit(lambda sc: r.render_scene_inputs(sc))(scene_t)
    target, _, _ = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0, sc_col, vd))(
        state, scene_t)
    target = target[..., :3]

    params = FogParams.from_medium(scene_0.media[0])
    optimizer = optax.adam(5e-2)
    opt_state = optimizer.init(params)
    step = jax.jit(lambda p, o, s: train_step(
        r, p, o, optimizer, scene_0, s, target, sc_col, vd)[0:3])

    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_checkpoint_roundtrip_fused_plane_state(tmp_path):
    """The megakernel path stores accumulation history as a tuple of planes
    (state.py) — the checkpoint pytree roundtrips it and resume is
    bit-identical; a structure-mismatched `like` fails loudly."""
    import pytest
    from volumetricrenderer_tpu import (Geometry, PointLights)
    cfg = dataclasses.replace(CFG, scatter_impl="pallas",
                              accumulate_impl="pallas",
                              reproj_impl="pallas", dir_shadow_impl="pallas",
                              material_impl="fused",
                              temporal_blend_shadow=True)
    scene = dataclasses.replace(
        _scene(),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1, 1, 1)], intensity=[2.0],
            has_shadow=[True], shadow_strength=[0.8]),
        point_lights=PointLights.create(
            position=[(1.0, 3.0, 2.0)], color=[(1, 0.8, 0.6)], range=[8.0],
            intensity=[3.0], has_shadow=[True]),
        media=(Medium.create(phase_g=0.3, noise_mode="procedural",
                             noise_tiling=(0.05, 0.05, 0.05)),),
        geometry=Geometry.create(
            planes=[((0, 1, 0), 0.0, (0.2, 0.2, 0.2))],
            boxes=[((-3.0, 0.0, 1.0), (-1.0, 2.5, 3.0), (0.4, 0.4, 0.4))]))
    r = VolumetricRenderer(cfg)
    f = jax.jit(lambda s, sc, t: r.render_frame(s, sc, t))
    state = r.init_state(1)
    for i in range(2):
        _, _, state = f(state, scene, jnp.float32(0.1 * i))
    assert isinstance(state.prev_accumulation, tuple)

    path = str(tmp_path / "state_fused.npz")
    save_state(path, state)
    restored = load_state(path, state)
    img_a, _, _ = f(state, scene, jnp.float32(0.5))
    img_b, _, _ = f(restored, scene, jnp.float32(0.5))
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))

    # init_state "auto" now matches the fused steady structure (planar), so
    # the load succeeds with it; the PACKED template is the mismatch case
    load_state(path, r.init_state(1))
    with pytest.raises(ValueError, match="leaves"):
        load_state(path, r.init_state(1, layout="packed"))
