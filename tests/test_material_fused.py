"""In-kernel material fold (ops/pallas/material.py) == the XLA material pass."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry, Medium,
                                    PointLights, RenderConfig, Scene, SpotLights,
                                    VolumetricRenderer)

CFG = RenderConfig(volume_width=16, volume_height=16, volume_depth=8,
                   image_width=32, image_height=32, shadow_mode="raycast",
                   scatter_impl="pallas")


def _scene():
    # covers every foldable feature: procedural fBm noise + scroll + height
    # falloff on an alpha-blend medium, plus an additive soft box medium
    fog = Medium.create(
        scattering_color=(1.0, 0.9, 0.8), absorption=0.19, phase_g=0.3,
        noise_mode="procedural", noise_tiling=(0.05, 0.04, 0.05),
        noise_scroll=(3.0, 0.5, 0.0), height_falloff=0.05, height_base=0.5)
    box = Medium.create(
        scattering_color=(0.6, 0.8, 1.0), absorption=0.3, phase_g=0.5,
        volume_type="box", blend_type="additive",
        box_min=(-8.0, 0.0, -6.0), box_max=(8.0, 3.0, 10.0), box_softness=1.0)
    return Scene.create(
        camera=Camera.create(position=(0.0, 2.0, -10.0),
                             forward=(0.05, -0.02, 1), aspect=1.0),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1, 1, 1)], intensity=[2.0],
            has_shadow=[True]),
        point_lights=PointLights.create(
            position=[(-2.0, 3.0, 2.0)], color=[(1.0, 0.2, 0.2)],
            intensity=[7.0], range=[25.0], has_shadow=[True]),
        spot_lights=SpotLights.create(
            position=[(-4.0, 5.0, 4.0)], direction=[(0.5, -0.7, 0.3)],
            color=[(1.0, 0.8, 0.1)], intensity=[6.0], range=[30.0],
            spot_angle_deg=[66.0], inner_angle_percent=[0.5],
            has_shadow=[True]),
        media=(fog, box),
        geometry=Geometry.create(
            planes=[((0, 1, 0), 0.0, (0.2, 0.2, 0.2))],
            spheres=[((0.0, 2.0, 3.0), 1.2, (0.5, 0.5, 0.5))]))


def _aux(cfg, scene, frames=2):
    r = VolumetricRenderer(cfg)
    state = r.init_state(1)
    f = jax.jit(lambda s, sc, t: r.render_frame(s, sc, t))
    aux = None
    for i in range(frames):
        _, aux, state = f(state, scene, jnp.float32(0.3 + 0.2 * i))
    return aux


def test_fused_material_matches_xla():
    scene = _scene()
    aux_x = _aux(CFG, scene)
    aux_f = _aux(dataclasses.replace(CFG, material_impl="fused"), scene)
    for key in ("scatter", "accumulation"):
        a = np.asarray(aux_x[key])
        b = np.asarray(aux_f[key])
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-7, err_msg=key)


def test_fused_material_texture_falls_back():
    """A texture-noise medium is not foldable: must fall back, stay finite."""
    scene = _scene()
    tex_fog = dataclasses.replace(
        scene.media[0], noise_mode="texture",
        noise_tex=jnp.ones((8, 8, 8), jnp.float32) * 0.5)
    scene = dataclasses.replace(scene, media=(tex_fog,) + scene.media[1:])
    aux = _aux(dataclasses.replace(CFG, material_impl="fused"), scene)
    assert np.isfinite(np.asarray(aux["accumulation"])).all()


def test_perlin_planes_matches_noise_module():
    """The Mosaic-safe fBm (bitcast-uint32 hash, pow2 wrap) == ops.noise."""
    from volumetricrenderer_tpu.ops.noise import perlin_3d
    from volumetricrenderer_tpu.ops.pallas.material import perlin_planes

    rng = np.random.default_rng(3)
    uvw = jnp.asarray(rng.uniform(-7.0, 7.0, (16, 128, 3)), jnp.float32)
    ref = perlin_3d(uvw, octaves=3, period=4, seed=7)
    got = perlin_planes(uvw[..., 0], uvw[..., 1], uvw[..., 2],
                        octaves=3, period=4, seed=7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)
