"""Texture-noise fold (round 5): texture-mode media no longer force the
frame off the megakernel — their wrap-trilinear factor is sampled at the
radiance bake's low grid in XLA (visibility.bake_noise_channels_xla) and
rides the bake channels into the fused scatter, exactly like the procedural
noise bake. Reference semantics: WriteMaterialVolumeConstant_WITH_NOISE,
VolumetricCompute.compute:51-58 (the factor itself); the low-rate
amortization is this framework's documented approximation (SPEC.md)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry,
                                    Medium, PointLights, RenderConfig, Scene,
                                    SpotLights, VolumetricRenderer)
from volumetricrenderer_tpu.ops.noise import perlin_texture_3d

CFG = RenderConfig(volume_width=32, volume_height=24, volume_depth=16,
                   image_width=64, image_height=48, shadow_mode="raycast",
                   scatter_impl="pallas", accumulate_impl="pallas",
                   reproj_impl="pallas", dir_shadow_impl="pallas",
                   material_impl="fused", raycast_shadow_subsample=2,
                   scatter_bake="radiance", texture_noise_subsample=2)


def _scene(tex, mixed=False):
    fog = Medium.create(
        scattering_color=(1.0, 0.9, 0.8), absorption=0.19, phase_g=0.3,
        noise_tex=tex, noise_mode="texture",
        noise_tiling=(0.05, 0.04, 0.05), noise_scroll=(3.0, 0.5, 0.0),
        height_falloff=0.05, height_base=0.5)
    box = Medium.create(
        scattering_color=(0.6, 0.8, 1.0), absorption=0.3, phase_g=0.5,
        volume_type="box", blend_type="additive",
        box_min=(-8.0, 0.0, -6.0), box_max=(8.0, 3.0, 10.0),
        box_softness=1.0,
        # mixed: a PROCEDURAL noise medium after the texture one exercises
        # the media-order channel contract of bake_noise_channels_xla
        **(dict(noise_mode="procedural", noise_tiling=(0.06, 0.05, 0.06))
           if mixed else {}))
    return Scene.create(
        camera=Camera.create(position=(0.0, 2.0, -10.0),
                             forward=(0.05, -0.02, 1), aspect=64 / 48),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1, 1, 1)], intensity=[2.0],
            has_shadow=[True], shadow_strength=[0.8]),
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


def _render(cfg, scene, frames=2):
    r = VolumetricRenderer(cfg)
    shadow_data = r.bake_shadow_data(scene)
    st = r.init_state(scene.dir_lights.count)
    img = aux = None
    for i in range(frames):
        img, aux, st = jax.jit(lambda s, sc, t: r.render_frame(
            s, sc, t, shadow_data=shadow_data))(st, scene,
                                                jnp.float32(0.4 + 0.1 * i))
    return np.asarray(img), aux


def test_texture_media_take_the_fused_path():
    """With the radiance bake on (ss>1), a texture-noise medium rides the
    megakernel (aux['scatter'] is None on the fused path — the scatter
    volume never exists); with scatter_bake='vis' it falls back unfused."""
    tex = jnp.asarray(perlin_texture_3d())
    scene = _scene(tex)
    img, aux = _render(CFG, scene)
    assert np.isfinite(img).all()
    assert aux["scatter"] is None, "texture media did not fold (round 5)"
    _, aux_vis = _render(dataclasses.replace(CFG, scatter_bake="vis"), scene)
    assert aux_vis["scatter"] is not None


def test_texture_fold_matches_unfused():
    """Fused (bake-channel) texture noise == the unfused frame with the
    texture sampled at the SAME low rate (texture_noise_subsample == ss):
    both paths sample noise_tex at identical low-grid positions
    (low_res_world_positions contract), so the residual is only the
    megakernel's documented reassociation + the in-kernel tent upsample's
    MXU rounding vs the XLA HIGHEST einsums."""
    tex = jnp.asarray(perlin_texture_3d())
    scene = _scene(tex)
    a, _ = _render(CFG, scene)
    b, _ = _render(dataclasses.replace(CFG, frame_fused=False), scene)
    err = np.abs(a - b)[..., :3] / np.abs(a[..., :3]).max()
    assert err.mean() < 0.01, err.mean()
    assert err.max() < 0.08, err.max()


def test_texture_fold_mixed_media_channel_order():
    """Texture + procedural noise media together: all noise channels come
    from the XLA bake in media order; the frame stays close to the unfused
    reference and to the same scene rendered with bake_procedural_noise
    (which would route the procedural channel in-kernel if texture media
    were absent)."""
    tex = jnp.asarray(perlin_texture_3d())
    scene = _scene(tex, mixed=True)
    cfg = dataclasses.replace(CFG, bake_procedural_noise=True)
    a, aux = _render(cfg, scene)
    assert aux["scatter"] is None
    b, _ = _render(dataclasses.replace(cfg, frame_fused=False), scene)
    err = np.abs(a - b)[..., :3] / np.abs(a[..., :3]).max()
    assert err.mean() < 0.01, err.mean()
    assert err.max() < 0.08, err.max()


def test_texture_fold_needs_radiance_bake():
    """ss=1 (no bake grid) keeps texture media off the fused path — the
    eligibility gate, not an assert, must catch it."""
    tex = jnp.asarray(perlin_texture_3d())
    scene = _scene(tex)
    cfg = dataclasses.replace(CFG, raycast_shadow_subsample=1)
    img, aux = _render(cfg, scene)
    assert np.isfinite(img).all()
    assert aux["scatter"] is not None


def test_sample_tex_selection_matches_gather():
    """The selection-matmul wrap-trilinear sampler == the gather sampler:
    exact at precision='highest', ~bf16-bounded at the production default."""
    from volumetricrenderer_tpu.ops.pallas.visibility import \
        sample_tex_selection
    from volumetricrenderer_tpu.ops.sampling import trilinear_sample_3d
    rng = np.random.RandomState(11)
    tex = jnp.asarray(rng.rand(8, 16, 32).astype(np.float32))
    pos = jnp.asarray((rng.rand(7, 9, 3).astype(np.float32) * 80.0 - 40.0))
    ref = np.asarray(trilinear_sample_3d(tex, pos, wrap=True))
    hi = np.asarray(jax.jit(lambda t, p: sample_tex_selection(
        t, p, precision="highest"))(tex, pos))
    np.testing.assert_allclose(hi, ref, rtol=1e-5, atol=1e-6)
    lo = np.asarray(jax.jit(sample_tex_selection)(tex, pos))
    np.testing.assert_allclose(lo, ref, rtol=0.02, atol=0.01)
