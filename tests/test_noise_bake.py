"""Low-rate procedural-noise bake (cfg.bake_procedural_noise): the per-medium
fBm factor evaluated at the radiance bake's 1/ss^3 grid and tent-upsampled in
the fused scatter, replacing the per-froxel Perlin (the last per-froxel
material cost that isn't needed at full rate — the noise field is band-limited
by its tiling). Reference semantics: WriteMaterialVolumeConstant_WITH_NOISE,
VolumetricCompute.compute:51-58; only the fBm moves to low rate — sigma, box
masks and the height falloff stay per-froxel (ops/pallas/material.py)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry,
                                    Medium, PointLights, RenderConfig, Scene,
                                    SpotLights, froxel)
from volumetricrenderer_tpu.ops.pallas import visibility as vis_lib
from volumetricrenderer_tpu.ops.pallas.material import (pack_media,
                                                        perlin_planes)
from volumetricrenderer_tpu.ops.pallas.scatter import scatter_local_pallas

CFG = RenderConfig(volume_width=32, volume_height=24, volume_depth=16,
                   image_width=64, image_height=48, shadow_mode="raycast",
                   scatter_impl="pallas", accumulate_impl="pallas",
                   reproj_impl="pallas", dir_shadow_impl="pallas",
                   material_impl="fused", raycast_shadow_subsample=2,
                   scatter_bake="radiance")


def _scene():
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


def _setup(scene):
    cam = scene.camera
    params = froxel.make_froxel_params(cam.fov_y, cam.aspect, cam.near,
                                       CFG.volume_distance,
                                       CFG.depth_distribution, CFG.grid)
    return params, cam.view_to_world(), jnp.asarray([0.1, -0.05, 0.2])


def test_bake_noise_channel_matches_xla_perlin():
    """Channel 3 of the noise-augmented radiance bake == the XLA fBm at the
    same low-rate sample points (exactly — same hash/grad formulas)."""
    scene = _scene()
    params, v2w, jit3 = _setup(scene)
    ss = 2
    t = jnp.float32(0.4)
    baked = vis_lib.bake_radiance_pallas(
        params, v2w, scene.camera.position, jit3, scene.point_lights,
        scene.spot_lights, scene.geometry, scene.media, t, CFG.grid, ss,
        interpret=True, bake_noise=True)
    assert baked.shape[0] == 4  # rgb + 1 noise-bearing medium (the fog)
    world = vis_lib.low_res_world_positions(CFG, params, v2w, jit3, ss)
    med, media_static = pack_media(scene.media, t)
    m = scene.media[0]
    ref = perlin_planes(world[..., 0] * med[0, 5] + med[0, 8],
                        world[..., 1] * med[0, 6] + med[0, 9],
                        world[..., 2] * med[0, 7] + med[0, 10],
                        int(m.noise_octaves), int(m.noise_period),
                        int(m.noise_seed))
    # atol 1e-4: the kernel's in-register world positions and the XLA
    # low_res_world_positions differ by FMA association (~5e-6 in the fBm)
    np.testing.assert_allclose(np.asarray(baked[3]), np.asarray(ref),
                               atol=1e-4)


def test_scatter_noise_bake_close_to_per_froxel():
    """The noise-baked fused scatter stays close to the same radiance path
    with per-froxel Perlin (only the fBm's sampling rate changes)."""
    scene = _scene()
    params, v2w, jit3 = _setup(scene)
    t = jnp.float32(0.4)
    common = (params, v2w, scene.camera.position, jit3, None, None,
              scene.point_lights, scene.spot_lights, scene.geometry, CFG.grid)
    rad = vis_lib.bake_radiance_pallas(
        params, v2w, scene.camera.position, jit3, scene.point_lights,
        scene.spot_lights, scene.geometry, scene.media, t, CFG.grid, 2,
        interpret=True, bake_noise=False)
    radn = vis_lib.bake_radiance_pallas(
        params, v2w, scene.camera.position, jit3, scene.point_lights,
        scene.spot_lights, scene.geometry, scene.media, t, CFG.grid, 2,
        interpret=True, bake_noise=True)
    a = scatter_local_pallas(*common, interpret=True, return_planes=True,
                             media=scene.media, time_x=t,
                             vis=rad, vis_ss=2, vis_radiance=True)
    b = scatter_local_pallas(*common, interpret=True, return_planes=True,
                             media=scene.media, time_x=t,
                             vis=radn, vis_ss=2, vis_radiance=True)
    a = np.stack([np.asarray(x) for x in a], axis=-1)
    b = np.stack([np.asarray(x) for x in b], axis=-1)
    err = np.abs(a - b) / np.abs(a).max()
    assert err.mean() < 0.01, err.mean()
    assert err.max() < 0.2, err.max()


def _render(cfg, scene):
    import jax

    from volumetricrenderer_tpu import VolumetricRenderer
    r = VolumetricRenderer(cfg)
    shadow_data = r.bake_shadow_data(scene)
    img, _, _ = jax.jit(lambda s, sc: r.render_frame(
        s, sc, 0.4, shadow_data=shadow_data))(r.init_state(1), scene)
    return np.asarray(img)


def test_pipeline_noise_bake_close():
    """bake_procedural_noise through the full renderer (megakernel inline
    bake): bounded drift vs the same config with per-froxel Perlin."""
    scene = _scene()
    a = _render(CFG, scene)
    b = _render(dataclasses.replace(CFG, bake_procedural_noise=True), scene)
    assert np.isfinite(b).all()
    assert not np.array_equal(a, b)          # the knob actually engaged
    err = np.abs(a - b)[..., :3] / np.abs(a[..., :3]).max()
    assert err.mean() < 0.01, err.mean()
    assert (err > 0.1).mean() < 0.001, (err > 0.1).mean()


def test_pipeline_noise_bake_map_mode():
    """Map-mode radiance + noise bake (bake_radiance_from_maps' XLA path)."""
    scene = _scene()
    cfg = dataclasses.replace(CFG, shadow_mode="map", dir_shadow_impl="xla")
    a = _render(cfg, scene)
    b = _render(dataclasses.replace(cfg, bake_procedural_noise=True), scene)
    assert np.isfinite(b).all()
    err = np.abs(a - b)[..., :3] / np.abs(a[..., :3]).max()
    assert err.mean() < 0.01, err.mean()
