"""Baked local-light RADIANCE (scatter_bake="radiance"): the entire per-light
scatter sum — visibility x falloff x cone x HG phase, color-weighted — baked
at 1/ss^3 rate (ops/pallas/visibility.py bake_radiance_*), making the fused
scatter kernel's local-light cost independent of light count. The reference
evaluates the same factors per froxel per light (VolumetricCompute.compute:
87-167); the bake trades its per-froxel rate for the tent-upsampled low rate
the visibility bake already established."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry,
                                    Medium, PointLights, RenderConfig, Scene,
                                    SpotLights, VolumetricRenderer, froxel)
from volumetricrenderer_tpu.ops import raycast
from volumetricrenderer_tpu.ops.pallas import visibility as vis_lib
from volumetricrenderer_tpu.ops.pallas.material import (pack_media,
                                                        phase_g_plane)
from volumetricrenderer_tpu.ops.pallas.scatter import (light_factor,
                                                       pack_lights,
                                                       scatter_local_pallas)
from volumetricrenderer_tpu.ops.phase import PI

CFG = RenderConfig(volume_width=32, volume_height=24, volume_depth=16,
                   image_width=64, image_height=48, shadow_mode="raycast",
                   scatter_impl="pallas")


def _scene():
    fog = Medium.create(scattering_color=(1.0, 0.9, 0.8), absorption=0.1,
                        phase_g=0.3)
    box = Medium.create(scattering_color=(0.6, 0.8, 1.0), absorption=0.2,
                        phase_g=0.5, volume_type="box", blend_type="additive",
                        box_min=(-8.0, 0.0, -6.0), box_max=(8.0, 3.0, 10.0),
                        box_softness=1.0)
    return Scene.create(
        camera=Camera.create(position=(0.0, 2.0, -10.0),
                             forward=(0.05, -0.02, 1), aspect=1.0),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1, 1, 1)], intensity=[2.0],
            has_shadow=[True], shadow_strength=[0.8]),
        point_lights=PointLights.create(
            position=[(1.0, 3.0, 2.0), (-2.0, 1.0, 5.0)],
            color=[(1, 0.8, 0.6), (0.3, 0.5, 1.0)], range=[8.0, 6.0],
            intensity=[3.0, 2.0], has_shadow=[True, True]),
        spot_lights=SpotLights.create(
            position=[(0.0, 5.0, 0.0)], direction=[(0, -1, 0.2)],
            color=[(1, 1, 0.9)], range=[10.0], intensity=[4.0],
            spot_angle_deg=[40.0], has_shadow=[True]),
        media=(fog, box),
        geometry=Geometry.create(
            planes=[((0, 1, 0), 0.0, (0.2, 0.2, 0.2))],
            spheres=[((0.0, 2.0, 3.0), 1.2, (0.5, 0.5, 0.5))],
            boxes=[((-3.0, 0.0, 1.0), (-1.0, 2.5, 3.0), (0.4, 0.4, 0.4))]))


def _setup(scene):
    cam = scene.camera
    params = froxel.make_froxel_params(cam.fov_y, cam.aspect, cam.near,
                                       CFG.volume_distance,
                                       CFG.depth_distribution, CFG.grid)
    return params, cam.view_to_world(), jnp.asarray([0.1, -0.05, 0.2])


def _manual_radiance(scene, params, v2w, jit3, ss, time_x=0.0):
    """XLA mirror of the bake: shared light_factor/phase_g_plane physics +
    raycast.occluded visibility, summed over ALL lights (skipping culled
    lights in the kernel is exact: out-of-range => falloff == 0)."""
    world = vis_lib.low_res_world_positions(CFG, params, v2w, jit3, ss)
    wx, wy, wz = world[..., 0], world[..., 1], world[..., 2]
    cam = jnp.asarray(scene.camera.position, jnp.float32)
    vd = world - cam
    inv = jax.lax.rsqrt(jnp.sum(vd * vd, -1) + 1e-18)
    vdx, vdy, vdz = vd[..., 0] * inv, vd[..., 1] * inv, vd[..., 2] * inv
    med, media_static = pack_media(scene.media, jnp.float32(time_x))
    phg = phase_g_plane(med, media_static, wx, wy, wz)
    g2 = phg * phg
    hg_num = (1.0 - g2) / (4.0 * PI)
    lights = pack_lights(scene.point_lights, scene.spot_lights)
    acc = [jnp.zeros(wx.shape, jnp.float32) for _ in range(3)]
    for li in range(lights.shape[0]):
        q = lambda i: lights[li, i]
        factor, ldx, ldy, ldz, dist, gate, cr, cg, cb = light_factor(
            q, wx, wy, wz, vdx, vdy, vdz, phg, g2, hg_num)
        ldir = jnp.stack([-ldx, -ldy, -ldz], axis=-1)
        occ = raycast.occluded(scene.geometry, world, ldir, dist - 0.05)
        base = factor * (1.0 - occ * gate)
        for c, col in enumerate((cr, cg, cb)):
            acc[c] = acc[c] + base * col
    return jnp.stack(acc)


def test_radiance_bake_matches_manual_sum():
    """The Pallas radiance bake must agree with the XLA mirror of the same
    physics at the same low-rate sample points."""
    scene = _scene()
    params, v2w, jit3 = _setup(scene)
    ss = 2
    baked = np.asarray(vis_lib.bake_radiance_pallas(
        params, v2w, scene.camera.position, jit3, scene.point_lights,
        scene.spot_lights, scene.geometry, scene.media, jnp.float32(0.0),
        CFG.grid, ss, interpret=True))
    ref = np.asarray(_manual_radiance(scene, params, v2w, jit3, ss))
    assert baked.shape == ref.shape
    np.testing.assert_allclose(baked, ref, atol=1e-5 * max(ref.max(), 1.0))


def test_scatter_radiance_path_close_to_march():
    """The radiance-baked scatter approximates the full-rate in-kernel march;
    unlike the visibility bake it also low-rates the smooth factors, so the
    bound is looser but still tight relative to signal scale."""
    scene = _scene()
    params, v2w, jit3 = _setup(scene)
    t = jnp.float32(0.0)
    common = (params, v2w, scene.camera.position, jit3, None, None,
              scene.point_lights, scene.spot_lights, scene.geometry, CFG.grid)
    a = scatter_local_pallas(*common, interpret=True, return_planes=True,
                             media=scene.media, time_x=t)
    rad = vis_lib.bake_radiance_pallas(
        params, v2w, scene.camera.position, jit3, scene.point_lights,
        scene.spot_lights, scene.geometry, scene.media, t, CFG.grid, 2,
        interpret=True)
    b = scatter_local_pallas(*common, interpret=True, return_planes=True,
                             media=scene.media, time_x=t,
                             vis=rad, vis_ss=2, vis_radiance=True)
    a = np.stack([np.asarray(x) for x in a[:3]], axis=-1)
    b = np.stack([np.asarray(x) for x in b[:3]], axis=-1)
    err = np.abs(a - b) / np.abs(a).max()
    assert err.mean() < 0.02, err.mean()
    assert (err > 0.1).mean() < 0.01, (err > 0.1).mean()


def _render(cfg, scene):
    r = VolumetricRenderer(cfg)
    shadow_data = r.bake_shadow_data(scene)
    img, _, _ = jax.jit(lambda s, sc: r.render_frame(
        s, sc, 0.0, shadow_data=shadow_data))(r.init_state(1), scene)
    return np.asarray(img)


def test_pipeline_radiance_close_to_full_rate():
    """scatter_bake='radiance' + subsample=2 through the full renderer (the
    megakernel's inline radiance bake on the fused path) stays close to the
    full-rate ss=1 frame."""
    scene = _scene()
    a = _render(CFG, scene)
    b = _render(dataclasses.replace(CFG, raycast_shadow_subsample=2,
                                    scatter_bake="radiance"), scene)
    assert np.isfinite(b).all()
    err = np.abs(a - b)[..., :3] / np.abs(a[..., :3]).max()
    assert err.mean() < 0.02, err.mean()


def test_pipeline_radiance_vs_vis_bake():
    """At the same subsample the radiance bake and the visibility bake differ
    only by where the smooth factors are sampled — frames must be close."""
    scene = _scene()
    a = _render(dataclasses.replace(CFG, raycast_shadow_subsample=2), scene)
    b = _render(dataclasses.replace(CFG, raycast_shadow_subsample=2,
                                    scatter_bake="radiance"), scene)
    err = np.abs(a - b)[..., :3] / np.abs(a[..., :3]).max()
    assert err.mean() < 0.02, err.mean()


def test_pipeline_map_mode_radiance():
    """shadow_mode='map' + radiance bake: local lights' cube/spot map
    visibility feeds the low-rate radiance volume — close to the full-rate
    XLA map-mode parity path."""
    scene = _scene()
    cfg_xla = dataclasses.replace(CFG, shadow_mode="map", scatter_impl="xla",
                                  dir_shadow_impl="xla")
    cfg_rad = dataclasses.replace(CFG, shadow_mode="map",
                                  dir_shadow_impl="xla",
                                  scatter_bake="radiance")
    a = _render(cfg_xla, scene)
    b = _render(cfg_rad, scene)
    assert np.isfinite(b).all()
    err = np.abs(a - b)[..., :3] / np.abs(a[..., :3]).max()
    assert err.mean() < 0.02, err.mean()
    assert (err > 0.1).mean() < 0.01
