"""Framework <-> NumPy-oracle parity on the BASELINE.json config family
(scaled-down grids so the single-core CPU test box stays fast; the math is
size-independent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oracle import adapter, oracle
from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry, Medium,
                                    PointLights, RenderConfig, Scene, SpotLights,
                                    VolumetricRenderer)
from volumetricrenderer_tpu.ops.noise import perlin_texture_3d

# gather-based composite + reprojection: the oracle's reference semantics
# (the TPU fast paths have their own equivalence tests)
CFG = dict(volume_width=20, volume_height=12, volume_depth=16,
           image_width=64, image_height=36, shadow_map_size=32,
           volume_distance=100.0, composite_impl="xla", reproj_impl="gather")


def _camera():
    return Camera.create(position=(-0.4, 1.9, -15.8), forward=(0.1, -0.05, 1.0),
                         fov_y_deg=60.0, aspect=64 / 36, near=0.3, far=100.0)


def _geometry():
    return Geometry.create(
        planes=[((0.0, 1.0, 0.0), 0.0, (0.2, 0.25, 0.2))],
        spheres=[((2.0, 2.0, 5.0), 1.5, (0.6, 0.5, 0.5))],
        boxes=[((-5.0, 0.0, 8.0), (-2.0, 3.0, 11.0), (0.5, 0.5, 0.4))])


def _fog(**kw):
    return Medium.create(scattering_color=(1.0, 1.0, 1.0), absorption=0.19,
                         phase_g=0.3, **kw)


def _run_and_compare(cfg, scene, n_frames=1, time_x=0.0,
                     atol=1.5e-3, keys=("shadow", "material_a", "scatter",
                                        "accumulation", "image"),
                     camera_path=None, outlier_frac=0.0):
    """Run n framework frames (jit), then re-run the LAST frame through the
    oracle from the same history, and compare per-volume."""
    r = VolumetricRenderer(cfg)
    state = r.init_state(max(scene.dir_lights.count, 1))

    @jax.jit
    def step(state, scene):
        img, aux, new_state = r.render_frame(state, scene, time_x)
        return img, aux, new_state

    scenes = [scene] * n_frames
    if camera_path is not None:
        scenes = [Scene.create(camera=c, dir_lights=scene.dir_lights,
                               point_lights=scene.point_lights,
                               spot_lights=scene.spot_lights, media=scene.media,
                               geometry=scene.geometry, ambient=scene.ambient)
                  for c in camera_path]

    for i in range(n_frames - 1):
        _, _, state = step(state, scenes[i])
    last_scene = scenes[n_frames - 1]
    img, aux, _ = step(state, last_scene)

    dir_sh, cube_sh, spot_sh = r.bake_shadow_data(last_scene)
    scene_color, view_depth = aux["scene_color"], aux["view_depth"]
    inp = adapter.to_oracle_input(cfg, last_scene, state, dir_sh, cube_sh,
                                  spot_sh, scene_color, view_depth, time_x)
    ref = oracle.render_frame_oracle(inp)
    ref["image"] = ref.get("image")

    got = {k: np.asarray(v) for k, v in aux.items()}
    got["image"] = np.asarray(img)

    for key in keys:
        a = got[key]
        b = np.asarray(ref[key])
        if key == "image":
            a = a[..., :3]
            b = b[..., :3]
        err = np.abs(a - b)
        denom = 1.0 + np.abs(b)
        rel = err / denom
        if outlier_frac == 0.0:
            assert rel.max() <= atol, f"{key}: max rel err {rel.max():.2e}"
        else:
            frac_bad = (rel > atol).mean()
            assert frac_bad <= outlier_frac, \
                f"{key}: {frac_bad:.2%} elements over {atol:.0e} (max {rel.max():.2e})"


# --------------------------------------------------------------------------- #
# BASELINE config 1: homogeneous fog, one dir light, no shadows
# --------------------------------------------------------------------------- #

def test_config1_homogeneous_fog_dir_light():
    cfg = RenderConfig(**CFG)
    scene = Scene.create(
        camera=_camera(),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(0.99, 0.96, 0.8)],
            intensity=[2.5], has_shadow=[False]),
        media=(_fog(),), geometry=_geometry())
    _run_and_compare(cfg, scene)


# --------------------------------------------------------------------------- #
# BASELINE config 2: heterogeneous fog (noise + height falloff)
# --------------------------------------------------------------------------- #

def test_config2_noise_and_height_falloff():
    cfg = RenderConfig(**CFG)
    tex = perlin_texture_3d(8, octaves=2, period=2)
    scene = Scene.create(
        camera=_camera(),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(0.99, 0.96, 0.8)],
            intensity=[2.5], has_shadow=[False]),
        media=(_fog(noise_tex=tex, noise_tiling=(0.05, 0.05, 0.05),
                    noise_scroll=(10.0, 0.0, 0.0), height_falloff=0.1),),
        geometry=_geometry())
    _run_and_compare(cfg, scene, time_x=0.37)


def test_box_volume_additive():
    cfg = RenderConfig(**CFG)
    box = Medium.create(scattering_color=(0.8, 0.9, 1.0), absorption=0.3,
                        phase_g=0.5, volume_type="box", blend_type="additive",
                        box_min=(-8.0, 0.0, -5.0), box_max=(8.0, 4.0, 20.0),
                        box_softness=1.0)
    scene = Scene.create(
        camera=_camera(),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1.0, 1.0, 1.0)],
            intensity=[2.0], has_shadow=[False]),
        media=(_fog(), box), geometry=_geometry())
    _run_and_compare(cfg, scene)


# --------------------------------------------------------------------------- #
# BASELINE config 3: local lights with shadow-map taps
# --------------------------------------------------------------------------- #

def test_config3_point_spot_lights_with_shadows():
    cfg = RenderConfig(**CFG)
    scene = Scene.create(
        camera=_camera(),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(0.99, 0.96, 0.8)],
            intensity=[2.5], has_shadow=[True]),
        point_lights=PointLights.create(
            position=[(-2.0, 3.0, 2.0), (4.0, 2.0, 10.0)],
            color=[(1.0, 0.2, 0.2), (0.2, 0.4, 1.0)],
            intensity=[7.0, 5.0], range=[25.0, 30.0],
            has_shadow=[True, False]),
        spot_lights=SpotLights.create(
            position=[(-6.0, 5.0, 6.0)], direction=[(0.5, -0.7, 0.3)],
            color=[(1.0, 0.0, 0.0)], intensity=[6.0], range=[34.42],
            spot_angle_deg=[66.0], inner_angle_percent=[0.5],
            has_shadow=[True]),
        media=(_fog(),), geometry=_geometry())
    # PCF compares are step functions: f32 vs f64 can flip isolated taps on
    # exact boundaries, so allow a tiny outlier fraction.
    _run_and_compare(cfg, scene, atol=1.5e-3, outlier_frac=2e-3)


# --------------------------------------------------------------------------- #
# BASELINE config 4: temporal path with a moving camera
# --------------------------------------------------------------------------- #

def test_config4_temporal_moving_camera():
    cfg = RenderConfig(**CFG, temporal_blend_alpha=0.5)
    cams = [Camera.create(position=(-0.4 + 0.3 * i, 1.9, -15.8 + 0.5 * i),
                          forward=(0.02 * i, -0.05, 1.0), fov_y_deg=60.0,
                          aspect=64 / 36, near=0.3, far=100.0)
            for i in range(3)]
    base = Scene.create(
        camera=cams[0],
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(0.99, 0.96, 0.8)],
            intensity=[2.5], has_shadow=[True]),
        media=(_fog(),), geometry=_geometry())
    _run_and_compare(cfg, base, n_frames=3, camera_path=cams,
                     atol=1.5e-3, outlier_frac=2e-3)


def test_config4_temporal_windowed_default_impls():
    # The TPU-native default paths (windowed reprojection + tentmm composite)
    # against the oracle's windowed spec; grid chosen image-divisible.
    cfg = RenderConfig(volume_width=16, volume_height=12, volume_depth=16,
                       image_width=64, image_height=36, shadow_map_size=32,
                       volume_distance=100.0, temporal_blend_alpha=0.5)
    cams = [Camera.create(position=(-0.4 + 0.2 * i, 1.9, -15.8 + 0.4 * i),
                          forward=(0.01 * i, -0.05, 1.0), fov_y_deg=60.0,
                          aspect=64 / 36, near=0.3, far=100.0)
            for i in range(3)]
    base = Scene.create(
        camera=cams[0],
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(0.99, 0.96, 0.8)],
            intensity=[2.5], has_shadow=[True]),
        media=(_fog(),), geometry=_geometry())
    _run_and_compare(cfg, base, n_frames=3, camera_path=cams,
                     atol=1.5e-3, outlier_frac=2e-3)


def test_temporal_quirk_current_matrix_reproj():
    # The reference's cs:100 quirk: reprojection with the current matrix.
    cfg = RenderConfig(**CFG, use_current_matrix_for_reproj=True,
                       temporal_blend_alpha=0.84)
    scene = Scene.create(
        camera=_camera(),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(0.99, 0.96, 0.8)],
            intensity=[2.5], has_shadow=[False]),
        media=(_fog(),), geometry=_geometry())
    _run_and_compare(cfg, scene, n_frames=2)


def test_first_frame_history_is_ignored():
    # frame 0 must be blend-free even with alpha = 0.84
    cfg = RenderConfig(**CFG, temporal_blend_alpha=0.84)
    cfg_off = RenderConfig(**CFG, temporal_blend_alpha=0.0)
    scene = Scene.create(
        camera=_camera(),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1.0, 1.0, 1.0)],
            intensity=[2.0], has_shadow=[False]),
        media=(_fog(),), geometry=_geometry())

    r1 = VolumetricRenderer(cfg)
    r2 = VolumetricRenderer(cfg_off)
    img1, _, _ = jax.jit(lambda s, sc: r1.render_frame(s, sc, 0.0))(
        r1.init_state(1), scene)
    img2, _, _ = jax.jit(lambda s, sc: r2.render_frame(s, sc, 0.0))(
        r2.init_state(1), scene)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-6)


def test_optional_material_scatter_blends_match_oracle():
    # the reference dispatches these blends with commented-out bodies
    # (compute:228, 243); our implemented versions, enabled, against the oracle
    cfg = RenderConfig(**CFG, temporal_blend_alpha=0.5,
                       temporal_blend_material=True,
                       temporal_blend_scatter=True)
    scene = Scene.create(
        camera=_camera(),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1.0, 1.0, 1.0)],
            intensity=[2.0], has_shadow=[False]),
        media=(_fog(),), geometry=_geometry())
    _run_and_compare(cfg, scene, n_frames=2)
