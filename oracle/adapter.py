"""Adapter: framework pytrees -> OracleFrameInput.

Lives outside oracle.oracle so the oracle core stays JAX-free. Shadow map data
baked by the framework is handed to the oracle as plain arrays (the oracle
implements its own *sampling*; bake correctness has direct tests in
tests/test_shadow.py).
"""

from __future__ import annotations

import numpy as np

import functools

from oracle.oracle import OracleFrameInput
from volumetricrenderer_tpu.ops.noise import perlin_3d
from volumetricrenderer_tpu.config import RenderConfig
from volumetricrenderer_tpu.models.scene import Scene
from volumetricrenderer_tpu.state import FrameState


def _packed_acc(prev, cfg):
    """Normalize the fused path's plane-tuple accumulation history
    (state.packed_accumulation) to the oracle's packed [D, H, W, 4]."""
    from volumetricrenderer_tpu.state import packed_accumulation
    return packed_accumulation(prev, cfg.grid_dhw)


def _np(x):
    return None if x is None else np.asarray(x, np.float64)


def _hf_dict(geom):
    """Procedural heightfield -> oracle dict (numpy height evaluator; the
    jax/numpy noise equivalence has its own test, tests/test_noise.py)."""
    if not geom.hf_enabled:
        return None
    amp = float(geom.hf_amp)
    base = float(geom.hf_base)
    tiling = _np(geom.hf_tiling)
    offset = _np(geom.hf_offset)

    def height_fn(x, z):
        uvw = np.stack([x * tiling[0] + offset[0], z * tiling[1] + offset[1],
                        np.zeros_like(x)], axis=-1)
        return base + amp * perlin_3d(uvw, octaves=geom.hf_octaves,
                                      period=geom.hf_period,
                                      seed=geom.hf_seed, xp=np)

    return dict(height_fn=height_fn, hmin=base, hmax=base + amp,
                steps=geom.hf_steps, far=geom.hf_far)


def to_oracle_input(cfg: RenderConfig, scene: Scene, state: FrameState,
                    dir_shadow=None, cube_shadow=None, spot_shadow=None,
                    scene_color=None, view_depth=None, time_x=0.0,
                    first_frame=None) -> OracleFrameInput:
    cam = scene.camera
    frame_count = int(state.frame_count)

    media = []
    for m in scene.media:
        media.append(dict(
            scattering_coef=_np(m.scattering_coef),
            absorption_coef=float(m.absorption_coef),
            phase_g=float(m.phase_g),
            noise_tex=_np(m.noise_tex),
            noise_tiling=_np(m.noise_tiling),
            noise_scroll=_np(m.noise_scroll),
            height_falloff=float(m.height_falloff),
            height_base=float(m.height_base),
            volume_type=m.volume_type,
            blend_type=m.blend_type,
            box_min=_np(m.box_min),
            box_max=_np(m.box_max),
            box_softness=float(m.box_softness),
            noise_fn=(functools.partial(perlin_3d, octaves=m.noise_octaves,
                                        period=m.noise_period, seed=m.noise_seed,
                                        xp=np)
                      if m.noise_mode == "procedural" else None),
        ))

    dir_lights = []
    dl = scene.dir_lights
    packed = np.asarray(dl.packed_color, np.float64) if dl.count else None
    for i in range(dl.count):
        entry = dict(direction=_np(dl.direction[i]), color_packed=packed[i],
                     has_shadow=bool(dl.has_shadow[i]),
                     shadow_strength=float(dl.shadow_strength[i]), shadow=None)
        if dir_shadow is not None and bool(dl.has_shadow[i]):
            entry["shadow"] = dict(
                atlas=_np(dir_shadow.atlas[i]),
                world_to_uv=_np(dir_shadow.world_to_uv[i]),
                spheres=_np(dir_shadow.split_spheres[i]),
                sq_radii=_np(dir_shadow.split_sq_radii[i]),
                strength_r=float(dir_shadow.strength_r[i]),
                bias=float(dir_shadow.bias[i]))
        dir_lights.append(entry)

    point_lights = []
    pl = scene.point_lights
    packed = np.asarray(pl.packed_color, np.float64) if pl.count else None
    for i in range(pl.count):
        entry = dict(position=_np(pl.position[i]), color_packed=packed[i],
                     range=float(pl.range[i]),
                     intensity_multiplier=float(pl.intensity_multiplier[i]),
                     has_shadow=bool(pl.has_shadow[i]), shadow=None)
        if cube_shadow is not None:
            entry["shadow"] = dict(faces=_np(cube_shadow.faces[i]),
                                   strength_r=float(cube_shadow.strength_r[i]),
                                   bias=float(cube_shadow.bias[i]))
        point_lights.append(entry)

    spot_lights = []
    sl = scene.spot_lights
    packed = np.asarray(sl.packed_color, np.float64) if sl.count else None
    for i in range(sl.count):
        entry = dict(position=_np(sl.position[i]), direction=_np(sl.direction[i]),
                     color_packed=packed[i], range=float(sl.range[i]),
                     spot_angle=float(sl.spot_angle[i]),
                     inner_angle_percent=float(sl.inner_angle_percent[i]),
                     intensity_multiplier=float(sl.intensity_multiplier[i]),
                     has_shadow=bool(sl.has_shadow[i]), shadow=None)
        if spot_shadow is not None:
            entry["shadow"] = dict(map=_np(spot_shadow.maps[i]),
                                   axes=_np(spot_shadow.axes[i]),
                                   tan_half=float(spot_shadow.tan_half_angle[i]),
                                   strength_r=float(spot_shadow.strength_r[i]),
                                   bias=float(spot_shadow.bias[i]))
        spot_lights.append(entry)

    has_history = frame_count > 0
    return OracleFrameInput(
        grid=cfg.grid,
        volume_distance=cfg.volume_distance,
        depth_distribution=cfg.depth_distribution,
        camera_pos=_np(cam.position),
        camera_forward=_np(cam.forward),
        camera_up=_np(cam.up),
        fov_y=float(cam.fov_y),
        aspect=float(cam.aspect),
        near=float(cam.near),
        frame_count=frame_count,
        temporal_blend_alpha=cfg.temporal_blend_alpha,
        temporal_blend_shadow=cfg.temporal_blend_shadow,
        temporal_blend_accumulation=cfg.temporal_blend_accumulation,
        temporal_blend_scatter=cfg.temporal_blend_scatter,
        temporal_blend_material=cfg.temporal_blend_material,
        jitter_dir_scatter=cfg.jitter_dir_scatter,
        use_current_matrix_for_reproj=cfg.use_current_matrix_for_reproj,
        reproj_impl=cfg.reproj_impl,
        reproj_window=cfg.reproj_window,
        shadow_mode=cfg.shadow_mode,
        geometry=dict(
            plane_normal=_np(scene.geometry.plane_normal),
            plane_d=_np(scene.geometry.plane_d),
            sphere_center=_np(scene.geometry.sphere_center),
            sphere_radius=_np(scene.geometry.sphere_radius),
            box_min=_np(scene.geometry.box_min),
            box_max=_np(scene.geometry.box_max),
            box_opacity=_np(scene.geometry.box_opacity),
            hf=_hf_dict(scene.geometry),
            hf_local=cfg.heightfield_local_shadows,
        ),
        time_x=float(time_x),
        media=media,
        dir_lights=dir_lights,
        point_lights=point_lights,
        spot_lights=spot_lights,
        prev_shadow=_np(state.prev_shadow) if has_history else None,
        prev_scatter=_np(state.prev_scatter)
        if has_history and state.prev_scatter is not None else None,
        prev_accumulation=_np(_packed_acc(state.prev_accumulation, cfg))
        if has_history else None,
        prev_material_a=_np(state.prev_material_a)
        if has_history and state.prev_material_a is not None else None,
        prev_world_to_view=_np(state.prev_world_to_view),
        scene_color=_np(scene_color),
        view_depth=_np(view_depth),
    )
