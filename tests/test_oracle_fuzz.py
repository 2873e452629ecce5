"""Seeded randomized config/scene fuzz vs the oracle.

The targeted oracle-parity suite (tests/test_oracle_match.py) pins the
BASELINE config family; this sweeps randomized corners of the config space
(shadow modes x light mixes x media stacks x temporal blends x jittered
frames) so knob interactions that no hand-written case covers still get a
reference check. Seeds are FIXED — failures reproduce exactly."""

import dataclasses

import numpy as np
import pytest

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry,
                                    Medium, PointLights, RenderConfig, Scene,
                                    SpotLights)

from test_oracle_match import _run_and_compare


def _random_case(rng: np.random.RandomState):
    w = int(rng.choice([12, 16, 20]))
    h = int(rng.choice([8, 12]))
    d = int(rng.choice([8, 16]))
    shadow_mode = str(rng.choice(["raycast", "map", "map_dir"]))
    cfg = RenderConfig(
        volume_width=w, volume_height=h, volume_depth=d,
        image_width=48, image_height=32, shadow_map_size=32,
        volume_distance=float(rng.uniform(60.0, 120.0)),
        depth_distribution=float(rng.uniform(0.3, 0.7)),
        shadow_mode=shadow_mode,
        composite_impl="xla", reproj_impl="gather",
        temporal_blend_shadow=bool(rng.rand() < 0.7),
        temporal_blend_accumulation=bool(rng.rand() < 0.7),
        temporal_blend_alpha=float(rng.uniform(0.3, 0.9)),
        jitter_dir_scatter=bool(rng.rand() < 0.3),
    )

    cam = Camera.create(
        position=tuple(rng.uniform([-3, 0.5, -18], [3, 4, -12])),
        forward=tuple(rng.uniform([-0.2, -0.15, 0.9], [0.2, 0.05, 1.1])),
        fov_y_deg=float(rng.uniform(45, 70)), aspect=48 / 32,
        near=0.3, far=100.0)

    sun = DirectionalLights.create(
        direction=[tuple(rng.uniform([-0.5, -1.0, -0.5], [0.5, -0.3, 0.5]))],
        color=[tuple(rng.uniform(0.5, 1.0, 3))],
        intensity=[float(rng.uniform(0.5, 3.0))],
        has_shadow=[bool(rng.rand() < 0.8)],
        shadow_strength=[float(rng.uniform(0.5, 1.0))])

    n_pt = int(rng.randint(1, 4))
    pts = PointLights.create(
        position=rng.uniform([-8, 0.5, -5], [8, 6, 15], (n_pt, 3)),
        color=rng.uniform(0.2, 1.0, (n_pt, 3)),
        intensity=rng.uniform(2.0, 9.0, n_pt),
        range=rng.uniform(10.0, 30.0, n_pt),
        has_shadow=[bool(rng.rand() < 0.7) for _ in range(n_pt)])

    n_sp = int(rng.randint(0, 3))
    spots = SpotLights.create(
        position=rng.uniform([-8, 2, -5], [8, 8, 15], (n_sp, 3)),
        direction=rng.uniform([-0.4, -1.0, -0.4], [0.4, -0.4, 0.4], (n_sp, 3)),
        color=rng.uniform(0.2, 1.0, (n_sp, 3)),
        intensity=rng.uniform(2.0, 8.0, n_sp),
        range=rng.uniform(12.0, 35.0, n_sp),
        spot_angle_deg=rng.uniform(30.0, 80.0, n_sp),
        has_shadow=[bool(rng.rand() < 0.6) for _ in range(n_sp)],
        inner_angle_percent=rng.uniform(30.0, 90.0, n_sp),
    ) if n_sp else SpotLights.empty()

    media = [Medium.create(
        scattering_color=tuple(rng.uniform(0.4, 1.0, 3)),
        absorption=float(rng.uniform(0.05, 0.4)),
        phase_g=float(rng.uniform(-0.3, 0.7)),
        height_falloff=float(rng.choice([0.0, rng.uniform(0.02, 0.1)])),
        height_base=float(rng.uniform(-1.0, 1.0)))]
    if rng.rand() < 0.5:
        media.append(Medium.create(
            scattering_color=tuple(rng.uniform(0.4, 1.0, 3)),
            absorption=float(rng.uniform(0.1, 0.5)),
            phase_g=float(rng.uniform(0.0, 0.6)),
            volume_type="box",
            blend_type=str(rng.choice(["additive", "overwrite"])),
            box_min=tuple(rng.uniform([-10, 0, 0], [-2, 1, 5])),
            box_max=tuple(rng.uniform([2, 3, 8], [10, 6, 20])),
            box_softness=float(rng.uniform(0.2, 2.0))))

    geometry = Geometry.create(
        planes=[((0.0, 1.0, 0.0), 0.0, tuple(rng.uniform(0.1, 0.4, 3)))],
        spheres=[(tuple(rng.uniform([-4, 1, 2], [4, 4, 10])),
                  float(rng.uniform(0.8, 2.5)),
                  tuple(rng.uniform(0.2, 0.7, 3)))],
        boxes=[(tuple(rng.uniform([-7, 0, 4], [-3, 1, 8])),
                tuple(rng.uniform([-2, 2, 9], [2, 5, 13])),
                tuple(rng.uniform(0.2, 0.7, 3)),
                # ~half the cases exercise fractional opacity (SPEC
                # "Occluder opacity"); the rest pin the solid path
                float(rng.uniform(0.3, 1.0)) if rng.rand() < 0.5 else 1.0)])

    scene = Scene.create(camera=cam, dir_lights=sun, point_lights=pts,
                         spot_lights=spots, media=tuple(media),
                         geometry=geometry,
                         ambient=tuple(rng.uniform(0.0, 0.15, 3)))
    n_frames = int(rng.randint(1, 4))
    return cfg, scene, n_frames


@pytest.mark.parametrize("seed", [7, 23, 91, 140, 245, 316])
def test_random_config_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    cfg, scene, n_frames = _random_case(rng)
    _run_and_compare(cfg, scene, n_frames=n_frames,
                     time_x=float(rng.uniform(0.0, 2.0)),
                     keys=("shadow", "scatter", "accumulation"),
                     atol=1.5e-3, outlier_frac=2e-3)
