"""Seeded fuzz: production impl set == reference-shaped impl set.

The oracle fuzz (test_oracle_fuzz.py) checks the reference-shaped paths
against NumPy; this sweep checks that the PRODUCTION paths (fused Pallas
kernels, zgather composite, fused temporal blends — interpret mode on CPU)
match the reference-shaped paths on randomized configs/scenes, catching
knob interactions the fixed-config equivalence tests miss. Fixed seeds."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry,
                                    Medium, PointLights, RenderConfig, Scene,
                                    SpotLights, VolumetricRenderer)


def _random_case(rng: np.random.RandomState):
    w = int(rng.choice([16, 24]))
    h = int(rng.choice([9, 15]))            # 3- or 5-divisible (zgather)
    d = int(rng.choice([8, 16]))
    cfg = RenderConfig(
        volume_width=w, volume_height=h, volume_depth=d,
        image_width=8 * w, image_height=8 * h,   # 64 px/cell
        shadow_map_size=32,
        volume_distance=float(rng.uniform(60.0, 120.0)),
        shadow_mode=str(rng.choice(["raycast", "map_dir"])),
        temporal_blend_shadow=bool(rng.rand() < 0.7),
        temporal_blend_accumulation=bool(rng.rand() < 0.7),
        temporal_blend_alpha=float(rng.uniform(0.3, 0.9)),
    )

    cam = Camera.create(
        position=tuple(rng.uniform([-3, 0.5, -18], [3, 4, -12])),
        forward=tuple(rng.uniform([-0.2, -0.15, 0.9], [0.2, 0.05, 1.1])),
        fov_y_deg=float(rng.uniform(45, 70)),
        aspect=cfg.image_width / cfg.image_height, near=0.3, far=100.0)

    sun = DirectionalLights.create(
        direction=[tuple(rng.uniform([-0.5, -1.0, -0.5], [0.5, -0.3, 0.5]))],
        color=[tuple(rng.uniform(0.5, 1.0, 3))],
        intensity=[float(rng.uniform(0.5, 3.0))],
        has_shadow=[True], shadow_strength=[float(rng.uniform(0.5, 1.0))])

    n_pt = int(rng.randint(1, 4))
    pts = PointLights.create(
        position=rng.uniform([-8, 0.5, -5], [8, 6, 15], (n_pt, 3)),
        color=rng.uniform(0.2, 1.0, (n_pt, 3)),
        intensity=rng.uniform(2.0, 9.0, n_pt),
        range=rng.uniform(10.0, 30.0, n_pt),
        has_shadow=[True] * n_pt)

    n_sp = int(rng.randint(0, 3))
    spots = SpotLights.create(
        position=rng.uniform([-8, 2, -5], [8, 8, 15], (n_sp, 3)),
        direction=rng.uniform([-0.4, -1.0, -0.4], [0.4, -0.4, 0.4], (n_sp, 3)),
        color=rng.uniform(0.2, 1.0, (n_sp, 3)),
        intensity=rng.uniform(2.0, 8.0, n_sp),
        range=rng.uniform(12.0, 35.0, n_sp),
        spot_angle_deg=rng.uniform(30.0, 80.0, n_sp),
        has_shadow=[True] * n_sp,
    ) if n_sp else SpotLights.empty()

    media = [Medium.create(
        scattering_color=tuple(rng.uniform(0.4, 1.0, 3)),
        absorption=float(rng.uniform(0.05, 0.4)),
        phase_g=float(rng.uniform(-0.3, 0.7)),
        noise_mode="procedural" if rng.rand() < 0.5 else "texture",
        height_falloff=float(rng.choice([0.0, rng.uniform(0.02, 0.1)])))]

    geometry = Geometry.create(
        planes=[((0.0, 1.0, 0.0), 0.0, tuple(rng.uniform(0.1, 0.4, 3)))],
        spheres=[(tuple(rng.uniform([-4, 1, 2], [4, 4, 10])),
                  float(rng.uniform(0.8, 2.5)),
                  tuple(rng.uniform(0.2, 0.7, 3)))],
        boxes=[(tuple(rng.uniform([-7, 0, 4], [-3, 1, 8])),
                tuple(rng.uniform([-2, 2, 9], [2, 5, 13])),
                tuple(rng.uniform(0.2, 0.7, 3)),
                float(rng.uniform(0.3, 1.0)) if rng.rand() < 0.5 else 1.0)],
        heightfield=(dict(amp=float(rng.uniform(1.0, 3.0)), base=-0.3,
                          tiling=(0.04, 0.04), steps=4, octaves=1)
                     if rng.rand() < 0.4 else None))

    scene = Scene.create(camera=cam, dir_lights=sun, point_lights=pts,
                         spot_lights=spots, media=tuple(media),
                         geometry=geometry,
                         ambient=tuple(rng.uniform(0.0, 0.15, 3)))
    return cfg, scene, int(rng.randint(1, 4))


REFERENCE_IMPLS = dict(composite_impl="xla", reproj_impl="gather",
                       scatter_impl="xla", dir_shadow_impl="xla",
                       accumulate_impl="xla", material_impl="xla")
PRODUCTION_IMPLS = dict(composite_impl="zgather", reproj_impl="pallas",
                        scatter_impl="pallas", dir_shadow_impl="pallas",
                        accumulate_impl="pallas", material_impl="fused")


def _run(cfg, scene, n_frames):
    r = VolumetricRenderer(cfg)
    state = r.init_state(scene.dir_lights.count)
    img = None
    step = jax.jit(lambda s, sc, t: r.render_frame(s, sc, t))
    for i in range(n_frames):
        img, _, state = step(state, scene, jnp.float32(0.1 * i))
    return np.asarray(img)


@pytest.mark.parametrize("seed", [11, 58, 204])
def test_production_impls_match_reference_impls(seed):
    rng = np.random.RandomState(seed)
    cfg, scene, n_frames = _random_case(rng)
    a = _run(dataclasses.replace(cfg, **REFERENCE_IMPLS), scene, n_frames)
    b = _run(dataclasses.replace(cfg, **PRODUCTION_IMPLS), scene, n_frames)
    # fast paths are equivalence-class, not bit-exact (windowed reproj clamps
    # vs the gather sampler at volume edges, any-hit boundary flips): bound
    # the mismatch mass + magnitude like tools/tpu_smoke.py
    rel = np.abs(a - b) / (1.0 + np.abs(a))
    assert np.isfinite(b).all()
    assert (rel > 2e-3).mean() < 1e-2, (rel.max(), (rel > 2e-3).mean())


@pytest.mark.parametrize("seed", [23, 71, 146])
def test_bake_knobs_bounded_vs_exact_fused(seed):
    """Randomized configs/scenes through the low-rate bake knob space
    (scatter_bake vis/radiance x bake_procedural_noise x ss in {2, 4}) vs the
    SAME production impls at ss=1 (the exact per-froxel fused path). Bounds
    are looser than the impl fuzz — the bake is a documented approximation —
    but still tight relative to signal scale; catches knob interactions
    (map_dir, heightfield, fractional boxes, spot-only slices, temporal
    blends off) the fixed-config bake tests miss."""
    rng = np.random.RandomState(seed)
    cfg, scene, n_frames = _random_case(rng)
    cfg = dataclasses.replace(cfg, **PRODUCTION_IMPLS)
    baked = dataclasses.replace(
        cfg,
        raycast_shadow_subsample=int(rng.choice([2, 4])),
        scatter_bake=str(rng.choice(["vis", "radiance"])),
        bake_procedural_noise=bool(rng.rand() < 0.5))
    a = _run(cfg, scene, n_frames)
    b = _run(baked, scene, n_frames)
    assert np.isfinite(b).all()
    err = np.abs(a - b)[..., :3] / max(np.abs(a[..., :3]).max(), 1e-6)
    assert err.mean() < 0.02, (baked.scatter_bake, err.mean())
    assert (err > 0.2).mean() < 5e-3, (baked.scatter_bake, (err > 0.2).mean())
