"""Fused Pallas local-light scatter == the XLA per-light path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry, Medium,
                                    PointLights, RenderConfig, Scene, SpotLights,
                                    VolumetricRenderer)

CFG = RenderConfig(volume_width=16, volume_height=16, volume_depth=8,
                   image_width=32, image_height=32, shadow_mode="raycast")


def _scene():
    return Scene.create(
        camera=Camera.create(position=(0.0, 2.0, -10.0), forward=(0.05, -0.02, 1),
                             aspect=1.0),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1, 1, 1)], intensity=[2.0],
            has_shadow=[True]),
        point_lights=PointLights.create(
            position=[(-2.0, 3.0, 2.0), (3.0, 1.0, 6.0)],
            color=[(1.0, 0.2, 0.2), (0.2, 1.0, 0.4)],
            intensity=[7.0, 5.0], range=[25.0, 18.0],
            has_shadow=[True, False]),
        spot_lights=SpotLights.create(
            position=[(-4.0, 5.0, 4.0)], direction=[(0.5, -0.7, 0.3)],
            color=[(1.0, 0.8, 0.1)], intensity=[6.0], range=[30.0],
            spot_angle_deg=[66.0], inner_angle_percent=[0.5],
            has_shadow=[True]),
        media=(Medium.create(phase_g=0.3),),
        geometry=Geometry.create(
            planes=[((0, 1, 0), 0.0, (0.2, 0.2, 0.2))],
            spheres=[((0.0, 2.0, 3.0), 1.2, (0.5, 0.5, 0.5))],
            boxes=[((-3.0, 0.0, 1.0), (-1.0, 2.5, 3.0), (0.4, 0.4, 0.4))]))


def test_pallas_scatter_matches_xla():
    scene = _scene()
    r_x = VolumetricRenderer(CFG)
    r_p = VolumetricRenderer(dataclasses.replace(CFG, scatter_impl="pallas"))
    _, aux_x, _ = jax.jit(lambda s, sc: r_x.render_frame(s, sc, 0.0))(
        r_x.init_state(1), scene)
    _, aux_p, _ = jax.jit(lambda s, sc: r_p.render_frame(s, sc, 0.0))(
        r_p.init_state(1), scene)
    a = np.asarray(aux_x["scatter"])
    b = np.asarray(aux_p["scatter"])
    rel = np.abs(a - b) / (1.0 + np.abs(a))
    # shadow-ray any-hit boundaries are step functions; allow isolated flips
    assert (rel > 1e-4).mean() < 2e-3, rel.max()
    np.testing.assert_allclose(b[..., 3], a[..., 3], atol=1e-6)  # extinction


def test_pallas_scatter_no_lights_falls_back():
    scene = _scene()
    scene = dataclasses.replace(scene, point_lights=PointLights.empty(),
                                spot_lights=SpotLights.empty())
    r_p = VolumetricRenderer(dataclasses.replace(CFG, scatter_impl="pallas"))
    img, _, _ = jax.jit(lambda s, sc: r_p.render_frame(s, sc, 0.0))(
        r_p.init_state(1), scene)
    assert np.isfinite(np.asarray(img)).all()


def test_pallas_scatter_no_dir_lights_matches_xla():
    """n_dir == 0 branch: local lights only — the kernel takes the 1-deep
    dummy shadow placeholder (constant index map, nothing streamed) and must
    still match the XLA path."""
    scene = dataclasses.replace(_scene(), dir_lights=DirectionalLights.empty())
    r_x = VolumetricRenderer(CFG)
    r_p = VolumetricRenderer(dataclasses.replace(CFG, scatter_impl="pallas"))
    _, aux_x, _ = jax.jit(lambda s, sc: r_x.render_frame(s, sc, 0.0))(
        r_x.init_state(0), scene)
    _, aux_p, _ = jax.jit(lambda s, sc: r_p.render_frame(s, sc, 0.0))(
        r_p.init_state(0), scene)
    a = np.asarray(aux_x["scatter"])
    b = np.asarray(aux_p["scatter"])
    rel = np.abs(a - b) / (1.0 + np.abs(a))
    assert (rel > 1e-4).mean() < 2e-3, rel.max()


def test_pallas_scatter_culling_far_light_exact():
    """A light whose range sphere misses the whole volume must contribute 0
    in both paths (culling must stay conservative/exact)."""
    scene = _scene()
    far = PointLights.create(
        position=[(500.0, 500.0, 500.0), (-2.0, 3.0, 2.0)],
        color=[(1.0, 1.0, 1.0), (1.0, 0.2, 0.2)],
        intensity=[9.0, 7.0], range=[10.0, 25.0],
        has_shadow=[False, True])
    scene = dataclasses.replace(scene, point_lights=far,
                                spot_lights=SpotLights.empty())
    r_x = VolumetricRenderer(CFG)
    r_p = VolumetricRenderer(dataclasses.replace(CFG, scatter_impl="pallas"))
    _, aux_x, _ = jax.jit(lambda s, sc: r_x.render_frame(s, sc, 0.0))(
        r_x.init_state(1), scene)
    _, aux_p, _ = jax.jit(lambda s, sc: r_p.render_frame(s, sc, 0.0))(
        r_p.init_state(1), scene)
    a = np.asarray(aux_x["scatter"])
    b = np.asarray(aux_p["scatter"])
    rel = np.abs(a - b) / (1.0 + np.abs(a))
    assert (rel > 1e-4).mean() < 2e-3, rel.max()


def test_bf16_volumes_compose_with_pallas_paths():
    """volume_dtype=bfloat16 must work through every fused kernel (validated
    once on real TPU at FULL size; this pins the CPU-interpret combo)."""
    scene = _scene()
    cfg = dataclasses.replace(CFG, scatter_impl="pallas",
                              dir_shadow_impl="pallas",
                              accumulate_impl="pallas", reproj_impl="pallas",
                              volume_dtype="bfloat16")
    r = VolumetricRenderer(cfg)
    img, _, _ = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0))(
        r.init_state(1), scene)
    a = np.asarray(img)
    assert np.isfinite(a).all() and a.std() > 0.0


def test_slice_light_order_is_conservative():
    """Property: every light within range of ANY froxel center of slice z
    must appear among the slice's first `count` schedule entries."""
    import jax.numpy as jnp
    from volumetricrenderer_tpu import froxel as froxel_lib
    from volumetricrenderer_tpu.ops.pallas.scatter import slice_light_order

    cfg = CFG
    cam = _scene().camera
    params = froxel_lib.make_froxel_params(
        cam.fov_y, cam.aspect, cam.near, cfg.volume_distance,
        cfg.depth_distribution, cfg.grid)
    v2w = cam.view_to_world()
    rng = np.random.default_rng(5)
    nl = 24
    positions = jnp.asarray(rng.uniform(-60, 60, (nl, 3)), jnp.float32)
    ranges = jnp.asarray(rng.uniform(2.0, 40.0, (nl,)), jnp.float32)
    order, count = slice_light_order(params, v2w, positions, ranges, cfg.grid)
    order = np.asarray(order)[:, 0]
    count = np.asarray(count)[:, 0, 0]

    d, h, w = cfg.grid_dhw
    centers = froxel_lib.froxel_centers(cfg.grid)           # [D,H,W,3]
    world = froxel_lib.transform_points(
        v2w, froxel_lib.froxel_to_view(params, centers))
    world = np.asarray(world).reshape(d, -1, 3)
    for z in range(d):
        scheduled = set(order[z, :count[z]].tolist())
        d2 = ((world[z][:, None] - np.asarray(positions)[None]) ** 2).sum(-1)
        in_range = (d2 <= np.asarray(ranges)[None] ** 2).any(axis=0)
        for li in np.nonzero(in_range)[0]:
            assert int(li) in scheduled, (z, int(li))
