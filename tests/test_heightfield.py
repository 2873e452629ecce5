"""Procedural heightfield occluder: ray queries, oracle parity, kernel parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry, Medium,
                                    PointLights, RenderConfig, Scene,
                                    VolumetricRenderer)
from volumetricrenderer_tpu.ops import raycast

HF = dict(amp=2.0, base=-0.3, tiling=(0.05, 0.05), offset=(0.0, 0.0),
          albedo=(0.3, 0.35, 0.25))


def _geom(**hf_over):
    return Geometry.create(
        planes=[((0.0, 1.0, 0.0), 2.0, (0.2, 0.2, 0.2))],  # floor at y=-2
        heightfield={**HF, **hf_over})


def test_intersect_hits_terrain_surface():
    geom = _geom()
    # straight-down rays from above the band hit y = h(x, z) exactly
    xs = jnp.linspace(-20.0, 20.0, 16)
    origins = jnp.stack([xs, jnp.full_like(xs, 10.0), xs * 0.7], axis=-1)
    dirs = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), origins.shape)
    t, albedo, normal = jax.jit(lambda o, d: raycast.intersect(geom, o, d))(
        origins, dirs)
    hit_y = 10.0 - np.asarray(t)
    h = np.asarray(raycast.heightfield_height(geom, origins[:, 0],
                                              origins[:, 2]))
    np.testing.assert_allclose(hit_y, h, atol=2e-3)
    assert (np.asarray(normal)[:, 1] > 0.5).all()      # upward-facing terrain
    np.testing.assert_allclose(
        np.asarray(albedo), np.broadcast_to(HF["albedo"], (16, 3)), atol=1e-6)


def test_occluded_band_cases():
    geom = _geom()
    pts = jnp.asarray([
        [0.0, -1.0, 0.0],    # below terrain min+... inside the hill body
        [0.0, 8.0, 0.0],     # above the band
        [0.0, 8.0, 5.0],
    ])
    up = jnp.asarray([0.0, 1.0, 0.0])
    occ_up = np.asarray(jax.jit(
        lambda p: raycast.occluded(geom, p, up, jnp.float32(100.0)))(pts))
    assert occ_up[0] == 1.0      # starts inside the terrain: occluded
    assert occ_up[1] == 0.0      # ascending from above the band: clear
    down = jnp.asarray([0.0, -1.0, 0.0])
    occ_down = np.asarray(jax.jit(
        lambda p: raycast.occluded(geom, p, down, jnp.float32(100.0)))(pts))
    assert occ_down[1] == 1.0    # descending through the band: hits terrain


def test_occluded_include_flag():
    geom = _geom()
    pts = jnp.asarray([[0.0, -1.0, 0.0]])
    up = jnp.asarray([0.0, 1.0, 0.0])
    occ = np.asarray(raycast.occluded(geom, pts, up, jnp.float32(100.0),
                                      include_heightfield=False))
    assert occ[0] == 0.0         # heightfield skipped, floor is below


CFG = RenderConfig(volume_width=20, volume_height=12, volume_depth=16,
                   image_width=64, image_height=36, shadow_mode="raycast",
                   composite_impl="xla", reproj_impl="gather",
                   heightfield_local_shadows=True)


def _scene():
    return Scene.create(
        camera=Camera.create(position=(-0.4, 4.0, -15.8),
                             forward=(0.1, -0.1, 1.0), aspect=64 / 36),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1, 1, 1)], intensity=[2.0],
            has_shadow=[True]),
        point_lights=PointLights.create(
            position=[(-2.0, 5.0, 2.0)], color=[(1.0, 0.4, 0.2)],
            intensity=[7.0], range=[25.0], has_shadow=[True]),
        media=(Medium.create(scattering_color=(1, 1, 1), absorption=0.19,
                             phase_g=0.3),),
        geometry=_geom())


def test_oracle_parity_with_heightfield():
    from oracle import adapter, oracle
    scene = _scene()
    r = VolumetricRenderer(CFG)
    state = r.init_state(1)
    img, aux, _ = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0))(state, scene)

    inp = adapter.to_oracle_input(CFG, scene, state, None, None, None,
                                  aux["scene_color"], aux["view_depth"], 0.0)
    ref = oracle.render_frame_oracle(inp)
    for key in ("shadow", "scatter", "accumulation"):
        np.testing.assert_allclose(np.asarray(aux[key]), np.asarray(ref[key]),
                                   atol=1.5e-3, err_msg=key)


def test_pallas_kernels_match_xla_with_heightfield():
    # cheap hf params (4 steps, 1 octave): interpret-mode Pallas executes each
    # march step as Python-level ops, and the full-size march made this test
    # take >40 min; the code path is identical, only the unroll count shrinks
    scene = _scene()
    scene = dataclasses.replace(
        scene, geometry=_geom(steps=4, octaves=1))
    base = dataclasses.replace(CFG, composite_impl="tentmm",
                               reproj_impl="windowed")
    fused = dataclasses.replace(base, scatter_impl="pallas",
                                dir_shadow_impl="pallas")

    def run(cfg):
        r = VolumetricRenderer(cfg)
        _, aux, _ = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0))(
            r.init_state(1), scene)
        return aux

    aux_x = run(base)
    aux_p = run(fused)
    for key in ("shadow", "scatter"):
        a = np.asarray(aux_x[key])
        b = np.asarray(aux_p[key])
        rel = np.abs(a - b) / (1.0 + np.abs(a))
        assert (rel > 1e-4).mean() < 2e-3, (key, rel.max())
