"""Pallas composite kernel vs the XLA gather composite (exact same trilinear)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import RenderConfig, froxel, pipeline

CFG = RenderConfig(volume_width=20, volume_height=12, volume_depth=16,
                   image_width=80, image_height=48, composite_impl="xla")


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    d, h, w = CFG.grid_dhw
    acc = jnp.asarray(rng.random((d, h, w, 4)).astype(np.float32))
    scene = jnp.asarray(rng.random((CFG.image_height, CFG.image_width, 3))
                        .astype(np.float32))
    depth = jnp.asarray((rng.random((CFG.image_height, CFG.image_width)) * 90
                         + 0.6).astype(np.float32))
    params = froxel.make_froxel_params(
        jnp.deg2rad(60.0), jnp.asarray(CFG.image_width / CFG.image_height),
        jnp.asarray(0.3), jnp.asarray(CFG.volume_distance),
        jnp.asarray(CFG.depth_distribution), CFG.grid)
    return params, acc, scene, depth


def test_pallas_composite_matches_gather():
    params, acc, scene, depth = _inputs()
    ref = np.asarray(pipeline.composite(CFG, params, acc, scene, depth))
    cfgp = dataclasses.replace(CFG, composite_impl="pallas")
    out = np.asarray(pipeline.composite(cfgp, params, acc, scene, depth))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_pallas_composite_depth_edges():
    # depths below near and beyond volume distance must clamp like the sampler
    params, acc, scene, _ = _inputs(1)
    depth = jnp.full((CFG.image_height, CFG.image_width), 0.31, jnp.float32)
    depth = depth.at[0, :].set(500.0)
    ref = np.asarray(pipeline.composite(CFG, params, acc, scene, depth))
    cfgp = dataclasses.replace(CFG, composite_impl="pallas")
    out = np.asarray(pipeline.composite(cfgp, params, acc, scene, depth))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_tentmm_composite_matches_gather():
    params, acc, scene, depth = _inputs(3)
    ref = np.asarray(pipeline.composite(CFG, params, acc, scene, depth))
    cfgt = dataclasses.replace(CFG, composite_impl="tentmm")
    out = np.asarray(jax.jit(
        lambda a, s, d: pipeline.composite(cfgt, params, a, s, d))(acc, scene, depth))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_pallas_composite_under_jit():
    params, acc, scene, depth = _inputs(2)
    cfgp = dataclasses.replace(CFG, composite_impl="pallas")
    f = jax.jit(lambda a, s, d: pipeline.composite(cfgp, params, a, s, d))
    out = np.asarray(f(acc, scene, depth))
    ref = np.asarray(pipeline.composite(CFG, params, acc, scene, depth))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
