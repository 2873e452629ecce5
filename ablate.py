#!/usr/bin/env python
"""Ablation timing of the fused frame (dev tool)."""

import dataclasses
import time

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()   # persistent .jax_cache (utils/cache.py)

from volumetricrenderer_tpu import FULL_CONFIG, VolumetricRenderer, benchmark_scene
from volumetricrenderer_tpu.models.lights import PointLights, SpotLights


def timeit_frame(tag, cfg, scene, n=10):
    r = VolumetricRenderer(cfg)
    state = r.init_state(max(scene.dir_lights.count, 1))
    shadow_data = jax.block_until_ready(jax.jit(
        lambda sc: r.bake_shadow_data(sc))(scene))
    sc_col, vd = jax.block_until_ready(jax.jit(
        lambda sc: r.render_scene_inputs(sc))(scene))

    @jax.jit
    def frame(state, scene, t):
        img, _, new_state = r.render_frame(state, scene, t, sc_col, vd,
                                           shadow_data)
        return img, new_state

    img, state = frame(state, scene, jnp.float32(0.0))
    jax.block_until_ready(img)
    for i in range(3):
        img, state = frame(state, scene, jnp.float32(0.01 * i))
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for i in range(n):
        img, state = frame(state, scene, jnp.float32(0.1 + 0.01 * i))
    jax.block_until_ready(img)
    print(f"{tag:42s} {(time.perf_counter() - t0) / n * 1e3:9.3f} ms", flush=True)


def main():
    base_cfg = dataclasses.replace(FULL_CONFIG, shadow_mode="raycast")
    scene = benchmark_scene(aspect=16 / 9, num_local_lights=16,
                            noise_mode="procedural")

    timeit_frame("full", base_cfg, scene)
    timeit_frame("material=xla (unfused)", dataclasses.replace(
        base_cfg, material_impl="xla"), scene)
    timeit_frame("tentmm precision=high (3-pass)", dataclasses.replace(
        base_cfg, composite_impl="tentmm", composite_precision="high"), scene)
    timeit_frame("tentmm precision=default (1-pass)", dataclasses.replace(
        base_cfg, composite_impl="tentmm",
        composite_precision="default"), scene)
    timeit_frame("no temporal blends", dataclasses.replace(
        base_cfg, temporal_blend_shadow=False,
        temporal_blend_accumulation=False), scene)
    scene_nolocal = dataclasses.replace(
        scene, point_lights=PointLights.empty(), spot_lights=SpotLights.empty())
    timeit_frame("no local lights", base_cfg, scene_nolocal)
    scene_nonoise = dataclasses.replace(
        scene, media=(dataclasses.replace(scene.media[0], noise_mode="texture",
                                          noise_tex=None),) + scene.media[1:])
    timeit_frame("no noise", base_cfg, scene_nonoise)
    timeit_frame("composite=tentmm (mxu dots)", dataclasses.replace(
        base_cfg, composite_impl="tentmm"), scene)
    timeit_frame("composite=xla-gather", dataclasses.replace(
        base_cfg, composite_impl="xla"), scene)
    timeit_frame("reproj window k=2", dataclasses.replace(
        base_cfg, reproj_window=2), scene)
    scene_noshadowlights = dataclasses.replace(
        scene,
        point_lights=dataclasses.replace(
            scene.point_lights, has_shadow=jnp.zeros((8,), bool)),
        spot_lights=dataclasses.replace(
            scene.spot_lights, has_shadow=jnp.zeros((8,), bool)),
        dir_lights=dataclasses.replace(
            scene.dir_lights, has_shadow=jnp.zeros((1,), bool)))
    timeit_frame("lights, no shadow rays", base_cfg, scene_noshadowlights)
    from volumetricrenderer_tpu.models.lights import DirectionalLights
    scene_nodir = dataclasses.replace(scene,
                                      dir_lights=DirectionalLights.empty())
    timeit_frame("no dir light", base_cfg, scene_nodir)
    scene_nolights = dataclasses.replace(
        scene_nodir, point_lights=PointLights.empty(),
        spot_lights=SpotLights.empty())
    timeit_frame("no lights at all (material+integrate+composite)",
                 base_cfg, scene_nolights)
    timeit_frame("scatter=xla (unfused)", dataclasses.replace(
        base_cfg, scatter_impl="xla", dir_shadow_impl="xla",
        accumulate_impl="xla"), scene)
    timeit_frame("accumulate=xla (no fused integrate)", dataclasses.replace(
        base_cfg, accumulate_impl="xla"), scene)
    timeit_frame("reproj=windowed (xla warp)", dataclasses.replace(
        base_cfg, reproj_impl="windowed"), scene)


if __name__ == "__main__":
    main()
