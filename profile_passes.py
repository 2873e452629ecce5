#!/usr/bin/env python
"""Per-pass timing on the current default device (TPU). Not part of the test
suite — a development tool for finding the hot pass."""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()   # persistent .jax_cache (utils/cache.py)

from volumetricrenderer_tpu import FULL_CONFIG, VolumetricRenderer, benchmark_scene
from volumetricrenderer_tpu import froxel, pipeline
from volumetricrenderer_tpu.jitter import JITTER_SEQUENCE
from volumetricrenderer_tpu.ops.noise import perlin_texture_3d


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:32s} {dt:8.3f} ms")
    return out


def main():
    cfg = FULL_CONFIG
    if "--small" in sys.argv:
        cfg = dataclasses.replace(cfg, volume_width=40, volume_height=24,
                                  volume_depth=16, image_width=160,
                                  image_height=90, shadow_map_size=64)
    r = VolumetricRenderer(cfg)
    # procedural noise = the production path (texture mode wrap-samples a
    # 32^3 texture per froxel: a gather, ~240 ms at FULL size — pass
    # noise_tex=perlin_texture_3d(32), noise_mode="texture" to measure it)
    scene = benchmark_scene(aspect=cfg.image_width / cfg.image_height,
                            num_local_lights=16, noise_mode="procedural")
    cam = scene.camera
    state = r.init_state(1)

    v2w = cam.view_to_world()
    w2v = froxel.invert_rigid(v2w)
    params = froxel.make_froxel_params(cam.fov_y, cam.aspect, cam.near,
                                       cfg.volume_distance,
                                       cfg.depth_distribution, cfg.grid)
    jit_ = JITTER_SEQUENCE[0]

    sc, vd = timeit("gbuffer", jax.jit(lambda s: r.render_scene_inputs(s)), scene)
    shadow_data = timeit("bake_shadow_maps",
                         jax.jit(lambda s: r.bake_shadow_data(s)), scene)
    dir_sh, cube_sh, spot_sh = shadow_data

    mat = timeit("write_material", jax.jit(
        lambda: pipeline.write_material_volumes(cfg, params, v2w, jit_, 0.1,
                                                scene.media)))
    mat_a, mat_b = mat

    shv = timeit("write_shadow_volume", jax.jit(
        lambda ds: pipeline.write_shadow_volume_dir(
            cfg, params, v2w, jit_, scene.dir_lights, ds, scene.geometry)),
        dir_sh)

    shv2 = timeit("temporal_blend_shadow", jax.jit(
        lambda sv: pipeline.temporal_blend_shadow(
            cfg, params, v2w, w2v, jit_, sv, state.prev_shadow, 0.5)), shv)

    sca = timeit("write_scatter(17 lights)", jax.jit(
        lambda ma, mb, sv: pipeline.write_scatter_volume(
            cfg, params, v2w, cam.position, jit_, ma, mb, sv,
            scene.dir_lights, scene.point_lights, scene.spot_lights,
            cube_sh, spot_sh)), mat_a, mat_b, shv2)

    acc = timeit("accumulate(scan)", jax.jit(
        lambda s: pipeline.accumulate(cfg, params, jit_, s)), sca)

    acc2 = timeit("temporal_blend_accum", jax.jit(
        lambda a: pipeline.temporal_blend_accumulation(
            cfg, params, v2w, w2v, a, state.prev_accumulation, 0.5)), acc)

    img = timeit("composite", jax.jit(
        lambda a, c, d: pipeline.composite(cfg, params, a, c, d)), acc2, sc, vd)

    from volumetricrenderer_tpu.post import PostConfig, apply_post
    timeit("post", jax.jit(
        lambda i: apply_post(i, PostConfig(bloom_strength=0.15, vignette=0.2))), img)


if __name__ == "__main__":
    main()
