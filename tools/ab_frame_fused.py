#!/usr/bin/env python
"""A/B the whole-volume megakernel vs the pairwise-fused chain (dev tool)."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import FULL_CONFIG, VolumetricRenderer, \
    benchmark_scene


def timeit_frame(tag, cfg, scene, n=20):
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
    ms = (time.perf_counter() - t0) / n * 1e3
    ck = float(jnp.sum(jnp.abs(img)))
    print(f"{tag:42s} {ms:9.3f} ms   checksum {ck:.1f}", flush=True)


def main():
    base_cfg = dataclasses.replace(FULL_CONFIG, shadow_mode="raycast")
    scene = benchmark_scene(aspect=16 / 9, num_local_lights=16,
                            noise_mode="procedural")
    for rep in range(2):
        timeit_frame("megakernel (frame_fused=True)", base_cfg, scene)
        timeit_frame("pairwise chain (frame_fused=False)",
                     dataclasses.replace(base_cfg, frame_fused=False), scene)


if __name__ == "__main__":
    main()
