#!/usr/bin/env python
"""Measure the n-shard slab EMULATION (shard_render.make_multislab_render)
on the one TPU chip for several n: the real per-shard Mosaic kernels + real
neighbor-row halo exchange, shards run sequentially, so total/n is a MEASURED
per-chip frame time at n-way sharding (the only unmeasured piece is the ICI
latency of the 2*halo-row exchange, ~2.5 MB/frame at n=3).

Usage: python tools/slab_scale.py [n ...]   (default: 3 5)
Prints one line per n: total ms for all shards, per-shard ms, checksum.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import FULL_CONFIG, VolumetricRenderer, benchmark_scene
from volumetricrenderer_tpu.parallel.shard_render import make_multislab_render


def measure(n, renderer, scene, scene_color, view_depth,
            n_batches=6, n_frames=12):
    cfg = renderer.config
    ihb = cfg.image_height // n
    sc_b = [scene_color[j * ihb:(j + 1) * ihb] for j in range(n)]
    vd_b = [view_depth[j * ihb:(j + 1) * ihb] for j in range(n)]
    # fixed engine inputs: same constant-folding convention as the unsharded
    # frame jit / bench slab scopes (make_multislab_render docstring)
    fn = make_multislab_render(renderer, n, fixed_inputs=(sc_b, vd_b))
    carry = fn.init_carry(scene.dir_lights.count)

    def step(carry, t):
        bands, carry = fn(carry, scene, t)
        return bands[-1], carry

    out = None
    for i in range(3):
        out, carry = step(carry, jnp.float32(0.31 + 0.01 * i))
    jax.block_until_ready(out)

    best = float("inf")
    for b in range(n_batches):
        t0 = time.perf_counter()
        for i in range(n_frames):
            out, carry = step(carry, jnp.float32(
                0.5 + 0.01 * (b * n_frames + i)))
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_frames)
    checksum = float(np.asarray(out).sum())
    return best * 1e3, checksum


def main():
    ns = [int(a) for a in sys.argv[1:] if a.isdigit()] or [3, 5, 9]
    cfg = dataclasses.replace(FULL_CONFIG, shadow_mode="raycast")
    renderer = VolumetricRenderer(cfg)
    scene = benchmark_scene(aspect=cfg.image_width / cfg.image_height,
                            num_local_lights=16, noise_mode="procedural")
    scene_color, view_depth = jax.block_until_ready(
        jax.jit(renderer.render_scene_inputs)(scene))
    for n in ns:
        if cfg.volume_height % n or cfg.image_height % n:
            print(f"n={n}: skipped (grid {cfg.volume_height} rows / image "
                  f"{cfg.image_height} not divisible)", flush=True)
            continue
        t0 = time.perf_counter()
        total_ms, checksum = measure(n, renderer, scene, scene_color,
                                     view_depth)
        print(f"n={n}: total={total_ms:.3f} ms  per-shard={total_ms/n:.3f} ms"
              f"  checksum={checksum:.1f}  ({time.perf_counter()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
