#!/usr/bin/env python
"""Split the 4K frame cost: whole frame vs composite-only (zgather 16x16-px
cell decomposition + reassembly) vs 1080p composite-only."""
import dataclasses, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import jax, jax.numpy as jnp
from volumetricrenderer_tpu import (FULL_CONFIG, VolumetricRenderer,
                                    benchmark_scene, froxel, pipeline)

scene = benchmark_scene(aspect=16/9, num_local_lights=16,
                        noise_mode="procedural")


def frame_ms(cfg, n=20):
    r = VolumetricRenderer(cfg)
    state = r.init_state(scene.dir_lights.count)
    shadow_data = jax.block_until_ready(
        jax.jit(lambda sc: r.bake_shadow_data(sc))(scene))
    sc_col, vd = jax.block_until_ready(
        jax.jit(lambda sc: r.render_scene_inputs(sc))(scene))

    @functools.partial(jax.jit, donate_argnums=0)
    def frame(state, t):
        img, _, ns = r.render_frame(state, scene, t, sc_col, vd, shadow_data)
        return jnp.sum(img), ns
    p, state = frame(state, jnp.float32(0.0)); jax.block_until_ready(p)
    for i in range(3): p, state = frame(state, jnp.float32(0.01*i))
    jax.block_until_ready(p)
    best = 1e9
    for b in range(4):
        t0 = time.perf_counter()
        for i in range(n): p, state = frame(state, jnp.float32(0.1+0.01*(b*n+i)))
        jax.block_until_ready(p)
        best = min(best, (time.perf_counter()-t0)/n)
    return best*1e3, float(p), r, sc_col, vd, state


def composite_ms(cfg, r, sc_col, vd, n=20):
    cam = scene.camera
    params = froxel.make_froxel_params(cam.fov_y, cam.aspect, cam.near,
                                       cfg.volume_distance,
                                       cfg.depth_distribution, cfg.grid)
    import numpy as np
    rng = np.random.RandomState(3)
    d, h, w = cfg.grid_dhw
    acc = jnp.asarray(rng.rand(d, h, w, 4).astype(np.float32))

    @jax.jit
    def comp(acc, s):
        a = acc * s
        img = pipeline.composite(cfg, params, a, sc_col, vd,
                                 planes=tuple(a[..., c] for c in range(4)))
        return jnp.sum(img)
    jax.block_until_ready(comp(acc, jnp.float32(1.0)))
    best = 1e9
    for b in range(4):
        t0 = time.perf_counter()
        for i in range(n):
            p = comp(acc, jnp.float32(1.0 + 1e-6*(b*n+i+1)))
        jax.block_until_ready(p)
        best = min(best, (time.perf_counter()-t0)/n)
    return best*1e3, float(p)


cfg1 = dataclasses.replace(FULL_CONFIG, shadow_mode="raycast")
cfg4 = dataclasses.replace(cfg1, image_width=3840, image_height=2160)

ms, p, r1, sc1, vd1, _ = frame_ms(cfg1)
print(f"frame 1080p        {ms:8.3f} ms  probe={p:.1f}", flush=True)
cms, cp = composite_ms(cfg1, r1, sc1, vd1)
print(f"composite 1080p    {cms:8.3f} ms  probe={cp:.1f}", flush=True)
ms4, p4, r4, sc4, vd4, _ = frame_ms(cfg4)
print(f"frame 4K           {ms4:8.3f} ms  probe={p4:.1f}", flush=True)
cms4, cp4 = composite_ms(cfg4, r4, sc4, vd4)
print(f"composite 4K       {cms4:8.3f} ms  probe={cp4:.1f}", flush=True)
