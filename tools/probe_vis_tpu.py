#!/usr/bin/env python
"""TPU probe: fused scatter with baked visibility (ss=2) vs in-kernel march."""
import dataclasses, time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from volumetricrenderer_tpu import FULL_CONFIG, VolumetricRenderer, benchmark_scene

def run(tag, cfg, scene, n=10):
    r = VolumetricRenderer(cfg)
    state = r.init_state(max(scene.dir_lights.count, 1))
    shadow_data = jax.block_until_ready(jax.jit(lambda sc: r.bake_shadow_data(sc))(scene))
    sc_col, vd = jax.block_until_ready(jax.jit(lambda sc: r.render_scene_inputs(sc))(scene))
    @jax.jit
    def frame(state, scene, t):
        img, _, ns = r.render_frame(state, scene, t, sc_col, vd, shadow_data)
        return img, ns
    t0 = time.perf_counter()
    img, state = frame(state, scene, jnp.float32(0.0))
    jax.block_until_ready(img)
    comp = time.perf_counter() - t0
    for i in range(3):
        img, state = frame(state, scene, jnp.float32(0.01*i))
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for i in range(n):
        img, state = frame(state, scene, jnp.float32(0.1+0.01*i))
    jax.block_until_ready(img)
    ms = (time.perf_counter()-t0)/n*1e3
    cs = float(jnp.sum(jnp.abs(img)))
    print(f"{tag:34s} {ms:8.3f} ms  compile {comp:6.1f}s  checksum {cs:.1f}",
          flush=True)
    return np.asarray(img)

base = dataclasses.replace(FULL_CONFIG, shadow_mode="raycast")
scene = benchmark_scene(aspect=16/9, num_local_lights=16, noise_mode="procedural")
a = run("march (ss=1)", base, scene)
b = run("visvolume ss=2", dataclasses.replace(base, raycast_shadow_subsample=2), scene)
err = np.abs(a-b)[..., :3]
print("img diff: mean", err.mean(), "max", err.max(), "rel",
      err.mean()/np.abs(a[...,:3]).mean())
