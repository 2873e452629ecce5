#!/usr/bin/env python
"""Time the batched-upsample scatter variant in the real frame."""
import dataclasses, os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from volumetricrenderer_tpu import FULL_CONFIG, VolumetricRenderer, benchmark_scene

cfg = dataclasses.replace(FULL_CONFIG, shadow_mode="raycast")
scene = benchmark_scene(aspect=16/9, num_local_lights=16, noise_mode="procedural")
r = VolumetricRenderer(cfg)
state = r.init_state(scene.dir_lights.count)
shadow_data = jax.block_until_ready(jax.jit(lambda sc: r.bake_shadow_data(sc))(scene))
sc_col, vd = jax.block_until_ready(jax.jit(lambda sc: r.render_scene_inputs(sc))(scene))
@functools.partial(jax.jit, donate_argnums=0)
def frame(state, t):
    img, _, ns = r.render_frame(state, scene, t, sc_col, vd, shadow_data)
    return jnp.sum(img), ns
p, state = frame(state, jnp.float32(0.0)); jax.block_until_ready(p)
for i in range(3): p, state = frame(state, jnp.float32(0.01*i))
jax.block_until_ready(p)
best = 1e9
for b in range(8):
    t0 = time.perf_counter()
    for i in range(20): p, state = frame(state, jnp.float32(0.1+0.01*(b*20+i)))
    jax.block_until_ready(p)
    best = min(best, (time.perf_counter()-t0)/20)
print(f"batched-upsample scatter frame {best*1e3:8.3f} ms  probe={float(p):.1f}")
