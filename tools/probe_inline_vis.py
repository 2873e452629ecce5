#!/usr/bin/env python
"""A/B the megakernel's inline visibility bake vs the separate bake kernel."""
import dataclasses, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from volumetricrenderer_tpu import FULL_CONFIG, VolumetricRenderer, benchmark_scene
from volumetricrenderer_tpu.ops.pallas import frame_fused as F

def run(tag, cfg, scene, n=20):
    r = VolumetricRenderer(cfg)
    state = r.init_state(scene.dir_lights.count)
    shadow_data = jax.block_until_ready(jax.jit(lambda sc: r.bake_shadow_data(sc))(scene))
    sc_col, vd = jax.block_until_ready(jax.jit(lambda sc: r.render_scene_inputs(sc))(scene))
    import functools
    @functools.partial(jax.jit, donate_argnums=0)
    def frame(state, t):
        img, _, ns = r.render_frame(state, scene, t, sc_col, vd, shadow_data)
        return jnp.sum(img), ns
    p, state = frame(state, jnp.float32(0.0)); jax.block_until_ready(p)
    for i in range(3): p, state = frame(state, jnp.float32(0.01*i))
    jax.block_until_ready(p)
    best = 1e9
    for b in range(6):
        t0 = time.perf_counter()
        for i in range(n): p, state = frame(state, jnp.float32(0.1+0.01*(b*n+i)))
        jax.block_until_ready(p)
        best = min(best, (time.perf_counter()-t0)/n)
    print(f"{tag:28s} {best*1e3:8.3f} ms  probe={float(p):.1f}", flush=True)

cfg = dataclasses.replace(FULL_CONFIG, shadow_mode="raycast")
scene = benchmark_scene(aspect=16/9, num_local_lights=16, noise_mode="procedural")
F.INLINE_VIS = False
run("separate bake kernel", cfg, scene)
F.INLINE_VIS = True
run("inline bake (VMEM ring)", cfg, scene)
