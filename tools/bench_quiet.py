"""Sentinel-gated quiet-window probe for the slab scaling anchors.

The pooled TPU's foreign tenants inflate the multislab scopes 3-7x
(BASELINE.md); this probe re-measures a pipelined HEADLINE batch until it
reads < 1.25x the known best, then measures slab3/slab5 with a post-check
sentinel — the standalone version of bench.py's per-scope contention
sentinel. Run detached (`setsid nohup python tools/bench_quiet.py &`);
it gives up after an hour without a quiet window.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, dataclasses, functools, jax, jax.numpy as jnp
from volumetricrenderer_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from volumetricrenderer_tpu import FULL_CONFIG, VolumetricRenderer, benchmark_scene
from volumetricrenderer_tpu.parallel.shard_render import make_multislab_render

cfg = dataclasses.replace(FULL_CONFIG, shadow_mode="raycast")
r = VolumetricRenderer(cfg)
scene = benchmark_scene(aspect=16/9, num_local_lights=16, noise_mode="procedural")
sd = jax.block_until_ready(jax.jit(r.bake_shadow_data)(scene))
sc, vd = jax.block_until_ready(jax.jit(r.render_scene_inputs)(scene))

@functools.partial(jax.jit, donate_argnums=0)
def frame(state, t):
    img, _, st = r.render_frame(state, scene, t, sc, vd, sd)
    return jnp.sum(img), st

hstate = r.init_state(scene.dir_lights.count)
for i in range(3):
    p, hstate = frame(hstate, jnp.float32(0.3+0.01*i))
jax.block_until_ready(p)

def headline_batch():
    global hstate
    t0 = time.perf_counter()
    for i in range(10):
        p2, hstate = frame(hstate, jnp.float32(time.time() % 7 + 0.01*i))
    jax.block_until_ready(p2)
    return (time.perf_counter() - t0) / 10 * 1e3

def slab(n):
    ihb = cfg.image_height // n
    sc_b = [sc[j*ihb:(j+1)*ihb] for j in range(n)]
    vd_b = [vd[j*ihb:(j+1)*ihb] for j in range(n)]
    fn = make_multislab_render(r, n, fixed_inputs=(sc_b, vd_b))
    carry = fn.init_carry(scene.dir_lights.count)
    def step(carry, t):
        bands, carry = fn(carry, scene, t)
        return bands[-1], carry
    for i in range(3):
        p2, carry = step(carry, jnp.float32(0.3+0.01*i))
    jax.block_until_ready(p2)
    best = 1e9
    for b in range(8):
        t0 = time.perf_counter()
        for i in range(12):
            p2, carry = step(carry, jnp.float32(0.5+0.01*(b*12+i)))
        jax.block_until_ready(p2)
        best = min(best, (time.perf_counter()-t0)/12)
    return best * 1e3

# wait for a quiet window: headline batch < 1.25x the known best (4.74)
deadline = time.time() + 3600
quiet = False
while time.time() < deadline:
    h = headline_batch()
    print(f"sentinel {h:.2f} ms", flush=True)
    if h < 1.25 * 4.74:
        quiet = True
        break
    time.sleep(20)
if not quiet:
    print("no quiet window within budget; numbers below are CONTENDED", flush=True)
for n in (3, 5):
    s = slab(n)
    h2 = headline_batch()
    print(f"slab{n}_seq {s:.3f} ms total = {s/n:.3f}/shard (post-sentinel {h2:.2f})", flush=True)
