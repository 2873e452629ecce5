"""A/B the planar vs packed frame+post chain in one process (same pool
state). Usage: python tools/ab_frame_post.py"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def pipelined(fn, state0, n_batches=4, n_frames=12):
    st = state0
    out = None
    for i in range(3):
        out, st = fn(st, jnp.float32(0.31 + 0.01 * i))
    jax.block_until_ready(out)
    best = float("inf")
    for b in range(n_batches):
        t0 = time.perf_counter()
        for i in range(n_frames):
            out, st = fn(st, jnp.float32(0.5 + 0.01 * (b * n_frames + i)))
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_frames)
    return best * 1e3, float(jnp.sum(out[0]) if isinstance(out, tuple) else 0)


def main():
    from volumetricrenderer_tpu import FULL_CONFIG, VolumetricRenderer
    from volumetricrenderer_tpu.models.scene import benchmark_scene
    from volumetricrenderer_tpu.post import PostConfig, apply_post

    cfg = FULL_CONFIG
    post_cfg = PostConfig(exposure=1.0, bloom_strength=0.15, vignette=0.2)
    r = VolumetricRenderer(cfg)
    scene = benchmark_scene(aspect=cfg.image_width / cfg.image_height,
                            noise_mode="procedural")
    shadow_data = jax.block_until_ready(
        jax.jit(lambda sc: r.bake_shadow_data(sc))(scene))
    sc_col, vd = jax.block_until_ready(
        jax.jit(lambda sc: r.render_scene_inputs(sc))(scene))

    @functools.partial(jax.jit, donate_argnums=0)
    def packed(state, t):
        image, _, ns = r.render_frame(state, scene, t, sc_col, vd,
                                      shadow_data)
        return jnp.sum(apply_post(image, post_cfg)), ns

    @functools.partial(jax.jit, donate_argnums=0)
    def planar(state, t):
        out, _, ns = r.render_frame_post(state, scene, post_cfg, t,
                                         sc_col, vd, shadow_data)
        return jnp.sum(out), ns

    scp = jax.block_until_ready(jax.jit(
        lambda s: tuple(s[..., c] for c in range(3)))(sc_col))

    @functools.partial(jax.jit, donate_argnums=0)
    def planar_pre(state, t):
        out, _, ns = r.render_frame_post(state, scene, post_cfg, t,
                                         scp, vd, shadow_data)
        return jnp.sum(out), ns

    for name, fn in (("packed", packed), ("planar_pre", planar_pre),
                     ("packed2", packed), ("planar_pre2", planar_pre),
                     ("planar_slice", planar)):
        st = r.init_state(scene.dir_lights.count)
        ms, _ = pipelined(fn, st)
        print(f"{name}: {ms:.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
