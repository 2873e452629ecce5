#!/usr/bin/env python
"""Benchmark: BASELINE config 5 on one TPU chip.

240x135x128 froxels, 1080p composite, cascaded dir light + 16 local lights
(8 point + 8 spot), animated-noise + height-falloff fog plus a box fog volume,
full temporal path, composite + post stack. Shadows default to the TPU-native
analytic raycast mode (shadow_mode="raycast", FULL_CONFIG); pass --map-shadows
to measure the reference's cascaded-PCF shadow-map path instead.

Measured scope matches BASELINE.json's metric ("inject + scatter + integrate +
composite"): the scene G-buffer and the shadow-map bake are precomputed (Unity
owns those passes in the reference) and the steady-state per-frame time of the
jitted froxel pipeline + composite + post is reported.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = 2.0ms / measured (>1 == beats the <2 ms/frame target). Extra
keys record the secondary scopes each round (VERDICT r2 #3/#9): frame_post_ms
(frame + the full post stack fused in ONE jit), map_ms (the cascaded-PCF
shadow-map path), ms_4k (3840x2160 composite).
"""

import dataclasses
import functools
import json
import signal
import sys
import time

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu import FULL_CONFIG, VolumetricRenderer, benchmark_scene
from volumetricrenderer_tpu.ops.noise import perlin_texture_3d
from volumetricrenderer_tpu.post import PostConfig, apply_post

TARGET_MS = 2.0


def main():
    cfg = FULL_CONFIG
    if "--small" in sys.argv:  # quick sanity on CPU
        cfg = dataclasses.replace(cfg, volume_width=40, volume_height=24,
                                  volume_depth=16, image_width=160,
                                  image_height=90, shadow_map_size=64)
    if "--map-shadows" not in sys.argv:
        # TPU-native default: analytic raycast visibility + procedural noise
        # (gather-free). --map-shadows switches to the PCF shadow-map path.
        cfg = dataclasses.replace(cfg, shadow_mode="raycast")
        scene_kw = dict(noise_mode="procedural")
    else:
        # the reference's cascaded-PCF technique for the sun via the fused
        # Pallas sampler (+ raycast local lights). shadow_mode="map" (cube/
        # spot maps for locals too) stays the gather-bound parity path.
        # Noise stays procedural: texture-mode noise is an orthogonal
        # (gather-bound, ~260 ms) axis that would drown the shadow delta.
        cfg = dataclasses.replace(cfg, shadow_mode="map_dir")
        scene_kw = dict(noise_mode="procedural")
    renderer = VolumetricRenderer(cfg)
    scene = benchmark_scene(aspect=cfg.image_width / cfg.image_height,
                            num_local_lights=16, **scene_kw)
    post_cfg = PostConfig(exposure=1.0, bloom_strength=0.15, vignette=0.2)

    state = renderer.init_state(scene.dir_lights.count)

    # Precompute the parts the engine owns in the reference.
    bake = jax.jit(lambda sc: renderer.bake_shadow_data(sc))
    shadow_data = jax.block_until_ready(bake(scene))
    gbuf = jax.jit(lambda sc: renderer.render_scene_inputs(sc))
    scene_color, view_depth = jax.block_until_ready(gbuf(scene))

    # The BASELINE metric scopes "inject + scatter + integrate + composite";
    # post-processing is measured separately below. The frame loop returns a
    # scalar probe instead of the full image: fetching a 33 MB image through
    # the axon relay costs ~30 ms/frame of pure transfer (measured), which is
    # not renderer time — a real pipeline consumes the image on-device (the
    # reference likewise renders into a GPU texture with no readback).
    @functools.partial(jax.jit, donate_argnums=0)
    def frame(state, scene, time_x, scene_color, view_depth, shadow_data):
        image, _, new_state = renderer.render_frame(
            state, scene, time_x, scene_color, view_depth, shadow_data)
        return jnp.sum(image), new_state

    @jax.jit
    def frame_image(state, scene, time_x, scene_color, view_depth, shadow_data):
        image, _, new_state = renderer.render_frame(
            state, scene, time_x, scene_color, view_depth, shadow_data)
        return image, new_state

    # Warm up / compile.
    t0 = time.perf_counter()
    probe, state = frame(state, scene, jnp.float32(0.0), scene_color,
                         view_depth, shadow_data)
    jax.block_until_ready(probe)
    compile_s = time.perf_counter() - t0

    # Steady state.
    n_warm, n_meas = 3, 20
    for i in range(n_warm):
        probe, state = frame(state, scene, jnp.float32(0.01 * i), scene_color,
                             view_depth, shadow_data)
    jax.block_until_ready(probe)

    # PIPELINED frame timing: block once per batch, not per frame. The axon
    # TPU sits behind a network relay, so a per-frame block_until_ready pays
    # a ~20 ms host<->relay round trip that is tunnel latency, not renderer
    # time (measured: per-frame-sync 35 ms vs pipelined 13.6 ms with
    # identical checksums); the reference likewise queues GPU command
    # buffers without per-frame CPU sync. The chip is also pooled: take the
    # best batch over 12 batches to reduce external-contention bias
    # (PERF.md "Measurement hygiene").
    def measure_batches(state, n_batches=12):
        means = []
        for b in range(n_batches):
            t0 = time.perf_counter()
            for i in range(n_meas):
                probe, state = frame(state, scene,
                                     jnp.float32(0.1 + 0.01 * (b * 37 + i)),
                                     scene_color, view_depth, shadow_data)
            jax.block_until_ready(probe)
            means.append((time.perf_counter() - t0) / n_meas)
        return means, state

    batch_means, state = measure_batches(state)

    # Wedged-relay guard: a wedged device/relay once returned ~0.2 ms batch
    # means with a perfectly VALID image (the checksum guard below cannot
    # catch it — the data is right, only the completion signaling is broken).
    # A genuinely executed FULL-size frame cannot beat a small fraction of
    # one per-frame-SYNC frame (which pays a ~20 ms relay round trip): if it
    # does, re-measure; if it persists, flag the estimator.
    t0 = time.perf_counter()
    for i in range(3):
        probe, state = frame(state, scene, jnp.float32(0.9 + 0.01 * i),
                             scene_color, view_depth, shadow_data)
        jax.block_until_ready(probe)
    sync_ms = (time.perf_counter() - t0) / 3 * 1e3
    timing_tag = "pipelined-best-batch-mean"
    for _ in range(2):
        if min(batch_means) * 1e3 >= 0.05 * sync_ms:
            break
        print(f"# suspect batch timing {min(batch_means)*1e3:.3f} ms vs "
              f"sync {sync_ms:.1f} ms — remeasuring", file=sys.stderr)
        batch_means, state = measure_batches(state)
    else:
        timing_tag = "pipelined-best-batch-mean-SUSPECT"

    # Self-validation: a too-good-to-be-true time with a garbage image means a
    # wedged device, not a fast renderer. DETERMINISTIC checksum: a fresh
    # state + a fixed 4-frame time sequence, so the value is comparable
    # across rounds regardless of how many measurement frames ran above
    # (the temporal history otherwise shifts it).
    st_c = renderer.init_state(scene.dir_lights.count)
    img = None
    for i in range(4):
        img, st_c = frame_image(st_c, scene, jnp.float32(0.1 * i),
                                scene_color, view_depth, shadow_data)
    checksum = float(jnp.sum(img))
    assert bool(jnp.isfinite(img).all()), "non-finite frame output"
    assert float(jnp.std(img[..., :3])) > 1e-4, "degenerate frame output"

    # Estimator: the best pipelined-batch MEAN over 12 batches — best batch
    # because the chip pool's contention only adds time (PERF.md measurement
    # hygiene); the "timing" field records the estimator for the driver.
    frame_ms = min(batch_means) * 1e3

    # vary the input per call — INCLUDING vs the warmup call: the axon relay
    # dedups identical (executable, inputs) executions (CLAUDE.md trap)
    post = jax.jit(lambda i, s: apply_post(i * s, post_cfg))
    jax.block_until_ready(post(img, jnp.float32(1.0)))
    t0 = time.perf_counter()
    for k in range(10):
        out = post(img, jnp.float32(1.0 + 1e-6 * (k + 1)))
    jax.block_until_ready(out)
    post_ms = (time.perf_counter() - t0) / 10 * 1e3

    # ---- secondary scopes (recorded every round, VERDICT r2 #3/#9) ---- #
    # Best-effort with a hard wall-clock cap: the pooled TPU occasionally
    # wedges mid-compile, and the driver MUST still get the headline JSON
    # line — each scope runs under a SIGALRM deadline and is skipped (with a
    # stderr note) on timeout or error.

    def pipelined(fn, state0, n_batches=4, n_frames=12):
        st = state0
        out = None
        for i in range(3):                     # warm
            out, st = fn(st, jnp.float32(0.31 + 0.01 * i))
        jax.block_until_ready(out)

        def batches(st, t_base):
            best = float("inf")
            for b in range(n_batches):
                t0 = time.perf_counter()
                for i in range(n_frames):
                    out, st = fn(st, jnp.float32(
                        t_base + 0.01 * (b * n_frames + i)))
                jax.block_until_ready(out)
                best = min(best, (time.perf_counter() - t0) / n_frames)
            return best, st

        best, st = batches(st, 0.5)
        if best * 1e3 < 0.5:   # wedged-relay guard (see the headline guard)
            best2, st = batches(st, 2.5)
            best = max(best, best2)
        return best * 1e3

    extra = {}

    # Global budget for ALL secondary scopes combined: the tunneled TPU can
    # wedge mid-compile for minutes (CLAUDE.md), and the headline JSON line
    # must reach the driver regardless — once the budget is spent, remaining
    # scopes are skipped loudly instead of risking the whole process being
    # killed mid-scope with nothing printed.
    scopes_t0 = time.perf_counter()
    SCOPE_BUDGET_S = 420.0

    def scope(key, thunk, deadline_s=900):
        left = SCOPE_BUDGET_S - (time.perf_counter() - scopes_t0)
        if left < 20.0:
            print(f"# scope {key} skipped: global scope budget "
                  f"({SCOPE_BUDGET_S:.0f}s) exhausted", file=sys.stderr)
            return
        deadline_s = int(min(deadline_s, left))

        def _alarm(signum, frm):
            raise TimeoutError(f"{key} exceeded {deadline_s}s")
        old = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(deadline_s)
        try:
            extra[key] = round(thunk(), 3)
        except Exception as e:  # noqa: BLE001 — best-effort secondary scope
            print(f"# scope {key} skipped: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    def run_frame_post():
        # frame + FULL post stack in one jit: the end-to-end number the
        # north star is really about (the scoped metric excludes post).
        # Packed-image chain ON PURPOSE: the planar chain
        # (render_frame_post) measured 11.7 vs 9.5 ms same-pool — XLA's
        # fusion over the materialized [H, W, 4] image beats the plane-wise
        # graph (tools/ab_frame_post.py; PERF.md round 3).
        @functools.partial(jax.jit, donate_argnums=0)
        def frame_post(state, time_x):
            image, _, new_state = renderer.render_frame(
                state, scene, time_x, scene_color, view_depth, shadow_data)
            return jnp.sum(apply_post(image, post_cfg)), new_state

        return pipelined(frame_post, state)

    def run_map():
        # the reference's cascaded-PCF dir-shadow technique (fused sampler)
        cfg_map = dataclasses.replace(cfg, shadow_mode="map_dir")
        r_map = VolumetricRenderer(cfg_map)
        shadow_map = jax.block_until_ready(
            jax.jit(lambda sc: r_map.bake_shadow_data(sc))(scene))

        @functools.partial(jax.jit, donate_argnums=0)
        def frame_map(state, time_x):
            image, _, new_state = r_map.render_frame(
                state, scene, time_x, scene_color, view_depth, shadow_map)
            return jnp.sum(image), new_state

        return pipelined(frame_map, r_map.init_state(scene.dir_lights.count))

    def run_4k():
        # 4K composite scope (zgather's multiple-of-8 cell decomposition)
        cfg_4k = dataclasses.replace(cfg, image_width=3840, image_height=2160)
        r_4k = VolumetricRenderer(cfg_4k)
        gb4k = jax.jit(lambda sc: r_4k.render_scene_inputs(sc))
        sc4k, vd4k = jax.block_until_ready(gb4k(scene))

        @functools.partial(jax.jit, donate_argnums=0)
        def frame_4k(state, time_x):
            image, _, new_state = r_4k.render_frame(
                state, scene, time_x, sc4k, vd4k, shadow_data)
            return jnp.sum(image), new_state

        return pipelined(frame_4k, r_4k.init_state(scene.dir_lights.count))

    def run_texture():
        # texture-mode noise (_WITH_NOISE wrap-trilinear, compute:51-58) at
        # the production low-rate sampling (texture_noise_subsample=4) —
        # records the VERDICT r2 #8 criterion (within ~2x of procedural;
        # full-rate texture sampling remains the ~260 ms parity cliff)
        cfg_tex = dataclasses.replace(cfg, texture_noise_subsample=4)
        r_tex = VolumetricRenderer(cfg_tex)
        scene_tex = benchmark_scene(
            aspect=cfg.image_width / cfg.image_height, num_local_lights=16,
            noise_tex=jnp.asarray(perlin_texture_3d()), noise_mode="texture")

        @functools.partial(jax.jit, donate_argnums=0)
        def frame_tex(state, time_x):
            image, _, new_state = r_tex.render_frame(
                state, scene_tex, time_x, scene_color, view_depth,
                shadow_data)
            return jnp.sum(image), new_state

        return pipelined(frame_tex, r_tex.init_state(scene.dir_lights.count))

    def run_slab1():
        # the shard_map slab pipeline on a 1-device mesh: quantifies the
        # per-shard overhead of the multi-chip path (halo overcompute rows +
        # crop; no cross-device traffic at n=1) so the linear-scaling claim
        # in BASELINE.md has a measured slab-cost anchor
        from volumetricrenderer_tpu.parallel.shard_render import \
            make_shardmap_render
        from volumetricrenderer_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(jax.devices()[:1], axis_name="y")
        # fixed engine inputs, same convention as the unsharded frame jit
        # (which closes over scene_color/view_depth as constants)
        fn = make_shardmap_render(renderer, mesh,
                                  fixed_inputs=(scene_color, view_depth))
        st = renderer.init_state(scene.dir_lights.count)

        def step(st, t):
            img, st = fn(st, scene, t)
            return jnp.sum(img), st

        return pipelined(step, st)

    def run_slabn(n):
        # n-shard slab EMULATION on the one chip (make_multislab_render):
        # the real per-shard Mosaic kernels + real neighbor-row halo
        # exchange, the n shards run SEQUENTIALLY — so this number is
        # ~n x each chip's per-frame work at n-way sharding (the only thing
        # it can't measure is the ICI latency of the 2*halo-row exchange,
        # ~2.5 MB/frame). BASELINE.md's scaling claim quotes total/n.
        from volumetricrenderer_tpu.parallel.shard_render import \
            make_multislab_render
        ihb = cfg.image_height // n
        sc_b = [scene_color[j * ihb:(j + 1) * ihb] for j in range(n)]
        vd_b = [view_depth[j * ihb:(j + 1) * ihb] for j in range(n)]
        # fixed engine inputs — the same constant-folding convention as the
        # unsharded frame jit and run_slab1, so the per-shard number is
        # comparable (shard_render.make_multislab_render docstring)
        fn = make_multislab_render(renderer, n, fixed_inputs=(sc_b, vd_b))
        carry = fn.init_carry(scene.dir_lights.count)

        def step(carry, t):
            bands, carry = fn(carry, scene, t)
            # all n shard dispatches precede the last band in program
            # order; blocking on it blocks the frame
            return bands[-1], carry

        return pipelined(step, carry)

    if "--headline-only" not in sys.argv:
        scope("frame_post_ms", run_frame_post)
    if ("--small" not in sys.argv and "--map-shadows" not in sys.argv
            and "--headline-only" not in sys.argv):
        scope("map_ms", run_map)
        scope("ms_4k", run_4k)
        scope("tex_ms", run_texture)
        scope("slab1_ms", run_slab1)
        scope("slab3_seq_ms", lambda: run_slabn(3))
        # 5-shard point on the same curve: slab5_seq_ms / 5 is the measured
        # per-chip frame time on a 5-chip v5e ring (135 = 27*5 froxel rows,
        # 1080 = 216*5 image rows — both divide exactly)
        scope("slab5_seq_ms", lambda: run_slabn(5))

    print(json.dumps({
        "metric": "ms/frame (inject+scatter+integrate+composite) at "
                  f"{cfg.image_width}x{cfg.image_height}, "
                  f"{cfg.volume_width}x{cfg.volume_height}x{cfg.volume_depth} froxels, 16 lights",
        "value": round(frame_ms, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / frame_ms, 3),
        "timing": timing_tag,
        **extra,
    }))
    print(f"# best={frame_ms:.3f}ms post={post_ms:.3f}ms "
          f"extra={extra} compile={compile_s:.1f}s "
          f"checksum={checksum:.1f} device={jax.devices()[0].device_kind}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
