"""Capture a device trace of one FULL-config frame and print the top ops.

Usage: python tools/profile_trace.py [outdir]
Needs the real TPU (run without JAX_PLATFORMS override). Prints per-op device
times summed across occurrences, descending — the tool behind PERF.md's
pass-level numbers.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()   # persistent .jax_cache (utils/cache.py)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    from volumetricrenderer_tpu import FULL_CONFIG, VolumetricRenderer
    from volumetricrenderer_tpu.models.scene import benchmark_scene

    import dataclasses
    cfg = FULL_CONFIG
    if "--map-dir" in sys.argv:      # profile the cascaded-PCF sampler path
        cfg = dataclasses.replace(cfg, shadow_mode="map_dir")
        sys.argv.remove("--map-dir")
    if "--ss2" in sys.argv:          # baked-visibility local shadows
        cfg = dataclasses.replace(cfg, raycast_shadow_subsample=2)
        sys.argv.remove("--ss2")
    if "--ss4" in sys.argv:          # quarter-rate bake (quality knob)
        cfg = dataclasses.replace(cfg, raycast_shadow_subsample=4)
        sys.argv.remove("--ss4")
    if "--4k" in sys.argv:           # 4K composite scope (bench ms_4k)
        cfg = dataclasses.replace(cfg, image_width=3840, image_height=2160)
        sys.argv.remove("--4k")
    for a in list(sys.argv):         # --group=N: inline-bake batch size
        if a.startswith("--group="):
            cfg = dataclasses.replace(cfg, inline_bake_group=int(a[8:]))
            sys.argv.remove(a)
    if "--no-lights" in sys.argv:    # the zero-light frame floor
        sys.argv.remove("--no-lights")
        no_lights = True
    else:
        no_lights = False
    r = VolumetricRenderer(cfg)
    if "--texture" in sys.argv:      # texture-noise fold (bench tex_ms)
        sys.argv.remove("--texture")
        from volumetricrenderer_tpu.ops.noise import perlin_texture_3d
        scene = benchmark_scene(aspect=cfg.image_width / cfg.image_height,
                                noise_tex=jnp.asarray(perlin_texture_3d()),
                                noise_mode="texture")
    else:
        scene = benchmark_scene(aspect=cfg.image_width / cfg.image_height,
                                noise_mode="procedural")
    if no_lights:
        from volumetricrenderer_tpu.models.lights import (DirectionalLights,
                                                          PointLights,
                                                          SpotLights)
        scene = dataclasses.replace(scene,
                                    dir_lights=DirectionalLights.empty(),
                                    point_lights=PointLights.empty(),
                                    spot_lights=SpotLights.empty())
    state = r.init_state(max(scene.dir_lights.count, 1))
    # engine-owned precomputes (bench.py scoping): bake + G-buffer stay out
    # of the traced frame
    shadow_data = jax.block_until_ready(
        jax.jit(lambda sc: r.bake_shadow_data(sc))(scene))
    sc_col, vd = jax.block_until_ready(
        jax.jit(lambda sc: r.render_scene_inputs(sc))(scene))

    import functools

    multislab = 0
    for a in list(sys.argv):         # --multislab=N: n-shard emulation trace
        if a.startswith("--multislab="):
            multislab = int(a[12:])
            sys.argv.remove(a)
    if multislab:
        # profile the n-shard slab EMULATION (bench.py's slab3_seq_ms scope):
        # one shared per-shard step jit runs n times per frame — per-op sums
        # BELOW ARE n-SHARD TOTALS; divide by n for per-shard (per-chip) cost
        from volumetricrenderer_tpu.parallel.shard_render import \
            make_multislab_render
        ihb = cfg.image_height // multislab
        sc_b = [sc_col[j * ihb:(j + 1) * ihb] for j in range(multislab)]
        vd_b = [vd[j * ihb:(j + 1) * ihb] for j in range(multislab)]
        ms_fn = make_multislab_render(r, multislab, fixed_inputs=(sc_b, vd_b))
        ms_carry = ms_fn.init_carry(scene.dir_lights.count)

        def frame(carry, scene, t):
            bands, carry = ms_fn(carry, scene, t)
            return bands[-1], carry

        state = ms_carry
    elif "--slab" in sys.argv:
        # profile the shard_map slab pipeline on a 1-device mesh (the
        # multi-chip path's per-shard overhead — bench.py's slab1_ms scope)
        from volumetricrenderer_tpu.parallel.shard_render import \
            make_shardmap_render
        from volumetricrenderer_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(jax.devices()[:1], axis_name="y")
        slab_fn = make_shardmap_render(r, mesh, fixed_inputs=(sc_col, vd))

        def frame(state, scene, t):
            img, new_state = slab_fn(state, scene, t)
            return jnp.sum(img), new_state
    else:
        # donate like production (bench.py / render_frame_jit): the
        # megakernel's in-place state aliasing (frame_fused.ALIAS_STATE)
        # otherwise forces defensive copies that production never pays
        @functools.partial(jax.jit, donate_argnums=0)
        def frame(state, scene, t):
            img, _, new_state = r.render_frame(state, scene, t, sc_col, vd,
                                               shadow_data)
            return jnp.sum(img), new_state

    s, state = frame(state, scene, jnp.float32(0.0))
    jax.block_until_ready(s)

    # the pooled chip's other tenants can flood the ~1M-event trace buffer
    # and displace our frames entirely (observed: a foreign module filled two
    # consecutive captures) — retry a few short captures until jit_frame
    # module windows actually appear
    for attempt in range(4):
        with jax.profiler.trace(outdir):
            for i in range(3):
                s, state = frame(state, scene, jnp.float32(0.1 * i))
            jax.block_until_ready(s)
        path = sorted(glob.glob(f"{outdir}/plugins/profile/*/*.trace.json.gz"))[-1]
        with gzip.open(path, "rt") as f:
            trace = json.load(f)
        modprefix = ("jit_step" if multislab else
                     "jit_dispatch" if "--slab" in sys.argv else "jit_frame")
        mods = {ev.get("name", "") for ev in trace.get("traceEvents", [])
                if ev.get("ph") == "X"}
        if any(m.startswith(modprefix) for m in mods):
            break
        print(f"# capture {attempt}: no jit_frame windows "
              "(foreign tenant flooded the buffer), retrying", flush=True)
    else:
        print("FAIL: no capture contained our frames; pool too noisy")
        return

    # Keep only the device "XLA Ops" thread (the same events repeat on the
    # Modules/Steps aggregate tracks and on host threads), and only ops inside
    # OUR jit_frame module windows — the chip is pooled, so the capture also
    # contains other tenants' programs (observed: a foreign module filled a
    # whole capture with anonymous fusions). If the windows themselves carry
    # no named scopes (write_scatter_volume etc.), distrust the capture and
    # re-run on a quieter pool.
    events = trace.get("traceEvents", [])
    thread = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            thread[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")

    windows = [(ev["ts"], ev["ts"] + ev.get("dur", 0)) for ev in events
               if ev.get("ph") == "X"
               and "XLA Modules" in thread.get((ev.get("pid"), ev.get("tid")), "")
               and ev.get("name", "").startswith(modprefix)]

    durs = defaultdict(float)
    counts = defaultdict(int)
    for ev in events:
        if ev.get("ph") != "X" or "name" not in ev:
            continue
        tname = thread.get((ev.get("pid"), ev.get("tid")), "")
        if "XLA Ops" not in tname:
            continue
        ts = ev.get("ts", 0)
        if windows and not any(a <= ts <= b for a, b in windows):
            continue
        durs[ev["name"]] += ev.get("dur", 0) / 1e3 / 3.0  # us -> ms, per frame
        counts[ev["name"]] += 1

    print(f"trace: {path}")
    win_ms = sum(b - a for a, b in windows) / 1e3 / 3.0
    print(f"module-window device time: {win_ms:.3f} ms/frame "
          f"({len(windows)} windows)")
    for name, ms in sorted(durs.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms:9.3f} ms  x{counts[name]:<3d} {name}")


if __name__ == "__main__":
    main()
