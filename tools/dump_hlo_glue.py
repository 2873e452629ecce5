"""Print every non-fused copy/concat/slice/pad op in the optimized HLO of the
production STEADY-STATE frame jit (planar history), with true byte sizes —
maps the trace's copy.NNN glue tail (PERF.md "copies/glue") to the arrays
they move.

Usage: python tools/dump_hlo_glue.py  (needs the TPU; compile is cached)
"""

import functools
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from volumetricrenderer_tpu import FULL_CONFIG, VolumetricRenderer
    from volumetricrenderer_tpu.models.scene import benchmark_scene

    cfg = FULL_CONFIG
    r = VolumetricRenderer(cfg)
    scene = benchmark_scene(aspect=cfg.image_width / cfg.image_height,
                            noise_mode="procedural")
    state = r.init_state(scene.dir_lights.count)
    shadow_data = jax.jit(lambda sc: r.bake_shadow_data(sc))(scene)
    sc_col, vd = jax.jit(lambda sc: r.render_scene_inputs(sc))(scene)

    @functools.partial(jax.jit, donate_argnums=0)
    def frame(state, scene, time_x, sc, vd, sd):
        image, _, new_state = r.render_frame(state, scene, time_x, sc, vd, sd)
        return jnp.sum(image), new_state

    # run frame 0 so the state takes its steady-state (planar-history) form,
    # then lower THAT graph — frame 0's packed-history repack glue is one-off
    probe, state = frame(state, scene, jnp.float32(0.0), sc_col, vd,
                         shadow_data)
    lowered = frame.lower(state, scene, jnp.float32(0.1), sc_col, vd,
                          shadow_data)
    compiled = lowered.compile()
    txt = compiled.as_text()
    pat = re.compile(
        r"^\s*(?:ROOT )?%?([\w.-]+)\s*=\s*((?:f32|bf16|s32|u32|pred)\[[\d,]*\])\S*\s+"
        r"(copy|copy-start|concatenate|slice|pad|transpose|bitcast-convert|"
        r"dynamic-slice|dynamic-update-slice)\(",
        re.M)
    rows = []
    for m in pat.finditer(txt):
        name, shape, op = m.group(1), m.group(2), m.group(3)
        dims = re.findall(r"\d+", shape[shape.index("["):])
        size = 1
        for n in dims:
            size *= int(n)
        bytes_ = size * (2 if shape.startswith("bf16") else 4)
        rows.append((bytes_, op, name, shape))
    rows.sort(reverse=True)
    total = sum(b for b, _, _, _ in rows)
    print(f"total bytes moved by standalone glue ops: {total/1e6:.1f} MB "
          f"(~{total/1e9/0.8*1e3:.2f} ms at 800 GB/s)")
    for b, op, name, shape in rows[:50]:
        print(f"{b/1e6:10.2f} MB  {op:22s} {name:28s} {shape}")


if __name__ == "__main__":
    main()
