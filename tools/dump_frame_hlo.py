"""Dump the compiled steady-state frame HLO and account for the copy glue.

The device trace (tools/profile_trace.py) shows ~0.6 ms/frame of copy.* /
copy-done.* ops around the megakernel + composite (PERF.md "Next levers":
the copies/glue tail). This tool compiles the exact bench.py frame jit and
prints every copy/bitcast-free materialization with its shape and byte size,
so the glue can be attributed to specific state arrays instead of guessed at.

Usage: python tools/dump_frame_hlo.py [--all]  (needs the TPU backend for
the production kernel eligibility; compile only, nothing is executed)
"""

import functools
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu import FULL_CONFIG, VolumetricRenderer
from volumetricrenderer_tpu.models.scene import benchmark_scene


def nbytes(shape_str: str) -> int:
    m = re.match(r"(bf16|f32|f16|s32|u32|pred|s8|u8)\[([0-9,]*)\]", shape_str)
    if not m:
        return 0
    sizes = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
             "s8": 1, "u8": 1}
    dims = [int(x) for x in m.group(2).split(",") if x]
    n = sizes[m.group(1)]
    for d in dims:
        n *= d
    return n


def main():
    cfg = FULL_CONFIG
    import dataclasses
    cfg = dataclasses.replace(cfg, shadow_mode="raycast")
    renderer = VolumetricRenderer(cfg)
    scene = benchmark_scene(aspect=cfg.image_width / cfg.image_height,
                            num_local_lights=16, noise_mode="procedural")
    state = renderer.init_state(scene.dir_lights.count)
    shadow_data = renderer.bake_shadow_data(scene)
    scene_color, view_depth = renderer.render_scene_inputs(scene)

    @functools.partial(jax.jit, donate_argnums=0)
    def frame(state, scene, time_x, scene_color, view_depth, shadow_data):
        image, _, new_state = renderer.render_frame(
            state, scene, time_x, scene_color, view_depth, shadow_data)
        return jnp.sum(image), new_state

    # steady-state input STRUCTURE: run frame 0 abstractly (eval_shape) to
    # get the planar-history state layout without touching the device
    st1 = jax.eval_shape(lambda s: frame(s, scene, jnp.float32(0.0),
                                         scene_color, view_depth,
                                         shadow_data)[1], state)
    lowered = frame.lower(st1, scene, jnp.float32(0.1), scene_color,
                          view_depth, shadow_data)
    print("lowered; compiling...", file=sys.stderr)
    compiled = lowered.compile()
    txt = compiled.as_text()

    copies = []
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"%?([a-zA-Z0-9_.-]+) = ([a-z0-9]+\[[0-9,]*\][^ ]*) "
                     r"(copy|copy-start|copy-done)\((.*)$", ls)
        if m:
            copies.append((nbytes(m.group(2)), m.group(1), m.group(2),
                           m.group(4)[:90]))
    copies.sort(reverse=True)
    total = sum(c[0] for c in copies)
    print(f"# {len(copies)} copy ops, {total / 1e6:.1f} MB total")
    for nb, name, shape, arg in copies[:60]:
        print(f"{nb / 1e6:9.2f} MB  {name:24s} {shape:28s} <- {arg}")

    if "--all" in sys.argv:
        out = "/tmp/frame_hlo.txt"
        with open(out, "w") as f:
            f.write(txt)
        print(f"full HLO -> {out}")


if __name__ == "__main__":
    main()
