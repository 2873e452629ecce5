#!/usr/bin/env python
"""Standalone TPU compile probe for the cascaded-PCF kernel (dev tool).

Builds synthetic aligned DirShadowData at FULL plane shape and invokes
ops/pallas/pcf_shadow.pcf_dir_shadow_pallas with interpret=False, printing
ok/FAIL — isolates Mosaic crashes from the full-frame smoke. PCF_PROBE_STAGE
env var (0..n) lets the kernel body be truncated for bisection when the
module sets _PROBE_STAGE hooks (none in production code).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import Camera, DirectionalLights, Geometry
from volumetricrenderer_tpu import froxel, shadow as shadow_lib
from volumetricrenderer_tpu.jitter import JITTER_SEQUENCE
from volumetricrenderer_tpu.ops.pallas.pcf_shadow import pcf_dir_shadow_pallas


def main():
    w, h, d = 240, 135, 16
    cam = Camera.create(position=(-0.4, 1.9, -15.8), forward=(0.1, -0.05, 1.0),
                        fov_y_deg=60.0, aspect=16 / 9, near=0.3, far=100.0)
    geom = Geometry.create(
        planes=[((0.0, 1.0, 0.0), 0.0, (0.2, 0.25, 0.2))],
        spheres=[((2.0, 2.0, 5.0), 1.5, (0.6, 0.5, 0.5))])
    lights = DirectionalLights.create(
        direction=[(0.3, -0.7, 0.5)], color=[(1, 1, 1)], intensity=[2.0],
        has_shadow=[True], shadow_strength=[0.9])
    v2w = cam.view_to_world()
    data = shadow_lib.bake_dir_shadows(
        geom, lights.direction, lights.shadow_strength, cam.position,
        cam.forward, cam.fov_y, cam.aspect, cam.near, 100.0,
        (0.067, 0.2, 0.467, 1.0), 512, align_up=v2w[:3, 1])
    params = froxel.make_froxel_params(cam.fov_y, cam.aspect, cam.near,
                                       100.0, 0.5, (w, h, d))
    jitter = JITTER_SEQUENCE[0]

    unroll = os.environ.get("PCF_UNROLL", "0") == "1"
    f = jax.jit(lambda: pcf_dir_shadow_pallas(params, v2w, jitter, lights,
                                              data, (w, h, d), unroll=unroll))
    out = np.asarray(jax.block_until_ready(f()))
    print(f"ok: shape={out.shape} mean={out.mean():.4f} "
          f"finite={np.isfinite(out).all()}")


if __name__ == "__main__":
    main()
