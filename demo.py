#!/usr/bin/env python
"""Render the demo scene (the reference's VolumetricRenderer.unity) to PNGs.

Usage: python demo.py [--frames N] [--out DIR] [--small] [--debug-slice Z]
                      [--showcase] [--production]

--showcase: full post chain (bloom, DoF on the scene depth, camera motion
blur from the temporal matrices, grading, chromatic aberration, grain) with
a slowly orbiting camera — the depth/velocity effects need a moving view.
"""

import argparse
import dataclasses
import os
import time

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()   # persistent .jax_cache (utils/cache.py)

from volumetricrenderer_tpu import DEMO_CONFIG, VolumetricRenderer, demo_scene
from volumetricrenderer_tpu.ops.noise import perlin_texture_3d
from volumetricrenderer_tpu.post import PostConfig, apply_post
from volumetricrenderer_tpu.utils.debug import save_png, volume_slice


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", default="out")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--noise", action="store_true")
    ap.add_argument("--debug-slice", type=int, default=-1)
    ap.add_argument("--showcase", action="store_true")
    ap.add_argument("--production", action="store_true",
                    help="FULL_CONFIG production impl set (megakernel + "
                         "radiance/noise bake + zgather composite) at the "
                         "demo grid — visual check of the fast paths")
    ap.add_argument("--mesh-env", action="store_true",
                    help="FBX-derived tree occluders (models/tree_assets.py)")
    ap.add_argument("--scene", default=None, metavar="FILE.json",
                    help="load a declarative scene (io/scene_io.py) instead "
                         "of the built-in demo scene; save one with "
                         "--dump-scene first")
    ap.add_argument("--dump-scene", default=None, metavar="FILE.json",
                    help="write the (built-in) scene as JSON and exit")
    args = ap.parse_args()

    cfg = DEMO_CONFIG
    if args.small:
        cfg = dataclasses.replace(cfg, volume_width=80, volume_height=44,
                                  volume_depth=32, image_width=480,
                                  image_height=270, shadow_map_size=128)
    if args.production:
        cfg = dataclasses.replace(
            cfg, shadow_mode="raycast", reproj_impl="pallas",
            scatter_impl="pallas", dir_shadow_impl="pallas",
            accumulate_impl="pallas", material_impl="fused",
            composite_impl="zgather", composite_precision="high",
            raycast_shadow_subsample=2, scatter_bake="radiance",
            bake_procedural_noise=True)
    renderer = VolumetricRenderer(cfg)
    noise = perlin_texture_3d(32) if args.noise else None
    scene_post = None
    if args.scene:
        from volumetricrenderer_tpu.io.scene_io import load_scene
        scene, scene_post = load_scene(args.scene, with_post=True)
    else:
        scene = demo_scene(aspect=cfg.image_width / cfg.image_height,
                           with_noise=args.noise, noise_tex=noise,
                           mesh_env=args.mesh_env)
    if args.dump_scene:
        from volumetricrenderer_tpu.io.scene_io import save_scene
        save_scene(args.dump_scene, scene)
        print(f"wrote {args.dump_scene}")
        return
    if args.showcase:
        # the full PostProcessing-2.3.0-shaped chain incl. the round-4/5
        # effects: auto exposure (adapted luma carried across frames), lens
        # distortion, multi-scale AO, SSR, SMAA, final-pass dithering
        post = PostConfig(exposure=1.1, bloom_strength=0.25,
                          bloom_threshold=0.8, vignette=0.25,
                          chromatic_aberration=1.0, grain=0.02,
                          saturation=1.1, contrast=1.05,
                          dof_focus_distance=20.0, dof_aperture=11.0,
                          dof_max_coc=3.0, motion_blur=0.4,
                          auto_exposure=True, ae_key=0.6, ae_min_ev=-2.0,
                          ae_max_ev=2.0, smaa=True, dithering=True,
                          lens_distortion=8.0, ao_intensity=0.5,
                          ao_multiscale=True, ssr_intensity=0.5)
    else:
        post = PostConfig(exposure=1.0, vignette=0.15)
    if scene_post is not None:       # the scene file's serialized profile
        post = scene_post
    state = renderer.init_state(scene.dir_lights.count)

    @jax.jit
    def frame(state, scene, t, adapted_luma):
        from volumetricrenderer_tpu.post import (auto_exposure_step,
                                                 camera_velocity)
        image, aux, new_state = renderer.render_frame(state, scene, t)
        vd = aux["view_depth"]
        cam = scene.camera
        vel = camera_velocity(vd, cam.fov_y, cam.aspect, cam.view_to_world(),
                              state.prev_world_to_view)
        scale = None
        if post.auto_exposure:
            planes = [image[..., c] for c in range(3)]
            scale, adapted_luma = auto_exposure_step(planes, adapted_luma,
                                                     post)
        out = apply_post(image, post, view_depth=vd, velocity=vel,
                         exposure_scale=scale,
                         dither_frame=state.frame_count)
        return out, aux["accumulation"], new_state, adapted_luma

    def orbit(scene, i):
        if not args.showcase:
            return scene
        ang = 0.04 * i
        cam = scene.camera
        pos = jnp.asarray([-0.4 + 4.0 * jnp.sin(ang), 1.9,
                           -15.8 + 2.0 * (1 - jnp.cos(ang))], jnp.float32)
        return dataclasses.replace(
            scene, camera=dataclasses.replace(cam, position=pos))

    os.makedirs(args.out, exist_ok=True)
    adapted_luma = jnp.float32(1.0)       # auto-exposure eye-adaptation state
    for i in range(args.frames):
        t0 = time.perf_counter()
        rgb, acc, state, adapted_luma = frame(state, orbit(scene, i),
                                              jnp.float32(i / 20.0),
                                              adapted_luma)
        jax.block_until_ready(rgb)
        dt = (time.perf_counter() - t0) * 1e3
        path = os.path.join(args.out, f"frame_{i:03d}.png")
        save_png(path, rgb)
        print(f"{path}  {dt:.1f} ms")
        if args.debug_slice >= 0:
            sl = volume_slice(acc, args.debug_slice)
            save_png(os.path.join(args.out, f"slice_{i:03d}.png"),
                     jnp.clip(sl[..., :3] * 3.0, 0, 1))


if __name__ == "__main__":
    main()
