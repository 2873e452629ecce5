"""Whole-volume megakernel == the pairwise-fused kernel chain
(ops/pallas/frame_fused.py vs shadow_blend + scatter + integrate_blend)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import (Camera, DirectionalLights, Geometry,
                                    Medium, PointLights, RenderConfig, Scene,
                                    SpotLights, VolumetricRenderer, froxel)
from volumetricrenderer_tpu.ops.pallas import visibility as vis_lib
from volumetricrenderer_tpu.ops.pallas.frame_fused import frame_volume_fused
from volumetricrenderer_tpu.ops.pallas.integrate_blend import \
    integrate_blend_fused
from volumetricrenderer_tpu.ops.pallas.scatter import scatter_local_pallas
from volumetricrenderer_tpu.ops.pallas.shadow_blend import \
    dir_shadow_blend_fused

GRID = (24, 16, 12)


def _scene():
    return Scene.create(
        camera=Camera.create(position=(0.2, 1.5, -8.0),
                             forward=(0.05, -0.02, 1.0), aspect=1.5),
        dir_lights=DirectionalLights.create(
            direction=[(0.3, -0.7, 0.5)], color=[(1, 1, 1)], intensity=[2.0],
            has_shadow=[True], shadow_strength=[0.8]),
        point_lights=PointLights.create(
            position=[(1.0, 3.0, 2.0), (-2.0, 1.0, 5.0)],
            color=[(1, 0.8, 0.6), (0.3, 0.5, 1.0)], range=[8.0, 6.0],
            intensity=[3.0, 2.0], has_shadow=[True, True]),
        spot_lights=SpotLights.create(
            position=[(0.0, 5.0, 0.0)], direction=[(0, -1, 0.2)],
            color=[(1, 1, 0.9)], range=[10.0], intensity=[4.0],
            spot_angle_deg=[40.0], has_shadow=[True]),
        media=(Medium.create(phase_g=0.3, noise_mode="procedural",
                             noise_tiling=(0.05, 0.05, 0.05)),),
        geometry=Geometry.create(
            planes=[((0, 1, 0), 0.0, (0.2, 0.2, 0.2))],
            spheres=[((0.0, 2.0, 3.0), 1.2, (0.5, 0.5, 0.5))],
            boxes=[((-3.0, 0.0, 1.0), (-1.0, 2.5, 3.0), (0.4, 0.4, 0.4))]))


def _chain(scene, params, v2w, prev_w2v, jitter, alpha, k, prev_sh, prev_acc,
           vis, ss):
    """The pairwise-fused reference: shadow+blend -> scatter -> int+blend."""
    shadow = dir_shadow_blend_fused(params, v2w, prev_w2v, jitter, alpha,
                                    scene.dir_lights, scene.geometry,
                                    prev_sh, GRID, k, interpret=True)
    planes = scatter_local_pallas(
        params, v2w, scene.camera.position, jitter, None, None,
        scene.point_lights, scene.spot_lights, scene.geometry, GRID,
        dir_lights=scene.dir_lights, shadow_volume=shadow,
        interpret=True, return_planes=True, media=scene.media, time_x=0.3,
        vis=vis, vis_ss=ss)
    acc = integrate_blend_fused(planes, prev_acc, jitter, params, v2w,
                                prev_w2v, alpha, GRID, k, interpret=True)
    return shadow, acc


def test_megakernel_matches_chain():
    scene = _scene()
    cam = scene.camera
    params = froxel.make_froxel_params(cam.fov_y, cam.aspect, cam.near,
                                       60.0, 2.0, GRID)
    v2w = cam.view_to_world()
    cam2 = Camera.create(position=(0.5, 1.4, -8.2), forward=(0.02, 0.0, 1.0),
                         aspect=1.5)
    prev_w2v = froxel.invert_rigid(cam2.view_to_world())
    jitter = jnp.asarray([0.25, -0.3, 0.4], jnp.float32)
    rng = np.random.default_rng(5)
    w, h, d = GRID
    prev_sh = jnp.asarray(rng.uniform(0, 1, (1, d, h, w)), jnp.float32)
    prev_acc = tuple(jnp.asarray(rng.uniform(0, 1, (d, h, w)), jnp.float32)
                     for _ in range(4))
    alpha = jnp.float32(0.7)

    for ss in (1, 2):
        vis = None
        if ss > 1:
            vis = vis_lib.bake_visibility_pallas(
                params, v2w, cam.position, jitter, scene.point_lights,
                scene.spot_lights, scene.geometry, GRID, ss, interpret=True)
        for k in (1, 2):
            ref_sh, ref_acc = _chain(scene, params, v2w, prev_w2v, jitter,
                                     alpha, k, prev_sh, prev_acc, vis, ss)
            out_sh, out_acc = frame_volume_fused(
                params, v2w, prev_w2v, jitter, alpha, scene.dir_lights,
                scene.point_lights, scene.spot_lights, scene.geometry,
                scene.media, 0.3, cam.position, prev_sh, prev_acc, GRID, k,
                vis=vis, vis_ss=ss, interpret=True)
            np.testing.assert_allclose(np.asarray(out_sh),
                                       np.asarray(ref_sh),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f"shadow ss={ss} k={k}")
            for c in range(4):
                np.testing.assert_allclose(np.asarray(out_acc[c]),
                                           np.asarray(ref_acc[c]),
                                           rtol=1e-6, atol=1e-6,
                                           err_msg=f"acc ss={ss} k={k} c={c}")


def test_renderer_megakernel_matches_xla():
    """Production-knob render_frame (megakernel) == the XLA impl set,
    multi-frame with temporal state."""
    cfg = RenderConfig(volume_width=16, volume_height=16, volume_depth=8,
                       image_width=32, image_height=32,
                       shadow_mode="raycast", scatter_impl="pallas",
                       accumulate_impl="pallas", reproj_impl="pallas",
                       dir_shadow_impl="pallas", material_impl="fused",
                       temporal_blend_alpha=0.6)
    cfg_ref = dataclasses.replace(cfg, scatter_impl="xla",
                                  accumulate_impl="xla",
                                  dir_shadow_impl="xla",
                                  material_impl="xla",
                                  reproj_impl="windowed")
    scene = _scene()

    def frames(c):
        r = VolumetricRenderer(c)
        st = r.init_state(1)
        f = jax.jit(lambda s, sc, t: r.render_frame(s, sc, t)[::2])
        img, st = f(st, scene, 0.0)
        img, st = f(st, scene, 0.1)
        img, st = f(st, scene, 0.2)
        return np.asarray(img)

    a = frames(cfg_ref)
    b = frames(cfg)
    # equivalence-class: any-hit boundaries may flip isolated texels
    rel = np.abs(a - b) / (1.0 + np.abs(a))
    assert float((rel > 1e-3).mean()) < 5e-3, (rel > 1e-3).mean()


def test_renderer_megakernel_zgather_padded_state():
    """Megakernel + zgather composite: the accumulation history round-trips
    through FrameState as PADDED planes (state.py) — frames 2+ stream the
    previous frame's padded layout straight back into the kernel. Must equal
    the pairwise-fused chain (frame_fused=False), which stores the packed
    volume."""
    from volumetricrenderer_tpu.state import packed_accumulation

    cfg = RenderConfig(volume_width=16, volume_height=15, volume_depth=8,
                       image_width=128, image_height=120,
                       shadow_mode="raycast", scatter_impl="pallas",
                       accumulate_impl="pallas", reproj_impl="pallas",
                       dir_shadow_impl="pallas", material_impl="fused",
                       composite_impl="zgather", temporal_blend_alpha=0.6,
                       raycast_shadow_subsample=2)
    cfg_ref = dataclasses.replace(cfg, frame_fused=False)
    scene = _scene()

    def frames(c):
        r = VolumetricRenderer(c)
        st = r.init_state(1)
        f = jax.jit(lambda s, sc, t: r.render_frame(s, sc, t)[::2])
        img = None
        for i in range(3):
            img, st = f(st, scene, jnp.float32(0.1 * i))
        return np.asarray(img), st

    img_ref, st_ref = frames(cfg_ref)
    img, st = frames(cfg)
    assert isinstance(st.prev_accumulation, tuple)
    from volumetricrenderer_tpu.ops.pallas.zg_composite import padded_dims
    hp, ws = padded_dims(cfg.volume_height)
    assert st.prev_accumulation[0].shape[1:] == (hp, ws)
    np.testing.assert_allclose(np.asarray(img), img_ref,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(packed_accumulation(st.prev_accumulation,
                                       (8, 15, 16))),
        np.asarray(st_ref.prev_accumulation), rtol=1e-5, atol=1e-6)


def test_inline_vis_bake_matches_input_vis():
    """Megakernel stage-0 inline visibility bake (VMEM ring on the
    inline_bake_schedule) == feeding the standalone bake's volume as input —
    bit-exact: shared bake helpers, and every (light, low-slice) pair the
    scatter reads is baked before its first read."""
    scene = _scene()
    cam = scene.camera
    params = froxel.make_froxel_params(cam.fov_y, cam.aspect, cam.near,
                                       60.0, 2.0, GRID)
    v2w = cam.view_to_world()
    cam2 = Camera.create(position=(0.5, 1.4, -8.2), forward=(0.02, 0.0, 1.0),
                         aspect=1.5)
    prev_w2v = froxel.invert_rigid(cam2.view_to_world())
    jitter = jnp.asarray([0.25, -0.3, 0.4], jnp.float32)
    rng = np.random.default_rng(7)
    w, h, d = GRID
    prev_sh = jnp.asarray(rng.uniform(0, 1, (1, d, h, w)), jnp.float32)
    prev_acc = tuple(jnp.asarray(rng.uniform(0, 1, (d, h, w)), jnp.float32)
                     for _ in range(4))
    alpha = jnp.float32(0.7)

    # bake-group sweep: group=1 (ungrouped), 3 (tail for dl % 3), 4 (the
    # production default; dl=6 at ss=2 also exercises the tail guard)
    for ss, k, bg in ((2, 2, 4), (2, 1, 1), (4, 2, 3), (2, 2, 3)):
        vis = vis_lib.bake_visibility_pallas(
            params, v2w, cam.position, jitter, scene.point_lights,
            scene.spot_lights, scene.geometry, GRID, ss, interpret=True)
        ref_sh, ref_acc = frame_volume_fused(
            params, v2w, prev_w2v, jitter, alpha, scene.dir_lights,
            scene.point_lights, scene.spot_lights, scene.geometry,
            scene.media, 0.3, cam.position, prev_sh, prev_acc, GRID, k,
            vis=vis, vis_ss=ss, interpret=True)
        out_sh, out_acc = frame_volume_fused(
            params, v2w, prev_w2v, jitter, alpha, scene.dir_lights,
            scene.point_lights, scene.spot_lights, scene.geometry,
            scene.media, 0.3, cam.position, prev_sh, prev_acc, GRID, k,
            vis=None, vis_ss=ss, inline_vis_bake=True, bake_group=bg,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(out_sh), np.asarray(ref_sh),
                                      err_msg=f"shadow ss={ss} k={k} bg={bg}")
        for c in range(4):
            np.testing.assert_array_equal(
                np.asarray(out_acc[c]), np.asarray(ref_acc[c]),
                err_msg=f"acc ss={ss} k={k} c={c} bg={bg}")


def test_inline_bake_schedule_covers_reads():
    """Every (ka, ka+1) low-slice read of every scatter step is baked at or
    before the reading step, and ring slots never alias while live — at
    every bake-group size (grouped bakes stamp `group` consecutive slices
    per step; tail slices past dl-1 are skipped in-kernel)."""
    for d, ss, k in ((128, 2, 2), (128, 2, 1), (128, 4, 2), (12, 2, 2),
                     (7, 2, 1), (128, 8, 3)):
      for group in (1, 2, 3, 4):
        dl = -(-d // ss)
        if group > dl:
            continue
        n_steps = d + k + 2
        bake_m, ring_n = vis_lib.inline_bake_schedule(d, dl, ss, k, n_steps,
                                                      group=group)
        baked_at = {}
        for j, m in enumerate(bake_m):
            if m >= 0:
                for b in range(group):
                    if m + b < dl:
                        assert (m + b) not in baked_at
                        baked_at[int(m + b)] = j
        slot_live = {}
        for zb in range(d):
            j = zb + k + 1
            ka = min(max((2 * zb - (ss - 1)) // (2 * ss), 0), dl - 1)
            for m in (ka, min(ka + 1, dl - 1)):
                assert m in baked_at and baked_at[m] <= j, (d, ss, k, zb, m)
                slot = m % ring_n
                if slot in slot_live and slot_live[slot] != m:
                    # a new slice took this slot: its bake must be later
                    # than every read of the old one we've already done
                    assert baked_at[m] >= baked_at[slot_live[slot]]
                slot_live[slot] = m
