"""Frame orchestrator.

Replaces the reference's CommandBuffer frame graph (VolumetricRenderer.cs
OnPreRender/OnRenderImage, cs:85-121) with one jittable pure function:
`render_frame(state, scene, ...) -> (image, aux, new_state)`. The per-frame pass
order mirrors the reference exactly (SURVEY §3.2-3.3):

  matrices -> material volumes -> shadow maps -> shadow volume ->
  temporal shadow blend -> scatter (dir + point + spot) -> accumulate ->
  temporal accumulation blend -> composite -> save history.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu import froxel, pipeline, shadow as shadow_lib
from volumetricrenderer_tpu.config import RenderConfig
from volumetricrenderer_tpu.jitter import JITTER_SEQUENCE
from volumetricrenderer_tpu.models.scene import Scene
from volumetricrenderer_tpu.ops import raycast
from volumetricrenderer_tpu.state import FrameState


class VolumetricRenderer:
    """Owns the static config; all methods are pure and jit-friendly."""

    def __init__(self, config: RenderConfig):
        self.config = config

    def init_state(self, num_dir_lights: int = 1,
                   layout: str = "auto") -> FrameState:
        """Fresh history state.

        layout="auto" (default): when the config statically routes to the
        megakernel + zgather composite (the unsharded production path), the
        accumulation history is created directly in that path's steady-state
        layout — 4 zgather-PADDED channel planes — so frame 0 runs the SAME
        executable as every later frame. A packed frame-0 state used to (a)
        force a second full compile of the frame graph for the packed->planar
        structure switch and (b) defeat buffer donation on frame 0 (the
        packed [D, H, W, 4] input aliases none of the planar outputs — the
        BENCH_r03 donation warnings). Zero planes are identical to the packed
        zero init (the pad rows are edge-clamps of zeros).

        layout="packed": always the plain [D, H, W, 4] volume — required by
        the H-sharded slab paths, whose frame-0 halo extension shards the
        plain global rows (parallel/shard_render.py)."""
        cfg = self.config
        state = FrameState.create(cfg.grid_dhw, num_dir_lights, cfg.dtype,
                                  with_material=cfg.temporal_blend_material,
                                  with_scatter=cfg.temporal_blend_scatter)
        acc_layout = self._steady_acc_layout() if layout == "auto" else None
        if acc_layout == "padded":
            from volumetricrenderer_tpu.ops.pallas.zg_composite import (
                DLANES, padded_dims)
            hp, wstride = padded_dims(cfg.volume_height)
            planes = tuple(jnp.zeros((DLANES, hp, wstride), cfg.dtype)
                           for _ in range(4))
            state = dataclasses.replace(state, prev_accumulation=planes)
        elif acc_layout == "raw":
            d, h, w = cfg.grid_dhw
            planes = tuple(jnp.zeros((d, h, w), cfg.dtype) for _ in range(4))
            state = dataclasses.replace(state, prev_accumulation=planes)
        return state

    def _steady_planar_layout(self) -> bool:
        return self._steady_acc_layout() == "padded"

    def _steady_acc_layout(self):
        """Config-only part of the render_frame fuse_frame predicate (the
        scene-dependent terms — lights present, foldable media — hold for
        every production scene; when they don't, render_frame repacks planar
        history via state.packed_accumulation). Returns the fused path's
        steady accumulation-history layout: "padded" (zgather composite
        configs), "raw" ([D, H, W] plane tuples — fused configs whose
        composite falls back to tentmm/rowmm), or None (unfused: packed)."""
        cfg = self.config
        fused = (cfg.frame_fused
                 and cfg.temporal_blend_shadow
                 and cfg.temporal_blend_accumulation
                 and not cfg.temporal_blend_material
                 and not cfg.temporal_blend_scatter
                 and cfg.dir_shadow_impl == "pallas"
                 and cfg.reproj_impl == "pallas"
                 and cfg.scatter_impl == "pallas"
                 and cfg.accumulate_impl == "pallas"
                 and cfg.material_impl == "fused"
                 and cfg.shadow_mode == "raycast")
        if not fused:
            return None
        return "padded" if pipeline.zgather_eligible(cfg) else "raw"

    # ------------------------------------------------------------------ #

    def bake_shadow_data(self, scene: Scene):
        """Per-frame shadow-map bake (the reference relies on Unity's shadow
        pass; SPEC 'Shadow pipeline')."""
        cfg = self.config
        cam = scene.camera
        dir_shadow = cube_shadow = spot_shadow = None
        if cfg.shadow_mode == "raycast":
            return dir_shadow, cube_shadow, spot_shadow
        if scene.dir_lights.count and cfg.shadow_mode in ("map", "map_dir"):
            # pallas PCF sampling needs the camera-aligned light basis; use it
            # for all of map_dir so impl choice never changes the bake
            aligned = (cfg.dir_shadow_impl == "pallas"
                       or cfg.shadow_mode == "map_dir")
            align_up = cam.view_to_world()[:3, 1] if aligned else None
            dir_shadow = shadow_lib.bake_dir_shadows(
                scene.geometry, scene.dir_lights.direction,
                scene.dir_lights.shadow_strength, cam.position, cam.forward,
                cam.fov_y, cam.aspect, cam.near, cfg.shadow_distance,
                cfg.cascade_splits, cfg.shadow_map_size, align_up=align_up)
        if cfg.shadow_mode == "map_dir":     # local lights use raycast
            return dir_shadow, cube_shadow, spot_shadow
        if scene.point_lights.count:
            cube_shadow = shadow_lib.bake_cube_shadows(
                scene.geometry, scene.point_lights.position,
                scene.point_lights.range, scene.point_lights.shadow_strength,
                cfg.shadow_map_size)
        if scene.spot_lights.count:
            spot_shadow = shadow_lib.bake_spot_shadows(
                scene.geometry, scene.spot_lights.position,
                scene.spot_lights.direction, scene.spot_lights.spot_angle,
                scene.spot_lights.range, scene.spot_lights.shadow_strength,
                cfg.shadow_map_size)
        return dir_shadow, cube_shadow, spot_shadow

    def render_scene_inputs(self, scene: Scene) -> Tuple[jax.Array, jax.Array]:
        """Demo scene color + linear view depth (stands in for Unity's
        G-buffer / _CameraDepthTexture): analytic ray caster for the
        primitive/heightfield environment, plus — when the scene carries a
        TriMesh — the bake-time triangle rasterizer (ops/raster.py),
        depth-composited like the deferred pass composites its draws."""
        cfg = self.config
        cam = scene.camera
        dirs, _ = raycast.camera_rays(cfg.image_width, cfg.image_height,
                                      cam.fov_y, cam.aspect, cam.view_to_world())
        sun_dir = scene.dir_lights.direction[0] if scene.dir_lights.count \
            else jnp.asarray([0.0, -1.0, 0.0], jnp.float32)
        sun_color = scene.dir_lights.packed_color[0] if scene.dir_lights.count \
            else jnp.zeros((3,), jnp.float32)
        color, depth = raycast.render_scene(
            scene.geometry, cam.position, dirs, sun_dir, sun_color,
            scene.ambient, cam.far, skip_proxy_boxes=scene.mesh is not None)
        if scene.mesh is not None:
            from volumetricrenderer_tpu.ops import raster
            malb, mnrm, mdepth = raster.rasterize_mesh(
                scene.mesh, cam, cfg.image_width, cfg.image_height)
            mcolor, _ = raster.shade_mesh_gbuffer(
                malb, mnrm, mdepth, cam.position, dirs, scene.geometry,
                sun_dir, sun_color, scene.ambient)
            near = jnp.minimum(mdepth, depth)
            color = jnp.where((mdepth < depth)[..., None], mcolor, color)
            depth = jnp.minimum(near, cam.far)
        return color, depth

    # ------------------------------------------------------------------ #

    def render_frame(self, state: FrameState, scene: Scene, time_x=0.0,
                     scene_color: Optional[jax.Array] = None,
                     view_depth: Optional[jax.Array] = None,
                     shadow_data=None, slab=None,
                     _image_planes: bool = False,
                     ) -> Tuple[jax.Array, dict, FrameState]:
        """One full frame. Returns (image [H, W, 4], aux volumes, new state).

        _image_planes=True returns the image as 4 channel planes
        ((r, g, b, T), each [H, W]) instead of packed [H, W, 4] — the planar
        frame+post chain (render_frame_post) consumes these directly.

        slab (parallel/shard_render.py): when rendering an H-sharded slab,
        cfg holds the LOCAL (halo-extended) shapes and slab carries the global
        grid + this shard's row offset; all outputs cover the extended slab
        and the caller crops the halo."""
        cfg = self.config
        cam = scene.camera

        # --- CalculateMatrices (cs:176-187) ---
        view_to_world = cam.view_to_world()
        world_to_view = froxel.invert_rigid(view_to_world)
        grid_global = cfg.grid if slab is None else slab.grid_global
        params = froxel.make_froxel_params(cam.fov_y, cam.aspect, cam.near,
                                           cfg.volume_distance,
                                           cfg.depth_distribution, grid_global)
        if slab is not None:
            params = dataclasses.replace(params, y0=jnp.asarray(slab.y0,
                                                                jnp.float32))
        jitter = JITTER_SEQUENCE[state.frame_count % 7]
        # History is invalid on frame 0 (SPEC fix for the unused
        # _IsTemporalHistoryValid, helper:67).
        history_valid = (state.frame_count > 0).astype(jnp.float32)
        alpha = cfg.temporal_blend_alpha * history_valid
        prev_w2v = world_to_view if cfg.use_current_matrix_for_reproj \
            else state.prev_world_to_view

        # --- Scene inputs (G-buffer stand-in) ---
        if slab is not None:
            assert scene_color is not None and view_depth is not None, \
                "slab rendering needs pre-sharded scene inputs"
        if scene_color is None or view_depth is None:
            with jax.named_scope("gbuffer"):
                scene_color, view_depth = self.render_scene_inputs(scene)

        # --- Shadow maps (engine shadow pass stand-in; pass prebaked data to
        # scope a frame like the reference, where Unity owns the shadow pass) ---
        if shadow_data is None:
            with jax.named_scope("shadow_maps"):
                shadow_data = self.bake_shadow_data(scene)
        dir_shadow, cube_shadow, spot_shadow = shadow_data

        # --- Material volumes (OnPreRender, cs:94) ---
        with jax.named_scope("write_material_volume"):
            mat_a, mat_b = pipeline.write_material_volumes(
                cfg, params, view_to_world, jitter, time_x, scene.media)
        if cfg.temporal_blend_material:
            mat_a = pipeline.temporal_blend_material(
                cfg, params, view_to_world, prev_w2v, mat_a,
                state.prev_material_a.astype(jnp.float32), alpha)

        # --- Whole-volume megakernel (ops/pallas/frame_fused.py): when every
        # production impl knob is on, the entire shadow -> blend -> scatter ->
        # integrate -> blend phase runs as ONE staggered pallas_call — no
        # intermediate volume ever touches HBM and the launch gaps between
        # the fused kernels disappear. aux["scatter"] is unavailable on this
        # path (the scatter volume never exists).
        n_local = scene.point_lights.count + scene.spot_lights.count
        try:
            from volumetricrenderer_tpu.ops.pallas.material import \
                media_foldable
            foldable = bool(scene.media) and media_foldable(scene.media)
            if bool(scene.media) and not foldable:
                # TEXTURE-noise fold (round 5): the wrap-trilinear factor is
                # sampled at the radiance bake's low grid in XLA
                # (visibility.bake_noise_channels_xla) and rides the bake
                # channels into the megakernel — texture media no longer
                # force the whole frame off the fused path (was tex_ms
                # 10.8 vs 4.7 headline). Needs the radiance bake on (ss>1).
                foldable = (cfg.scatter_bake == "radiance"
                            and max(int(cfg.raycast_shadow_subsample), 1) > 1)
        except Exception:
            foldable = False
        fuse_frame = (cfg.frame_fused
                      and cfg.temporal_blend_shadow
                      and cfg.temporal_blend_accumulation
                      and not cfg.temporal_blend_material
                      and not cfg.temporal_blend_scatter
                      and cfg.dir_shadow_impl == "pallas"
                      and cfg.reproj_impl == "pallas"
                      and cfg.scatter_impl == "pallas"
                      and cfg.accumulate_impl == "pallas"
                      and cfg.material_impl == "fused"
                      and cfg.shadow_mode == "raycast"
                      and scene.geometry is not None
                      and scene.dir_lights.count > 0
                      and n_local > 0 and foldable)
        if fuse_frame:
            return self._render_volume_fused(
                cfg, params, state, scene, view_to_world, prev_w2v, jitter,
                alpha, time_x, mat_a, mat_b, scene_color, view_depth, slab,
                _image_planes)

        # the fused path stores accumulation history as kernel-layout planes
        # (state.py) — repack for the unfused passes (frame 0 after a config
        # switch, parity paths; the production fused path never comes here)
        if isinstance(state.prev_accumulation, (tuple, list)):
            from volumetricrenderer_tpu.state import packed_accumulation
            state = dataclasses.replace(
                state, prev_accumulation=packed_accumulation(
                    state.prev_accumulation, cfg.grid_dhw))

        # --- Shadow volume (light events, cs:376-384) + blend (cs:258) ---
        fuse_sb = (cfg.temporal_blend_shadow
                   and cfg.dir_shadow_impl == "pallas"
                   and cfg.reproj_impl == "pallas"
                   and cfg.shadow_mode == "raycast"
                   and scene.geometry is not None
                   and scene.dir_lights.count > 0)
        if fuse_sb:
            # single-pass raycast shadow + temporal blend (ops/pallas/
            # shadow_blend.py): the un-blended shadow volume never exists
            from volumetricrenderer_tpu.ops.pallas.shadow_blend import \
                dir_shadow_blend_fused
            with jax.named_scope("shadow_blend"):
                shadow_vol = dir_shadow_blend_fused(
                    params, view_to_world, prev_w2v, jitter, alpha,
                    scene.dir_lights, scene.geometry,
                    state.prev_shadow.astype(jnp.float32), cfg.grid,
                    cfg.reproj_window,
                    interpret=jax.default_backend() != "tpu")
        else:
            with jax.named_scope("write_shadow_volume"):
                shadow_vol = pipeline.write_shadow_volume_dir(
                    cfg, params, view_to_world, jitter, scene.dir_lights,
                    dir_shadow, scene.geometry)
            if cfg.temporal_blend_shadow:
                with jax.named_scope("temporal_blend_shadow"):
                    shadow_vol = pipeline.temporal_blend_shadow(
                        cfg, params, view_to_world, prev_w2v, jitter,
                        shadow_vol, state.prev_shadow.astype(jnp.float32),
                        alpha)

        # --- Scatter (cs:530-622) + optional blend ---
        with jax.named_scope("write_scatter_volume"):
            scatter, scatter_planes = pipeline.write_scatter_volume(
                cfg, params, view_to_world, cam.position, jitter, mat_a, mat_b,
                shadow_vol, scene.dir_lights, scene.point_lights,
                scene.spot_lights, cube_shadow, spot_shadow, scene.geometry,
                return_planes=True, media=scene.media, time_x=time_x)
        if cfg.temporal_blend_scatter:
            scatter = pipeline.temporal_blend_scatter(
                cfg, params, view_to_world, prev_w2v, scatter,
                state.prev_scatter.astype(jnp.float32), alpha)
            scatter_planes = None   # planes bypass the blend; use the volume

        # --- Accumulate (cs:641-647) + blend (cs:276) ---
        acc_prepadded = False
        padded_for = None
        if (cfg.temporal_blend_accumulation and slab is None
                and cfg.reproj_impl == "pallas"
                and pipeline.zgather_eligible(cfg)):
            # blend emits planes pre-padded for the zgather composite when
            # both fused paths are active (saves the XLA pad concats)
            from volumetricrenderer_tpu.ops.pallas.zg_composite import \
                padded_dims
            padded_for = padded_dims(cfg.volume_height)
            acc_prepadded = True
        fuse_ib = (cfg.temporal_blend_accumulation
                   and cfg.accumulate_impl == "pallas"
                   and cfg.reproj_impl == "pallas"
                   and scatter_planes is not None)
        if fuse_ib:
            # single-pass sample + integrate + accumulation blend
            # (ops/pallas/integrate_blend.py): the pre-blend accumulation
            # volume never exists, ~132 MB/frame of HBM glue gone
            from volumetricrenderer_tpu.ops.pallas.integrate_blend import \
                integrate_blend_fused
            prev_acc = state.prev_accumulation.astype(jnp.float32)
            with jax.named_scope("integrate_blend"):
                acc_planes = integrate_blend_fused(
                    scatter_planes,
                    tuple(prev_acc[..., c] for c in range(4)),
                    jitter, params, view_to_world, prev_w2v, alpha,
                    cfg.grid, cfg.reproj_window,
                    interpret=jax.default_backend() != "tpu",
                    padded_out=padded_for)
            d_, h_, w_ = cfg.grid_dhw
            un = [o[:d_, 1:h_ + 1, 1:w_ + 1] for o in acc_planes] \
                if acc_prepadded else list(acc_planes)
            accumulation = jnp.concatenate(
                [jnp.stack(un[:3], axis=-1), un[3][..., None]], axis=-1)
        else:
            with jax.named_scope("accumulate"):
                accumulation, acc_planes = pipeline.accumulate(
                    cfg, params, jitter, scatter, planes=scatter_planes,
                    return_planes=True)
            if cfg.temporal_blend_accumulation:
                with jax.named_scope("temporal_blend_accumulation"):
                    accumulation, acc_planes = \
                        pipeline.temporal_blend_accumulation(
                            cfg, params, view_to_world, prev_w2v,
                            accumulation,
                            state.prev_accumulation.astype(jnp.float32),
                            alpha, planes=acc_planes, return_planes=True,
                            padded_for=padded_for)

        # --- Composite (cs:118, shader:69-93) ---
        with jax.named_scope("composite"):
            image = pipeline.composite(cfg, params, accumulation, scene_color,
                                       view_depth, slab=slab,
                                       planes=acc_planes,
                                       planes_prepadded=acc_prepadded,
                                       return_planes=_image_planes)

        # --- SaveHistory (cs:285-299) — free: new state carries the volumes.
        # Histories whose blends are off are not stored (None): a dead
        # [D, H, W, 4] store costs ~1 ms/frame of HBM writes at FULL size. ---
        dt = cfg.dtype
        new_state = FrameState(
            prev_shadow=shadow_vol.astype(dt),
            prev_material_a=mat_a.astype(dt)
            if cfg.temporal_blend_material else None,
            prev_scatter=scatter.astype(dt)
            if cfg.temporal_blend_scatter else None,
            prev_accumulation=accumulation.astype(dt),
            prev_world_to_view=world_to_view,
            frame_count=state.frame_count + 1,
        )
        aux = dict(material_a=mat_a, material_b=mat_b, shadow=shadow_vol,
                   scatter=scatter, accumulation=accumulation,
                   scene_color=scene_color, view_depth=view_depth)
        return image, aux, new_state

    # ------------------------------------------------------------------ #

    def _render_volume_fused(self, cfg, params, state, scene, view_to_world,
                             prev_w2v, jitter, alpha, time_x, mat_a, mat_b,
                             scene_color, view_depth, slab,
                             _image_planes: bool = False):
        """render_frame tail for the whole-volume megakernel path (see the
        fuse_frame eligibility in render_frame)."""
        from volumetricrenderer_tpu.ops.pallas.frame_fused import \
            frame_volume_fused

        interp = jax.default_backend() != "tpu"
        d_, h_, w_ = cfg.grid_dhw
        is_slab = h_ != params.grid[1]

        ss = max(int(cfg.raycast_shadow_subsample), 1)
        vis = None
        inline_bake = False
        radiance = cfg.scatter_bake == "radiance" and bool(scene.media)
        # Slabs bake too: every helper is slab-generic (bake_world_planes /
        # low_slice_active read params.y0; the upsample matrices live in the
        # LOCAL row frame). With h_loc and the halo both even, the slab's
        # low grid is phase-aligned with the unsharded one; the only
        # semantic difference is tent clamp-to-edge at slab borders, which
        # lands on cropped halo rows (tests/test_shard_render.py bounds it).
        # texture-noise media: their factor channels must be sampled in XLA
        # (no in-kernel gather) at the bake grid and passed in with the
        # radiance volume — forces the vis-PASSED path (no inline bake); all
        # noise channels (procedural too) then come from XLA so the channel
        # order stays media order (bake_noise_channels_xla docstring)
        has_tex = any(m.noise_tex is not None and m.noise_mode != "procedural"
                      for m in scene.media)
        if ss > 1:
            from volumetricrenderer_tpu.ops.pallas import frame_fused as ffm
            if ffm.INLINE_VIS and not (has_tex and radiance):
                # visibility bakes inside the megakernel's own grid (stage 0)
                inline_bake = True
            else:
                from volumetricrenderer_tpu.ops.pallas import \
                    visibility as vis_lib
                if radiance:
                    vis = vis_lib.bake_radiance_pallas(
                        params, view_to_world, scene.camera.position, jitter,
                        scene.point_lights, scene.spot_lights, scene.geometry,
                        scene.media, time_x, cfg.grid, ss, interpret=interp,
                        heightfield_shadows=cfg.heightfield_local_shadows,
                        bake_noise=cfg.bake_procedural_noise and not has_tex)
                    if has_tex:
                        with jax.named_scope("bake_noise_tex"):
                            nz = vis_lib.bake_noise_channels_xla(
                                cfg, params, view_to_world, jitter,
                                scene.media, time_x, ss)
                        vis = jnp.concatenate([vis, nz], axis=0)
                else:
                    vis = vis_lib.bake_visibility_pallas(
                        params, view_to_world, scene.camera.position, jitter,
                        scene.point_lights, scene.spot_lights, scene.geometry,
                        cfg.grid, ss, interpret=interp,
                        heightfield_shadows=cfg.heightfield_local_shadows)

        acc_prepadded = False
        padded_for = None
        if (slab is None and pipeline.zgather_eligible(cfg)) or (
                slab is not None
                and pipeline.zgather_slab_eligible(cfg, int(slab.halo))):
            # slabs emit padded planes too: the composite reads the out-rows
            # window of the halo-extended padded plane directly (row_off),
            # and shard_render refreshes halos in the padded layout — the
            # per-frame re-pad of the 4 planes (~1.4 ms of XLA concats, the
            # dominant slab overhead) never happens
            from volumetricrenderer_tpu.ops.pallas.zg_composite import \
                padded_dims
            padded_for = padded_dims(cfg.volume_height)
            acc_prepadded = True

        # history arrives either packed [D, H, W, 4] (frame 0 / parity paths)
        # or as the previous fused frame's kernel-layout planes (state.py) —
        # the latter skips 4 strided channel slices AND the repack interleave
        prev = state.prev_accumulation
        if isinstance(prev, (tuple, list)):
            prev_planes = tuple(p.astype(jnp.float32) for p in prev)
        else:
            pa = prev.astype(jnp.float32)
            prev_planes = tuple(pa[..., c] for c in range(4))
        prev_padded = prev_planes[0].shape != (d_, h_, w_)
        with jax.named_scope("volume_fused"):
            shadow_vol, acc_planes = frame_volume_fused(
                params, view_to_world, prev_w2v, jitter, alpha,
                scene.dir_lights, scene.point_lights, scene.spot_lights,
                scene.geometry, scene.media, time_x, scene.camera.position,
                state.prev_shadow.astype(jnp.float32),
                prev_planes, prev_acc_padded=prev_padded,
                grid_whd=cfg.grid, k=cfg.reproj_window, vis=vis, vis_ss=ss,
                vis_radiance=radiance,
                bake_noise=cfg.bake_procedural_noise,
                inline_vis_bake=inline_bake,
                bake_group=cfg.inline_bake_group,
                jitter_dir=cfg.jitter_dir_scatter,
                heightfield_shadows=cfg.heightfield_local_shadows,
                interpret=interp, padded_out=padded_for)
        un = [o[:d_, 1:h_ + 1, 1:w_ + 1] for o in acc_planes] \
            if acc_prepadded else list(acc_planes)
        accumulation = jnp.concatenate(
            [jnp.stack(un[:3], axis=-1), un[3][..., None]], axis=-1)

        with jax.named_scope("composite"):
            image = pipeline.composite(cfg, params, accumulation, scene_color,
                                       view_depth, slab=slab,
                                       planes=acc_planes,
                                       planes_prepadded=acc_prepadded,
                                       return_planes=_image_planes)

        dt = cfg.dtype
        # keep accumulation history in the kernels' own layout (planes, padded
        # when the zgather composite is on): next frame streams them straight
        # back into the megakernel — no channel interleave, no strided slices.
        # Slabs keep planar history too (unpadded planes; shard_render halos
        # each plane along its H axis) — the packed [D, H, W, 4] interleave
        # was ~1 ms/frame of the slab path's overhead.
        new_acc = tuple(p.astype(dt) for p in acc_planes)
        new_state = FrameState(
            prev_shadow=shadow_vol.astype(dt),
            prev_material_a=None,
            prev_scatter=None,
            prev_accumulation=new_acc,
            prev_world_to_view=froxel.invert_rigid(view_to_world),
            frame_count=state.frame_count + 1,
        )
        aux = dict(material_a=mat_a, material_b=mat_b, shadow=shadow_vol,
                   scatter=None, accumulation=accumulation,
                   scene_color=scene_color, view_depth=view_depth)
        return image, aux, new_state

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def render_frame_jit(self, state: FrameState, scene: Scene, time_x):
        image, _, new_state = self.render_frame(state, scene, time_x)
        return image, new_state

    def render_frame_post(self, state: FrameState, scene: Scene, post_cfg,
                          time_x=0.0,
                          scene_color: Optional[jax.Array] = None,
                          view_depth: Optional[jax.Array] = None,
                          shadow_data=None, velocity=None,
                          ) -> Tuple[jax.Array, dict, FrameState]:
        """Frame + full post stack in one traceable call, channel-planar
        end-to-end: the zgather composite emits screen planes and the post
        chain (post.apply_post_planes) consumes them directly — the packed
        [H, W, 4] HDR image is never materialized (the reference pays this
        as the OnRenderImage blit, VolumetricRenderer.cs:104-121, feeding
        PostProcessing 2.3.0). Returns (display rgb [H, W, 3], aux, state)."""
        from volumetricrenderer_tpu.post import apply_post_planes, _merge
        planes, aux, new_state = self.render_frame(
            state, scene, time_x, scene_color, view_depth, shadow_data,
            _image_planes=True)
        out = apply_post_planes(list(planes[:3]), post_cfg,
                                view_depth=aux["view_depth"],
                                velocity=velocity)
        return _merge(out), aux, new_state

    def render_debug_slice(self, state: FrameState, scene: Scene, z: int,
                           volume: str = "accumulation", time_x=0.0):
        """Debug composite of one froxel slice over the scene color — the
        reference's _DEBUG pass + inspector slice selector
        (VolumetricRenderer.cs:684-702, VolumetricRenderer.shader:97-130)."""
        from volumetricrenderer_tpu.utils.debug import (debug_composite,
                                                        volume_slice)
        image, aux, _ = self.render_frame(state, scene, time_x)
        vol = aux[volume]
        if vol.ndim == 4 and vol.shape[-1] == 4:
            sl = volume_slice(vol, z)
        else:  # single-channel volumes (e.g. shadow[i]) -> grayscale rgba
            sl = volume_slice(vol[0] if vol.ndim == 4 else vol, z)
            sl = jnp.stack([sl, sl, sl, jnp.ones_like(sl)], axis=-1)
        return debug_composite(aux["scene_color"], sl)
