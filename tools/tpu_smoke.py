#!/usr/bin/env python
"""TPU compile-smoke for the production Pallas kernels.

Every Pallas test in tests/ runs interpret-mode off-TPU, so a Mosaic
regression (VMEM scoped OOM, unsupported lowering, ...) otherwise only
surfaces at bench time as an opaque HTTP 500 from the remote compiler
(CLAUDE.md "Mosaic crash list"). This script compiles + runs each fused
kernel ON the TPU at production BLOCK shapes (full 240x135 planes — the
shapes Mosaic tiles and budgets VMEM for) but a short Z axis, checksums the
all-Pallas frame against the all-XLA frame, and exits non-zero on any
compile failure or mismatch.

Usage:
  python tools/tpu_smoke.py            # one all-Pallas frame vs all-XLA (~2 compiles)
  python tools/tpu_smoke.py --bisect   # additionally isolate per-kernel on failure

Warm .jax_cache steady state is well under 60 s; first-ever run pays the
remote Mosaic compiles.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import FULL_CONFIG, VolumetricRenderer, benchmark_scene

# Production plane shape (240 x 135), short Z: Mosaic block shapes / VMEM
# budgets are per-plane, so this exercises the real tiling cheaply.
BASE = dataclasses.replace(
    FULL_CONFIG, volume_depth=16, shadow_mode="raycast",
    reproj_impl="windowed", scatter_impl="xla", dir_shadow_impl="xla",
    accumulate_impl="xla", composite_impl="tentmm",
    # ss=1 keeps the XLA-vs-pallas frames equivalence-class (FULL_CONFIG's
    # production ss=2 changes semantics on the two paths differently); the
    # baked-visibility/radiance kernels get their own dedicated checks below
    # (scatter_bake pinned so the ss=2 cases select the intended bake)
    raycast_shadow_subsample=1, scatter_bake="vis", dir_shadow_subsample=1)

PALLAS_KNOBS = dict(reproj_impl="pallas", scatter_impl="pallas",
                    dir_shadow_impl="pallas", accumulate_impl="pallas",
                    material_impl="fused")


def run_frames(cfg, scene, n=2):
    """Two frames (frame 1 exercises the temporal-blend kernels) -> image."""
    r = VolumetricRenderer(cfg)
    state = r.init_state(scene.dir_lights.count)

    @jax.jit
    def frame(state, scene, t):
        image, _, new_state = r.render_frame(state, scene, t)
        return image, new_state

    img = None
    for i in range(n):
        img, state = frame(state, scene, jnp.float32(0.01 * i))
    return np.asarray(jax.block_until_ready(img))


def check(name, cfg, scene, ref_img, rel_tol=1e-3):
    t0 = time.perf_counter()
    try:
        img = run_frames(cfg, scene)
    except Exception as e:  # Mosaic compile failures arrive as runtime errors
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
        return False
    dt = time.perf_counter() - t0
    if not np.isfinite(img).all():
        print(f"FAIL {name}: non-finite output ({dt:.1f}s)")
        return False
    if ref_img is not None:
        rel = np.abs(img - ref_img) / (1.0 + np.abs(ref_img))
        # fast paths are equivalence-class, not bit-exact (bf16 MXU dots,
        # any-hit boundary flips): bound the mismatch mass + magnitude
        frac = float((rel > rel_tol).mean())
        if frac > 5e-3:
            print(f"FAIL {name}: {frac:.2%} of pixels off vs XLA frame "
                  f"(max rel {rel.max():.2e}, {dt:.1f}s)")
            return False
    print(f"ok   {name}: checksum={img.sum():.3f} ({dt:.1f}s)")
    return True


def check_multislab(scene, n=3, name=None, **cfg_kw):
    """Run the n-shard single-device slab EMULATION (sequential shards,
    explicit neighbor-row halo exchange — shard_render.make_multislab_render)
    on the TPU and compare against the unsharded all-Pallas frame. This is
    the only place the n>1 slab kernel shapes compile for real (the CPU
    mesh tests run interpret mode); bench.py's slab3_seq_ms times the same
    path."""
    from volumetricrenderer_tpu.parallel.shard_render import \
        make_multislab_render
    name = name or f"multislab n={n} emulation (pallas, ss=2, zgather)"
    t0 = time.perf_counter()
    try:
        cfg = dataclasses.replace(
            BASE, **PALLAS_KNOBS, raycast_shadow_subsample=2,
            scatter_bake="radiance", bake_procedural_noise=True,
            composite_impl="zgather", **cfg_kw)
        r = VolumetricRenderer(cfg)
        sc_col, vd = jax.jit(r.render_scene_inputs)(scene)
        ihb = cfg.image_height // n
        sc_b = [sc_col[j * ihb:(j + 1) * ihb] for j in range(n)]
        vd_b = [vd[j * ihb:(j + 1) * ihb] for j in range(n)]
        fn = make_multislab_render(r, n)
        carry = fn.init_carry(scene.dir_lights.count)
        img = None
        for i in range(2):
            bands, carry = fn(carry, scene, jnp.float32(0.01 * i),
                              sc_b, vd_b)
            img = np.concatenate([np.asarray(b) for b in bands], axis=0)
        ref = run_frames(cfg, scene)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
        return False
    dt = time.perf_counter() - t0
    if not np.isfinite(img).all():
        print(f"FAIL {name}: non-finite output ({dt:.1f}s)")
        return False
    # same equivalence class as the shard tests: interior rows match the
    # unsharded frame tightly for ANY slab start (the bake's slab y-phase,
    # visibility.py); only the GLOBAL top/bottom rows may differ (the
    # unsharded y-tent clamps where the slab's replicated halo interpolates)
    err = np.abs(img - ref) / max(np.abs(ref).max(), 1e-6)
    edge = 2 * (cfg.image_height // cfg.volume_height)   # 2 froxel rows
    interior = err[edge:-edge]
    if err.mean() > 5e-4 or err.max() > 0.05 or interior.max() > 2e-3:
        print(f"FAIL {name}: mean rel {err.mean():.2e} max {err.max():.2e} "
              f"interior max {interior.max():.2e} vs unsharded ({dt:.1f}s)")
        return False
    print(f"ok   {name}: checksum={img.sum():.3f} "
          f"(mean rel {err.mean():.2e}, interior max {interior.max():.2e}, "
          f"{dt:.1f}s)")
    return True


def check_shardmap_1dev(scene, name="shard_map 1-device slab (pallas)",
                        **cfg_kw):
    """Compile + run the shard_map slab pipeline on a 1-device TPU mesh and
    compare against the unsharded all-Pallas frame (equivalence-class: the
    1-shard slab only adds clamped halo rows at the global edges; with the
    ss=2 bake the slab's low grid is phase-aligned — halo=2 is even)."""
    from volumetricrenderer_tpu.parallel.shard_render import \
        make_shardmap_render
    from volumetricrenderer_tpu.parallel.sharding import make_mesh

    t0 = time.perf_counter()
    try:
        cfg = dataclasses.replace(BASE, **PALLAS_KNOBS, **cfg_kw)
        r = VolumetricRenderer(cfg)
        sc_col, vd = jax.jit(r.render_scene_inputs)(scene)
        mesh = make_mesh(jax.devices()[:1], axis_name="y")
        fn = make_shardmap_render(r, mesh)
        state = r.init_state(scene.dir_lights.count)
        img = None
        for i in range(2):
            img, state = fn(state, scene, jnp.float32(0.01 * i), sc_col, vd)
        img = np.asarray(jax.block_until_ready(img))
        ref = run_frames(cfg, scene)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
        return False
    dt = time.perf_counter() - t0
    if not np.isfinite(img).all():
        print(f"FAIL {name}: non-finite output ({dt:.1f}s)")
        return False
    rel = np.abs(img - ref) / (1.0 + np.abs(ref))
    frac = float((rel > 1e-3).mean())
    if frac > 5e-3:
        print(f"FAIL {name}: {frac:.2%} of pixels off vs unsharded "
              f"(max rel {rel.max():.2e}, {dt:.1f}s)")
        return False
    print(f"ok   {name}: checksum={img.sum():.3f} ({dt:.1f}s)")
    return True


def main():
    if jax.default_backend() != "tpu":
        print(f"FAIL: backend is {jax.default_backend()}, not tpu")
        return 1
    scene = benchmark_scene(aspect=BASE.image_width / BASE.image_height,
                            num_local_lights=16, noise_mode="procedural")

    t0 = time.perf_counter()
    ref = run_frames(BASE, scene)
    print(f"ok   xla reference frame: checksum={ref.sum():.3f} "
          f"({time.perf_counter() - t0:.1f}s)")

    ok = check("all-pallas frame", dataclasses.replace(BASE, **PALLAS_KNOBS),
               scene, ref)
    # the reference's cascaded-PCF technique: fused sampler vs the gather
    # sampler, both on map_dir (dir maps + raycast locals); same aligned bake
    ref_md = run_frames(dataclasses.replace(
        BASE, shadow_mode="map_dir", dir_shadow_impl="pallas",
        scatter_impl="pallas"), scene)
    print(f"ok   map_dir pallas frame: checksum={ref_md.sum():.3f}")
    ok &= check("map_dir gather vs pallas",
                dataclasses.replace(BASE, shadow_mode="map_dir"), scene,
                ref_md)
    # production low-rate PCF (dir_shadow_subsample=2): distinct Mosaic
    # compile (half-x/z grid) + the XLA tent/lerp upsample; finite + its own
    # checksum (low-rate shadows are not equivalence-class at this shallow
    # smoke depth — image bounds live in tests/test_pcf_pallas.py and the
    # FULL-size measurement in config.py)
    ok &= check("map_dir low-rate PCF (ssd=2)",
                dataclasses.replace(BASE, shadow_mode="map_dir",
                                    dir_shadow_impl="pallas",
                                    scatter_impl="pallas",
                                    dir_shadow_subsample=2), scene, None)
    # heightfield-occluder branch of the fused kernels (terrain march inside
    # scatter + dir-shadow; benchmark_scene has no heightfield so this is the
    # only TPU compile of that branch). Cheap march (2 lights, 4 steps,
    # 1 octave): the full-size XLA reference frame unrolls to a ~6 MB MLIR
    # graph that gets the remote compile helper SIGKILLed — the kernel branch
    # under test is identical, only the unroll counts shrink.
    from volumetricrenderer_tpu.models.geometry import Geometry
    hf_scene = benchmark_scene(aspect=BASE.image_width / BASE.image_height,
                               num_local_lights=2, noise_mode="procedural")
    hf_scene = dataclasses.replace(
        hf_scene, geometry=Geometry.create(
            planes=[((0.0, 1.0, 0.0), 0.0, (0.22, 0.26, 0.18))],
            spheres=[((4.0, 1.5, 6.0), 1.5, (0.6, 0.55, 0.5))],
            heightfield=dict(amp=2.0, base=-0.3, tiling=(0.03, 0.03),
                             steps=4, octaves=1)))
    hf_base = dataclasses.replace(BASE, heightfield_local_shadows=True)
    hf_ref = run_frames(hf_base, hf_scene)
    print(f"ok   heightfield xla frame: checksum={hf_ref.sum():.3f}")
    ok &= check("heightfield pallas vs xla",
                dataclasses.replace(hf_base, **PALLAS_KNOBS), hf_scene, hf_ref)
    # the production zgather composite kernel (exact f32 trilinear via
    # cells-as-rows take_along_axis; FULL_CONFIG default)
    ok &= check("zgather composite",
                dataclasses.replace(BASE, composite_impl="zgather"), scene,
                ref)
    # the non-default fused composite kernel (needs IH % H == 0: 1080/135).
    # rel_tol 1e-2: this kernel has a KNOWN ~2e-3 bf16 hi/lo residual vs the
    # exact-trilinear tentmm (PERF.md composite post-mortem) — the smoke pins
    # compile health + no regression past that documented envelope.
    ok &= check("pallas composite", dataclasses.replace(BASE, composite_impl="pallas"),
                scene, ref, rel_tol=1e-2)
    # the baked-visibility scatter path (ops/pallas/visibility.py): bake
    # kernel + in-kernel tent-upsample sampling. NOT equivalence-class vs the
    # in-march frame (shadow boundaries blur at 1/ss rate) — finite + its own
    # checksum only; quality bounds live in tests/test_visibility.py.
    ok &= check("visibility-volume scatter (ss=2)",
                dataclasses.replace(BASE, **PALLAS_KNOBS,
                                    raycast_shadow_subsample=2), scene, None)
    # the baked-RADIANCE variant (scatter_bake="radiance" + the baked fBm
    # factor, the production pair): the whole per-light sum + noise baked at
    # low rate, (3+Nn)-row ring + rgb accumulate inside the megakernel — a
    # distinct Mosaic compile from the per-light vis ring
    ok &= check("radiance+noise-bake scatter (ss=2)",
                dataclasses.replace(BASE, **PALLAS_KNOBS,
                                    raycast_shadow_subsample=2,
                                    scatter_bake="radiance",
                                    bake_procedural_noise=True), scene, None)
    # fractional box opacity (SPEC "Occluder opacity"): the transmittance-
    # product any-hit variant compiled for real in every consumer (dir
    # shadow, scatter march, the inline visibility bake) — XLA frame as the
    # equivalence reference (both route through the fractional evaluators)
    frac_scene = dataclasses.replace(
        hf_scene, geometry=Geometry.create(
            planes=[((0.0, 1.0, 0.0), 0.0, (0.22, 0.26, 0.18))],
            spheres=[((4.0, 1.5, 6.0), 1.5, (0.6, 0.55, 0.5))],
            boxes=[((-6.0, 0.0, 2.0), (-4.0, 4.0, 4.0), (0.4, 0.4, 0.4),
                    0.6),
                   ((2.0, 0.0, 8.0), (5.0, 5.0, 11.0), (0.4, 0.4, 0.4),
                    0.85)]))
    frac_ref = run_frames(BASE, frac_scene)
    print(f"ok   fractional-opacity xla frame: checksum={frac_ref.sum():.3f}")
    ok &= check("fractional opacity pallas vs xla",
                dataclasses.replace(BASE, **PALLAS_KNOBS), frac_scene,
                frac_ref)
    ok &= check("fractional opacity + baked vis (ss=2)",
                dataclasses.replace(BASE, **PALLAS_KNOBS,
                                    raycast_shadow_subsample=2), frac_scene,
                None)
    # mesh-rasterized G-buffer (ops/raster.py — pure-XLA scan, but the
    # shapes/layout differ enough from the froxel kernels to smoke it here;
    # measured 1.05 s steady bake at 1080p x 11.6k tris, PERF.md round 3)
    try:
        from volumetricrenderer_tpu import VolumetricRenderer, demo_scene
        from volumetricrenderer_tpu.config import RenderConfig
        cfg_m = RenderConfig(volume_width=16, volume_height=16,
                             volume_depth=8, image_width=160,
                             image_height=96, shadow_map_size=32)
        scene_m = demo_scene(aspect=160 / 96, mesh_env=True)
        r_m = VolumetricRenderer(cfg_m)
        sc_m, vd_m = jax.block_until_ready(
            jax.jit(r_m.render_scene_inputs)(scene_m))
        assert bool(jnp.isfinite(sc_m).all() & jnp.isfinite(vd_m).all())
        assert float(vd_m.min()) > 0.0
        print(f"ok   mesh-raster G-buffer: {scene_m.mesh.num_tris} tris, "
              f"depth[{float(vd_m.min()):.1f}, {float(vd_m.max()):.1f}]")
    except Exception as e:  # noqa: BLE001
        print(f"FAIL mesh-raster G-buffer: {type(e).__name__}: {e}")
        ok = False
    # 1-device shard_map of the production kernel set ON the TPU: the slab
    # variants of every Mosaic kernel (traced y0 row offsets, halo-extended
    # plane shapes) compile for real here — the CPU-mesh tests only ever run
    # them in interpret mode (VERDICT r2 weak #3)
    ok &= check_shardmap_1dev(scene)
    # the production shard config: slab-local radiance+noise bake at ss=2
    # + the slab-wise zgather composite (halo_rows branch)
    ok &= check_shardmap_1dev(
        scene, name="shard_map slab radiance+noise+zgather (ss=2)",
        raycast_shadow_subsample=2, scatter_bake="radiance",
        bake_procedural_noise=True, composite_impl="zgather")
    # n=3 multislab emulation ON the TPU: real n>1 slab kernels (45-row
    # shards, padded persistent halos, REAL neighbor-row exchange) vs the
    # unsharded frame — the CPU shard tests only ever run interpret mode
    ok &= check_multislab(scene, n=3)

    if not ok and "--bisect" in sys.argv:
        for knob, val in PALLAS_KNOBS.items():
            check(f"only {knob}", dataclasses.replace(BASE, **{knob: val}),
                  scene, ref)

    print("SMOKE " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
