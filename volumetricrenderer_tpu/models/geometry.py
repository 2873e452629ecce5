"""Analytic scene geometry.

The reference gets scene color, camera depth, and shadow maps from Unity's
rasterizer (the Environment prefab: ground cubes + sphere + trees,
Assets/Prefabs/Enviornment.prefab). On TPU there is no rasterizer; instead the
framework describes occluders/scenery as analytic primitives (planes, spheres,
axis-aligned boxes) and ray-casts them — per-pixel/per-texel closed-form
intersections, pure elementwise math that vectorizes perfectly on the VPU.

Mesh-class environment content (terrain, ground clutter) is covered by an
optional PROCEDURAL HEIGHTFIELD: y = base + amp * fBm-Perlin(x, z) — the same
tileable noise as ops/noise.py, so evaluating the surface is gather-free
elementwise math usable inside the Pallas kernels, and ray queries are a
bounded march through the [base, base+amp] band (ops/raycast.py). Tree-like
occluders compose from sphere canopies + box trunks (models/scene.demo_scene).

Used for: demo scene color + camera depth, shadow-map baking (ops/raycast.py),
and the gather-free `shadow_mode="raycast"` froxel visibility path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _f32(v):
    return jnp.asarray(v, jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Geometry:
    # Infinite planes: dot(n, p) + d = 0, n unit.
    plane_normal: jax.Array   # [P, 3]
    plane_d: jax.Array        # [P]
    plane_albedo: jax.Array   # [P, 3]

    sphere_center: jax.Array  # [S, 3]
    sphere_radius: jax.Array  # [S]
    sphere_albedo: jax.Array  # [S, 3]

    box_min: jax.Array        # [B, 3]
    box_max: jax.Array        # [B, 3]
    box_albedo: jax.Array     # [B, 3]
    # Shadow opacity per box: 1 = solid; < 1 attenuates shadow rays by the
    # box's average coverage — the TPU-native stand-in for alpha-tested
    # foliage (TreeLeaves.shader): a ray through a porous canopy keeps
    # (1 - opacity) of its light (SPEC "Occluder opacity"). The voxelized
    # mesh bake (models/voxelize.py) emits its per-box fill fraction here.
    box_opacity: jax.Array    # [B]

    # Procedural heightfield y = base + amp * perlin(x*tiling+offset) in
    # [base, base+amp]; solid below the surface. Noise params are static
    # (they pick the compile-time fBm unroll, like Medium's).
    hf_amp: jax.Array         # [] 0 disables nothing — hf_enabled gates
    hf_base: jax.Array        # []
    hf_tiling: jax.Array      # [2] (x, z) -> uv scale
    hf_offset: jax.Array      # [2]
    hf_albedo: jax.Array      # [3]
    # static: any box_opacity < 1 (selects the fractional any-hit variant at
    # trace time; the default all-solid path compiles unchanged)
    box_fractional: bool = dataclasses.field(default=False,
                                             metadata=dict(static=True))
    # static: the LAST n boxes are shadow-only PROXIES for rasterized mesh
    # content (models/mesh.py): they occlude shadow rays / froxel visibility
    # exactly like any box, but primary-visibility rays skip them
    # (ops/raycast.intersect include_proxies=False) so the G-buffer shows
    # the mesh surface instead of its voxelized hull.
    n_proxy_boxes: int = dataclasses.field(default=0,
                                           metadata=dict(static=True))
    hf_enabled: bool = dataclasses.field(default=False, metadata=dict(static=True))
    hf_octaves: int = dataclasses.field(default=2, metadata=dict(static=True))
    hf_period: int = dataclasses.field(default=4, metadata=dict(static=True))
    hf_seed: int = dataclasses.field(default=11, metadata=dict(static=True))
    hf_steps: int = dataclasses.field(default=12, metadata=dict(static=True))
    hf_far: float = dataclasses.field(default=200.0, metadata=dict(static=True))

    @staticmethod
    def create(planes=(), spheres=(), boxes=(), heightfield=None,
               n_proxy_boxes: int = 0) -> "Geometry":
        """planes: [(normal, d, albedo)], spheres: [(center, r, albedo)],
        boxes: [(min, max, albedo)] or [(min, max, albedo, opacity)];
        heightfield: optional dict with keys amp, base, tiling, offset,
        albedo (+ static octaves/period/seed/steps/far); n_proxy_boxes:
        the last n boxes are shadow-only mesh proxies (see field doc)."""
        def pack(items, shapes):
            if not items:
                return [jnp.zeros((0,) + s, jnp.float32) for s in shapes]
            cols = list(zip(*items))
            return [_f32(list(c)).reshape((len(items),) + s) for c, s in zip(cols, shapes)]

        pn, pd, pa = pack(planes, [(3,), (), (3,)])
        sc, sr, sa = pack(spheres, [(3,), (), (3,)])
        boxes = [b if len(b) == 4 else (*b, 1.0) for b in boxes]
        bmin, bmax, ba, bo = pack(boxes, [(3,), (3,), (3,), ()])
        frac = bool(any(float(b[3]) < 1.0 for b in boxes))
        pn = pn / jnp.maximum(jnp.linalg.norm(pn, axis=-1, keepdims=True), 1e-9)

        hf = heightfield or {}
        assert 0 <= n_proxy_boxes <= len(boxes)
        return Geometry(
            pn, pd, pa, sc, sr, sa, bmin, bmax, ba, bo,
            box_fractional=frac,
            n_proxy_boxes=int(n_proxy_boxes),
            hf_amp=_f32(hf.get("amp", 0.0)),
            hf_base=_f32(hf.get("base", 0.0)),
            hf_tiling=_f32(hf.get("tiling", (0.05, 0.05))),
            hf_offset=_f32(hf.get("offset", (0.0, 0.0))),
            hf_albedo=_f32(hf.get("albedo", (0.3, 0.35, 0.25))),
            hf_enabled=heightfield is not None,
            hf_octaves=int(hf.get("octaves", 2)),
            hf_period=int(hf.get("period", 4)),
            hf_seed=int(hf.get("seed", 11)),
            hf_steps=int(hf.get("steps", 12)),
            hf_far=float(hf.get("far", 200.0)),
        )

    @staticmethod
    def empty() -> "Geometry":
        return Geometry.create()
