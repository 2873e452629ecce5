"""Analytic scene geometry.

The reference gets scene color, camera depth, and shadow maps from Unity's
rasterizer (the Environment prefab: ground cubes + sphere + trees,
Assets/Prefabs/Enviornment.prefab). On TPU there is no rasterizer; instead the
framework describes occluders/scenery as analytic primitives (planes, spheres,
axis-aligned boxes) and ray-casts them — per-pixel/per-texel closed-form
intersections, pure elementwise math that vectorizes perfectly on the VPU.

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

    @staticmethod
    def create(planes=(), spheres=(), boxes=()) -> "Geometry":
        """planes: [(normal, d, albedo)], spheres: [(center, r, albedo)],
        boxes: [(min, max, albedo)]."""
        def pack(items, shapes):
            if not items:
                return [jnp.zeros((0,) + s, jnp.float32) for s in shapes]
            cols = list(zip(*items))
            return [_f32(list(c)).reshape((len(items),) + s) for c, s in zip(cols, shapes)]

        pn, pd, pa = pack(planes, [(3,), (), (3,)])
        sc, sr, sa = pack(spheres, [(3,), (), (3,)])
        bmin, bmax, ba = pack(boxes, [(3,), (3,), (3,)])
        pn = pn / jnp.maximum(jnp.linalg.norm(pn, axis=-1, keepdims=True), 1e-9)
        return Geometry(pn, pd, pa, sc, sr, sa, bmin, bmax, ba)

    @staticmethod
    def empty() -> "Geometry":
        return Geometry.create()
