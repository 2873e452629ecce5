"""Froxel-grid geometry: the coordinate-system contract.

Mirrors the reference's packed params (VolumetricRenderer.cs:183-186) and the
froxel<->view<->world transforms (VolumetricHelper.hlsl:105-186). All functions are
vectorized over leading batch dims and jit-friendly.

Froxel positions are *continuous*: slice/texel centers sit at integer+0.5
(DiscreteToContinuous, helper:105-108). Arrays are stored [D, H, W].
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FroxelParams:
    """Packed froxel<->view mapping parameters (_FroxelToWorldParams, helper:57-59).

    x: cot(fov_x/2), y: cot(fov_y/2),
    z: depth_distribution*(D - near*D/volume_distance) + 1,
    w: volume_distance / depth_distribution / D.
    """

    x: jax.Array
    y: jax.Array
    z: jax.Array
    w: jax.Array
    near: jax.Array
    grid: Tuple[int, int, int] = dataclasses.field(metadata=dict(static=True))  # (W, H, D)
    # Slab offset for H-sharded rendering (parallel/shard_render.py): the
    # GLOBAL froxel row of the local array's row 0 (may be negative in the
    # halo overcompute region; rows clamp to [0, H-1] like the edge sampler).
    # 0 for whole-grid rendering; `grid` is always the GLOBAL grid.
    y0: jax.Array = 0.0


def make_froxel_params(fov_y_rad, aspect, near, volume_distance, depth_distribution,
                       grid: Tuple[int, int, int]) -> FroxelParams:
    """VolumetricRenderer.cs:176-187 (CalculateMatrices), froxel part."""
    _, _, d = grid
    py = 1.0 / jnp.tan(fov_y_rad / 2.0)
    px = py / aspect
    pz = depth_distribution * (d - near * d / volume_distance) + 1.0
    pw = volume_distance / depth_distribution / d
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return FroxelParams(x=f32(px), y=f32(py), z=f32(pz), w=f32(pw), near=f32(near), grid=grid)


def froxel_to_view(p: FroxelParams, froxel_pos: jax.Array) -> jax.Array:
    """FroxelPosToViewPos (helper:125-132). froxel_pos [..., 3] (x, y, z) continuous."""
    w, h, d = p.grid
    fx, fy, fz = froxel_pos[..., 0], froxel_pos[..., 1], froxel_pos[..., 2]
    vz = (jnp.power(p.z, fz / d) - 1.0) * p.w + p.near
    vx = (2.0 * fx / w - 1.0) * vz / p.x
    vy = (2.0 * fy / h - 1.0) * vz / p.y
    return jnp.stack([vx, vy, vz], axis=-1)


def view_to_froxel(p: FroxelParams, view_pos: jax.Array) -> jax.Array:
    """ViewPosToFroxelPos (helper:142-151)."""
    w, h, d = p.grid
    vx, vy, vz = view_pos[..., 0], view_pos[..., 1], view_pos[..., 2]
    # Clamp the log argument: view z behind the near plane must degrade to a
    # far-out-of-range froxel z (like a GPU clamp sampler), not NaN (SPEC.md).
    fz = d * jnp.log(jnp.maximum((vz - p.near) / p.w + 1.0, 1e-8)) / jnp.log(p.z)
    fx = w * (p.x * vx / vz + 1.0) / 2.0
    fy = h * (p.y * vy / vz + 1.0) / 2.0
    return jnp.stack([fx, fy, fz], axis=-1)


def depth_to_froxel_z(p: FroxelParams, view_depth: jax.Array) -> jax.Array:
    """DepthToFroxelPosZ (helper:173-177)."""
    _, _, d = p.grid
    return d * jnp.log(jnp.maximum((view_depth - p.near) / p.w + 1.0, 1e-8)) / jnp.log(p.z)


def froxel_z_to_view_z(p: FroxelParams, fz: jax.Array) -> jax.Array:
    _, _, d = p.grid
    return (jnp.power(p.z, fz / d) - 1.0) * p.w + p.near


def dot3(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise 3-vector dot. Written as explicit FMAs so it stays on the
    VPU at full f32 — tiny `@` contractions would be routed to the MXU where
    the default precision truncates to bf16 (0.5%-level error, measured)."""
    return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1] + a[..., 2] * b[..., 2]


def transform_points(mat: jax.Array, pos: jax.Array) -> jax.Array:
    """Apply a 4x4 (column-vector convention) to [..., 3] points, w-divide.
    Explicit FMAs, not a matmul — see dot3."""
    x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
    out = jnp.stack(
        [mat[0, 0] * x + mat[0, 1] * y + mat[0, 2] * z + mat[0, 3],
         mat[1, 0] * x + mat[1, 1] * y + mat[1, 2] * z + mat[1, 3],
         mat[2, 0] * x + mat[2, 1] * y + mat[2, 2] * z + mat[2, 3]], axis=-1)
    w = mat[3, 0] * x + mat[3, 1] * y + mat[3, 2] * z + mat[3, 3]
    return out / w[..., None]


def transform_dirs(mat: jax.Array, dirs: jax.Array) -> jax.Array:
    """Rotate [..., 3] directions by the upper-left 3x3 (explicit FMAs)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    return jnp.stack(
        [mat[0, 0] * x + mat[0, 1] * y + mat[0, 2] * z,
         mat[1, 0] * x + mat[1, 1] * y + mat[1, 2] * z,
         mat[2, 0] * x + mat[2, 1] * y + mat[2, 2] * z], axis=-1)


def froxel_to_world(p: FroxelParams, view_to_world_mat: jax.Array,
                    froxel_pos: jax.Array) -> jax.Array:
    """FroxelPosToWorldPos (helper:134-140)."""
    return transform_points(view_to_world_mat, froxel_to_view(p, froxel_pos))


def world_to_froxel(p: FroxelParams, world_to_view_mat: jax.Array,
                    world_pos: jax.Array) -> jax.Array:
    """WorldPosToFroxelPos (helper:153-160)."""
    return view_to_froxel(p, transform_points(world_to_view_mat, world_pos))


def look_at_matrix(position: jax.Array, forward: jax.Array, up: jax.Array) -> jax.Array:
    """Unity-style LookAt view->world matrix (VolumetricRenderer.cs:180).

    Left-handed camera basis: z = forward, x = normalize(cross(up, z)), y = cross(z, x).
    Returns a 4x4 with columns (x, y, z, position), column-vector convention.
    """
    z = forward / jnp.linalg.norm(forward)
    x = jnp.cross(up, z)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, 0].set(x)
    m = m.at[:3, 1].set(y)
    m = m.at[:3, 2].set(z)
    m = m.at[:3, 3].set(position)
    return m


def invert_rigid(m: jax.Array) -> jax.Array:
    """Inverse of a rigid (rotation+translation) 4x4."""
    r = m[:3, :3]
    t = m[:3, 3]
    inv = jnp.eye(4, dtype=m.dtype)
    inv = inv.at[:3, :3].set(r.T)
    inv = inv.at[:3, 3].set(-(r.T @ t))
    return inv


def froxel_centers(grid: Tuple[int, int, int]) -> jax.Array:
    """Continuous froxel positions of every cell center, shaped [D, H, W, 3].

    (DiscreteToContinuous over the whole grid: integer index + 0.5.)
    """
    w, h, d = grid
    fz = jnp.arange(d, dtype=jnp.float32) + 0.5
    fy = jnp.arange(h, dtype=jnp.float32) + 0.5
    fx = jnp.arange(w, dtype=jnp.float32) + 0.5
    zz, yy, xx = jnp.meshgrid(fz, fy, fx, indexing="ij")
    return jnp.stack([xx, yy, zz], axis=-1)
