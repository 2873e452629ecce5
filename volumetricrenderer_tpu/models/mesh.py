"""Triangle-mesh scene content for the rasterized G-buffer.

The reference's environment is FBX tree meshes + engine primitives rendered by
Unity's deferred pass (Assets/Prefabs/Enviornment.prefab, scene:938-1006;
Internal-DeferredShading.shader consumes the result). Here a `TriMesh` carries
a world-space triangle soup with flat per-triangle albedo; the TPU rasterizer
(ops/raster.py) turns it into scene color + linear depth at BAKE time — the
G-buffer is an engine-owned INPUT to the froxel pipeline in the reference
(VolumetricRenderer.cs:104-121 reads _CameraDepthTexture), so rasterization
cost never touches the per-frame path.

Content sources:
- `reference_tree(i)` ingests the actual reference FBX meshes (io/fbx.py),
  normalized exactly like the occluder bake (tools/bake_tree_boxes.py), so
  the rasterized trees and their voxelized shadow-proxy boxes
  (models/tree_assets.py) are the SAME geometry.
- `procedural_tree()` is a reference-free stand-in (lat/lon canopy sphere +
  box trunk) so tests and demos run without the reference checkout.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriMesh:
    verts: jax.Array       # [V, 3] f32 world-space positions
    tris: jax.Array        # [T, 3] i32 vertex indices
    albedo: jax.Array      # [T, 3] f32 flat per-triangle albedo

    @staticmethod
    def create(verts, tris, albedo) -> "TriMesh":
        verts = jnp.asarray(verts, jnp.float32)
        tris = jnp.asarray(tris, jnp.int32)
        albedo = jnp.asarray(albedo, jnp.float32)
        if albedo.ndim == 1:
            albedo = jnp.broadcast_to(albedo[None], (tris.shape[0], 3))
        assert verts.ndim == 2 and verts.shape[1] == 3
        assert tris.ndim == 2 and tris.shape[1] == 3
        assert albedo.shape == (tris.shape[0], 3), albedo.shape
        return TriMesh(verts=verts, tris=tris, albedo=albedo)

    @property
    def num_tris(self) -> int:
        return self.tris.shape[0]


def concat_meshes(meshes: Sequence[TriMesh]) -> TriMesh:
    """One soup from many instances (vertex indices re-offset)."""
    vs, ts, als = [], [], []
    off = 0
    for m in meshes:
        vs.append(m.verts)
        ts.append(m.tris + off)
        als.append(m.albedo)
        off += m.verts.shape[0]
    return TriMesh(verts=jnp.concatenate(vs), tris=jnp.concatenate(ts),
                   albedo=jnp.concatenate(als))


def transform_mesh(mesh: TriMesh, scale: float = 1.0,
                   translate=(0.0, 0.0, 0.0), yaw: float = 0.0) -> TriMesh:
    """Uniform scale, y-axis yaw, then translate — the same instancing
    transform the occluder boxes use (models/voxelize.transform_boxes), so a
    tree's rasterized triangles and its shadow-proxy boxes stay aligned."""
    c, s = math.cos(yaw), math.sin(yaw)
    rot = jnp.asarray([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]],
                      jnp.float32)
    v = (mesh.verts * scale) @ rot.T + jnp.asarray(translate, jnp.float32)
    return dataclasses.replace(mesh, verts=v)


# ------------------------------------------------------------------ #
# Content


def procedural_tree(height: float = 6.0, nlat: int = 6, nlon: int = 8,
                    canopy_albedo=(0.18, 0.32, 0.12),
                    trunk_albedo=(0.3, 0.2, 0.12)) -> TriMesh:
    """Reference-free tree: lat/lon sphere canopy + box trunk, standing on
    y=0 with the given height. Deterministic numpy; ~1e2 triangles."""
    r = 0.32 * height
    cy = height - r
    verts = [(0.0, cy + r, 0.0)]
    for i in range(1, nlat):
        th = math.pi * i / nlat
        for j in range(nlon):
            ph = 2.0 * math.pi * j / nlon
            verts.append((r * math.sin(th) * math.cos(ph),
                          cy + r * math.cos(th),
                          r * math.sin(th) * math.sin(ph)))
    verts.append((0.0, cy - r, 0.0))
    bot = len(verts) - 1
    tris = []
    for j in range(nlon):
        tris.append((0, 1 + j, 1 + (j + 1) % nlon))
    for i in range(nlat - 2):
        a, b = 1 + i * nlon, 1 + (i + 1) * nlon
        for j in range(nlon):
            j2 = (j + 1) % nlon
            tris.append((a + j, b + j, b + j2))
            tris.append((a + j, b + j2, a + j2))
    last = 1 + (nlat - 2) * nlon
    for j in range(nlon):
        tris.append((bot, last + (j + 1) % nlon, last + j))
    n_canopy = len(tris)

    # trunk box
    hw, th_ = 0.06 * height, cy
    base = len(verts)
    for sy in (0.0, th_):
        for sx, sz in ((-hw, -hw), (hw, -hw), (hw, hw), (-hw, hw)):
            verts.append((sx, sy, sz))
    quads = [(0, 1, 5, 4), (1, 2, 6, 5), (2, 3, 7, 6), (3, 0, 4, 7),
             (4, 5, 6, 7), (3, 2, 1, 0)]
    for q in quads:
        a, b, c_, d = (base + k for k in q)
        tris.append((a, b, c_))
        tris.append((a, c_, d))

    albedo = np.concatenate([
        np.broadcast_to(np.asarray(canopy_albedo, np.float32),
                        (n_canopy, 3)),
        np.broadcast_to(np.asarray(trunk_albedo, np.float32),
                        (len(tris) - n_canopy, 3))])
    return TriMesh.create(np.asarray(verts, np.float32),
                          np.asarray(tris, np.int32), albedo)


_REF_TREES = [("Assets/Fbxs/Nature_Tree_0_Up.fbx", 6.0),
              ("Assets/Fbxs/Nature_Tree_1_Leaves.fbx", 7.0)]


def reference_tree(idx: int, ref_root: str = "/root/reference",
                   canopy_albedo=(0.18, 0.32, 0.12),
                   trunk_albedo=(0.3, 0.2, 0.12)) -> Optional[TriMesh]:
    """The actual reference FBX tree (same file + normalization as the
    occluder bake, tools/bake_tree_boxes.py), or None without the checkout.

    Albedo assignment (the FBX materials are Unity-side, not in the
    geometry nodes): per TRIANGLE by radial distance of its centroid from
    the trunk axis — leaf cards fan out far from the axis, trunk/branch
    geometry hugs it. Verified visually against the reference screenshots
    (green canopy mass, brown core)."""
    from volumetricrenderer_tpu.io.fbx import (load_fbx_meshes, merge_meshes,
                                               normalize_mesh)
    rel, height = _REF_TREES[idx % len(_REF_TREES)]
    path = os.path.join(ref_root, rel)
    if not os.path.exists(path):
        return None
    meshes = load_fbx_meshes(path)
    if not meshes:
        return None
    verts, tris = merge_meshes(meshes)
    verts = normalize_mesh(verts, height=height)
    cent = verts[tris].mean(axis=1)                      # [T, 3]
    rad = np.hypot(cent[:, 0], cent[:, 2])
    leafy = (rad > 0.22 * rad.max()) | (cent[:, 1] > 0.55 * height)
    albs = np.where(leafy[:, None],
                    np.asarray(canopy_albedo, np.float32),
                    np.asarray(trunk_albedo, np.float32))
    return TriMesh.create(verts, tris, albs)


def demo_tree(idx: int, ref_root: str = "/root/reference") -> TriMesh:
    """reference_tree when the checkout exists, else procedural_tree — so
    demo/tests work in both environments with one call."""
    m = reference_tree(idx, ref_root)
    if m is None:
        m = procedural_tree(height=_REF_TREES[idx % len(_REF_TREES)][1])
    return m
