"""Mesh ingestion: FBX parsing -> voxelization -> box decomposition
(io/fbx.py, models/voxelize.py, models/tree_assets.py; the reference's
counterpart is Unity's FBX import of Assets/Fbxs/Nature_Tree_*.fbx)."""

import os

import jax
import numpy as np
import pytest

from volumetricrenderer_tpu import RenderConfig, VolumetricRenderer, demo_scene
from volumetricrenderer_tpu.models.voxelize import (boxes_from_occupancy,
                                                    mesh_to_boxes,
                                                    transform_boxes,
                                                    voxelize_triangles)

REF_FBX = "/root/reference/Assets/Fbxs/Nature_Tree_0_Up.fbx"


def _cube_mesh(lo, hi):
    """12-triangle axis-aligned cube."""
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    v = np.asarray([[x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0],
                    [x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1]],
                   np.float32)
    quads = [(0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4), (2, 3, 7, 6),
             (0, 3, 7, 4), (1, 2, 6, 5)]
    t = []
    for a, b, c, d in quads:
        t += [(a, b, c), (a, c, d)]
    return v, np.asarray(t, np.int32)


def test_voxelize_cube_surface():
    v, t = _cube_mesh((0, 0, 0), (2, 2, 2))
    occ, origin, vox = voxelize_triangles(v, t, res=10)
    assert occ.any()
    # faces are surface-sampled: boundary layers occupied, strict interior not
    assert occ[0].any() and occ[-1].any()
    interior = occ[2:-2, 2:-2, 2:-2]
    assert not interior.all()


def test_boxes_cover_cube():
    v, t = _cube_mesh((0, 0, 0), (2, 1, 1))
    boxes = mesh_to_boxes(v, t, res=8, max_boxes=4, fill_thresh=0.2)
    assert boxes
    bmin = np.min([b[0] for b in boxes], axis=0)
    bmax = np.max([b[1] for b in boxes], axis=0)
    assert (bmin <= 0.2).all() and (bmax >= [1.8, 0.8, 0.8]).all()


def test_transform_boxes_yaw90():
    boxes = [((0.0, 0.0, 0.0), (2.0, 1.0, 1.0))]
    out = transform_boxes(boxes, scale=2.0, translate=(10.0, 0.0, 0.0),
                          yaw=np.pi / 2)
    bm, bx = out[0]
    # x-extent 4 rotates onto z; scale doubles; translate shifts x. yaw pi/2
    # maps (x, y, z) -> (z, y, -x): center (2,1,1) -> (1,1,-2) + (10,0,0)
    np.testing.assert_allclose(bx - bm, [2.0, 2.0, 4.0], atol=1e-5)
    np.testing.assert_allclose(0.5 * (bm + bx), [11.0, 1.0, -2.0], atol=1e-5)


@pytest.mark.skipif(not os.path.exists(REF_FBX),
                    reason="reference checkout not present")
def test_fbx_parser_reads_reference_trees():
    from volumetricrenderer_tpu.io.fbx import (load_fbx_meshes, merge_meshes,
                                               normalize_mesh)
    meshes = load_fbx_meshes(REF_FBX)
    assert meshes
    verts, tris = merge_meshes(meshes)
    assert len(verts) > 1000 and len(tris) > 1000
    assert tris.min() >= 0 and tris.max() < len(verts)
    norm = normalize_mesh(verts, height=6.0)
    lo, hi = norm.min(0), norm.max(0)
    np.testing.assert_allclose(hi[1] - lo[1], 6.0, rtol=1e-5)


def test_tree_assets_regenerable():
    """The checked-in bake must match a fresh run of the ingestion pipeline
    (guards against the generated file drifting from the tool)."""
    if not os.path.exists(REF_FBX):
        pytest.skip("reference checkout not present")
    from volumetricrenderer_tpu.io.fbx import (load_fbx_meshes, merge_meshes,
                                               normalize_mesh)
    from volumetricrenderer_tpu.models import tree_assets
    meshes = load_fbx_meshes(REF_FBX)
    verts, tris = merge_meshes(meshes)
    verts = normalize_mesh(verts, height=6.0)
    fresh = mesh_to_boxes(verts, tris, res=20, max_boxes=8)
    assert len(fresh) == len(tree_assets.TREE_0)
    for (am, ax, ao), (bm, bx, bo) in zip(fresh, tree_assets.TREE_0):
        np.testing.assert_allclose(am, bm, atol=2e-3)
        np.testing.assert_allclose(ax, bx, atol=2e-3)
        assert 0.0 < bo <= 1.0 and abs(ao - bo) < 2e-3


def test_mesh_env_scene_renders():
    cfg = RenderConfig(volume_width=16, volume_height=16, volume_depth=8,
                       image_width=32, image_height=32,
                       shadow_mode="raycast")
    scene = demo_scene(aspect=1.0, mesh_env=True)
    plain = demo_scene(aspect=1.0, mesh_env=False)
    assert scene.geometry.box_min.shape[0] > plain.geometry.box_min.shape[0]
    r = VolumetricRenderer(cfg)
    img, _, _ = jax.jit(lambda s, sc: r.render_frame(s, sc, 0.0))(
        r.init_state(1), scene)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img[..., :3].std() > 1e-4
