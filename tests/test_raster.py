"""Bake-time triangle rasterizer (ops/raster.py) + mesh G-buffer integration.

The reference's G-buffer comes from Unity's rasterizer
(Internal-DeferredShading.shader; VolumetricRenderer.cs:104-121 consumes
color + _CameraDepthTexture); here ops/raster.py produces the same inputs
from a TriMesh. Correctness anchors: projection matches camera_rays (a
rasterized plane-aligned triangle must agree with the analytic ray-plane
depth), z-buffering, double-sidedness, near-plane culling.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import RenderConfig, VolumetricRenderer, demo_scene
from volumetricrenderer_tpu.models.camera import Camera
from volumetricrenderer_tpu.models.mesh import (TriMesh, concat_meshes,
                                                procedural_tree,
                                                transform_mesh)
from volumetricrenderer_tpu.ops import raster, raycast

W, H = 64, 48


def _cam(**kw):
    kw.setdefault("position", (0.0, 0.0, 0.0))
    kw.setdefault("forward", (0.0, 0.0, 1.0))
    kw.setdefault("aspect", W / H)
    return Camera.create(**kw)


def _raster(mesh, cam, w=W, h=H):
    return jax.jit(lambda m: raster.rasterize_mesh(m, cam, w, h))(mesh)


def test_facing_triangle_constant_depth():
    """A z=5-aligned triangle covering the image center: covered pixels get
    depth 5 exactly; outside pixels stay BIG."""
    mesh = TriMesh.create(
        verts=[(-4.0, -4.0, 5.0), (4.0, -4.0, 5.0), (0.0, 5.0, 5.0)],
        tris=[(0, 1, 2)], albedo=[(1.0, 0.5, 0.25)])
    cam = _cam()
    alb, nrm, depth = _raster(mesh, cam)
    depth = np.asarray(depth)
    hit = depth < raster.BIG
    assert hit.sum() > 50
    np.testing.assert_allclose(depth[hit], 5.0, rtol=1e-5)
    # center pixel is covered; its albedo is the triangle's, normal +-z
    cy, cx = H // 2, W // 2
    assert hit[cy, cx]
    np.testing.assert_allclose(np.asarray(alb)[cy, cx], [1.0, 0.5, 0.25],
                               rtol=1e-6)
    assert abs(abs(float(np.asarray(nrm)[cy, cx, 2])) - 1.0) < 1e-5
    # corners are outside the triangle
    assert not hit[0, 0] and not hit[-1, -1]


def test_perspective_depth_matches_analytic_plane():
    """A slanted triangle: rasterized depth at covered pixels must equal the
    analytic ray/plane intersection depth (perspective-correct 1/z lerp).
    This also pins the projection convention to camera_rays."""
    v = [(-6.0, -6.0, 4.0), (6.0, -6.0, 8.0), (0.0, 8.0, 6.0)]
    mesh = TriMesh.create(verts=v, tris=[(0, 1, 2)], albedo=[(1.0, 1.0, 1.0)])
    cam = _cam()
    _, _, depth = _raster(mesh, cam)
    depth = np.asarray(depth)
    hit = depth < raster.BIG
    assert hit.sum() > 100

    dirs, _ = raycast.camera_rays(W, H, cam.fov_y, cam.aspect,
                                  cam.view_to_world())
    dirs = np.asarray(dirs)
    n = np.cross(np.subtract(v[1], v[0]), np.subtract(v[2], v[0]))
    t_plane = np.dot(v[0], n) / np.maximum(dirs @ n, 1e-9)
    # rasterizer depth is linear view z; dirs have unit view z, so the
    # ray parameter IS the view depth
    np.testing.assert_allclose(depth[hit], t_plane[hit], rtol=1e-4)


def test_zbuffer_nearer_triangle_wins():
    mesh = TriMesh.create(
        verts=[(-5.0, -5.0, 6.0), (5.0, -5.0, 6.0), (0.0, 6.0, 6.0),
               (-5.0, -5.0, 3.0), (5.0, -5.0, 3.0), (0.0, 6.0, 3.0)],
        tris=[(0, 1, 2), (3, 4, 5)],
        albedo=[(1.0, 0.0, 0.0), (0.0, 1.0, 0.0)])
    cam = _cam()
    alb, _, depth = _raster(mesh, cam)
    cy, cx = H // 2, W // 2
    assert abs(float(depth[cy, cx]) - 3.0) < 1e-4
    np.testing.assert_allclose(np.asarray(alb)[cy, cx], [0.0, 1.0, 0.0],
                               atol=1e-6)
    # chunk-boundary independence: same result with the triangles far apart
    # in the chunk order
    pad_t = [(0, 1, 2)] * 15
    mesh2 = TriMesh.create(
        verts=mesh.verts,
        tris=[(0, 1, 2)] + pad_t + [(3, 4, 5)],
        albedo=[(1.0, 0.0, 0.0)] * 16 + [(0.0, 1.0, 0.0)])
    alb2, _, depth2 = _raster(mesh2, cam)
    np.testing.assert_allclose(np.asarray(depth2), np.asarray(depth),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(alb2)[cy, cx], [0.0, 1.0, 0.0],
                               atol=1e-6)


def test_double_sided_winding():
    """Either winding rasterizes (the reference foliage is double-sided)."""
    cam = _cam()
    a = TriMesh.create(verts=[(-4.0, -4.0, 5.0), (4.0, -4.0, 5.0),
                              (0.0, 5.0, 5.0)],
                       tris=[(0, 1, 2)], albedo=[(1.0, 1.0, 1.0)])
    b = dataclasses.replace(a, tris=jnp.asarray([[2, 1, 0]], jnp.int32))
    _, _, da = _raster(a, cam)
    _, _, db = _raster(b, cam)
    np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=1e-6)


def test_behind_camera_culled_no_nans():
    mesh = TriMesh.create(
        verts=[(-4.0, -4.0, -2.0), (4.0, -4.0, 5.0), (0.0, 5.0, 5.0),
               (0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)],
        tris=[(0, 1, 2), (3, 4, 5)], albedo=[(1.0, 1.0, 1.0)] * 2)
    alb, nrm, depth = _raster(mesh, _cam())
    assert np.isfinite(np.asarray(alb)).all()
    assert np.isfinite(np.asarray(nrm)).all()
    # every triangle has a vertex at/behind the camera -> dropped whole
    assert (np.asarray(depth) == raster.BIG).all()


def test_mesh_gbuffer_integration():
    """demo_scene(mesh_env) + an attached tree mesh: render_scene_inputs
    composites rasterized trees over the analytic pass by depth, and the
    full frame consumes it."""
    cfg = RenderConfig(volume_width=16, volume_height=16, volume_depth=8,
                       image_width=W, image_height=H, shadow_map_size=32)
    r = VolumetricRenderer(cfg)
    scene = demo_scene(aspect=W / H, mesh_env=True)
    assert scene.mesh is not None and scene.mesh.num_tris > 10
    sc_mesh, vd_mesh = jax.jit(r.render_scene_inputs)(scene)
    assert np.isfinite(np.asarray(sc_mesh)).all()
    assert np.isfinite(np.asarray(vd_mesh)).all()
    # baseline: the analytic pass WITHOUT the trees (proxy boxes skipped as
    # they are under the mesh path). The mesh only ADDS geometry over it:
    # depth never increases, tree pixels get strictly nearer.
    cam = scene.camera
    dirs, _ = raycast.camera_rays(W, H, cam.fov_y, cam.aspect,
                                  cam.view_to_world())
    _, vd_base = jax.jit(lambda s: raycast.render_scene(
        s.geometry, s.camera.position, dirs, s.dir_lights.direction[0],
        s.dir_lights.packed_color[0], s.ambient, s.camera.far,
        skip_proxy_boxes=True))(scene)
    dm, df = np.asarray(vd_mesh), np.asarray(vd_base)
    # (relative tolerance: the two baselines run in separate jits, so the
    # heightfield march's f32 rounding wobbles in both directions)
    assert (dm <= df * (1.0 + 1e-4) + 1e-3).all()
    assert (dm < df - 0.5).sum() > 10
    assert dm.min() > 0.0
    # a frame renders on top of it
    img, _, _ = r.render_frame(r.init_state(scene.dir_lights.count), scene,
                               0.0, scene_color=sc_mesh, view_depth=vd_mesh)
    assert np.isfinite(np.asarray(img)).all()


def test_fuzz_vs_numpy_oracle():
    """Random triangle soups vs an INDEPENDENT numpy rasterizer (straight
    [T, H, W] broadcasting, no chunking/scan) — same SPEC contract
    ("Mesh G-buffer rasterization"): signed-area barycentrics, 1/z depth,
    first-index tie-break, whole-triangle near cull. Pixels whose winner
    differs are allowed only where two depths are within float noise."""
    rng = np.random.default_rng(11)
    w, h = 40, 32
    cam = _cam(aspect=w / h)
    tan_y = float(np.tan(np.asarray(cam.fov_y) / 2.0))
    tan_x = tan_y * (w / h)

    def oracle(verts, tris):
        v = verts[tris]                                   # [T, 3, 3] view==world (identity cam)
        z = v[..., 2]
        sx = (v[..., 0] / (z * tan_x) + 1.0) * 0.5 * w - 0.5
        sy = (v[..., 1] / (z * tan_y) + 1.0) * 0.5 * h - 0.5
        area = ((sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0])
                - (sy[:, 1] - sy[:, 0]) * (sx[:, 2] - sx[:, 0]))
        valid = (z.min(axis=1) > 1e-3) & (np.abs(area) > 1e-8)
        px = np.arange(w, dtype=np.float32)[None, None, :]
        py = np.arange(h, dtype=np.float32)[None, :, None]
        ia = np.where(valid, 1.0 / np.where(valid, area, 1.0), 0.0)
        b3 = lambda a: a[:, None, None]
        w0 = ((b3(sx[:, 2] - sx[:, 1])) * (py - b3(sy[:, 1]))
              - (b3(sy[:, 2] - sy[:, 1])) * (px - b3(sx[:, 1]))) * b3(ia)
        w1 = ((b3(sx[:, 0] - sx[:, 2])) * (py - b3(sy[:, 2]))
              - (b3(sy[:, 0] - sy[:, 2])) * (px - b3(sx[:, 2]))) * b3(ia)
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & b3(valid)
        iz = w0 * b3(1.0 / z[:, 0]) + w1 * b3(1.0 / z[:, 1]) \
            + w2 * b3(1.0 / z[:, 2])
        zp = 1.0 / np.maximum(iz, 1e-9)
        zc = np.where(inside, zp, raster.BIG).astype(np.float32)
        return zc.min(axis=0)

    for trial in range(4):
        n = 12 + 10 * trial
        verts = np.stack([
            (rng.random(n * 3, dtype=np.float32) - 0.5) * 10.0,
            (rng.random(n * 3, dtype=np.float32) - 0.5) * 8.0,
            rng.random(n * 3, dtype=np.float32) * 10.0 - 1.0,  # some behind
        ], axis=-1)
        tris = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
        mesh = TriMesh.create(verts, tris,
                              np.ones((n, 3), np.float32))
        _, _, depth = _raster(mesh, cam, w, h)
        d_ref = oracle(np.asarray(verts, np.float32), tris)
        d = np.asarray(depth)
        both_hit = (d < raster.BIG) & (d_ref < raster.BIG)
        np.testing.assert_allclose(d[both_hit], d_ref[both_hit], rtol=2e-4,
                                   err_msg=f"trial {trial}")
        # coverage agrees except possibly at edge-on float-noise pixels
        mismatch = (d < raster.BIG) != (d_ref < raster.BIG)
        assert mismatch.mean() < 0.01, (trial, mismatch.sum())


def test_instancing_transform_matches_boxes():
    """transform_mesh composes scale -> yaw -> translate exactly like
    transform_boxes, so the rasterized tree lands inside its shadow-proxy
    boxes' footprint."""
    from volumetricrenderer_tpu.models.voxelize import transform_boxes
    tree = procedural_tree(height=6.0)
    boxes = [((-1.0, 0.0, -1.0), (1.0, 6.0, 1.0), 1.0)]
    inst_b = transform_boxes(boxes, scale=0.5, translate=(3.0, 0.0, -2.0),
                             yaw=np.pi / 2)
    inst_m = transform_mesh(tree, scale=0.5, translate=(3.0, 0.0, -2.0),
                            yaw=np.pi / 2)
    (bmin, bmax, _), = inst_b
    v = np.asarray(inst_m.verts)
    # canopy radius 1.92 * 0.5 scale around (3, *, -2): inside a generous
    # bound derived from the same transform
    assert v[:, 0].min() > bmin[0] - 1.2 and v[:, 0].max() < bmax[0] + 1.2
    assert v[:, 1].min() > -1e-3 and v[:, 1].max() < 3.2
    cm = concat_meshes([inst_m, inst_m])
    assert cm.num_tris == 2 * inst_m.num_tris
    assert int(cm.tris.max()) == inst_m.verts.shape[0] + int(inst_m.tris.max())
