"""Analytic raycaster tests."""

import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.models.geometry import Geometry
from volumetricrenderer_tpu.ops import raycast


def test_sphere_hit_distance():
    g = Geometry.create(spheres=[((0.0, 0.0, 10.0), 2.0, (1.0, 0.0, 0.0))])
    t, albedo, normal = raycast.intersect(
        g, jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([[0.0, 0.0, 1.0]]))
    assert np.isclose(float(t[0]), 8.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(normal[0]), [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(albedo[0]), [1, 0, 0])


def test_plane_hit():
    g = Geometry.create(planes=[((0.0, 1.0, 0.0), 0.0, (0.0, 1.0, 0.0))])
    t, _, n = raycast.intersect(
        g, jnp.asarray([[0.0, 5.0, 0.0]]), jnp.asarray([[0.0, -1.0, 1.0]]))
    assert np.isclose(float(t[0]), 5.0, atol=1e-4)


def test_box_entry_face():
    g = Geometry.create(boxes=[((-1.0, -1.0, 4.0), (1.0, 1.0, 6.0), (1.0, 1.0, 1.0))])
    t, _, n = raycast.intersect(
        g, jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([[0.0, 0.0, 1.0]]))
    assert np.isclose(float(t[0]), 4.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, -1], atol=1e-5)


def test_nearest_of_multiple():
    g = Geometry.create(
        spheres=[((0.0, 0.0, 20.0), 1.0, (1.0, 0.0, 0.0)),
                 ((0.0, 0.0, 10.0), 1.0, (0.0, 1.0, 0.0))])
    t, albedo, _ = raycast.intersect(
        g, jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([[0.0, 0.0, 1.0]]))
    assert np.isclose(float(t[0]), 9.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(albedo[0]), [0, 1, 0])


def test_miss_returns_big():
    g = Geometry.create(spheres=[((0.0, 0.0, 10.0), 1.0, (1.0, 0.0, 0.0))])
    t, _, _ = raycast.intersect(
        g, jnp.asarray([[0.0, 5.0, 0.0]]), jnp.asarray([[0.0, 0.0, 1.0]]))
    assert float(t[0]) >= raycast.BIG


def test_occluded_segment():
    g = Geometry.create(spheres=[((0.0, 0.0, 5.0), 1.0, (1.0, 0.0, 0.0))])
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
    to_light = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    occ = raycast.occluded(g, pts, to_light, jnp.asarray(100.0))
    np.testing.assert_allclose(np.asarray(occ), [1.0, 0.0])


def test_camera_rays_unit_view_z():
    import jax
    from volumetricrenderer_tpu import froxel
    v2w = froxel.look_at_matrix(jnp.asarray([1.0, 2.0, 3.0]),
                                jnp.asarray([0.0, 0.0, 1.0]),
                                jnp.asarray([0.0, 1.0, 0.0]))
    dirs, uv = raycast.camera_rays(8, 6, jnp.deg2rad(60.0), jnp.asarray(8 / 6), v2w)
    # view-space z of every ray dir must be exactly 1
    w2v = froxel.invert_rigid(v2w)
    view_dirs = np.asarray(dirs) @ np.asarray(w2v[:3, :3]).T
    np.testing.assert_allclose(view_dirs[..., 2], 1.0, atol=1e-5)
    # center pixel looks straight ahead
    c = np.asarray(dirs)[3, 4]
    assert abs(c[0]) < 0.2 and abs(c[1]) < 0.2
