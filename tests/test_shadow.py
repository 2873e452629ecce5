"""Shadow pipeline tests: bake correctness by direct geometric reasoning."""

import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu import shadow as sl
from volumetricrenderer_tpu.models.geometry import Geometry


def _blocker_sphere():
    return Geometry.create(spheres=[((0.0, 5.0, 0.0), 1.0, (1.0, 0.0, 0.0))])


def test_dir_shadow_blocks_below_sphere():
    geom = _blocker_sphere()
    light_dir = jnp.asarray([[0.0, -1.0, 0.0]])  # straight down
    data = sl.bake_dir_shadows(
        geom, light_dir, jnp.asarray([1.0]),
        camera_pos=jnp.asarray([0.0, 1.0, -10.0]),
        camera_forward=jnp.asarray([0.0, 0.0, 1.0]),
        fov_y=jnp.deg2rad(60.0), aspect=jnp.asarray(16 / 9),
        near=jnp.asarray(0.3), shadow_distance=50.0,
        splits=(0.1, 0.25, 0.5, 1.0), map_size=128)

    pts = jnp.asarray([
        [0.0, 1.0, 0.0],    # directly below the sphere -> shadowed
        [3.0, 1.0, 0.0],    # off to the side -> lit
    ])
    vis = np.asarray(sl.sample_dir_shadow(data, 0, pts))
    assert vis[0] < 0.2, vis
    assert vis[1] > 0.8, vis


def test_dir_shadow_no_cascade_is_lit():
    geom = _blocker_sphere()
    data = sl.bake_dir_shadows(
        geom, jnp.asarray([[0.0, -1.0, 0.0]]), jnp.asarray([1.0]),
        camera_pos=jnp.asarray([0.0, 1.0, 0.0]),
        camera_forward=jnp.asarray([0.0, 0.0, 1.0]),
        fov_y=jnp.deg2rad(60.0), aspect=jnp.asarray(1.0),
        near=jnp.asarray(0.3), shadow_distance=20.0,
        splits=(0.1, 0.25, 0.5, 1.0), map_size=64)
    far_pt = jnp.asarray([[500.0, 0.0, 500.0]])
    vis = np.asarray(sl.sample_dir_shadow(data, 0, far_pt))
    assert vis[0] == 1.0


def test_shadow_strength_floor():
    geom = _blocker_sphere()
    data = sl.bake_dir_shadows(
        geom, jnp.asarray([[0.0, -1.0, 0.0]]), jnp.asarray([0.7]),
        camera_pos=jnp.asarray([0.0, 1.0, -10.0]),
        camera_forward=jnp.asarray([0.0, 0.0, 1.0]),
        fov_y=jnp.deg2rad(60.0), aspect=jnp.asarray(1.0),
        near=jnp.asarray(0.3), shadow_distance=50.0,
        splits=(0.1, 0.25, 0.5, 1.0), map_size=128)
    vis = float(sl.sample_dir_shadow(data, 0, jnp.asarray([[0.0, 1.0, 0.0]]))[0])
    # fully shadowed -> strength_r = 1 - 0.7 = 0.3 (helper:233)
    assert np.isclose(vis, 0.3, atol=0.1)


def test_cube_shadow_faces_and_visibility():
    # occluder at +x of the light
    geom = Geometry.create(spheres=[((5.0, 0.0, 0.0), 1.0, (1.0, 0.0, 0.0))])
    data = sl.bake_cube_shadows(geom, jnp.asarray([[0.0, 0.0, 0.0]]),
                                jnp.asarray([30.0]), jnp.asarray([1.0]),
                                map_size=64)
    # behind the occluder on +x -> shadowed; -x -> lit
    vis_shadowed = float(sl.sample_cube_shadow(
        data, 0, jnp.asarray([[10.0, 0.0, 0.0]]))[0])
    vis_lit = float(sl.sample_cube_shadow(
        data, 0, jnp.asarray([[-10.0, 0.0, 0.0]]))[0])
    vis_before = float(sl.sample_cube_shadow(
        data, 0, jnp.asarray([[2.0, 0.0, 0.0]]))[0])
    assert vis_shadowed < 0.2
    assert vis_lit > 0.8
    assert vis_before > 0.8


def test_spot_shadow():
    geom = Geometry.create(spheres=[((0.0, 0.0, 5.0), 0.8, (1.0, 0.0, 0.0))])
    data = sl.bake_spot_shadows(
        geom, jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([[0.0, 0.0, 1.0]]),
        jnp.asarray([np.deg2rad(66.0)]), jnp.asarray([30.0]),
        jnp.asarray([1.0]), map_size=64)
    vis_behind = float(sl.sample_spot_shadow(
        data, 0, jnp.asarray([[0.0, 0.0, 10.0]]))[0])
    vis_side = float(sl.sample_spot_shadow(
        data, 0, jnp.asarray([[4.0, 0.0, 10.0]]))[0])
    vis_front = float(sl.sample_spot_shadow(
        data, 0, jnp.asarray([[0.0, 0.0, 2.0]]))[0])
    assert vis_behind < 0.2
    assert vis_side > 0.8
    assert vis_front > 0.8


def test_cascade_weights_one_hot():
    spheres = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 5.0],
                           [0.0, 0.0, 12.0], [0.0, 0.0, 30.0]])
    radii2 = jnp.asarray([3.0, 7.0, 15.0, 40.0]) ** 2
    pts = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 9.0], [0.0, 0.0, 25.0],
                       [0.0, 0.0, 65.0], [0.0, 0.0, 200.0]])
    w = np.asarray(sl.cascade_weights_split_spheres(pts, spheres, radii2))
    # each point picks exactly one cascade (or none, for the far point)
    np.testing.assert_allclose(w.sum(-1), [1, 1, 1, 1, 0])
    assert w[0, 0] == 1 and w[1, 1] == 1 and w[2, 2] == 1 and w[3, 3] == 1
