"""Froxel transform contract tests (VolumetricHelper.hlsl:105-186)."""

import numpy as np
import jax.numpy as jnp

from volumetricrenderer_tpu import froxel
from oracle import oracle

GRID = (40, 24, 16)


def _params():
    return froxel.make_froxel_params(
        jnp.deg2rad(60.0), jnp.asarray(16 / 9), jnp.asarray(0.3),
        jnp.asarray(100.0), jnp.asarray(0.5), GRID)


def _oparams():
    return oracle.make_params(np.deg2rad(60.0), 16 / 9, 0.3, 100.0, 0.5, GRID)


def test_packed_params_match_reference_formula():
    p = _params()
    d = GRID[2]
    assert np.isclose(float(p.y), 1.0 / np.tan(np.deg2rad(30.0)))
    assert np.isclose(float(p.x), float(p.y) / (16 / 9))
    assert np.isclose(float(p.z), 0.5 * (d - 0.3 * d / 100.0) + 1.0)
    assert np.isclose(float(p.w), 100.0 / 0.5 / d)


def test_view_froxel_round_trip():
    p = _params()
    rng = np.random.default_rng(0)
    f = rng.uniform([0, 0, 0.01], [GRID[0], GRID[1], GRID[2]], (500, 3)).astype(np.float32)
    view = froxel.froxel_to_view(p, jnp.asarray(f))
    back = froxel.view_to_froxel(p, view)
    np.testing.assert_allclose(np.asarray(back), f, rtol=2e-4, atol=2e-3)


def test_depth_range_maps_to_grid():
    p = _params()
    # froxel z=0 -> near plane, z=D -> volume_distance
    v = froxel.froxel_to_view(p, jnp.asarray([[0.0, 0.0, 0.0],
                                              [0.0, 0.0, float(GRID[2])]]))
    assert np.isclose(float(v[0, 2]), 0.3, atol=1e-5)
    assert np.isclose(float(v[1, 2]), 100.0, rtol=1e-5)


def test_transforms_match_oracle():
    p = _params()
    op = _oparams()
    rng = np.random.default_rng(1)
    f = rng.uniform([0, 0, 0.01], [GRID[0], GRID[1], GRID[2]], (200, 3))
    va = np.asarray(froxel.froxel_to_view(p, jnp.asarray(f, jnp.float32)))
    vb = oracle.froxel_to_view(op, f)
    np.testing.assert_allclose(va, vb, rtol=2e-4, atol=2e-4)

    fa = np.asarray(froxel.view_to_froxel(p, jnp.asarray(vb, jnp.float32)))
    fb = oracle.view_to_froxel(op, vb)
    np.testing.assert_allclose(fa, fb, rtol=1e-4, atol=1e-3)


def test_world_round_trip_with_lookat():
    p = _params()
    pos = jnp.asarray([1.0, 2.0, -3.0])
    fwd = jnp.asarray([0.3, -0.2, 0.9])
    fwd = fwd / jnp.linalg.norm(fwd)
    v2w = froxel.look_at_matrix(pos, fwd, jnp.asarray([0.0, 1.0, 0.0]))
    w2v = froxel.invert_rigid(v2w)
    # orthonormal rotation
    r = np.asarray(v2w)[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    # froxel -> world -> froxel identity
    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.uniform([0, 0, 0.5], [GRID[0], GRID[1], GRID[2]], (100, 3)),
                    jnp.float32)
    world = froxel.froxel_to_world(p, v2w, f)
    back = froxel.world_to_froxel(p, w2v, world)
    np.testing.assert_allclose(np.asarray(back), np.asarray(f), rtol=1e-3, atol=5e-3)


def test_lookat_matches_oracle():
    pos = (1.0, 2.0, -3.0)
    fwd = np.array([0.3, -0.2, 0.9])
    fwd = fwd / np.linalg.norm(fwd)
    a = np.asarray(froxel.look_at_matrix(jnp.asarray(pos, jnp.float32),
                                         jnp.asarray(fwd, jnp.float32),
                                         jnp.asarray([0.0, 1.0, 0.0])))
    b = oracle.look_at_matrix(pos, fwd, (0, 1, 0))
    np.testing.assert_allclose(a, b, atol=1e-6)
