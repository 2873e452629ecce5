"""Tileable noise tests."""

import numpy as np
import jax.numpy as jnp

from volumetricrenderer_tpu.ops.noise import perlin_3d, perlin_texture_3d
from volumetricrenderer_tpu.ops.sampling import trilinear_sample_3d


def test_texture_is_tileable():
    tex = perlin_texture_3d(16, octaves=2, period=2)
    # noise at uvw and uvw+1 (one full tile) must match: evaluate procedurally
    rng = np.random.default_rng(0)
    uvw = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    a = perlin_3d(uvw, octaves=2, period=2, xp=np)
    b = perlin_3d(uvw + np.array([1.0, 0.0, 0.0], np.float32), octaves=2,
                  period=2, xp=np)
    c = perlin_3d(uvw + np.array([0.0, 1.0, 1.0], np.float32), octaves=2,
                  period=2, xp=np)
    np.testing.assert_allclose(a, b, atol=1e-5)
    np.testing.assert_allclose(a, c, atol=1e-5)


def test_texture_in_unit_range_and_nonconstant():
    tex = perlin_texture_3d(16)
    assert tex.min() >= 0.0 and tex.max() <= 1.0
    assert tex.std() > 0.02


def test_procedural_matches_jax_and_numpy():
    rng = np.random.default_rng(1)
    uvw = rng.uniform(-2, 3, (64, 3)).astype(np.float32)
    a = perlin_3d(uvw, xp=np)
    b = np.asarray(perlin_3d(jnp.asarray(uvw), xp=jnp))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_texture_equals_procedural_at_texel_centers():
    n = 8
    tex = perlin_texture_3d(n, octaves=1, period=2)
    # wrap-sampling the texture exactly at texel centers reproduces the bake
    idx = np.stack(np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                               indexing="ij"), axis=-1).astype(np.float32)
    texel = idx[..., ::-1]  # (x, y, z)
    out = np.asarray(trilinear_sample_3d(jnp.asarray(tex), jnp.asarray(texel),
                                         wrap=True))
    np.testing.assert_allclose(out, tex, atol=1e-6)
