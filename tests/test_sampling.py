"""Sampling op tests: stencil shift == generic trilinear == oracle trilinear."""

import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.ops import sampling
from oracle import oracle as onp


def test_shift_sample_equals_trilinear_gather():
    rng = np.random.default_rng(0)
    vol = rng.uniform(0, 1, (8, 6, 10, 4)).astype(np.float32)  # [D, H, W, C]
    for offset in [(0.2, -0.3, 0.4), (0.0, 0.0, 0.0), (-0.49, 0.49, 0.93),
                   (0.33, 0.21, 0.07)]:
        out = np.asarray(sampling.shift_sample_3d(jnp.asarray(vol),
                                                  jnp.asarray(offset, jnp.float32)))
        d, h, w = vol.shape[:3]
        zz, yy, xx = np.meshgrid(np.arange(d), np.arange(h), np.arange(w),
                                 indexing="ij")
        pos = np.stack([xx + offset[0], yy + offset[1], zz + offset[2]],
                       axis=-1).astype(np.float32)
        ref = np.asarray(sampling.trilinear_sample_3d(jnp.asarray(vol),
                                                      jnp.asarray(pos)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_trilinear_matches_oracle_clamp():
    rng = np.random.default_rng(1)
    vol = rng.uniform(0, 1, (6, 5, 7, 4)).astype(np.float32)
    pos = rng.uniform(-1.5, 8.0, (50, 3)).astype(np.float32)
    a = np.asarray(sampling.trilinear_sample_3d(jnp.asarray(vol), jnp.asarray(pos)))
    b = onp.trilinear(vol.astype(np.float64), pos.astype(np.float64))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_trilinear_matches_oracle_wrap():
    rng = np.random.default_rng(2)
    vol = rng.uniform(0, 1, (4, 4, 4)).astype(np.float32)
    pos = rng.uniform(-6.0, 9.0, (40, 3)).astype(np.float32)
    a = np.asarray(sampling.trilinear_sample_3d(jnp.asarray(vol), jnp.asarray(pos),
                                                wrap=True))
    b = onp.trilinear(vol.astype(np.float64), pos.astype(np.float64), wrap=True)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_trilinear_exact_at_texel_centers():
    rng = np.random.default_rng(3)
    vol = rng.uniform(0, 1, (5, 6, 7)).astype(np.float32)
    zz, yy, xx = np.meshgrid(np.arange(5), np.arange(6), np.arange(7), indexing="ij")
    pos = np.stack([xx, yy, zz], axis=-1).astype(np.float32)
    out = np.asarray(sampling.trilinear_sample_3d(jnp.asarray(vol),
                                                  jnp.asarray(pos)))
    np.testing.assert_allclose(out, vol, rtol=1e-6)
