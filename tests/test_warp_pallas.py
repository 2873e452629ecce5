"""Pallas windowed warp == XLA windowed warp (same SPEC semantics)."""

import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.ops.pallas.warp import windowed_warp_pallas
from volumetricrenderer_tpu.ops.warp import windowed_warp_sample_3d

D, H, W = 8, 10, 12


def _case(seed, c):
    rng = np.random.default_rng(seed)
    shape = (D, H, W) if c is None else (D, H, W, c)
    vol = rng.random(shape).astype(np.float32)
    zz, yy, xx = np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                             indexing="ij")
    tx = (xx + rng.uniform(-2.5, 2.5)).astype(np.float32)
    ty = (yy + 0.7 * np.sin(xx * 0.3)).astype(np.float32)
    tz = (zz - 0.4 + 0.2 * np.cos(yy * 0.2)).astype(np.float32)
    return vol, tx, ty, tz


def test_pallas_warp_matches_xla_4ch():
    vol, tx, ty, tz = _case(0, 4)
    a = np.asarray(windowed_warp_pallas(jnp.asarray(vol), jnp.asarray(tx),
                                        jnp.asarray(ty), jnp.asarray(tz), k=3,
                                        interpret=True))
    b = np.asarray(windowed_warp_sample_3d(jnp.asarray(vol), jnp.asarray(tx),
                                           jnp.asarray(ty), jnp.asarray(tz),
                                           k=3))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_pallas_warp_matches_xla_1ch():
    vol, tx, ty, tz = _case(1, None)
    a = np.asarray(windowed_warp_pallas(jnp.asarray(vol), jnp.asarray(tx),
                                        jnp.asarray(ty), jnp.asarray(tz), k=2,
                                        interpret=True))
    b = np.asarray(windowed_warp_sample_3d(jnp.asarray(vol), jnp.asarray(tx),
                                           jnp.asarray(ty), jnp.asarray(tz),
                                           k=2))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
