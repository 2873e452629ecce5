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


def test_pallas_warp_fused_weight_blend():
    """blend_weight mode == warp-then-lerp (shadow temporal blend)."""
    vol, tx, ty, tz = _case(2, None)
    cur = np.random.default_rng(9).random(vol.shape).astype(np.float32)
    w = np.random.default_rng(10).random(vol.shape).astype(np.float32)
    warped = windowed_warp_sample_3d(jnp.asarray(vol), jnp.asarray(tx),
                                     jnp.asarray(ty), jnp.asarray(tz), k=3)
    ref = cur + np.asarray(warped - cur) * w
    out = windowed_warp_pallas(jnp.asarray(vol), jnp.asarray(tx),
                               jnp.asarray(ty), jnp.asarray(tz), k=3,
                               interpret=True, blend_cur=jnp.asarray(cur),
                               blend_weight=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_pallas_warp_fused_alpha_blend():
    """blend_alpha mode == warp-then-lerp with prev.a != 0 success
    (accumulation temporal blend, compute:257)."""
    vol, tx, ty, tz = _case(3, 4)
    # zero out a region of the alpha channel so the success mask has holes
    vol[:, :3, :, 3] = 0.0
    vol[..., 3] = np.where(vol[..., 3] < 0.3, 0.0, vol[..., 3])
    cur = np.random.default_rng(11).random(vol.shape).astype(np.float32)
    alpha = 0.84
    warped = np.asarray(windowed_warp_sample_3d(
        jnp.asarray(vol), jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(tz),
        k=3))
    success = (warped[..., 3] != 0.0).astype(np.float32)
    ref = cur + (warped - cur) * (alpha * success)[..., None]
    out = windowed_warp_pallas(jnp.asarray(vol), jnp.asarray(tx),
                               jnp.asarray(ty), jnp.asarray(tz), k=3,
                               interpret=True, blend_cur=jnp.asarray(cur),
                               blend_alpha=jnp.float32(alpha))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)
