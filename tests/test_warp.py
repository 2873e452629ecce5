"""Windowed warp resampling tests (ops/warp.py vs oracle + exact trilinear)."""

import jax.numpy as jnp
import numpy as np

from oracle import oracle as onp
from volumetricrenderer_tpu.ops.sampling import trilinear_sample_3d
from volumetricrenderer_tpu.ops.warp import windowed_warp_sample_3d

D, H, W = 10, 12, 14


def _grid_targets(offset):
    zz, yy, xx = np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                             indexing="ij")
    return (xx + offset[0]).astype(np.float32), \
        (yy + offset[1]).astype(np.float32), \
        (zz + offset[2]).astype(np.float32)


def test_constant_offset_matches_exact_trilinear():
    rng = np.random.default_rng(0)
    vol = rng.random((D, H, W, 4)).astype(np.float32)
    for off in [(0.3, -0.6, 1.2), (0.0, 0.0, 0.0), (-2.5, 1.5, 0.5)]:
        tx, ty, tz = _grid_targets(off)
        out = np.asarray(windowed_warp_sample_3d(
            jnp.asarray(vol), jnp.asarray(tx), jnp.asarray(ty),
            jnp.asarray(tz), k=4))
        pos = np.stack([np.clip(tx, 0, W - 1), np.clip(ty, 0, H - 1),
                        np.clip(tz, 0, D - 1)], axis=-1)
        ref = np.asarray(trilinear_sample_3d(jnp.asarray(vol), jnp.asarray(pos)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_matches_oracle_windowed_warp():
    rng = np.random.default_rng(1)
    vol = rng.random((D, H, W, 4)).astype(np.float32)
    # smooth spatially-varying offsets
    zz, yy, xx = np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                             indexing="ij")
    tx = (xx + 0.8 * np.sin(yy * 0.2)).astype(np.float32)
    ty = (yy + 0.5 * np.cos(xx * 0.15)).astype(np.float32)
    tz = (zz + 0.3 * np.sin(xx * 0.1)).astype(np.float32)
    out = np.asarray(windowed_warp_sample_3d(
        jnp.asarray(vol), jnp.asarray(tx), jnp.asarray(ty),
        jnp.asarray(tz), k=3))
    texel = np.stack([tx, ty, tz], axis=-1).astype(np.float64)
    ref = onp.windowed_warp(vol.astype(np.float64), texel, k=3)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_close_to_joint_trilinear_for_smooth_warps():
    rng = np.random.default_rng(2)
    vol = rng.random((D, H, W)).astype(np.float32)
    zz, yy, xx = np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                             indexing="ij")
    # gentle warp (reprojection-scale): offsets < 1, gradients ~0.05
    tx = (xx + 0.5 + 0.05 * yy / H).astype(np.float32)
    ty = (yy - 0.3 + 0.05 * zz / D).astype(np.float32)
    tz = (zz + 0.2).astype(np.float32)
    out = np.asarray(windowed_warp_sample_3d(jnp.asarray(vol), jnp.asarray(tx),
                                             jnp.asarray(ty), jnp.asarray(tz)))
    pos = np.stack([np.clip(tx, 0, W - 1), np.clip(ty, 0, H - 1),
                    np.clip(tz, 0, D - 1)], axis=-1)
    ref = np.asarray(trilinear_sample_3d(jnp.asarray(vol), jnp.asarray(pos)))
    assert np.abs(out - ref).max() < 5e-3


def test_offsets_beyond_window_clamp():
    vol = np.zeros((D, H, W), np.float32)
    vol[:, :, 10] = 1.0
    tx, ty, tz = _grid_targets((20.0, 0.0, 0.0))  # way outside k=2 window
    out = np.asarray(windowed_warp_sample_3d(jnp.asarray(vol), jnp.asarray(tx),
                                             jnp.asarray(ty), jnp.asarray(tz),
                                             k=2))
    # each element reads at most x+2 -> column 10 seen only from x=8
    assert out[0, 0, 8] == 1.0
    assert out[0, 0, 0] == 0.0
