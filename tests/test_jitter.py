"""Jitter sequence tests (VolumetricRenderer.cs:306-335)."""

import numpy as np

from volumetricrenderer_tpu.jitter import jitter_sequence
from oracle import oracle


def test_bounds_and_stratification():
    seq = jitter_sequence()
    assert seq.shape == (7, 3)
    assert np.all(np.abs(seq[:, :2]) < 0.5)
    # z values are (2k+1)/14, each exactly once
    z = np.sort(seq[:, 2])
    np.testing.assert_allclose(z, (2 * np.arange(7) + 1) / 14.0, atol=1e-6)


def test_xy_mean_near_center():
    seq = jitter_sequence()
    assert np.linalg.norm(seq[:, :2].mean(axis=0)) < 1e-6


def test_rotation_preserves_radii():
    # the unrotated pattern has radii {0, 2r, 2r, 2r, 2r, 2r, 2r}
    seq = jitter_sequence()
    r = 0.17054068870105443882
    radii = np.sort(np.linalg.norm(seq[:, :2], axis=1))
    np.testing.assert_allclose(radii[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(radii[1:], 2 * r, atol=1e-6)


def test_matches_oracle():
    np.testing.assert_allclose(jitter_sequence(), oracle.jitter_sequence(),
                               atol=1e-6)
