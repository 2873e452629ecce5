"""Temporal jitter sequence.

7 offsets from a close-packing-of-equal-spheres pattern rotated 15 degrees,
xy in (-0.5, 0.5)^2 and z stratified at (2k+1)/14 — the reference's
GetJitterSequence (VolumetricRenderer.cs:306-335). Selected per frame by
frame_count % 7 (cs:241) and applied in-kernel by adding the offset to the
continuous froxel position (JitterFroxelPos, VolumetricHelper.hlsl:115-122).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def jitter_sequence() -> np.ndarray:
    """[7, 3] float32 jitter offsets (x, y, z)."""
    r = 0.17054068870105443882
    d = 2.0 * r
    s = r * math.sqrt(3.0)
    seq = np.array(
        [
            [0.0, 0.0, 3.0 / 14.0],
            [-d, 0.0, 11.0 / 14.0],
            [d, 0.0, 1.0 / 14.0],
            [-r, -s, 9.0 / 14.0],
            [r, s, 7.0 / 14.0],
            [r, -s, 13.0 / 14.0],
            [-r, s, 5.0 / 14.0],
        ],
        dtype=np.float64,
    )
    cos15 = 0.96592582628906828675
    sin15 = 0.25881904510252076235
    x = seq[:, 0] * cos15 - seq[:, 1] * sin15
    y = seq[:, 0] * sin15 + seq[:, 1] * cos15
    seq[:, 0] = x
    seq[:, 1] = y
    return seq.astype(np.float32)


JITTER_SEQUENCE = jnp.asarray(jitter_sequence())


def jitter_for_frame(frame_count):
    """Offset for a (traced or static) frame counter (cs:241)."""
    return JITTER_SEQUENCE[jnp.asarray(frame_count) % 7]
