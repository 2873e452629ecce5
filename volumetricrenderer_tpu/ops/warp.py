"""Gather-free windowed warp resampling.

XLA TPU gathers execute ~one element per scalar-core step (~8 ns/element,
measured: a 4.2M-element take = 35 ms), so per-element random access is off the
table for per-frame passes. Temporal reprojection, however, is a *near-identity*
warp: between consecutive frames the previous-frame froxel position of a froxel
differs from its own position by at most a few cells. That bounded offset turns
the resample into a fixed stencil:

    out[p] = sum_d  tent(target_axis(p) - (p_axis + d)) * shift(vol, d, axis)

with d in [-K, K] — static shifts (pad + slice) and elementwise tent weights,
pure VPU work. The three axes are applied as *sequential 1D passes* (z, then y,
then x), each using the target coordinate evaluated at the output point. For a
warp whose offset field varies slowly (any camera reprojection), this separable
form deviates from joint trilinear only at second order in the offset
gradients; SPEC.md documents it as the reprojection sampling semantics, and the
oracle implements the same algorithm, so parity is exact. Offsets beyond the
window clamp to the window edge (large motion ~ reprojection failure anyway).

The reference's counterpart is a hardware trilinear fetch
(VolumetricCompute.compute:205-258); on GPU texture units that's free — this is
the TPU-native equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _axis_pass(vol: jax.Array, target: jax.Array, axis: int, k: int) -> jax.Array:
    """1D windowed linear resample of `vol` along spatial `axis` (0=z, 1=y,
    2=x) at per-element `target` coordinates (in index units of that axis).
    vol [D, H, W, C] (channels LAST — no relayout on TPU; channel-moving
    transposes of C-minor volumes cost ~10 ms at full size, measured);
    target [D, H, W]. Offsets clamp to [-k, k]."""
    n = vol.shape[axis]
    base = lax.broadcasted_iota(jnp.float32, target.shape, axis)
    off = jnp.clip(target - base, -k, k)

    pad_cfg = [(0, 0)] * vol.ndim
    pad_cfg[axis] = (k, k)
    pvol = jnp.pad(vol, pad_cfg, mode="edge")

    # taps span [-k, k]: the offset is clipped to [-k, k], so a d = k+1 tap's
    # tent weight max(0, 1 - |off - (k+1)|) is identically zero — not a tap
    out = jnp.zeros_like(vol)
    for d in range(-k, k + 1):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(off - d))
        idx = [slice(None)] * vol.ndim
        idx[axis] = slice(k + d, k + d + n)
        out = out + pvol[tuple(idx)] * w[..., None]
    return out


def windowed_warp_sample_3d(vol: jax.Array, target_x: jax.Array,
                            target_y: jax.Array, target_z: jax.Array,
                            k: int = 4) -> jax.Array:
    """Resample vol at per-element texel coords (target_x/y/z), each [D, H, W],
    via three sequential windowed 1D passes (z, y, x). vol is [D, H, W] or
    [D, H, W, C] (channels last). Clamp-to-edge outside the volume (targets
    are clamped to valid texel range first, matching a clamp sampler)."""
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[..., None]
    d, h, w, _ = vol.shape
    tz = jnp.clip(target_z, 0.0, d - 1.0)
    ty = jnp.clip(target_y, 0.0, h - 1.0)
    tx = jnp.clip(target_x, 0.0, w - 1.0)
    out = _axis_pass(vol, tz, 0, k)
    out = _axis_pass(out, ty, 1, k)
    out = _axis_pass(out, tx, 2, k)
    return out[..., 0] if squeeze else out
