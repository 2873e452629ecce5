"""Debug / observability surface.

Reproduces the reference's debug tooling (SURVEY §4): the `_DEBUG` partial class
with its slice selector + debug composite pass (VolumetricRenderer.cs:684-738,
VolumetricRenderer.shader:97-130) and the froxel-slice gizmo, as pure functions
returning images / stats instead of editor gizmos.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def volume_slice(volume: jax.Array, z: int) -> jax.Array:
    """Extract froxel slice z (the inspector `slice` selector, cs:688-689).
    volume [D, H, W(, C)] -> [H, W(, C)]."""
    return volume[z]


def debug_composite(scene_color: jax.Array, volume_slice_rgba: jax.Array
                    ) -> jax.Array:
    """The debug pass blend `main * a + rgb` (shader:119-127), upsampling the
    slice to the image size with nearest neighbor."""
    ih, iw = scene_color.shape[:2]
    h, w = volume_slice_rgba.shape[:2]
    yi = (jnp.arange(ih) * h // ih).astype(jnp.int32)
    xi = (jnp.arange(iw) * w // iw).astype(jnp.int32)
    up = volume_slice_rgba[yi][:, xi]
    return scene_color * up[..., 3:4] + up[..., :3]


def channel_stats(aux: Dict[str, jax.Array]) -> Dict[str, dict]:
    """Per-volume min/max/mean/nan-count — the 'commented-out alternate outputs'
    style of eyeballing (SURVEY §4), numerically."""
    out = {}
    for name, vol in aux.items():
        v = np.asarray(vol)
        out[name] = dict(shape=tuple(v.shape), min=float(v.min()),
                         max=float(v.max()), mean=float(v.mean()),
                         nans=int(np.isnan(v).sum()))
    return out


def save_png(path: str, rgb) -> None:
    """Write [H, W, 3] float [0,1] (row 0 = bottom) as PNG, no deps beyond stdlib."""
    import struct
    import zlib

    arr = np.asarray(rgb)
    arr = np.clip(arr, 0.0, 1.0)
    img = (arr[::-1] * 255).astype(np.uint8)  # flip to top-down for PNG
    h, w = img.shape[:2]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw, 6))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)
