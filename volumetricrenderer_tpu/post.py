"""Minimal post-processing stack.

The reference bundles Unity PostProcessing 2.3.0 (SURVEY §2.7) but its demo
profile only (mis)configures the volumetric entry itself, so the effective post
chain is exposure/tonemap/display. This module provides the pieces BASELINE
config 5 asks for ("composite + post stack"): exposure, bloom, ACES tonemap,
vignette, gamma encode — all fused elementwise/XLA ops.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PostConfig:
    exposure: float = 1.0
    bloom_strength: float = 0.0        # 0 disables bloom
    bloom_threshold: float = 1.0
    bloom_levels: int = 3
    vignette: float = 0.0              # 0 disables
    tonemap: str = "aces"              # "aces" | "none"
    gamma: float = 2.2


def aces_tonemap(x: jax.Array) -> jax.Array:
    """Narkowicz ACES fit."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def _downsample2(img: jax.Array) -> jax.Array:
    h, w, c = img.shape
    h2, w2 = h // 2, w // 2
    img = img[:h2 * 2, :w2 * 2]
    return img.reshape(h2, 2, w2, 2, c).mean(axis=(1, 3))


def _upsample2(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    up = jnp.repeat(jnp.repeat(img, 2, axis=0), 2, axis=1)
    pad_h = max(0, out_h - up.shape[0])
    pad_w = max(0, out_w - up.shape[1])
    if pad_h or pad_w:
        up = jnp.pad(up, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    return up[:out_h, :out_w]


def _blur3(img: jax.Array) -> jax.Array:
    """Separable [1,2,1]/4 blur with edge clamp."""
    k = jnp.asarray([0.25, 0.5, 0.25], img.dtype)
    p = jnp.pad(img, ((1, 1), (0, 0), (0, 0)), mode="edge")
    img = p[:-2] * k[0] + p[1:-1] * k[1] + p[2:] * k[2]
    p = jnp.pad(img, ((0, 0), (1, 1), (0, 0)), mode="edge")
    return p[:, :-2] * k[0] + p[:, 1:-1] * k[1] + p[:, 2:] * k[2]


def bloom(rgb: jax.Array, threshold: float, levels: int) -> jax.Array:
    """Threshold -> downsample pyramid -> blur -> additive upsample chain."""
    bright = jnp.maximum(rgb - threshold, 0.0)
    pyr = []
    cur = bright
    for _ in range(levels):
        cur = _blur3(_downsample2(cur))
        pyr.append(cur)
    out = pyr[-1]
    for lvl in reversed(pyr[:-1]):
        out = lvl + _upsample2(out, lvl.shape[0], lvl.shape[1])
    return _upsample2(out, rgb.shape[0], rgb.shape[1])


def apply_post(image_rgba: jax.Array, cfg: PostConfig) -> jax.Array:
    """HDR composite [H, W, 4] -> display-ready [H, W, 3] in [0, 1]."""
    rgb = image_rgba[..., :3] * cfg.exposure
    if cfg.bloom_strength > 0.0:
        rgb = rgb + cfg.bloom_strength * bloom(rgb, cfg.bloom_threshold,
                                               cfg.bloom_levels)
    if cfg.vignette > 0.0:
        h, w = rgb.shape[:2]
        yy = (jnp.arange(h, dtype=rgb.dtype) + 0.5) / h - 0.5
        xx = (jnp.arange(w, dtype=rgb.dtype) + 0.5) / w - 0.5
        r2 = (xx[None, :] ** 2 + yy[:, None] ** 2) * 2.0
        rgb = rgb * (1.0 - cfg.vignette * r2)[..., None]
    if cfg.tonemap == "aces":
        rgb = aces_tonemap(rgb)
    rgb = jnp.clip(rgb, 0.0, 1.0) ** (1.0 / cfg.gamma)
    return rgb
