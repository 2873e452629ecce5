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
    # Color grading (PostProcessing 2.3.0 ColorGrading's LDR controls,
    # LUT-free closed forms): lift/gamma/gain per the ASC CDL-style model,
    # saturation/contrast around mid-gray.
    grade_lift: tuple = (0.0, 0.0, 0.0)
    grade_gamma: tuple = (1.0, 1.0, 1.0)
    grade_gain: tuple = (1.0, 1.0, 1.0)
    saturation: float = 1.0
    contrast: float = 1.0
    # Chromatic aberration: radial R/B channel shift in pixels at the corner
    # (static integer-shift approximation - gather-free).
    chromatic_aberration: float = 0.0
    # Film grain strength (hash-noise, Random.hlsl-style construction).
    grain: float = 0.0
    grain_seed: int = 0


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


def chromatic_aberration(rgb: jax.Array, strength_px: float) -> jax.Array:
    """Radial R/B shift approximated by one static pixel shift per half:
    R shifts outward, B inward, scaled by a radial mask (gather-free; the
    engine effect warps along the radius with a spectral LUT)."""
    h, w = rgb.shape[:2]
    yy = (jnp.arange(h, dtype=rgb.dtype) + 0.5) / h - 0.5
    xx = (jnp.arange(w, dtype=rgb.dtype) + 0.5) / w - 0.5
    r2 = jnp.minimum((xx[None, :] ** 2 + yy[:, None] ** 2) * 4.0, 1.0)
    amt = jnp.clip(strength_px, 0.0, 8.0) * r2[..., None]

    def shifted(img, s):
        # shift towards the center by s pixels along each axis' sign
        left = jnp.concatenate([img[:, s:], img[:, -1:].repeat(s, 1)], axis=1)
        right = jnp.concatenate([img[:, :1].repeat(s, 1), img[:, :-s]], axis=1)
        xs = jnp.where(xx[None, :, None] > 0, left, right)
        up = jnp.concatenate([xs[s:], xs[-1:].repeat(s, 0)], axis=0)
        dn = jnp.concatenate([xs[:1].repeat(s, 0), xs[:-s]], axis=0)
        return jnp.where(yy[:, None, None] > 0, up, dn)

    r_in = shifted(rgb[..., :1], 1)
    b_in = shifted(rgb[..., 2:3], 2)
    frac = amt  # blend amount toward the shifted sample
    r = rgb[..., :1] + frac[..., :1] * 0.5 * (r_in - rgb[..., :1])
    b = rgb[..., 2:3] + frac[..., :1] * 0.5 * (b_in - rgb[..., 2:3])
    return jnp.concatenate([r, rgb[..., 1:2], b], axis=-1)


def color_grade(rgb: jax.Array, cfg: PostConfig) -> jax.Array:
    """Lift/gamma/gain (ASC CDL-style) + saturation + contrast around 0.5."""
    lift = jnp.asarray(cfg.grade_lift, rgb.dtype)
    gamma = jnp.asarray(cfg.grade_gamma, rgb.dtype)
    gain = jnp.asarray(cfg.grade_gain, rgb.dtype)
    x = jnp.clip(rgb, 0.0, None)
    x = jnp.clip(x * gain + lift * (1.0 - x), 0.0, None)
    x = x ** (1.0 / jnp.maximum(gamma, 1e-4))
    luma = (0.2126 * x[..., 0] + 0.7152 * x[..., 1]
            + 0.0722 * x[..., 2])[..., None]
    x = luma + cfg.saturation * (x - luma)
    return 0.5 + cfg.contrast * (x - 0.5) if cfg.contrast != 1.0 else x


def film_grain(rgb: jax.Array, strength: float, seed: int) -> jax.Array:
    """Hash-noise grain (JenkinsHash-style integer mix, Random.hlsl:9-51),
    luminance-masked so shadows carry more grain (engine behavior)."""
    h, w = rgb.shape[:2]
    ix = jnp.arange(w, dtype=jnp.uint32)[None, :]
    iy = jnp.arange(h, dtype=jnp.uint32)[:, None]
    hsh = (ix * jnp.uint32(0x8da6b343) + iy * jnp.uint32(0xd8163841)
           + jnp.uint32((seed * 0x9E3779B9) & 0xFFFFFFFF))
    hsh = hsh ^ (hsh >> jnp.uint32(13))
    hsh = hsh * jnp.uint32(0x85ebca6b)
    hsh = hsh ^ (hsh >> jnp.uint32(16))
    n = hsh.astype(jnp.float32) * (1.0 / 4294967295.0) - 0.5
    luma = 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    mask = 1.0 - jnp.clip(luma, 0.0, 1.0) * 0.5
    return rgb + (strength * n * mask)[..., None]


def apply_post(image_rgba: jax.Array, cfg: PostConfig) -> jax.Array:
    """HDR composite [H, W, 4] -> display-ready [H, W, 3] in [0, 1]."""
    rgb = image_rgba[..., :3] * cfg.exposure
    if cfg.chromatic_aberration > 0.0:
        rgb = chromatic_aberration(rgb, cfg.chromatic_aberration)
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
    if (cfg.grade_lift != (0.0, 0.0, 0.0) or cfg.grade_gamma != (1.0, 1.0, 1.0)
            or cfg.grade_gain != (1.0, 1.0, 1.0) or cfg.saturation != 1.0
            or cfg.contrast != 1.0):
        rgb = color_grade(rgb, cfg)
    if cfg.grain > 0.0:
        rgb = film_grain(rgb, cfg.grain, cfg.grain_seed)
    rgb = jnp.clip(rgb, 0.0, 1.0) ** (1.0 / cfg.gamma)
    return rgb
