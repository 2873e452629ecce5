"""Gather-free composite via tent-weight matmuls, pure XLA.

Same algorithm as ops/pallas/composite.py (per-pixel z-lerp expressed as a
tent-weight matrix contracted on the MXU; XY taps are static shifts because the
screen maps to the froxel grid at an integer ratio), but expressed as a
`lax.scan` over froxel rows so XLA's native batched dot_general does the work.
~20x faster than the per-pixel gather path on TPU (gathers are serial on the
scalar core); the Pallas version fuses the tent construction into VMEM and is
faster still where Mosaic cooperates.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.ops.pallas.composite import _cell_weights


PRECISIONS = {"highest": jax.lax.Precision.HIGHEST,
              "high": jax.lax.Precision.HIGH,
              "default": jax.lax.Precision.DEFAULT}


def composite_tentmm(accumulation: jax.Array, scene_color: jax.Array,
                     fz_texel: jax.Array, grid_whd: Tuple[int, int, int],
                     precision: str = "highest") -> jax.Array:
    """accumulation [D,H,W,4]; scene_color [IH,IW,3]; fz_texel [IH,IW].
    Returns [IH,IW,4]. Requires IH % H == 0 and IW % W == 0.

    precision: MXU pass count for the tent dots — "highest" (6 bf16 passes,
    exact trilinear), "high" (3 passes, ~1e-6), "default" (1 pass, ~0.4%)."""
    w, h, d = grid_whd
    ih, iw = fz_texel.shape
    py, px = ih // h, iw // w
    cellpx = py * px

    fz = jnp.clip(fz_texel, 0.0, d - 1.0)
    fz_c = fz.reshape(h, py, w, px).transpose(0, 2, 1, 3).reshape(h, w, cellpx)

    # [H, W, D, C] with one-column x-padding (edge clamp).
    acc_t = jnp.transpose(accumulation, (1, 2, 0, 3))
    acc_t = jnp.concatenate([acc_t[:, :1], acc_t, acc_t[:, -1:]], axis=1)

    weights = jnp.asarray(_cell_weights(py, px))          # [9, cellpx]
    zi = jnp.arange(d, dtype=jnp.float32)

    # Batch several froxel rows per map step: bigger batched dots utilize the
    # MXU better and cut lax.map's per-step overhead.
    nb = 5 if h % 5 == 0 else (3 if h % 3 == 0 else 1)

    def rows(y0):
        def one(dy_off):
            ys = jnp.clip(y0 + dy_off, 0, h - 1)
            return jax.lax.dynamic_index_in_dim(acc_t, ys, 0, keepdims=False)

        out_rows = []
        for j in range(nb):
            rows3 = [one(j - 1), one(j), one(j + 1)]      # [W+2, D, C] each
            rhs = jnp.concatenate(
                [r[dx:dx + w] for r in rows3 for dx in range(3)], axis=-1)
            fzr = jax.lax.dynamic_index_in_dim(fz_c, y0 + j, 0, keepdims=False)
            t = jnp.maximum(0.0, 1.0 - jnp.abs(fzr[..., None] - zi))
            out = jax.lax.dot_general(
                t, rhs, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=PRECISIONS[precision])          # [W, cp, 9C]
            out = out.reshape(w, cellpx, 9, 4)
            out = jnp.sum(out * weights.T[None, :, :, None], axis=2)
            # emit SCREEN-row-major [py, W*px, C] per froxel row (cp is
            # py-major): the per-step transpose fuses into the dot's output
            # here, while a whole-image unshuffle after the map is a strided
            # 33 MB copy+reshape (~1.6 ms measured at 1080p, copy.74 in the
            # device trace)
            out = out.reshape(w, py, px, 4).transpose(1, 0, 2, 3)
            out_rows.append(out.reshape(py, w * px, 4))
        return jnp.stack(out_rows)

    out_rows = jax.lax.map(rows, jnp.arange(0, h, nb))    # [H/nb, nb, py, IW, C]

    out = out_rows.reshape(ih, iw, 4)
    trans = out[..., 3:4]
    rgb = scene_color * trans + out[..., :3]
    return jnp.concatenate([rgb, trans], axis=-1)
