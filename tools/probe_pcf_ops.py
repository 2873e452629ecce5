#!/usr/bin/env python
"""Mosaic bisect probe for the PCF kernel's op patterns (dev tool).

Each stage is a minimal kernel exercising ONE op pattern from
ops/pallas/pcf_shadow.py at the production shapes; run with
PCF_OPS_STAGE=<name> to compile just that stage on the TPU and find which
pattern trips the `vector_extract_strided_slice (limits 64 vs dim 1)` crash.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 512
XP = 512
YP = 256
W, H = 240, 135
S2 = 512


def run(name, kernel, inputs, out_shape, in_specs, out_specs):
    f = pl.pallas_call(kernel, grid=(2,), in_specs=in_specs,
                       out_specs=out_specs, out_shape=out_shape)
    try:
        out = np.asarray(jax.block_until_ready(jax.jit(f)(*inputs)))
        print(f"{name}: ok sum={out.sum():.3f}", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:200]}", flush=True)
        return False


def vmem(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def smem(shape):
    return pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                        memory_space=pltpu.SMEM)


def full_out():
    return (jax.ShapeDtypeStruct((2, H, W), jnp.float32),
            vmem((1, H, W), lambda i: (i, 0, 0)))


def main():
    stage = os.environ.get("PCF_OPS_STAGE", "all")
    atlas = jnp.arange(S2 * S2, dtype=jnp.float32).reshape(S2, S2) / (S2 * S2)
    scal = jnp.asarray([[1.0, 2.0]], jnp.float32)
    blk = jnp.asarray([[2, 1]], jnp.int32)

    results = {}

    # A: dynamic 2D window read from VMEM atlas, traced block starts from SMEM
    def k_a(blk_ref, atlas_ref, out_ref):
        vst = blk_ref[0, 0] * 128
        ust = pl.multiple_of(blk_ref[0, 1] * 128, 128)
        awin = atlas_ref[pl.ds(vst, WIN), pl.ds(ust, 128)]
        out_ref[0] = jnp.sum(awin) + jnp.zeros((H, W), jnp.float32)

    if stage in ("all", "a"):
        o, os_ = full_out()
        results["a_dyn_window"] = run(
            "a_dyn_window", k_a, (blk, atlas), o,
            [smem((1, 2)), vmem((S2, S2), lambda i: (0, 0))], os_)

    # B: 512-wide windowed take_along_axis (4x 128 blocks + select)
    def taa_win(src, idx, win):
        out = jnp.zeros(idx.shape, jnp.float32)
        for k in range(win // 128):
            local = jnp.clip(idx - 128 * k, 0, 127)
            g = jnp.take_along_axis(src[:, 128 * k:128 * (k + 1)], local,
                                    axis=1)
            out = jnp.where(idx // 128 == k, g, out)
        return out

    def k_b(atlas_ref, out_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (WIN, 128), 1)
        g = taa_win(atlas_ref[...], (rows * 3) % WIN, WIN)
        out_ref[0] = jnp.sum(g) + jnp.zeros((H, W), jnp.float32)

    if stage in ("all", "b"):
        o, os_ = full_out()
        results["b_taa512"] = run(
            "b_taa512", k_b, (atlas,), o,
            [vmem((S2, S2), lambda i: (0, 0))], os_)

    # C: [512, 512] in-VMEM transpose
    def k_c(atlas_ref, out_ref):
        out_ref[0] = jnp.sum(atlas_ref[...].T) + jnp.zeros((H, W), jnp.float32)

    if stage in ("all", "c"):
        o, os_ = full_out()
        results["c_transpose512"] = run(
            "c_transpose512", k_c, (atlas,), o,
            [vmem((S2, S2), lambda i: (0, 0))], os_)

    # D: non-aligned slice + transpose ([512, 256] -> [240, :135].T)
    def k_d(atlas_ref, out_ref):
        g = atlas_ref[...][:, :YP]                    # [512, 256]
        p = g[XP // 2:XP // 2 + W, :H].T              # [135, 240]
        out_ref[0] = p

    if stage in ("all", "d"):
        o, os_ = full_out()
        results["d_slice_T"] = run(
            "d_slice_T", k_d, (atlas,), o,
            [vmem((S2, S2), lambda i: (0, 0))], os_)

    # E: same but pad-transpose-slice (transpose at aligned shape, then slice)
    def k_e(atlas_ref, out_ref):
        g = atlas_ref[...][:, :YP]                    # [512, 256]
        t = g.T                                       # [256, 512] aligned
        out_ref[0] = t[:H, XP // 2:XP // 2 + W]

    if stage in ("all", "e"):
        o, os_ = full_out()
        results["e_T_slice"] = run(
            "e_T_slice", k_e, (atlas,), o,
            [vmem((S2, S2), lambda i: (0, 0))], os_)

    # F: take_along_axis at width 128 on a TRANSPOSED source
    def k_f(atlas_ref, out_ref):
        ct = atlas_ref[...].T
        rows = jax.lax.broadcasted_iota(jnp.int32, (XP, 128), 1)
        g = taa_win(ct, (rows * 5) % WIN, WIN)
        out_ref[0] = jnp.sum(g) + jnp.zeros((H, W), jnp.float32)

    if stage in ("all", "f"):
        o, os_ = full_out()
        results["f_taa_on_T"] = run(
            "f_taa_on_T", k_f, (atlas,), o,
            [vmem((S2, S2), lambda i: (0, 0))], os_)

    print("summary:", {k: v for k, v in results.items()})


if __name__ == "__main__":
    main()


def composite_stages():
    """Build the real cascade_body up in stages (g, h, i) at real shapes."""
    stage = os.environ.get("PCF_OPS_STAGE", "g")
    atlas = jnp.arange(S2 * S2, dtype=jnp.float32).reshape(S2, S2) / (S2 * S2)
    coef = jnp.asarray([[[0.5, 10.0, 0.01, 0.45, 20.0, 1e-3, 1e-3, 0.2]] * 4],
                       jnp.float32)                      # [1, C, 8]
    winb = jnp.asarray([[[1, 1]] * 4], jnp.int32)        # [1, C, 2]

    def taa_win(src, idx, win):
        out = jnp.zeros(idx.shape, jnp.float32)
        for k in range(win // 128):
            local = jnp.clip(idx - 128 * k, 0, 127)
            g = jnp.take_along_axis(src[:, 128 * k:128 * (k + 1)], local,
                                    axis=1)
            out = jnp.where(idx // 128 == k, g, out)
        return out

    def body(coef_ref, winb_ref, atlas_ref, out_ref):
        row_xp = jax.lax.broadcasted_iota(jnp.int32, (WIN, XP), 1)
        x_of_xp = jnp.where(row_xp >= XP // 2, row_xp - XP // 2, row_xp)
        dx_of_xp = (row_xp >= XP // 2).astype(jnp.int32)
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (XP, 128), 0)
        x_of_r = jnp.where(rows2 >= XP // 2, rows2 - XP // 2, rows2) \
            .astype(jnp.float32)

        acc = jnp.zeros((H, W), jnp.float32)
        for ci in range(2):
            q = lambda i: coef_ref[0, ci, i]
            a_u, c_u = q(0), q(1)
            a_v, b_v, c_v = q(2), q(3), q(4)
            vst = winb_ref[0, ci, 0] * 128
            ust = pl.multiple_of(winb_ref[0, ci, 1] * 128, 128)

            u_xp = a_u * x_of_xp.astype(jnp.float32) + c_u
            gu = jnp.clip(jnp.floor(u_xp).astype(jnp.int32) + dx_of_xp,
                          0, S2 - 1)
            idx_u = jnp.clip(gu - ust, 0, WIN - 1)
            awin = atlas_ref[pl.ds(vst, WIN), pl.ds(ust, WIN)]
            cols = []
            for qk in range(XP // 128):
                cols.append(taa_win(awin, idx_u[:, 128 * qk:128 * (qk + 1)],
                                    WIN))
            cmat = jnp.concatenate(cols, axis=1)
            ct = cmat.T
            if stage == "g":
                acc = acc + jnp.sum(ct) + jnp.zeros((H, W), jnp.float32)
                continue

            taps = []
            for dy in (0, 1):
                chunks = []
                for m in range(YP // 128):
                    y_l = (jax.lax.broadcasted_iota(jnp.int32, (XP, 128), 1)
                           + 128 * m).astype(jnp.float32)
                    v_t = a_v * x_of_r + b_v * y_l + c_v
                    gv = jnp.clip(jnp.floor(v_t).astype(jnp.int32) + dy,
                                  0, S2 - 1)
                    idx_v = jnp.clip(gv - vst, 0, WIN - 1)
                    chunks.append(taa_win(ct, idx_v, WIN))
                taps.append(jnp.concatenate(chunks, axis=1))
            if stage == "h":
                acc = acc + jnp.sum(taps[0]) + jnp.sum(taps[1]) \
                    + jnp.zeros((H, W), jnp.float32)
                continue

            def plane(g, dx):
                return g[dx * (XP // 2):dx * (XP // 2) + W, :H].T
            t00 = plane(taps[0], 0)
            t01 = plane(taps[0], 1)
            t10 = plane(taps[1], 0)
            t11 = plane(taps[1], 1)
            acc = acc + t00 + t01 + t10 + t11
        out_ref[0] = acc

    o, os_ = full_out()
    run(f"stage_{stage}", body, (coef, winb, atlas), o,
        [smem((1, 4, 8)), smem((1, 4, 2)), vmem((S2, S2), lambda i: (0, 0))],
        os_)


if os.environ.get("PCF_OPS_STAGE", "") in ("g", "h", "i"):
    composite_stages()
