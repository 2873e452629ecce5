#!/usr/bin/env python
"""Mosaic capability probe for the cascaded-PCF fast path (dev tool).

The planned map-mode kernel (VERDICT #4) decomposes the per-froxel 2D atlas
gather into (a) a column gather shared across atlas rows (aligned light basis
makes u independent of froxel y), (b) an in-kernel transpose, (c) a per-column
row gather. All three live or die on Mosaic's take_along_axis / transpose
support, documented so far only as "2D, axis=1, width exactly 128". This
probes each shape variant on the real TPU and prints ok/FAIL per case.
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


def probe(name, fn, *args, expect):
    try:
        out = np.asarray(jax.jit(fn)(*args))
        if np.array_equal(out, expect):
            print(f"ok   {name}")
            return True
        print(f"MISMATCH {name}: max abs diff {np.abs(out - expect).max()}")
        return False
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
        return False


def taa_kernel(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)


def make_taa(src_shape, idx_shape):
    def fn(src, idx):
        return pl.pallas_call(
            taa_kernel,
            out_shape=jax.ShapeDtypeStruct(idx_shape, src.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)
    return fn


def transpose_kernel(src_ref, out_ref):
    out_ref[:] = src_ref[:].T


def make_transpose(shape):
    def fn(src):
        return pl.pallas_call(
            transpose_kernel,
            out_shape=jax.ShapeDtypeStruct(shape[::-1], jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src)
    return fn


def main():
    rng = np.random.default_rng(0)
    ok = True

    for (n, m), kw in [((256, 128), 128), ((256, 1024), 128),
                       ((256, 1024), 256), ((256, 1024), 1024),
                       ((135, 1024), 128), ((240, 1024), 256),
                       ((512, 1024), 512)]:
        src = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, m, (n, kw)), jnp.int32)
        expect = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
        ok &= probe(f"taa src[{n},{m}] idx[{n},{kw}]",
                    make_taa((n, m), (n, kw)), src, idx, expect=expect)

    for shape in [(1024, 256), (1024, 512), (128, 1024), (135, 256)]:
        src = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        ok &= probe(f"transpose {shape}", make_transpose(shape), src,
                    expect=np.asarray(src).T)

    print("PROBE " + ("PASS" if ok else "PARTIAL"))


if __name__ == "__main__":
    main()
