"""Probe: data-dependent tent-tap culling for the megakernel's z-warps.

The temporal warps statically unroll 2k+1 z taps per channel; per slice the
tent weight of tap dd is nonzero only for dd in [floor(min off_z),
ceil(max off_z)] — with a slow/static camera that's 2-3 of 9. This probe
checks the Mosaic patterns the dynamic form needs on the real TPU:

  g1: jnp.min/jnp.max of an [h, w] plane -> scalar loop bounds of a
      fori_loop whose body reads a VMEM ring with a traced leading index
      (pl.ds(mod)) and carries an [h, w] vector accumulation.
  g2: the same with the static 9-tap reference in the SAME kernel — bitwise
      equality of the two results (skipped taps contribute exactly 0.0).

Run: python tools/probe_dynwarp.py  (needs the TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, K = 64, 128, 4
RN = 2 * K + 2


def _kernel(ring_ref, off_ref, out_dyn_ref, out_ref_ref):
    z = pl.program_id(0)
    off = off_ref[0]

    # static 9-tap reference (the current megakernel form)
    acc = jnp.zeros((H, W), jnp.float32)
    for dd in range(-K, K + 1):
        s = jnp.clip(z + dd, 0, 7)
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(off - dd))
        acc = acc + ring_ref[pl.ds(jnp.mod(s, RN), 1)][0] * wz
    out_ref_ref[0] = acc

    # dynamic-bound taps: dd in [floor(min off), ceil(max off)] clamped
    lo = jnp.maximum(jnp.floor(jnp.min(off)).astype(jnp.int32), -K)
    hi = jnp.minimum(jnp.ceil(jnp.max(off)).astype(jnp.int32), K)

    def body(dd, a):
        s = jnp.clip(z + dd, 0, 7)
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(off - dd.astype(jnp.float32)))
        return a + ring_ref[pl.ds(jnp.mod(s, RN), 1)][0] * wz

    acc2 = jax.lax.fori_loop(lo, hi + 1, body, jnp.zeros((H, W), jnp.float32))
    out_dyn_ref[0] = acc2


def main():
    rng = np.random.RandomState(0)
    ring = jnp.asarray(rng.rand(RN, H, W).astype(np.float32))
    # offsets in a narrow band (static-ish camera): [-0.6, 0.9]
    off = jnp.asarray((rng.rand(4, H, W) * 1.5 - 0.6).astype(np.float32))

    out = pl.pallas_call(
        _kernel,
        grid=(4,),
        in_specs=[
            pl.BlockSpec((RN, H, W), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, H, W), lambda j: (j, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, H, W), lambda j: (j, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((4, H, W), jnp.float32),
                   jax.ShapeDtypeStruct((4, H, W), jnp.float32)),
    )(ring, off)
    dyn, ref = jax.block_until_ready(out)
    same = bool(jnp.all(dyn == ref))
    print("g1/g2 dynamic-tap warp: compiled ok; bitwise equal =", same)
    assert same


if __name__ == "__main__":
    main()
