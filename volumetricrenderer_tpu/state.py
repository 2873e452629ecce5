"""Cross-frame state.

The reference's only cross-frame state is the four `prev*` history volumes
written by SaveHistory (VolumetricCompute.compute:23-30) plus the previous view
matrix (VolumetricRenderer.cs:100, 208) and the frame counter driving jitter
selection (cs:241). FrameState carries exactly that as a pytree; SaveHistory is
free — the previous frame's outputs simply become next frame's history fields.
This also makes checkpoint/resume trivial: serialize the pytree.

The material/scatter histories exist only for the temporal blends the reference
dispatches with commented-out bodies (compute:228, 243) — off by default. When
a blend is off its history field is None (an empty pytree leaf): storing a dead
[D, H, W, 4] volume per frame costs ~67 MB of HBM writes (~1 ms/frame each at
FULL size) for nothing.

Volumes are stored [D, H, W] (+channel axis where multi-channel): Z leading for
the scan, W minor for TPU lanes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FrameState:
    prev_shadow: jax.Array                      # [Nd, D, H, W] per-dir-light visibility history
    prev_material_a: Optional[jax.Array]        # [D, H, W, 4] (sigma_s rgb, sigma_a) or None
    prev_scatter: Optional[jax.Array]           # [D, H, W, 4] (L rgb, sigma_t) or None
    # [D, H, W, 4] (L rgb, T) — or, after a megakernel frame
    # (renderer._render_volume_fused), a TUPLE of 4 per-channel planes in the
    # exact layout the kernels consume: [D, H, W], or the zgather composite's
    # padded cell layout [DLANES, hp, wstride]. Keeping the history in the
    # producer's layout skips a pack (channel interleave) + 4 strided channel
    # slices per frame; packed_accumulation() normalizes for inspection.
    prev_accumulation: jax.Array
    prev_world_to_view: jax.Array               # [4, 4]
    frame_count: jax.Array                      # int32 scalar

    @staticmethod
    def create(grid_dhw: Tuple[int, int, int], num_dir_lights: int = 1,
               dtype=jnp.float32, with_material: bool = False,
               with_scatter: bool = False) -> "FrameState":
        d, h, w = grid_dhw
        nd = max(num_dir_lights, 1)
        return FrameState(
            prev_shadow=jnp.ones((nd, d, h, w), dtype),
            prev_material_a=jnp.zeros((d, h, w, 4), dtype) if with_material else None,
            prev_scatter=jnp.zeros((d, h, w, 4), dtype) if with_scatter else None,
            # InitAllVolumes seeds accumulation to (0,0,0,1) (compute:39); alpha=0
            # here marks "no history" for the first-frame reprojection test
            # (compute:257 uses prev.a != 0 as reprojection success).
            prev_accumulation=jnp.zeros((d, h, w, 4), dtype),
            prev_world_to_view=jnp.eye(4, dtype=jnp.float32),
            frame_count=jnp.zeros((), jnp.int32),
        )


def packed_accumulation(prev, grid_dhw: Tuple[int, int, int]) -> jax.Array:
    """Normalize FrameState.prev_accumulation to packed [D, H, W, 4].

    Accepts the packed volume (returned as-is) or the fused path's tuple of
    planes — raw [D, H, W] or the zgather padded cell layout
    [DLANES, hp, wstride] (padded row/col r maps to clamp(r - 1, 0, n - 1);
    slicing [1:n+1] recovers the interior exactly)."""
    if not isinstance(prev, (tuple, list)):
        return prev
    d, h, w = grid_dhw
    un = [p if p.shape == (d, h, w) else p[:d, 1:h + 1, 1:w + 1]
          for p in prev]
    return jnp.stack(un, axis=-1)
