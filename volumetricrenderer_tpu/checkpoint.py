"""Checkpoint / resume.

The reference has none (SURVEY §5); its only cross-frame state is the prev*
volumes + matrix, which FrameState already isolates — so checkpointing is just
(de)serializing one pytree. Plain .npz keeps it dependency-free; orbax works on
the same pytree if an async/distributed checkpointer is wanted.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.state import FrameState


def save_state(path: str, state: FrameState) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(path, **{f"leaf_{i}": np.asarray(leaf)
                      for i, leaf in enumerate(leaves)})


def load_state(path: str, like: FrameState) -> FrameState:
    """Restore into the structure of `like` (shapes/dtypes must match).

    NOTE: after a fused (megakernel) frame, FrameState carries accumulation
    history as a tuple of planes (state.py) — `like` must have the same
    structure (render one frame with the same config, or checkpoint before
    the first frame)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    n_saved = len([k for k in data.files if k.startswith("leaf_")])
    if n_saved != len(leaves):
        raise ValueError(
            f"checkpoint has {n_saved} leaves but `like` has {len(leaves)} — "
            "fused-path states store accumulation as a tuple of planes; pass "
            "a `like` produced by the same render path (see state.py)")
    restored = [jnp.asarray(data[f"leaf_{i}"], leaves[i].dtype)
                for i in range(len(leaves))]
    for a, b in zip(restored, leaves):
        if a.shape != b.shape:
            raise ValueError(f"checkpoint shape {a.shape} != state {b.shape}")
    return jax.tree_util.tree_unflatten(treedef, restored)


def save_state_orbax(path: str, state: FrameState) -> None:
    """Async/distributed-capable checkpoint via orbax (same pytree)."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_state_orbax(path: str, like: FrameState) -> FrameState:
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, like)
