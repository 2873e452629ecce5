"""Persistent-compilation-cache enablement for CLI entry points.

The box has ONE host CPU core and the FULL-config frame program takes
~250-350 s to compile cold; tests/conftest.py already points JAX's persistent
cache at <repo>/.jax_cache, but CLI runs (bench.py, demo.py, the driver's
__graft_entry__ import) used to run with NO cache dir configured — every
bench invocation recompiled the whole frame graph, which is what timed out
the round-3 driver bench (BENCH_r03 rc=124). Call enable_persistent_cache()
before any jit in every entry point.
"""

from __future__ import annotations

import os

import jax

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at <repo>/.jax_cache (or
    `path`). Idempotent; safe to call after jax import but before tracing."""
    cache_dir = path or os.environ.get("VOLR_JAX_CACHE",
                                       os.path.join(_REPO_ROOT, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir
