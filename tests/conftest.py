"""Test environment: force CPU with 8 virtual devices so sharding tests run
without TPU hardware.

Note: this box preloads an accelerator PJRT plugin via sitecustomize, which
imports jax at interpreter startup — env vars like JAX_PLATFORMS set here are
too late, so the override must go through jax.config. Also enables the
persistent compilation cache: the box has one CPU core, and recompiling the
pipeline every pytest run would dominate test time."""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
