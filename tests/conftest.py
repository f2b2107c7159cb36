"""Test harness: force an 8-virtual-device CPU JAX platform.

SURVEY.md §5 "multi-device without a cluster": all sharding/collective
tests run against 8 virtual CPU devices so CI needs no TPU. The container's
sitecustomize pre-registers a tunneled TPU backend and pins
JAX_PLATFORMS=axon before pytest starts, so env vars are too late here —
but `jax.config.update` still wins if applied before first backend use.

A persistent compilation cache is enabled because this host pays ~0.75s per
fresh XLA compile; warm runs of the suite are then fast.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
