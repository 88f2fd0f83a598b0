"""Test configuration: force a deterministic 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(``--xla_force_host_platform_device_count=8``) exactly as SURVEY.md §4 prescribes;
the real-TPU benchmark path is exercised separately by ``bench.py``.

Note: this environment pre-seeds ``jax_platforms=axon,cpu`` (a tunneled TPU), and
that setting overrides the ``JAX_PLATFORMS`` env var — so the platform must be
forced through ``jax.config`` before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the permutation takes 30-40 s to compile on CPU;
# cache it across test runs so only the first invocation pays.
jax.config.update("jax_compilation_cache_dir", "/tmp/sponge_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
