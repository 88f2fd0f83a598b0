"""Persistent-compilation-cache setup for the bench probes.

History of the crash hunt on this dev box (jax 0.9.0): full CPU test-suite
runs repeatedly segfaulted inside the persistent cache — first attributed to
the ``zstandard`` C compression backend, but forcing the zlib fallback did
NOT stop it; the faulting frames are ``executable.serialize()`` on the put
path and ``backend.deserialize_executable(...)`` on the get path, i.e. XLA
executable (de)serialization itself (small executables round-trip fine; the
multi-MB unrolled kernel programs are the suspects).  The test suite
therefore runs with NO persistent cache (tests/conftest.py).  Bench probes
keep theirs — the TPU backend's serialization has not crashed — and this
helper configures it, still with zstd nulled (harmless, and one less native
codepath in the loop).
"""

from __future__ import annotations


def configure_cache(cache_dir: str, min_compile_secs: float = 1.0) -> None:
    """Point jax's persistent compilation cache at ``cache_dir`` with zstd
    compression disabled (zlib fallback) — see module docstring."""
    import jax
    import jax._src.compilation_cache as _cc

    # Force the zlib fallback.  Both names must be nulled: ``zstd`` is the
    # Python>=3.14 stdlib module, ``zstandard`` the pip package backend.
    _cc.zstd = None
    _cc.zstandard = None

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
