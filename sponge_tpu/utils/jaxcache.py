"""Persistent-compilation-cache setup hardened for this dev box.

The ``zstandard`` C extension jax prefers for cache compression segfaults
here — observed repeatedly in BOTH the cache read path
(``compilation_cache.get_executable_and_time``) and the write path
(``put_executable_and_time``), each crash killing an entire test-suite or
bench run.  jax falls back to zlib when the module is absent, so this helper
nulls the module references before configuring the cache, trading a little
compression ratio for runs that finish.

Call ``configure_cache(dir)`` before the first compilation (conftest.py does
it at import; bench probes call it at the top of ``main``).
"""

from __future__ import annotations


def configure_cache(cache_dir: str, min_compile_secs: float = 1.0) -> None:
    """Point jax's persistent compilation cache at ``cache_dir`` with the
    crash-prone zstd compression disabled (zlib fallback)."""
    import jax
    import jax._src.compilation_cache as _cc

    # Force the zlib fallback (see module docstring).  Both names must be
    # nulled: ``zstd`` is the Python>=3.14 stdlib module, ``zstandard`` the
    # pip package backend.
    _cc.zstd = None
    _cc.zstandard = None

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
