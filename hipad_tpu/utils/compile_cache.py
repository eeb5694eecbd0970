"""Persistent XLA compilation cache.

Every CLI entry point calls :func:`enable_persistent_cache` before the
first trace. Rationale: on this class of host the stage-2 programs take
10-26 min to compile (remote TPU compile helper; 1-core CPU fallback), and
JAX's in-process cache dies with the process — so every tool re-run,
benchmark iteration and test session used to pay full compile. The
persistent cache keys on (HLO, platform, jaxlib version, flags), so config
or code changes miss safely and identical re-runs hit.

The cache directory defaults to ``~/.cache/hipad_tpu_xla`` and can be
moved/disabled with ``HIPAD_XLA_CACHE_DIR`` (empty string disables —
e.g. for compile-time benchmarking, where a hit would fake the number).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "hipad_tpu_xla")


def enable_persistent_cache() -> str | None:
    """Idempotently point JAX at the on-disk compilation cache.

    Returns the cache dir, or None when disabled via HIPAD_XLA_CACHE_DIR="".
    Must run before the first jit trace to cover it; safe (no-op) after.
    """
    cache_dir = os.environ.get("HIPAD_XLA_CACHE_DIR", _DEFAULT)
    if not cache_dir:
        return None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache every program regardless of compile time / size: the small
    # programs here are dispatch-trivial but the BIG ones are the point,
    # and the default min-compile-time heuristic skips mid-sized ones.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
