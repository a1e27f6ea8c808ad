"""Persistent XLA compilation cache.

First compiles through the remote-relay TPU backend are expensive and the
relay latency is bursty (observed 1.5s-166s for the same small program), so
long-lived entry points (bench, trainers, serving) opt into JAX's persistent
compilation cache: compiled executables are keyed by HLO+backend and reloaded
from disk in later processes.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable the persistent compile cache; returns the dir used.

    The standard ``JAX_COMPILATION_CACHE_DIR`` env var wins over both the
    argument and the repo-local default.  Skipped on the CPU backend: compiles
    there are fast, and reloading XLA:CPU AOT executables across processes
    trips machine-feature checks (observed '+prefer-no-scatter' mismatch
    warnings with SIGILL risk).
    """
    import jax

    if jax.default_backend() == "cpu":
        return None
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or cache_dir or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
