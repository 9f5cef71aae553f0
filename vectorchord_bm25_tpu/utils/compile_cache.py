"""Persistent XLA compilation cache.

First compiles over the TPU tunnel take minutes; enabling JAX's
persistent compilation cache makes repeated runs (benchmarks, CLI
invocations, driver checks) reuse compiled executables across processes.
"""

from __future__ import annotations

import os

__all__ = ["enable_compile_cache"]

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str | None = None) -> str:
    """Idempotently enable the persistent compilation cache."""
    import jax

    path = path or os.environ.get("VCBM25_COMPILE_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older/newer jax naming; cache is best-effort
    return path
