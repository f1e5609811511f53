"""Persistent XLA compile-cache setup shared by bench.py, the graft entry,
and the profiling scripts.

The measured cold-start whale on the tunneled TPU backend is ~1600 TINY
eager-op executables (~0.2-0.5 s each through the remote-compile tunnel,
~350 s total), which a default 5 s write threshold would never cache — so
thresholds are forced to zero. The cache directory lives at the repo root
(.jax_cache_tpu) and persists across sessions.
"""

from __future__ import annotations

import os
import sys

import jax

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def enable_compile_cache(cache_dir: str | None = None) -> bool:
    """Point JAX's persistent compilation cache at the repo-root cache dir
    (or `cache_dir`), with zeroed write thresholds. Returns True on
    success; logs one line to stderr and returns False on failure instead
    of silently disabling caching."""
    cache = cache_dir or os.path.join(_REPO_ROOT, ".jax_cache_tpu")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception as e:  # pragma: no cover - config API drift
        print(f"[lidiff_tpu] compile cache setup failed ({e}); "
              "continuing without persistent cache", file=sys.stderr)
        return False
