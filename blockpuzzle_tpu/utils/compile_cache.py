"""Persistent XLA compilation cache.

Compiles on the axon tunnel platform are remote and slow (30-500 s for large
programs); the persistent cache makes every program a one-time cost across
processes.  Called by all CLIs, bench.py, and the driver entry.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/blockpuzzle_tpu/xla_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    # CPU programs compile fast and cached CPU executables are pinned to
    # the compile machine's ISA features (SIGILL risk on mismatch) — cache
    # only when an accelerator platform is EXPLICITLY selected (config or
    # env).  Uses the config value, NOT jax.default_backend(), to avoid
    # initializing backends here; an unset platform could resolve to CPU,
    # so it also skips.
    platforms = (
        jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "") or ""
    )
    if platforms.split(",")[0] in ("", "cpu"):
        return ""
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything, including small programs (default threshold skips
    # sub-second compiles, but on this platform even tiny programs are slow)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
