"""Persistent XLA compilation cache (first TPU compile of the fused train
step takes minutes; cached recompiles take seconds)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.path.expanduser("~/.cache/signaltrain_tpu/xla")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover - config name drift across jax versions
        print(f"compilation cache unavailable: {e}")
