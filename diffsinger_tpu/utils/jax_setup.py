"""Process-level JAX configuration for CLIs and bench.

Enables the persistent compilation cache so TPU programs (samplers, vocoder,
train steps) compile once per machine instead of once per process — first-run
compiles of the big scan graphs take minutes on a cold cache.
"""

from __future__ import annotations

import os
import pathlib


def setup_jax(cache_dir: str | None = None) -> None:
    import jax

    cache = pathlib.Path(
        cache_dir
        or os.environ.get("DS_JAX_CACHE_DIR")
        or pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    )
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
