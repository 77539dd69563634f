"""Persistent XLA compilation cache.

YOLOv3-416 takes minutes to compile cold; enabling jax's on-disk compilation
cache makes every CLI invocation after the first start in seconds. Called by
all CLI entry points and bench.py.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str = "") -> None:
    import jax

    cache_dir = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.cache/yolov3_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
