"""Persistent XLA compilation cache setup.

Remote TPU compiles (and 42-layer graphs generally) are expensive; the
persistent cache makes second runs start in seconds. Called by every entry
point (train.py, sample.py, bench.py).
"""

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get("TTT_COMPILE_CACHE", os.path.expanduser("~/.cache/ttt_video_dit_tpu/xla"))


def enable_compile_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
