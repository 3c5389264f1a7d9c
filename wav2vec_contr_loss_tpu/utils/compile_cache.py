"""Persistent XLA compile cache — one definition for every entry point.

First compiles on the axon remote-compile service take 10-45 min; the
persistent cache in `<repo>/.jax_cache` makes reruns ~seconds. bench.py,
cli.bench_components and tools/profile_step.py all want the same setup.
"""

from __future__ import annotations

import os

__all__ = ["enable_compile_cache"]


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Point JAX at the repo-level persistent compile cache (no-op if the
    running jax doesn't support the config knobs)."""
    import jax

    if cache_dir is None:
        # <repo>/wav2vec_contr_loss_tpu/utils/compile_cache.py -> <repo>
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(repo, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
