"""Persistent XLA compilation cache.

On this image the TPU is reached through a tunnel and a cold compile of a
recon-sized graph takes minutes; the persistent cache brings repeat runs
(including fresh processes, e.g. the driver's bench run after a warmup) down
to ~1 s per graph. Call :func:`enable` before the first jit dispatch.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    path = cache_dir or os.environ.get(
        "ICON_TPU_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
