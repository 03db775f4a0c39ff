"""Runtime environment knobs (compilation cache, platform selection)."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes. Each per-layer extraction
    program costs ~20-40 s to compile through the remote-compile tunnel; the
    cache makes repeat runs (re-entry after a crash, bench iterations) pay it
    once."""
    import jax

    cache_dir = path or os.environ.get("CP_TPU_CACHE",
                                       "/tmp/cp_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the knobs


def force_cpu() -> None:
    """For scripts/debug: must run before first device use (jax is
    pre-imported in this image, so env vars are too late)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
