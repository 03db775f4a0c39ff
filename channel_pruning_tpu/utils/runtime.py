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


def retry_on_worker_crash(fn, retries: int = 2, wait_s: float = 90.0):
    """Run `fn()` and retry after a TPU-worker crash (the axon tunnel's
    worker intermittently faults and restarts — reference-era analogue:
    Worker.do hangs forever on a crashed child, lib/worker.py:64; here we
    detect, wait for the restart, and re-run). `fn` must re-upload any
    device state it needs (dead buffers from before the crash cannot be
    reused)."""
    import time

    from jax.errors import JaxRuntimeError

    for attempt in range(retries + 1):
        try:
            return fn()
        except JaxRuntimeError as exc:
            if "UNAVAILABLE" not in str(exc) or attempt == retries:
                raise
            print(f"[runtime] TPU worker crashed ({exc}); waiting {wait_s:.0f}s "
                  f"for restart (retry {attempt + 1}/{retries})")
            time.sleep(wait_s)


def force_cpu() -> None:
    """For scripts/debug: must run before first device use (jax is
    pre-imported in this image, so env vars are too late)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
