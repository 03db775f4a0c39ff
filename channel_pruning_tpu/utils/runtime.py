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


def wait_for_device(max_wait_s: float = 600.0, poll_s: float = 30.0) -> bool:
    """Block until the default device answers a trivial op (the axon worker
    can take minutes to restart after a fault). Returns True if it came back
    within `max_wait_s`."""
    import time

    import jax
    import jax.numpy as jnp
    from jax.errors import JaxRuntimeError

    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            jnp.zeros((), jnp.float32).block_until_ready()
            return True
        except JaxRuntimeError as exc:
            if "UNAVAILABLE" not in str(exc) or time.monotonic() > deadline:
                return False
            print(f"[runtime] device unavailable; polling again in {poll_s:.0f}s")
            time.sleep(poll_s)


def retry_on_worker_crash(fn, retries: int = 2, wait_s: float = 600.0):
    """Run `fn()` and retry after a TPU-worker crash (the axon tunnel's
    worker intermittently faults and restarts — reference-era analogue:
    Worker.do hangs forever on a crashed child, lib/worker.py:64; here we
    detect, poll until the device answers again (up to `wait_s`), and
    re-run). `fn` must re-upload any device state it needs (dead buffers
    from before the crash cannot be reused)."""
    from jax.errors import JaxRuntimeError

    for attempt in range(retries + 1):
        try:
            return fn()
        except JaxRuntimeError as exc:
            if "UNAVAILABLE" not in str(exc) or attempt == retries:
                raise
            print(f"[runtime] TPU worker crashed ({exc}); polling for restart "
                  f"(retry {attempt + 1}/{retries})")
            wait_for_device(wait_s)


def force_cpu() -> None:
    """For scripts/debug: must run before first device use (jax is
    pre-imported in this image, so env vars are too late)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
