"""Runtime failure-detection plumbing: watchdog staleness/heartbeat and the
worker-crash classifier (the recovery path that survives the axon tunnel's
hung/crashed-worker pathologies — see BENCH_NOTES)."""
import time

from channel_pruning_tpu.utils import runtime


def test_watchdog_heartbeat_prevents_stale():
    fired = []
    wd = runtime.Watchdog(["-m", "x"], limit_s=0.3, poll_s=0.05,
                          on_stale=lambda: fired.append(1))
    wd.start()
    try:
        for _ in range(10):
            runtime.heartbeat()
            time.sleep(0.05)
        assert not fired
        assert not wd.stale()
    finally:
        wd.stop()


def test_watchdog_fires_on_stall():
    fired = []
    wd = runtime.Watchdog(["-m", "x"], limit_s=0.2, poll_s=0.05,
                          on_stale=lambda: fired.append(1))
    wd.start()
    try:
        time.sleep(0.6)
        assert fired  # no heartbeat -> on_stale ran (instead of re-exec)
    finally:
        wd.stop()


def test_heartbeat_noop_without_watchdog():
    runtime.heartbeat()  # must never throw when nothing is armed


def test_is_worker_crash_classifier():
    assert runtime.is_worker_crash(RuntimeError(
        "UNAVAILABLE: TPU worker process crashed or restarted."))
    assert runtime.is_worker_crash(RuntimeError(
        "FAILED_PRECONDITION: TPU backend error (FailedPrecondition)."))
    assert not runtime.is_worker_crash(ValueError("shape mismatch"))
    assert not runtime.is_worker_crash(RuntimeError("RESOURCE_EXHAUSTED"))


def test_watchdog_adaptive_limit_bounds_single_op_stall():
    """A run beating steadily trains the adaptive bound down to
    stall_factor x median inter-beat interval (clamped at min_limit_s): a
    single op stalling far beyond the run's rhythm is detected at the
    adaptive bound, NOT the flat limit_s (the 874 s healthy-probe stall
    that inflated a ~500 s 3C wall 2.7x, VERDICT r4 #3)."""
    fired = []
    wd = runtime.Watchdog(["-m", "x"], limit_s=60.0, poll_s=0.02,
                          on_stale=lambda: fired.append(time.monotonic()),
                          stall_factor=4.0, min_limit_s=0.1, min_samples=5)
    wd.start()
    try:
        for _ in range(10):
            runtime.heartbeat()
            time.sleep(0.01)
        assert wd.effective_limit_s() < 1.0     # learned the rhythm
        t0 = time.monotonic()
        time.sleep(0.5)                          # the op stalls
        assert fired, "stall not detected at the adaptive bound"
        assert fired[0] - t0 < 5.0               # bounded, nowhere near 60 s
    finally:
        wd.stop()


def test_watchdog_adaptive_limit_floor_and_cap():
    wd = runtime.Watchdog(["-m", "x"], limit_s=600.0, stall_factor=12.0,
                          min_limit_s=240.0, min_samples=4)
    assert wd.effective_limit_s() == 600.0    # no rhythm yet: flat limit
    wd._intervals.extend([2.0, 2.0, 2.0, 2.0])
    # floored far above the observed 10-37 s cold fused-solve compiles
    assert wd.effective_limit_s() == 240.0
    wd._intervals.extend([600.0] * 8)
    assert wd.effective_limit_s() == 600.0    # never exceeds the flat limit


def test_watchdog_stall_redispatches_in_fresh_client(monkeypatch):
    """probe-healthy-but-op-stuck: once the adaptive grace expires the
    watchdog re-dispatches the (idempotent, checkpointed) stage via execv
    into a fresh client instead of waiting the op out."""
    import os as os_mod

    execs = []
    monkeypatch.setattr(runtime, "wait_for_device_subprocess",
                        lambda *a, **k: True)
    monkeypatch.setattr(os_mod, "execv", lambda *a: execs.append(a))
    monkeypatch.setenv("CP_TPU_REEXEC", "0")
    wd = runtime.Watchdog(["-m", "x"], limit_s=60.0, poll_s=0.02,
                          stall_factor=4.0, min_limit_s=0.05, min_samples=4)
    for _ in range(8):
        wd.beat()
        time.sleep(0.01)
    wd._last -= 10.0          # fake: the in-flight op has stalled 10 s
    t0 = time.monotonic()
    wd._reexec()
    assert execs, "stalled stage was not re-dispatched"
    assert time.monotonic() - t0 < 5.0   # grace = adaptive bound, not 60 s
