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
