"""Stall-watchdog tests (SURVEY.md §5.3 failure detection: a wedged device
transport must terminate the run, not hang it forever)."""

import threading
import time

from octfusion_tpu.utils.watchdog import StallWatchdog


def test_watchdog_fires_on_stall():
    fired = threading.Event()
    dog = StallWatchdog(timeout_s=0.3, on_stall=fired.set, poll_s=0.05)
    assert fired.wait(3.0), "watchdog never fired on a stalled run"
    dog.stop()


def test_watchdog_poke_defers():
    fired = threading.Event()
    dog = StallWatchdog(timeout_s=0.5, on_stall=fired.set, poll_s=0.05)
    for _ in range(6):
        time.sleep(0.15)
        dog.poke()
    assert not fired.is_set(), "watchdog fired despite steady progress"
    dog.stop()
    time.sleep(0.3)
    assert not fired.is_set(), "watchdog fired after stop()"


def test_watchdog_disabled():
    fired = threading.Event()
    dog = StallWatchdog(timeout_s=0, on_stall=fired.set, poll_s=0.05)
    time.sleep(0.3)
    assert not fired.is_set()
    assert dog._thread is None
    dog.stop()
