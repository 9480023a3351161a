"""bench.run_section semantics: sections are independently survivable.

Round 4 lost train/deploy/int8/wholeview to ONE headline TimeoutError
(bench exited after the first SIGALRM); round 5's run_section gives
every section its own budget, one retry on timeout, and never lets a
failure propagate (the driver's end-of-round bench must always print
its JSON line). Proven live on the chip the same round: the infer
section's first attempt timed out cold at 420 s and the retry recorded
828.0 crops/s (docs/roofline.md round 5).
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


@pytest.fixture(autouse=True)
def fast_budget(monkeypatch):
    monkeypatch.setattr(bench, "SECTION_TIMEOUT_S", 1)
    monkeypatch.setattr(bench, "SECTION_RETRIES", 1)


def test_run_section_ok():
    out, err = bench.run_section("s", lambda: {"v": 1})
    assert out == {"v": 1} and err is None


def test_run_section_timeout_then_success():
    """First attempt hangs past the budget; the retry (fresh alarm)
    succeeds — the chip-observed cold-compile pattern."""
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            import time

            time.sleep(5)  # > 1s budget -> SIGALRM
        return calls["n"]

    out, err = bench.run_section("s", flaky)
    assert out == 2 and err is None and calls["n"] == 2


def test_run_section_timeout_exhausts_retries():
    def hang():
        import time

        time.sleep(5)

    out, err = bench.run_section("s", hang)
    assert out is None and "timeout" in err


def test_run_section_error_does_not_retry():
    calls = {"n": 0}

    def boom():
        calls["n"] += 1
        raise RuntimeError("kaput")

    out, err = bench.run_section("s", boom)
    assert out is None and calls["n"] == 1  # non-timeout: no retry
    assert "RuntimeError" in err and "kaput" in err
