"""Native ROOT reader robustness: malformed files must surface as
Python exceptions, never as process death.

cpp/rootio.cpp runs inside the Python process via ctypes; a missing
bounds check is a SIGSEGV and an unchecked allocation a
std::terminate. The sweep (tools/fuzz_rootio.py) mutates a known-good
writer file — truncations, 1-byte XORs, and 4-byte extreme-value
stamps (allocation-size attacks on length/offset fields) — and
decodes every mutant in a worker subprocess so a crash is a test
failure, not a test-runner kill.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_mutated_root_files_never_crash():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "fuzz_rootio.py"),
         "--cases", "192", "--timeout", "240"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "0 crashes []" in proc.stdout and "0 hangs []" in proc.stdout


def test_mutated_uevt_files_never_crash():
    """cpp/uevt.cpp must bounds-check every file-controlled offset:
    before the File::open/find guards, 65 of 256 mutants SIGSEGV'd
    (every truncation case — index table beyond the map)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "fuzz_rootio.py"),
         "--format", "uevt", "--cases", "192", "--timeout", "240"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "0 crashes []" in proc.stdout and "0 hangs []" in proc.stdout


def test_fuzz_harness_detects_a_crash():
    """Negative control: a worker that hard-dies mid-case must be
    RECORDED as a crash finding (driver rc=1), not kill the driver —
    and the sweep must continue past it."""
    env = dict(os.environ, UBTPU_FUZZ_CRASH_AT="3")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "fuzz_rootio.py"),
         "--cases", "8", "--timeout", "120"],
        capture_output=True, text=True, timeout=400, env=env,
    )
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "1 crashes [(3, 'rc=139')]" in proc.stdout, proc.stdout
