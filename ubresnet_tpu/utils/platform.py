"""Platform selection honored in code.

The axon TPU plugin overrides the JAX_PLATFORMS env var, so CLIs honor
UBTPU_PLATFORM (e.g. ``UBTPU_PLATFORM=cpu``) through jax.config —
needed for CPU smoke runs, CI, and the virtual-mesh tests.
"""
from __future__ import annotations

import os
import subprocess
import sys


def probe_backend(timeout: float = 45.0) -> dict:
    """Ask the default jax backend for its devices in a SUBPROCESS with
    a hard timeout.

    ``jax.devices()`` against a wedged axon/TPU tunnel hangs forever
    (observed round 3: the in-process call blocked the multichip dryrun
    into an rc=124 and bench.py into a raw traceback), so anything that
    merely *wants to know* whether a backend is usable must never ask
    in-process. Returns ``{"ok": bool, "n_devices": int, "platform":
    str, "error": str}`` — on timeout/failure ``ok`` is False and
    ``error`` says why.
    """
    code = (
        # honor UBTPU_PLATFORM like apply_platform_env — the axon TPU
        # plugin overrides the JAX_PLATFORMS env var, so CPU smoke runs
        # need the jax.config route inside the probe too
        "import os, sys\n"
        "import jax\n"
        "plat = os.environ.get('UBTPU_PLATFORM')\n"
        "if plat:\n"
        "    jax.config.update('jax_platforms', plat)\n"
        "ds = jax.devices()\n"
        "sys.stdout.write('%d %s' % (len(ds), ds[0].platform))\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"ok": False, "n_devices": 0, "platform": "",
                "error": f"backend probe timed out after {timeout:.0f}s"}
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-1:] or [""]
        return {"ok": False, "n_devices": 0, "platform": "",
                "error": f"backend probe rc={proc.returncode}: {tail[0]}"}
    try:
        n, plat = proc.stdout.split()
        return {"ok": True, "n_devices": int(n), "platform": plat, "error": ""}
    except ValueError:
        return {"ok": False, "n_devices": 0, "platform": "",
                "error": f"unparseable probe output: {proc.stdout!r}"}


def apply_platform_env():
    plat = os.environ.get("UBTPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    _apply_runtime_defaults()


def _apply_runtime_defaults():
    """Runtime config every CLI entry point wants:

    * ``rbg`` PRNG — the threefry default inlines a hash network per
      ``random.normal``; with ~60 param initialisers the jitted
      ``model.init`` took 140 s to compile on XLA:CPU (11 s with rbg).
      rbg is also the faster/partitionable choice on TPU.
    * persistent compilation cache — subprocesses spawned by the sweep
      launcher (cli/launch.py) don't inherit a conftest's jax.config,
      so set it here; override dir with UBTPU_JAX_CACHE, disable with
      UBTPU_JAX_CACHE=0.
    """
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    cache = os.environ.get("UBTPU_JAX_CACHE", "/tmp/ubtpu_jax_cache")
    if cache != "0":
        # One cache dir for ALL ranks: cache writes are atomic
        # (tmp+rename), and the compile-skew hazard that once argued
        # for per-rank dirs (one rank cache-hitting ahead to the first
        # collective and tripping Gloo's 30 s KV timeout) is closed by
        # the trainer's AOT-compile + coordination-service barrier
        # before the first collective (train/trainer.py).
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
