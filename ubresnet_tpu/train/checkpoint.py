"""Orbax checkpointing of the full TrainState pytree.

Reference behavior (train_ubresnet2018_wlarcv2.py:253-289,474-479):
periodic save every N iters, best-model copy, final save, and resume
restoring model + optimizer + best metric. Orbax handles atomicity and
async writes; the GPU-remap map_location gymnastics of the reference
(ubresnet_funcs.py:46-51) have no TPU equivalent — pytrees are
device-agnostic.

Periodic/best saves go through an AsyncCheckpointer in single-process
runs: the device arrays are snapshotted to host synchronously, the
file write proceeds in a background thread, and the train loop keeps
dispatching steps — a checkpoint costs ~a D2H copy instead of a full
serialization stall. Multi-process runs stay on the synchronous path
(orbax async coordination wants consistent barriers across ranks;
the per-rank saves here are replicated, not sharded).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

_async: Optional[ocp.AsyncCheckpointer] = None


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _async
    if _async is None:
        _async = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async


def wait_for_checkpoints():
    """Block until every in-flight async save has committed."""
    if _async is not None:
        _async.wait_until_finished()


def _state_payload(state) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "best_metric": state.best_metric,
    }


def save_checkpoint(directory: str, state, *, best: bool = False,
                    async_: bool = False) -> str:
    """Save under <dir>/step_<N>; also refresh <dir>/best when best.

    With async_=True the write happens in the background (orbax
    snapshots arrays to host before returning); call
    wait_for_checkpoints() before reading the files back or exiting.
    """
    directory = os.path.abspath(directory)
    step = int(jax.device_get(state.step))
    path = os.path.join(directory, f"step_{step:08d}")
    use_async = async_ and jax.process_count() == 1
    ckpt = _async_checkpointer() if use_async else _checkpointer()
    ckpt.save(path, _state_payload(state), force=True)
    if best:
        best_path = os.path.join(directory, "best")
        ckpt.save(best_path, _state_payload(state), force=True)
    return path


def prune_checkpoints(directory: str, keep: int):
    """Delete all but the newest `keep` step_* checkpoints (the `best`
    alias is never pruned). keep <= 0 keeps everything (the reference's
    behavior — every 500th checkpoint accumulates forever,
    train_ubresnet2018_wlarcv2.py:260-289). Safe alongside async saves:
    the single AsyncCheckpointer serializes writes, so every dir older
    than the newest is committed."""
    if keep <= 0 or not os.path.isdir(directory):
        return
    import shutil

    steps = sorted(
        int(name.split("_")[1])
        for name in os.listdir(directory)
        if name.startswith("step_") and name.split("_")[1].isdigit()
    )
    for step in steps[:-keep]:
        shutil.rmtree(
            os.path.join(directory, f"step_{step:08d}"), ignore_errors=True
        )


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(name.split("_")[1])
        for name in os.listdir(directory)
        if name.startswith("step_") and name.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_checkpoint(directory: str, state, *, step: Optional[int] = None,
                       best: bool = False):
    """Restore a TrainState saved by save_checkpoint (latest by default)."""
    wait_for_checkpoints()  # a just-written async save must be visible
    directory = os.path.abspath(directory)
    if best:
        path = os.path.join(directory, "best")
    else:
        if step is None:
            step = latest_step(directory)
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {directory}")
        path = os.path.join(directory, f"step_{step:08d}")
    restored = _checkpointer().restore(path, item=_state_payload(state))
    return state.replace(**restored)
