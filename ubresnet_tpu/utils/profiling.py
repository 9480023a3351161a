"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference instruments with per-stage cumulative timers printed at
exit (deploy/run_ubresnet_precropped.py:97-103) and wraps training in
torch.autograd.profiler (train_ubresnet2018_wlarcv2.py:51,209). Here:

  * StageTimer — the OrderedDict-of-cumulative-seconds pattern as a
    context-manager API, with the reference's per-event report format
  * trace — jax.profiler wrapper producing TensorBoard-viewable traces
    of device execution

NB: on async runtimes wall-clock stage timers measure dispatch unless
the stage ends in a device sync; pass ``sync=True`` to block on
device work (jax.block_until_ready on the stage result).
"""
from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Optional


class StageTimer:
    def __init__(self):
        self.times: "OrderedDict[str, float]" = OrderedDict()
        self.counts: "OrderedDict[str, int]" = OrderedDict()

    @contextlib.contextmanager
    def stage(self, name: str, result=None, sync: bool = False):
        t0 = time.time()
        try:
            yield
        finally:
            if sync and result is not None:
                import jax

                jax.block_until_ready(result)
            self.times[name] = self.times.get(name, 0.0) + time.time() - t0
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, n_events: Optional[int] = None) -> str:
        lines = ["------ timing -------"]
        for k, v in self.times.items():
            per = f" / {v / n_events:.5f} s per event" if n_events else ""
            lines.append(f"{k} : {v:.3f} s{per}")
        return "\n".join(lines)

    def as_dict(self) -> OrderedDict:
        return OrderedDict(self.times)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context — the TPU equivalent of the
    reference's RUNPROFILER block. View with TensorBoard's profile
    plugin."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
