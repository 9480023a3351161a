"""Metrics: per-class pixel accuracy (on-device) + host-side meters.

Reference: accuracy() computes per-class and total pixel accuracy from
the channel argmax (train_ubresnet2018_wlarcv2.py:509-566); the larcv1
trainers add a combined track+shower ('nonzero') accuracy (wlarcv1:584).
AverageMeter (val/avg/sum/count) is the universal accumulator
(wlarcv2:482-497). Here the accuracy math runs inside the jitted step —
a handful of VPU reductions — and only scalars reach the host.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

CLASS_NAMES = ("background", "shower", "track")


def pixel_accuracy(
    logits: jax.Array, labels: jax.Array, num_classes: int = 3
) -> Dict[str, jax.Array]:
    """Per-class, total, and nonzero (all classes > 0) pixel accuracy.

    logits/log-probs (b, h, w, c) — argmax is invariant to which;
    labels (b, h, w) int.
    """
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    out: Dict[str, jax.Array] = {}
    for c in range(num_classes):
        mask = (labels == c).astype(jnp.float32)
        n = jnp.sum(mask)
        out[f"acc_class{c}"] = jnp.where(n > 0, jnp.sum(correct * mask) / n, 0.0)
    out["acc_total"] = jnp.mean(correct)
    nz = (labels > 0).astype(jnp.float32)
    n_nz = jnp.sum(nz)
    out["acc_nonzero"] = jnp.where(n_nz > 0, jnp.sum(correct * nz) / n_nz, 0.0)
    return out


class AverageMeter:
    """val/avg/sum/count accumulator (reference AverageMeter)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __repr__(self):
        return f"AverageMeter(val={self.val:.4g}, avg={self.avg:.4g}, n={self.count})"


class MeterDict:
    """Dict of AverageMeters keyed lazily — per-phase timing/metric set."""

    def __init__(self):
        self.meters: Dict[str, AverageMeter] = {}

    def update(self, values: Dict[str, float], n: int = 1):
        for k, v in values.items():
            self.meters.setdefault(k, AverageMeter()).update(float(v), n)

    def averages(self) -> Dict[str, float]:
        return {k: m.avg for k, m in self.meters.items()}

    def reset(self):
        for m in self.meters.values():
            m.reset()

    def __getitem__(self, k):
        return self.meters[k]
