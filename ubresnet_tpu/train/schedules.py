"""Learning-rate schedules the reference uses.

  * constant — flagship trainer's adjust_learning_rate is a no-op
    (train_ubresnet2018_wlarcv2.py:500-507)
  * step decay — grid trainers: base_lr * 0.1 ** (iteration // 10000)
    (grid_scripts/train_ubresnet_wlarcv1_tuftsgrid.py:610-619)
"""
from __future__ import annotations

import optax


def make_schedule(
    name: str = "constant",
    base_lr: float = 1e-5,
    decay_factor: float = 0.1,
    decay_every: int = 10000,
) -> optax.Schedule:
    if name == "constant":
        return optax.constant_schedule(base_lr)
    if name == "step":
        return lambda step: base_lr * decay_factor ** (step // decay_every)
    raise ValueError(f"unknown schedule '{name}' (constant|step)")
