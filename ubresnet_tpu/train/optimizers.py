"""Optimizers with torch-equivalent semantics.

  * adam: torch.optim.Adam(lr=1e-5, weight_decay=1e-4) — weight decay
    is L2 added to the gradient BEFORE the moment updates (not AdamW)
    (train_ubresnet2018_wlarcv2.py:155-157)
  * sgd: torch.optim.SGD(lr, momentum=0.9, weight_decay=1e-3) —
    heavy-ball momentum, decay added to gradient
    (train_ubresnet2018_wlarcv1.py:127-129)
"""
from __future__ import annotations

from typing import Union

import optax


def make_optimizer(
    name: str = "adam",
    learning_rate: Union[float, optax.Schedule] = 1e-5,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        # torch-style L2: grad += wd * param, applied before the update rule
        parts.append(optax.add_decayed_weights(weight_decay))
    if name == "adam":
        parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    elif name == "sgd":
        if momentum:
            # optax trace == torch heavy-ball (dampening=0, no nesterov)
            parts.append(optax.trace(decay=momentum, nesterov=False))
    else:
        raise ValueError(f"unknown optimizer '{name}' (adam|sgd)")
    if callable(learning_rate):
        parts.append(optax.scale_by_schedule(lambda s: -learning_rate(s)))
    else:
        parts.append(optax.scale(-learning_rate))
    return optax.chain(*parts)


def optimizer_from_config(optim_cfg) -> optax.GradientTransformation:
    """Build the optimizer exactly as training does (OptimConfig) — the
    opt_state tree structure must match for orbax checkpoint restore,
    so deploy-side loading reuses this."""
    from ubresnet_tpu.train.schedules import make_schedule

    schedule = make_schedule(
        optim_cfg.schedule,
        base_lr=optim_cfg.lr,
        decay_factor=optim_cfg.decay_factor,
        decay_every=optim_cfg.decay_every,
    )
    return make_optimizer(
        optim_cfg.name,
        learning_rate=schedule,
        weight_decay=optim_cfg.weight_decay,
        momentum=optim_cfg.momentum,
    )
