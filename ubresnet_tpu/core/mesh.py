"""Device mesh + sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
(train_ubresnet2018_wlarcv2.py:64-65,98-103) plus SLURM job arrays
(SURVEY.md §2.3). The TPU-native replacement is a ``jax.sharding.Mesh``
with a ``data`` axis (batch sharding, gradient psum inserted by GSPMD)
and a reserved ``model`` axis (channel sharding of the widest conv
kernels — tensor parallelism the reference never had). Collectives ride
ICI; no user-visible backend selection exists, matching the idiom of
pjit/GSPMD rather than NCCL process groups.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_axis: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the given devices.

    ``model_axis`` devices are dedicated to channel/tensor sharding; the
    rest form the batch (data-parallel) axis. With ``model_axis=1`` this
    degenerates to pure data parallelism — the reference's DataParallel
    equivalent.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    n = len(devices)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    grid = np.array(devices).reshape(n // model_axis, model_axis)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis of the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_mesh(n: int) -> Mesh:
    """1-D data mesh over the first ``n`` local devices (tests/dryrun)."""
    return make_mesh(jax.devices()[:n], model_axis=1)
