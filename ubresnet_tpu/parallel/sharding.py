"""GSPMD sharding of the training program over a TPU mesh.

The reference's multi-device story is nn.DataParallel replicate/
scatter/gather (train_ubresnet2018_wlarcv2.py:64-65,98-103). Here the
single jitted train step is partitioned by GSPMD over a
(data, model) mesh:

  * data axis  — batch sharding; gradient/BN-stat reductions become
    psum over ICI (the DataParallel replacement).
  * model axis — output-channel sharding of the widest conv kernels
    (tensor parallelism the reference never had), plus optional
    spatial sharding of activations for whole-view-scale images (the
    conv-net analog of sequence/context parallelism, SURVEY.md §5.7):
    GSPMD inserts halo exchanges for windowed ops automatically.

No collective is written by hand — shardings are declared on arrays
and XLA lowers the communication onto ICI.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ubresnet_tpu.core.mesh import DATA_AXIS, MODEL_AXIS


def _put_full(x, sharding: NamedSharding):
    """Place a FULL (host-replicated) value onto a possibly multi-host
    sharding. Single-process: plain device_put. Multi-process: every
    process holds the whole value (e.g. identically-seeded init or an
    orbax restore), so assemble the global array shard-by-shard."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def make_param_shardings(params: Any, mesh: Mesh, min_features: int = 256):
    """NamedSharding tree: conv kernels with >= min_features output
    channels (divisible by the model axis) shard on the channel dim;
    everything else replicates."""
    model_size = mesh.shape[MODEL_AXIS]

    def rule(x):
        if (
            model_size > 1
            and hasattr(x, "ndim")
            and x.ndim == 4  # HWIO conv kernels
            and x.shape[-1] >= min_features
            and x.shape[-1] % model_size == 0
        ):
            return NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def shard_state(state, mesh: Mesh, min_features: int = 256):
    """device_put a TrainState with param/opt-state sharded per rules.

    opt_state moments mirror the param tree, so the same rule applies
    leaf-wise (Adam mu/nu have param shapes; scalars replicate).
    """

    param_sh = make_param_shardings(state.params, mesh, min_features)
    opt_sh = jax.tree_util.tree_map(
        lambda x: make_param_shardings(x, mesh, min_features), state.opt_state
    )
    repl = NamedSharding(mesh, P())
    put = jax.tree_util.tree_map
    return state.replace(
        step=_put_full(state.step, repl),
        params=put(_put_full, state.params, param_sh),
        batch_stats=put(lambda x: _put_full(x, repl), state.batch_stats),
        opt_state=put(_put_full, state.opt_state, opt_sh),
        best_metric=_put_full(state.best_metric, repl),
        nan_count=_put_full(state.nan_count, repl),
    )


def shard_batch(batch: Any, mesh: Mesh):
    """Shard the leading batch axis of every array over the data axis.

    Multi-process: each process contributes its own (different) local
    batch; the global batch axis is their concatenation in process
    order — the jax.distributed data-parallel idiom replacing the
    reference's SLURM-array independence (SURVEY.md §2.3)."""
    multiproc = jax.process_count() > 1

    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        sh = NamedSharding(mesh, spec)
        if multiproc:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def spatial_sharding(mesh: Mesh):
    """Sharding for (b, h, w, c) images: batch over data, rows over
    model — GSPMD halo-exchanges conv windows across the row cuts.
    Used for whole-plane (3456x1008) device-resident inference."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None, None))


def plane_sharding(mesh: Mesh):
    """Sharding for ONE whole plane (1, h, w, c): rows split over every
    mesh device. The deploy-side context-parallel analog (SURVEY.md
    §5.7b): a single 1008x3456 view stays resident across the mesh and
    GSPMD inserts the conv halo exchanges — no crop-and-stitch."""
    return NamedSharding(mesh, P(None, tuple(mesh.axis_names), None, None))
