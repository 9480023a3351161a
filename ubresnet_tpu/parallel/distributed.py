"""Multi-host initialization + launch helpers.

The reference's cluster story is SLURM job arrays of *independent*
trainings (grid_scripts/sbatch_submit_larcv1_training.sh:11-22) — no
torch.distributed use at all (SURVEY.md §2.3). The TPU-native stack
supports both modes:

  * job-level parallelism: ubresnet_tpu.cli.launch runs N independent
    configs (hyperparameter / per-plane sweeps) as processes
  * one training across hosts: ``initialize()`` wires
    jax.distributed so the same pjit program spans slices (DCN between
    them, ICI within)
"""
from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """jax.distributed.initialize with env fallbacks.

    Reads UBTPU_COORDINATOR / UBTPU_NUM_PROCESSES / UBTPU_PROCESS_ID
    when args are absent (the launcher exports them); no-ops (returns
    False) in single-process runs.
    """
    coordinator_address = coordinator_address or os.environ.get("UBTPU_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("UBTPU_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("UBTPU_PROCESS_ID", "0"))
    if not coordinator_address or num_processes <= 1:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def barrier(name: str, timeout_s: float = 600.0) -> bool:
    """Rendezvous all processes on the coordination service.

    Unlike executing a collective (whose Gloo/ICI rendezvous carries a
    short, hardcoded key-value timeout — 30 s for the CPU Gloo store),
    the coordination-service barrier takes an explicit timeout, so it
    can safely span a peer's cold compile. Used before the first
    collective execution of a program. No-op (returns False) in
    single-process runs.
    """
    import jax

    if jax.process_count() <= 1:
        return False
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    if client is None:
        return False
    client.wait_at_barrier(f"ubtpu_{name}", timeout_in_ms=int(timeout_s * 1000))
    return True
