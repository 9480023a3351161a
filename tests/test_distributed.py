"""Multi-host execution smoke test: ONE training across 2 localhost
processes via jax.distributed (CPU backend, Gloo collectives, 2 virtual
devices per process → a 4-device global mesh).

This is the capability the reference never wired (torch.distributed
imported in five files, zero calls — SURVEY.md §2.3); its cluster story
was SLURM arrays of independent jobs. Here the same pjit program spans
processes: batch axis = concatenation of per-process loader batches,
gradient psum over the global mesh.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from ubresnet_tpu.data import make_synthetic_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training(tmp_path):
    data = make_synthetic_file(str(tmp_path / "d.uevt"), n_events=6, hw=(32, 32))
    cfg = {
        "model": {"inplanes": 2, "precision": "f32"},
        "optim": {"lr": 1e-3},
        # per-process batch 2 → global batch 4 over a 4-device data axis
        "train_data": {"files": [data], "batch_size": 2, "native": False},
        "num_iters": 3,
        "checkpoint_every": 100,
        "print_every": 1,
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "model_axis": 1,
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    coordinator = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            UBTPU_PLATFORM="cpu",
            UBTPU_COORDINATOR=coordinator,
            UBTPU_NUM_PROCESSES="2",
            UBTPU_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "ubresnet_tpu.cli.train",
                 "--config", str(cfg_path)],
                env=env,
                cwd=str(tmp_path),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    # generous: a fully cold XLA:CPU compile of the 4-device train
    # program takes ~8-9 min on a contended host; the AOT-compile +
    # coordination-service barrier in the trainer keeps the ranks from
    # tripping collective timeouts while either is still compiling
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "distributed: process" in out
        assert "4 global devices" in out
    # both processes ran the SAME program: identical final loss
    losses = []
    for out in outs:
        summary = json.loads(out[out.index("{") :])
        losses.append(summary["meters"]["loss"])
        assert summary["final_iter"] == 3
    assert np.isclose(losses[0], losses[1]), losses
    # collective checkpoint written once
    assert any(
        name.startswith("step_") for name in os.listdir(tmp_path / "ckpt")
    )
