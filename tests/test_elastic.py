"""Fault injection + elastic restart (cli/launch --retries).

The reference's grid jobs had "high infant mortality ... check if they
launched and rerun" (grid_scripts/README.md) — a manual workflow. Here
a one-shot hard-kill fault hook (TrainConfig.fault_at_iter) exercises
the launcher's automatic relaunch-with-resume, which must continue the
run from the latest periodic checkpoint (no final checkpoint exists
after a hard kill).
"""
import json
import os
import subprocess
import sys

import pytest

from ubresnet_tpu.data import make_synthetic_file


def _base_cfg(tmp_path, **extra):
    data = make_synthetic_file(str(tmp_path / "d.uevt"), n_events=4, hw=(32, 32))
    cfg = {
        "model": {"inplanes": 2, "precision": "f32"},
        "train_data": {"files": [data], "batch_size": 2},
        "num_iters": 4,
        "checkpoint_every": 2,
        "print_every": 1,
        "model_axis": 1,
    }
    cfg.update(extra)
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    return str(path)


def test_fault_injection_hard_exits_once(tmp_path):
    ckdir = tmp_path / "ck"
    cfg = _base_cfg(tmp_path, checkpoint_dir=str(ckdir), fault_at_iter=3)
    env = dict(os.environ, UBTPU_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "ubresnet_tpu.cli.train", "-c", cfg],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode == 23, proc.stdout + proc.stderr
    assert "fault injection" in proc.stdout
    # hard kill: the periodic step-2 checkpoint exists, nothing later
    assert (ckdir / "step_00000002").is_dir()
    assert not (ckdir / "step_00000004").exists()
    assert (ckdir / ".fault_injected").read_text() == "3"


@pytest.mark.slow
def test_launch_elastic_restart_resumes(tmp_path):
    cfg = _base_cfg(tmp_path)
    sweep = {
        "base": cfg,
        "jobs": [{"name": "flaky", "set": {"fault_at_iter": 3}}],
    }
    spath = tmp_path / "sweep.json"
    spath.write_text(json.dumps(sweep))
    env = dict(os.environ, UBTPU_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "ubresnet_tpu.cli.launch", "--sweep",
         str(spath), "--workdir", str(tmp_path / "out"), "--retries", "1"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    jobdir = tmp_path / "out" / "flaky"
    log = (jobdir / "train.log").read_text()
    assert proc.returncode == 0, proc.stdout + proc.stderr + log
    # first attempt crashed after iter 3, second resumed from step 2
    assert "fault injection: hard exit after iter 3" in log
    assert "resumed from iter 2" in log
    assert (jobdir / "checkpoints" / "step_00000004").is_dir()


@pytest.mark.slow
def test_sweep_spec_max_restarts(tmp_path):
    """max_restarts in the sweep spec works without --retries."""
    cfg = _base_cfg(tmp_path)
    sweep = {
        "base": cfg,
        "max_restarts": 1,
        "jobs": [{"name": "flaky", "set": {"fault_at_iter": 3}}],
    }
    spath = tmp_path / "sweep.json"
    spath.write_text(json.dumps(sweep))
    env = dict(os.environ, UBTPU_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "ubresnet_tpu.cli.launch", "--sweep",
         str(spath), "--workdir", str(tmp_path / "out")],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert (tmp_path / "out" / "flaky" / "checkpoints"
            / "step_00000004").is_dir()


@pytest.mark.slow
def test_distributed_elastic_restart(tmp_path):
    """Gang restart: a hard-killed distributed run relaunches every
    process with resume and completes."""
    ckdir = tmp_path / "ck"
    cfg = _base_cfg(tmp_path, checkpoint_dir=str(ckdir), fault_at_iter=3)
    # 2 virtual devices per process -> 4-device global mesh for the
    # global batch of 4 (conftest's 8-device flag would leak through)
    env = dict(os.environ, UBTPU_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    proc = subprocess.run(
        [sys.executable, "-m", "ubresnet_tpu.cli.launch", "--distributed",
         "2", "--config", cfg, "--workdir", str(tmp_path / "out"),
         "--retries", "1"],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    log0 = (tmp_path / "out" / "proc0.log").read_text()
    assert proc.returncode == 0, proc.stdout + proc.stderr + log0
    assert "restarting all 2 processes" in proc.stdout
    assert "resumed from iter 2" in log0
    assert (ckdir / "step_00000004").is_dir()
