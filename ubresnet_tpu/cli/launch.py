"""Sweep launcher — the SLURM-array capability, process-local.

Runs N independent trainings (per-plane sweeps, hyperparameter scans)
from one base config plus per-job overrides, with per-job workdirs,
log redirection, and staggered starts — what
grid_scripts/sbatch_submit_larcv1_training.sh +
larcv1_run_training.sh do on the Tufts cluster (SURVEY.md §2.3/§2.4).
Can also emit an sbatch script for real SLURM clusters.

Sweep spec (JSON):
  {"base": "cfg.json",
   "jobs": [
     {"name": "plane0", "set": {"train_data.plane": 0}},
     {"name": "plane1", "set": {"train_data.plane": 1}},
     {"name": "plane2", "set": {"train_data.plane": 2}}
   ],
   "stagger_seconds": 5}
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from typing import List


def emit_sbatch(sweep_path: str, sweep: dict, out_path: str):
    """Emit a SLURM array script mirroring the reference's
    (sbatch_submit_larcv1_training.sh: gpu partition, array 0-N,
    per-job exec)."""
    n = len(sweep["jobs"])
    script = f"""#!/bin/bash
#SBATCH --job-name=ubtpu_sweep
#SBATCH --output=ubtpu_sweep.%A_%a.log
#SBATCH --array=0-{n - 1}
#SBATCH --time=3-0:00:00

python -m ubresnet_tpu.cli.launch --sweep {sweep_path} --job-index $SLURM_ARRAY_TASK_ID
"""
    with open(out_path, "w") as f:
        f.write(script)
    os.chmod(out_path, 0o755)
    return out_path


def run_job(sweep: dict, index: int, workdir: str) -> int:
    job = sweep["jobs"][index]
    name = job.get("name", f"job{index}")
    jobdir = os.path.join(workdir, name)
    os.makedirs(jobdir, exist_ok=True)
    args = [
        sys.executable,
        "-m",
        "ubresnet_tpu.cli.train",
        "--config",
        os.path.abspath(sweep["base"]),
        "--set",
        f"checkpoint_dir={os.path.join(jobdir, 'checkpoints')}",
        "--set",
        f"log_dir={os.path.join(jobdir, 'logs')}",
    ]
    for key, val in job.get("set", {}).items():
        args += ["--set", f"{key}={json.dumps(val)}"]
    logfile = os.path.join(jobdir, "train.log")
    with open(logfile, "w") as log:
        proc = subprocess.Popen(args, stdout=log, stderr=subprocess.STDOUT)
        return proc.wait()


def run_distributed(config: str, n_processes: int, workdir: str,
                    coordinator: str = "127.0.0.1:0",
                    overrides=None) -> int:
    """ONE training across n_processes via jax.distributed — the
    capability the reference lacks entirely (torch.distributed imported
    but never called, SURVEY.md §2.3). Exports the UBTPU_* env contract
    consumed by parallel/distributed.initialize(); on a real cluster
    the scheduler sets the same variables per task (e.g. from
    SLURM_PROCID / the head-node address)."""
    host, _, port = coordinator.partition(":")
    if port in ("", "0"):
        import socket

        s = socket.socket()
        s.bind((host or "127.0.0.1", 0))
        port = str(s.getsockname()[1])
        s.close()
    coordinator = f"{host or '127.0.0.1'}:{port}"
    os.makedirs(workdir, exist_ok=True)
    procs = []
    for pid in range(n_processes):
        env = dict(os.environ)
        env.update(
            UBTPU_COORDINATOR=coordinator,
            UBTPU_NUM_PROCESSES=str(n_processes),
            UBTPU_PROCESS_ID=str(pid),
        )
        cmd = [sys.executable, "-m", "ubresnet_tpu.cli.train",
               "--config", os.path.abspath(config)]
        for ov in overrides or []:
            cmd += ["--set", ov]
        log = open(os.path.join(workdir, f"proc{pid}.log"), "w")
        procs.append(subprocess.Popen(cmd, env=env, stdout=log,
                                      stderr=subprocess.STDOUT))
        print(f"launched process {pid} (pid {procs[-1].pid})", flush=True)
    codes = [p.wait() for p in procs]
    print(f"distributed run done: exit codes {codes}")
    return max(codes)


def main(argv=None):
    ap = argparse.ArgumentParser(description="Run a training sweep")
    ap.add_argument("--sweep", help="sweep spec JSON")
    ap.add_argument("--distributed", type=int, default=None, metavar="N",
                    help="run ONE training as N jax.distributed processes")
    ap.add_argument("--config", help="train config (with --distributed)")
    ap.add_argument("--coordinator", default="127.0.0.1:0",
                    help="coordinator host:port (with --distributed; "
                         "port 0 picks a free one)")
    ap.add_argument("--set", action="append", dest="overrides",
                    metavar="KEY=VALUE",
                    help="config overrides (with --distributed)")
    ap.add_argument("--workdir", default="sweep_out")
    ap.add_argument(
        "--job-index", type=int, default=None,
        help="run a single job (SLURM array mode)",
    )
    ap.add_argument(
        "--parallel", type=int, default=1,
        help="concurrent jobs when running locally",
    )
    ap.add_argument("--emit-sbatch", default=None, metavar="PATH",
                    help="write a SLURM array script and exit")
    args = ap.parse_args(argv)

    if args.distributed:
        if not args.config:
            ap.error("--distributed requires --config")
        return run_distributed(args.config, args.distributed, args.workdir,
                               args.coordinator, args.overrides)
    if not args.sweep:
        ap.error("--sweep required (or use --distributed)")

    with open(args.sweep) as f:
        sweep = json.load(f)

    if args.emit_sbatch:
        path = emit_sbatch(os.path.abspath(args.sweep), sweep, args.emit_sbatch)
        print(f"wrote {path}")
        return 0

    os.makedirs(args.workdir, exist_ok=True)
    if args.job_index is not None:
        return run_job(sweep, args.job_index, args.workdir)

    stagger = float(sweep.get("stagger_seconds", 0))
    procs: List[subprocess.Popen] = []
    codes = []
    for i, job in enumerate(sweep["jobs"]):
        name = job.get("name", f"job{i}")
        jobdir = os.path.join(args.workdir, name)
        os.makedirs(jobdir, exist_ok=True)
        cmd = [
            sys.executable, "-m", "ubresnet_tpu.cli.launch",
            "--sweep", args.sweep, "--workdir", args.workdir,
            "--job-index", str(i),
        ]
        log = open(os.path.join(jobdir, "launch.log"), "w")
        procs.append(subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT))
        print(f"launched {name} (pid {procs[-1].pid})", flush=True)
        if stagger and i + 1 < len(sweep["jobs"]):
            time.sleep(stagger)  # staggered start (reference: GPUID*10s)
        while len([p for p in procs if p.poll() is None]) >= args.parallel:
            time.sleep(0.5)
    for p in procs:
        codes.append(p.wait())
    print(f"sweep done: exit codes {codes}")
    return max(codes) if codes else 0


if __name__ == "__main__":
    raise SystemExit(main())
