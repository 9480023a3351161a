"""Benchmark harness — prints ONE JSON line for the driver.

Metric: 512x512 crops/sec/chip, H2D + forward, on the flagship UResNet
(inplanes=16, 3 classes) — the BASELINE.json north star. Input data is
realistic zero-suppressed LArTPC-like events (~1% occupancy) shipped to
the device over the framework's sparse COO path and densified on-chip
inside the jitted program (the reference ships dense f32 and is
input-bound, SURVEY.md §6).

vs_baseline is the ratio to the PyTorch reference engine (functional
evaluation of the same architecture/state-dict format) on this host's
CPU — the reference published no numbers (BASELINE.md); its engine on
available hardware is the baseline. Cached in bench_baseline.json.

Timing is one long window over many batches ending in a device→host
readback (the tunnel's dispatch is async; per-call timers lie).
stdout carries exactly one JSON line; progress goes to stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(HERE, "bench_baseline.json")

HW = 512
BATCH = 64
ITERS = 15
INPLANES = 16


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_batches(n=4):
    from ubresnet_tpu.data.synthetic import synth_event
    from ubresnet_tpu.ops.sparse import sparsify

    rng = np.random.RandomState(0)
    dense, sparse = [], []
    cap = 0
    for _ in range(n):
        imgs = np.stack([synth_event(rng, (HW, HW))["wire"] for _ in range(BATCH)])
        sp = sparsify(imgs, bucket=4096)
        cap = max(cap, sp["indices"].shape[1])
        dense.append(imgs)
        sparse.append(sp)
    # equalize capacity so one compiled program serves all batches
    for sp in sparse:
        k = sp["indices"].shape[1]
        if k < cap:
            pad = cap - k
            sp["indices"] = np.pad(sp["indices"], ((0, 0), (0, pad)))
            sp["values"] = np.pad(sp["values"], ((0, 0), (0, pad)))
    occ = float(np.mean([(d != 0).mean() for d in dense]))
    log(f"data: {len(dense)} batches of {BATCH}x{HW}x{HW}, occupancy {occ * 100:.2f}%, "
        f"sparse capacity {cap}")
    return dense, sparse


def measure_tpu() -> dict:
    import jax
    import jax.numpy as jnp

    from ubresnet_tpu.core.precision import Policy
    from ubresnet_tpu.models import get_model
    from ubresnet_tpu.ops.sparse import sparse_forward_fn
    from ubresnet_tpu.train import init_model

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    model = get_model(
        "uresnet", policy=Policy.tpu(), input_channels=1, inplanes=INPLANES
    )
    variables = init_model(model, jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 1)))
    fwd_sp = sparse_forward_fn(model)

    dense, sparse = make_batches()

    def run_window(n_iters):
        out = None
        t0 = time.time()
        for i in range(n_iters):
            sp = sparse[i % len(sparse)]
            out = fwd_sp(
                variables,
                jax.device_put(sp["indices"]),
                jax.device_put(sp["values"]),
                (HW, HW),
            )
        _ = float(out[0, 0, 0, 0])  # D2H readback: drains the async queue
        return time.time() - t0

    run_window(2)  # compile + warm
    dt = run_window(ITERS)
    crops_per_sec = ITERS * BATCH / dt
    log(f"tpu sparse h2d+fwd: {crops_per_sec:.1f} crops/s "
        f"({dt / ITERS * 1e3:.1f} ms/batch of {BATCH})")
    return {"crops_per_sec": crops_per_sec, "ms_per_batch": dt / ITERS * 1e3}


def measure_torch_baseline() -> float:
    """PyTorch engine on this host (CPU build), dense batch-1 forward
    like the reference deploy loop (run_ubresnet_precropped.py:136-138).
    """
    import torch

    from ubresnet_tpu.parity.torch_oracle import make_state_dict, torch_uresnet_eval

    torch.set_num_threads(os.cpu_count() or 8)
    rng = np.random.RandomState(0)
    sd = make_state_dict(rng, inplanes=INPLANES, in_ch=1, classes=3)
    x = torch.from_numpy(rng.rand(1, 1, HW, HW).astype(np.float32))
    with torch.no_grad():
        torch_uresnet_eval(sd, x)  # warmup
        n = 3
        t0 = time.time()
        for _ in range(n):
            torch_uresnet_eval(sd, x)
        dt = time.time() - t0
    rate = n / dt
    log(f"torch-cpu baseline: {rate:.3f} crops/s")
    return rate


def get_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        log(f"baseline from cache: {cached['torch_cpu_crops_per_sec']:.3f} crops/s")
        return cached["torch_cpu_crops_per_sec"]
    rate = measure_torch_baseline()
    with open(BASELINE_CACHE, "w") as f:
        json.dump(
            {
                "torch_cpu_crops_per_sec": rate,
                "note": "PyTorch-CPU reference engine, 1x1x512x512 forward, "
                "torch " + __import__("torch").__version__,
            },
            f,
            indent=2,
        )
    return rate


def main():
    tpu = measure_tpu()
    baseline = get_baseline()
    result = {
        "metric": "uresnet16_512x512_infer_crops_per_sec_per_chip",
        "value": round(tpu["crops_per_sec"], 2),
        "unit": "crops/s",
        "vs_baseline": round(tpu["crops_per_sec"] / baseline, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
