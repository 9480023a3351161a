"""Input-pipeline throughput: can the host feed the chip?

The reference's known bottleneck is the batch filler ("threadfiller
isn't very efficient", 0% GPU util — grid_scripts/README.md). The
chip-side consumption rate is ~161-250 crops/s for training at 512²
(BENCH_r02 / the round-4 target), so the loader must beat that with
margin. Measures crops/s of:

  * SegmentDataset + BatchLoader (Python threads over mmap UEVT)
  * the native C++ pthread filler (data/native.py), when built
  * the same via a .root input (auto-converted training cache)

Run anywhere (CPU-only; no jax involved).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import tempfile
import time

import numpy as np

HW = int(_os.environ.get("UBTPU_BENCH_HW", 512))
BATCH = int(_os.environ.get("UBTPU_BENCH_TRAIN_BATCH", 32))
N_EVENTS = 64
WINDOW_BATCHES = 40


def measure(loader, label):
    for _ in range(4):
        loader[0]  # warm
    t0 = time.time()
    for _ in range(WINDOW_BATCHES):
        b = loader[0]
    dt = time.time() - t0
    rate = WINDOW_BATCHES * b["image"].shape[0] / dt
    print(f"{label}: {rate:.0f} crops/s "
          f"({dt / WINDOW_BATCHES * 1e3:.1f} ms/batch of "
          f"{b['image'].shape[0]})", flush=True)
    return rate


def main():
    print(f"host cores: {_os.cpu_count()} (thread scaling is bounded "
          "by cores; this sandbox has 1 — real hosts scale the "
          "native filler's pthread workers linearly)", flush=True)
    from ubresnet_tpu.data import make_synthetic_file
    from ubresnet_tpu.data.loader import BatchLoader, SegmentDataset

    with tempfile.TemporaryDirectory() as d:
        path = make_synthetic_file(_os.path.join(d, "b.uevt"),
                                   n_events=N_EVENTS, hw=(HW, HW))
        results = {}

        ds = SegmentDataset(path, weight_producer="weight", plane=2)
        loader = BatchLoader(ds, batch_size=BATCH, n_threads=int(_os.environ.get("UBTPU_LOADER_THREADS", min(4, _os.cpu_count() or 1)))).start()
        try:
            results["python_uevt"] = measure(loader, "python loader (uevt)")
        finally:
            loader.stop()

        from ubresnet_tpu.data import native

        if native.native_available():
            nl = native.NativeBatchLoader(
                [path], batch_size=BATCH, n_threads=int(_os.environ.get("UBTPU_LOADER_THREADS", min(4, _os.cpu_count() or 1))), plane=2,
            ).start()
            try:
                results["native_uevt"] = measure(nl, "native filler (uevt)")
            finally:
                nl.stop()
        else:
            print("native filler unavailable (no toolchain)", flush=True)

        from ubresnet_tpu.cli.convert import main as convert_main

        rpath = _os.path.join(d, "b.root")
        assert convert_main(["--to-root", path, rpath]) == 0
        ds_r = SegmentDataset(rpath, weight_producer="weight", plane=2)
        loader = BatchLoader(ds_r, batch_size=BATCH, n_threads=int(_os.environ.get("UBTPU_LOADER_THREADS", min(4, _os.cpu_count() or 1)))).start()
        try:
            results["python_root"] = measure(
                loader, "python loader (.root via training cache)")
        finally:
            loader.stop()

        chip_rate = 250.0  # round-4 train target, crops/s/chip
        for k, v in results.items():
            print(f"{k}: {v / chip_rate:.1f}x the 250 crops/s chip-side "
                  "train target", flush=True)


if __name__ == "__main__":
    main()
