"""Fuzz the native file readers against truncated / bit-flipped files.

cpp/rootio.cpp and cpp/uevt.cpp parse untrusted files inside the
Python process (ctypes); a missing bounds check or an unchecked
allocation is a process kill (SIGSEGV / std::terminate on bad_alloc),
not an exception. This harness mutates a known-good writer-produced
file deterministically and opens+decodes every mutant in a worker
subprocess, so crashes are observed instead of suffered. Any Python
exception is a PASS (clean error surface); only process death or a
hang is a finding.

Usage:
  python tools/fuzz_rootio.py                  # .root sweep, summary
  python tools/fuzz_rootio.py --format uevt    # .uevt sweep (native +
                                               # pure-Python readers)
  python tools/fuzz_rootio.py --cases 128      # smaller sweep
Exit code 0 = no crashes/hangs.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TRUNC_DEFAULT = 64  # truncation points spread over the file


def make_base(path: str) -> str:
    import numpy as np

    from ubresnet_tpu.data.meta import Image2D, ImageMeta
    from ubresnet_tpu.data.rootio import RootWriter

    rng = np.random.RandomState(7)
    with RootWriter(path) as w:
        for e in range(3):
            w.set_id(1, 0, e)
            meta = ImageMeta(0.0, 64.0, 0.0, 64.0, 32, 32, plane=2)
            for prod in ("wire", "scores"):
                px = (rng.rand(32, 32) * 50).astype(np.float32)
                w.append(prod, Image2D(px, meta, 1, 0, e))
            w.save_entry()
    return path


def mutate(base: bytes, idx: int, n_trunc: int) -> bytes:
    """Deterministic mutant #idx: truncations, then 1-byte XORs, then
    huge-length stamps (the allocation-size attack: overwrite 4 bytes
    with extreme values wherever a length/offset field might live)."""
    import numpy as np

    if idx < n_trunc:
        # keep the magic so mutants exercise the parser, not the
        # "not a ROOT file" fast path (idx 0 still covers a stub file)
        n = max(8, int(len(base) * (idx + 1) / (n_trunc + 1)))
        return base[:n]
    rng = np.random.RandomState(1000 + idx)
    b = bytearray(base)
    if idx % 2:  # 1-byte XOR
        pos = int(rng.randint(4, len(base)))  # spare the magic
        b[pos] ^= int(rng.randint(1, 256))
    else:  # 4-byte extreme-value stamp
        pos = int(rng.randint(4, len(base) - 4))
        val = [0x7FFFFFFF, 0xFFFFFFFF, 0x40000000 | 0x3FFFFFFF,
               0x00FFFFFF][int(rng.randint(4))]
        b[pos:pos + 4] = val.to_bytes(4, "big")
    return bytes(b)


def make_base_uevt(path: str) -> str:
    from ubresnet_tpu.data import make_synthetic_file

    return make_synthetic_file(path, n_events=3, hw=(32, 32))


def probe_uevt(path: str) -> str:
    """Native (cpp/uevt.cpp) + pure-Python readers over a mutant."""
    from ubresnet_tpu.data.native import NativeEventFile, native_available
    from ubresnet_tpu.data.uevt import EventFileReader

    tag = "decoded"
    if native_available():
        try:
            nf = NativeEventFile(path)
            for e in range(min(len(nf), 3)):
                for prod in ("wire", "segment", "weight"):
                    try:
                        nf.read_image(e, prod)
                    except Exception:
                        tag = "native-error"
            nf.close()
        except Exception:
            tag = "native-error"
    try:
        r = EventFileReader(path)
        for e in range(min(len(r), 3)):
            r.read_entry(e)
    except Exception:
        return tag if tag != "decoded" else "py-error"
    return tag


def probe(path: str) -> str:
    """Open + fully decode; returns a short outcome tag."""
    from ubresnet_tpu.data.rootio import RootEventReader, RootFile

    try:
        with RootFile(path) as rf:
            rf.keys()
            for (tree, br), info in list(rf.branches().items())[:4]:
                for e in range(min(int(info["entries"]), 3)):
                    try:
                        rf.read_event(tree, br, e)
                    except Exception:
                        pass
        try:
            r = RootEventReader(path)
            for e in range(min(len(r), 3)):
                r.read_entry(e)
            r.close()
        except Exception:
            return "reader-error"
        return "decoded"
    except Exception:
        return "open-error"


def worker(base_path: str, workdir: str, start: int, total: int,
           n_trunc: int, fmt: str = "root") -> None:
    base = open(base_path, "rb").read()
    mut_path = os.path.join(workdir, "mut." + fmt)
    probe_fn = probe if fmt == "root" else probe_uevt
    for idx in range(start, total):
        data = mutate(base, idx, n_trunc)
        with open(mut_path, "wb") as f:
            f.write(data)
        print(f"BEGIN {idx}", flush=True)
        if idx == int(os.environ.get("UBTPU_FUZZ_CRASH_AT", -1)):
            os._exit(139)  # harness self-test: simulate a reader crash
        tag = probe_fn(mut_path)
        print(f"OK {idx} {tag}", flush=True)


def drive(cases: int, n_trunc: int, per_worker_timeout: float,
          fmt: str = "root") -> int:
    workdir = tempfile.mkdtemp(prefix="rootio_fuzz_")
    if fmt == "root":
        base_path = make_base(os.path.join(workdir, "base.root"))
        assert probe(base_path) == "decoded", "base file must decode cleanly"
    else:
        base_path = make_base_uevt(os.path.join(workdir, "base.uevt"))
        assert probe_uevt(base_path) == "decoded", \
            "base file must decode cleanly"
    crashes, hangs, tags = [], [], {}
    idx = 0
    while idx < cases:
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               base_path, workdir, str(idx), str(cases), str(n_trunc), fmt]
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True)
        try:
            out, _ = proc.communicate(timeout=per_worker_timeout)
            timed_out = False
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
            timed_out = True
        done = -1
        in_flight = None
        for line in out.splitlines():
            parts = line.split()
            if parts[:1] == ["BEGIN"]:
                in_flight = int(parts[1])
            elif parts[:1] == ["OK"]:
                done = int(parts[1])
                in_flight = None
                tags[parts[2]] = tags.get(parts[2], 0) + 1
        if proc.returncode == 0 and not timed_out:
            break  # worker finished the range
        bad = in_flight if in_flight is not None else done + 1
        (hangs if timed_out else crashes).append(
            (bad, "hang" if timed_out else f"rc={proc.returncode}")
        )
        print(f"FINDING: case {bad} "
              f"{'hang' if timed_out else f'died rc={proc.returncode}'}",
              flush=True)
        idx = bad + 1
    print(f"fuzz_{fmt}: {cases} cases, outcomes {tags}, "
          f"{len(crashes)} crashes {crashes}, {len(hangs)} hangs {hangs}")
    return 1 if (crashes or hangs) else 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=512)
    ap.add_argument("--trunc", type=int, default=N_TRUNC_DEFAULT)
    ap.add_argument("--timeout", type=float, default=600.0,
                    help="per-worker-batch timeout (hang detection)")
    ap.add_argument("--format", choices=("root", "uevt"), default="root")
    ap.add_argument("--worker", nargs=6, metavar="ARG", default=None,
                    help=argparse.SUPPRESS)
    args = ap.parse_args(argv)
    if args.worker:
        base, workdir, start, total, n_trunc, fmt = args.worker
        worker(base, workdir, int(start), int(total), int(n_trunc), fmt)
        return 0
    return drive(args.cases, args.trunc, args.timeout, args.format)


if __name__ == "__main__":
    raise SystemExit(main())
