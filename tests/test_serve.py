"""Watch-dir serving CLI (cli/serve.py): drain-once semantics, warm
process across files, failure quarantine, idempotent re-run."""
import json
import os
import time

import numpy as np
import pytest
import torch

from ubresnet_tpu.data import EventFileReader, make_synthetic_file
from ubresnet_tpu.parity.torch_oracle import make_state_dict


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_ckpt")
    sd = make_state_dict(np.random.RandomState(5), inplanes=4, in_ch=1,
                         classes=3, final_kernels=16)
    path = str(d / "ref.tar")
    torch.save({"iter": 1, "state_dict": sd, "best_prec1": 0.5,
                "optimizer": {}}, path)
    return path


def test_serve_once_drains_and_quarantines(tmp_path, ckpt, capsys):
    from ubresnet_tpu.cli.serve import main

    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    make_synthetic_file(str(watch / "a.uevt"), n_events=2, hw=(64, 64))
    make_synthetic_file(str(watch / "b.uevt"), n_events=1, hw=(64, 64))
    (watch / "broken.uevt").write_bytes(b"not an event file")

    argv = ["--watch-dir", str(watch), "--out-dir", str(out),
            "-c", ckpt, "-p", "2", "--once", "--f32", "-b", "2"]
    assert main(argv) == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[-1]["shutdown"] is True and lines[-1]["served"] == 2

    for name, n in (("a", 2), ("b", 1)):
        r = EventFileReader(str(out / f"{name}_scores.uevt"))
        assert len(r) == n
        scores = r.read_entry(0)["uburn_plane2"]
        total = sum(s.pixels for s in scores)
        np.testing.assert_allclose(total, 1.0, atol=1e-4)
    assert (out / "broken.uevt.failed").exists()

    # idempotent: nothing new on a second drain
    assert main(argv) == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[-1]["served"] == 0


def test_serve_once_int8(tmp_path, ckpt, capsys):
    """--int8 serve: calibrates on the first served file, output scores
    stay normalized (quant dequant ends in the same softmax head)."""
    from ubresnet_tpu.cli.serve import main

    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    make_synthetic_file(str(watch / "a.uevt"), n_events=2, hw=(64, 64))

    argv = ["--watch-dir", str(watch), "--out-dir", str(out),
            "-c", ckpt, "-p", "2", "--once", "-b", "2", "-v",
            "--int8", "--int8-calib", "2"]
    assert main(argv) == 0
    out_text = capsys.readouterr().out
    assert "int8: calibrated on 2 images" in out_text
    r = EventFileReader(str(out / "a_scores.uevt"))
    scores = r.read_entry(0)["uburn_plane2"]
    total = sum(s.pixels for s in scores)
    np.testing.assert_allclose(total, 1.0, atol=1e-2)


def _wait_for(path, timeout=240.0, absent=()):
    t0 = time.time()
    while time.time() - t0 < timeout:
        for a in absent:
            assert not os.path.exists(a), f"quarantined: {open(a).read()}"
        if os.path.exists(path):
            return True
        time.sleep(0.2)
    return False


@pytest.mark.slow
def test_serve_continuous_poll_root_io_and_sigterm(tmp_path, ckpt):
    """The advertised daemon behaviors end-to-end (VERDICT round-3
    item 6): continuous poll loop in a real process, a slow/racing
    writer exercising the size-stability guard (a mid-copy file must
    be held, then served cleanly — never quarantined), larcv .root
    input with --root-out write-back, and SIGTERM clean shutdown with
    the final summary line."""
    import shutil
    import signal
    import subprocess
    import sys
    import threading

    from ubresnet_tpu.cli.convert import main as convert_main

    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    make_synthetic_file(str(watch / "a.uevt"), n_events=2, hw=(64, 64))
    # larcv .root input via the framework's own migration path
    make_synthetic_file(str(tmp_path / "r_src.uevt"), n_events=1,
                        hw=(64, 64))
    assert convert_main(["--to-root", str(tmp_path / "r_src.uevt"),
                         str(watch / "r.root")]) == 0

    env = dict(os.environ, UBTPU_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "ubresnet_tpu.cli.serve",
         "--watch-dir", str(watch), "--out-dir", str(out),
         "-c", ckpt, "-p", "2", "--f32", "-b", "2",
         "--poll", "0.3", "--root-out"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )
    try:
        # backlog served from the poll loop (includes model compile)
        assert _wait_for(str(out / "a_scores.root"))
        assert _wait_for(str(out / "r_scores.root"))

        # slow writer: stream a valid file in small chunks across many
        # polls; the size-stability guard must hold it mid-copy and
        # serve it whole (without the guard the partial file would be
        # parsed and quarantined as .failed)
        make_synthetic_file(str(tmp_path / "c_full.uevt"), n_events=2,
                            hw=(64, 64))
        blob = open(str(tmp_path / "c_full.uevt"), "rb").read()
        cpath = str(watch / "c.uevt")

        def slow_write():
            step = max(1, len(blob) // 40)
            with open(cpath, "wb") as f:
                for i in range(0, len(blob), step):
                    f.write(blob[i:i + step])
                    f.flush()
                    time.sleep(0.02)

        th = threading.Thread(target=slow_write)
        th.start()
        ok = _wait_for(str(out / "c_scores.root"),
                       absent=[str(out / "c.uevt.failed")])
        th.join()
        assert ok, "slow-written file never served"
        assert not os.path.exists(str(out / "c.uevt.failed"))

        proc.send_signal(signal.SIGTERM)
        stdout, stderr = proc.communicate(timeout=60)
        assert proc.returncode == 0, stderr[-2000:]
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()

    lines = [json.loads(l) for l in stdout.strip().splitlines()]
    assert lines[-1]["shutdown"] is True
    assert lines[-1]["served"] == 3
    served = {l["served"] for l in lines[:-1] if "served" in l}
    assert served == {"a.uevt", "r.root", "c.uevt"}

    # .root outputs carry normalized per-class scores + the source rse
    from ubresnet_tpu.data.rootio import RootEventReader

    with RootEventReader(str(out / "a_scores.root")) as r:
        assert len(r) == 2
        imgs = r.read_entry(0)["uburn_plane2"]
        assert len(imgs) == 3
        total = sum(i.pixels for i in imgs)
        np.testing.assert_allclose(total, 1.0, atol=1e-4)


def test_serve_once_wholeview_int8(tmp_path, ckpt, capsys):
    """--wholeview serve: whole planes split/score/stitched per file,
    int8 calibration on occupied tiles of the first file, normalized
    stitched scores under the ubsnet producer."""
    from ubresnet_tpu.cli.serve import main

    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    make_synthetic_file(str(watch / "wv.uevt"), n_events=2, hw=(128, 192))

    argv = ["--watch-dir", str(watch), "--out-dir", str(out),
            "-c", ckpt, "--once", "-v", "--wholeview", "--planes", "2",
            "--tile-rows", "64", "--tile-cols", "64", "--overlap-rows",
            "8", "--overlap-cols", "8", "--crop-batch", "4",
            "--int8", "--int8-calib", "2", "--int8-percentile", "99.9"]
    assert main(argv) == 0
    out_text = capsys.readouterr().out
    assert "int8: calibrated on" in out_text and "tiles" in out_text
    lines = [json.loads(l) for l in out_text.strip().splitlines()
             if l.startswith("{")]
    assert lines[-1]["shutdown"] is True and lines[-1]["served"] == 1
    r = EventFileReader(str(out / "wv_scores.uevt"))
    assert len(r) == 2
    scores = r.read_entry(0)["ubsnet_plane2"]
    assert len(scores) == 3
    total = sum(s.pixels for s in scores)
    np.testing.assert_allclose(total, 1.0, atol=1e-2)
