"""Watch-dir serving CLI (cli/serve.py): drain-once semantics, warm
process across files, failure quarantine, idempotent re-run."""
import json
import os

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
