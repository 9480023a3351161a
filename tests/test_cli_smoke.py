"""End-to-end CLI smoke tests (subprocess, CPU platform)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

from ubresnet_tpu.data import EventFileReader, make_synthetic_file
from ubresnet_tpu.parity.torch_oracle import make_state_dict

ENV = dict(os.environ, UBTPU_PLATFORM="cpu")


def run_cli(args, timeout=400):
    proc = subprocess.run(
        [sys.executable, "-m"] + args, capture_output=True, text=True,
        env=ENV, timeout=timeout,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc.stdout


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    data = make_synthetic_file(str(d / "ev.uevt"), n_events=4, hw=(64, 64))
    sd = make_state_dict(np.random.RandomState(3), inplanes=4, in_ch=1,
                         classes=3, final_kernels=16)
    ckpt = str(d / "ref.tar")
    torch.save({"iter": 1, "state_dict": sd, "best_prec1": 0.5,
                "optimizer": {}}, ckpt)
    return {"dir": d, "data": data, "ckpt": ckpt}


@pytest.mark.slow
def test_infer_precropped_cli(fixtures):
    out = str(fixtures["dir"] / "pre_out.uevt")
    stdout = run_cli([
        "ubresnet_tpu.cli.infer_precropped", "-i", fixtures["data"], "-o", out,
        "-c", fixtures["ckpt"], "-p", "2", "-b", "2", "--f32",
    ])
    timing = json.loads(stdout.strip().splitlines()[-1])
    assert timing["total"] > 0
    r = EventFileReader(out)
    assert len(r) == 4
    scores = r.read_entry(0)["uburn_plane2"]
    total = sum(s.pixels for s in scores)
    np.testing.assert_allclose(total, 1.0, atol=1e-4)


@pytest.mark.slow
def test_infer_precropped_cli_int8(fixtures):
    """--int8 deploy: calibrates on the input, writes normalized scores."""
    out = str(fixtures["dir"] / "pre_out_int8.uevt")
    stdout = run_cli([
        "ubresnet_tpu.cli.infer_precropped", "-i", fixtures["data"], "-o", out,
        "-c", fixtures["ckpt"], "-p", "2", "-b", "2", "-v",
        "--int8", "--int8-calib", "4",
    ])
    assert "int8: calibrated on 4 images" in stdout
    timing = json.loads(stdout.strip().splitlines()[-1])
    assert timing["total"] > 0
    r = EventFileReader(out)
    assert len(r) == 4
    scores = r.read_entry(0)["uburn_plane2"]
    total = sum(s.pixels for s in scores)
    np.testing.assert_allclose(total, 1.0, atol=1e-2)


@pytest.mark.slow
def test_compare_and_evaluate_cli(fixtures):
    pre = str(fixtures["dir"] / "pre_out.uevt")
    if not os.path.exists(pre):
        pytest.skip("needs precropped output")
    stdout = run_cli([
        "ubresnet_tpu.cli.compare", pre, pre,
        "--producer-a", "uburn_plane2", "--producer-b", "uburn_plane2",
        "--adc-file", fixtures["data"],
    ])
    m = json.loads(stdout[stdout.index("{"):])
    assert m["label_agreement"] == 1.0
    assert m["meanabsdiff_class0"] == 0.0

    stdout = run_cli([
        "ubresnet_tpu.cli.evaluate", pre, fixtures["data"],
        "--score-producer", "uburn_plane2",
    ])
    m = json.loads(stdout[stdout.index("{"):])
    assert 0.0 <= m["acc_total"] <= 1.0
    assert m["n_entries"] == 4


def test_wholeview_spatial_default_resolution():
    """Spatial is the wholeview default since the round-5 chip A/B
    (spatial_speedup 1.023, docs/roofline.md); --stitched opts out and
    --detsplit implies crop geometry."""
    import pytest

    from ubresnet_tpu.cli.infer_wholeview import resolve_spatial

    assert resolve_spatial(None, False, False) is True   # default
    assert resolve_spatial(None, True, False) is False   # --stitched
    assert resolve_spatial(None, False, True) is False   # --detsplit
    assert resolve_spatial(True, False, False) is True   # explicit
    assert resolve_spatial(False, False, False) is False
    with pytest.raises(SystemExit):
        resolve_spatial(True, False, True)  # contradiction
