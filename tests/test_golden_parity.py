"""Golden-parity rig dry run (cli/golden_parity.py).

The official ssnet2018 caffemodels are absent from the reference
checkout (weights/ssnet2018caffe holds fetch scripts only), so the
committed coverage is the rig itself: the full three-leg pipeline with
surrogate weights, the per-plane threshold machinery, and the
negative control proving the comparator detects disagreement.
Reference discipline: caffe/README.md:9-13, compare_caffe_to_tf.py:89-97.
"""
import json

import pytest

from ubresnet_tpu.cli.golden_parity import main


@pytest.mark.slow
def test_dry_run_report(tmp_path):
    report_path = str(tmp_path / "report.json")
    rc = main([
        "--dry-run",
        "--hw", "64",          # small stand-in for the 512 oracle shape
        "-n", "2",
        "-o", report_path,
    ])
    assert rc == 0
    rep = json.loads(open(report_path).read())
    assert rep["ok"] is True
    assert rep["mode"] == "dry-run"
    assert rep["threshold"] == 0.999
    assert set(rep["planes"]) == {"0", "1", "2"}
    for plane, m in rep["planes"].items():
        assert m["passes"] and m["label_agreement"] >= 0.999
    # the comparator must be able to FAIL: perturbed weights detected
    neg = rep["negative_control"]
    assert neg["detected"] and neg["label_agreement"] < 0.999
