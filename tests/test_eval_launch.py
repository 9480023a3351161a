"""Evaluation, launcher, and profiling-utility tests."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from ubresnet_tpu.data import (
    EventFileReader,
    EventFileWriter,
    Image2D,
    ImageMeta,
    make_synthetic_file,
)
from ubresnet_tpu.parity.evaluate import evaluate_entry, evaluate_files
from ubresnet_tpu.utils.profiling import StageTimer


def test_evaluate_entry_exact():
    truth = np.array([[0, 1], [2, 2]])
    scores = np.zeros((3, 2, 2), np.float32)
    scores[0, 0, 0] = 1  # correct bg
    scores[1, 0, 1] = 1  # correct shower
    scores[0, 1, 0] = 1  # wrong (truth track)
    scores[2, 1, 1] = 1  # correct track
    m = evaluate_entry(scores, truth)
    assert m["acc_total"] == pytest.approx(0.75)
    assert m["acc_class2"] == pytest.approx(0.5)
    assert m["acc_nonzero"] == pytest.approx(2 / 3)
    assert m["confusion"][2][0] == 1


def test_evaluate_entry_masks():
    truth = np.array([[0, 1], [2, 9]])
    scores = np.zeros((3, 2, 2), np.float32)
    scores[0] = 1.0  # predict bg everywhere
    adc = np.array([[0.0, 50.0], [50.0, 50.0]])
    m = evaluate_entry(scores, truth, adc=adc, adc_threshold=10.0,
                       ignore_label=9)
    # only pixels (0,1) shower and (1,0) track remain; both predicted bg
    assert m["n_pixels"] == 2
    assert m["acc_total"] == 0.0


def _write_scores(path, truth_path, flip_frac=0.0, seed=0):
    """Score file whose argmax equals truth except a flipped fraction."""
    rt = EventFileReader(truth_path)
    rng = np.random.RandomState(seed)
    with EventFileWriter(path) as w:
        for i in range(len(rt)):
            ev = rt.read_entry(i)
            lab = ev["segment"][0]
            onehot = np.eye(3, dtype=np.float32)[lab.pixels.astype(int)]
            flip = rng.rand(*lab.pixels.shape) < flip_frac
            onehot[flip] = np.roll(onehot[flip], 1, axis=-1)
            w.set_id(*lab.rse)
            for c in range(3):
                w.append("scores", Image2D(onehot[..., c], lab.meta, *lab.rse))
            w.save_entry()
    return path


def test_evaluate_files_perfect_and_degraded(tmp_path):
    truth = make_synthetic_file(str(tmp_path / "t.uevt"), n_events=3, hw=(64, 64))
    perfect = _write_scores(str(tmp_path / "p.uevt"), truth)
    m = evaluate_files(perfect, truth, "scores", adc_producer=None)
    assert m["acc_total"] == 1.0
    assert m["acc_nonzero"] == 1.0

    flipped = _write_scores(str(tmp_path / "f.uevt"), truth, flip_frac=0.5)
    m2 = evaluate_files(flipped, truth, "scores", adc_producer=None)
    assert 0.3 < m2["acc_total"] < 0.7


def test_stage_timer_report():
    t = StageTimer()
    with t.stage("read"):
        pass
    with t.stage("forward"):
        pass
    with t.stage("read"):
        pass
    assert t.counts["read"] == 2
    rep = t.report(n_events=2)
    assert "forward" in rep and "per event" in rep


def test_launch_emit_sbatch(tmp_path):
    sweep = {
        "base": "cfg.json",
        "jobs": [{"name": "a", "set": {}}, {"name": "b", "set": {}}],
    }
    spath = tmp_path / "sweep.json"
    spath.write_text(json.dumps(sweep))
    from ubresnet_tpu.cli.launch import main

    out = tmp_path / "submit.sh"
    assert main(["--sweep", str(spath), "--emit-sbatch", str(out)]) == 0
    text = out.read_text()
    assert "--array=0-1" in text
    assert "ubresnet_tpu.cli.launch" in text


@pytest.mark.slow
def test_launch_runs_sweep(tmp_path):
    """Two tiny independent trainings through the real launcher CLI."""
    data = make_synthetic_file(str(tmp_path / "d.uevt"), n_events=4, hw=(32, 32))
    cfg = {
        "model": {"inplanes": 2, "precision": "f32"},
        "train_data": {"files": [data], "batch_size": 2},
        "num_iters": 2,
        "checkpoint_every": 2,
        "print_every": 1,
        "model_axis": 1,
    }
    base = tmp_path / "base.json"
    base.write_text(json.dumps(cfg))
    sweep = {
        "base": str(base),
        "jobs": [
            {"name": "lr_a", "set": {"optim.lr": 1e-3}},
            {"name": "lr_b", "set": {"optim.lr": 1e-4}},
        ],
        "stagger_seconds": 0,
    }
    spath = tmp_path / "sweep.json"
    spath.write_text(json.dumps(sweep))
    env = dict(os.environ, UBTPU_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "ubresnet_tpu.cli.launch", "--sweep", str(spath),
         "--workdir", str(tmp_path / "out"), "--parallel", "2"],
        capture_output=True, text=True, env=env, timeout=400,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    for name in ("lr_a", "lr_b"):
        ckpts = tmp_path / "out" / name / "checkpoints"
        assert ckpts.is_dir(), (tmp_path / "out" / name / "train.log").read_text()


def _shuffle_file(src, dst, order):
    """Rewrite a UEVT file with entries in the given order."""
    r = EventFileReader(src)
    with EventFileWriter(dst) as w:
        for i in order:
            ev = r.read_entry(i)
            w.set_id(*r.rse(i))
            for prod, imgs in ev.items():
                for img in imgs:
                    w.append(prod, img)
            w.save_entry()
    return dst


def test_evaluate_files_rse_aligned(tmp_path):
    """Entries are paired by (run,subrun,event), not file position
    (VERDICT round-2 item 6; reference rse discipline,
    deploy/run_ubresnet_precropped.py:163-168): a score file written in
    reversed order still evaluates perfect."""
    truth = make_synthetic_file(str(tmp_path / "t.uevt"), n_events=4,
                                hw=(64, 64))
    perfect = _write_scores(str(tmp_path / "p.uevt"), truth)
    shuffled = _shuffle_file(perfect, str(tmp_path / "ps.uevt"),
                             [3, 1, 0, 2])
    m = evaluate_files(shuffled, truth, "scores", adc_producer=None)
    assert m["acc_total"] == 1.0
    assert m["n_entries"] == 4.0


def test_evaluate_files_rse_mismatch_diagnostic(tmp_path):
    """Disjoint event-id sets raise with the offending ids named."""
    truth = make_synthetic_file(str(tmp_path / "t.uevt"), n_events=3,
                                hw=(32, 32))
    perfect = _write_scores(str(tmp_path / "p.uevt"), truth)
    r = EventFileReader(perfect)
    bad = str(tmp_path / "bad.uevt")
    with EventFileWriter(bad) as w:
        for i in range(len(r)):
            ev = r.read_entry(i)
            w.set_id(7, 7, 100 + i)  # ids that exist in no truth file
            for prod, imgs in ev.items():
                for img in imgs:
                    w.append(prod, img)
            w.save_entry()
    with pytest.raises(ValueError, match=r"\(7, 7, 100\)"):
        evaluate_files(bad, truth, "scores", adc_producer=None)


def test_compare_score_files_rse_aligned(tmp_path):
    from ubresnet_tpu.parity import compare_score_files

    truth = make_synthetic_file(str(tmp_path / "t.uevt"), n_events=4,
                                hw=(64, 64))
    a = _write_scores(str(tmp_path / "a.uevt"), truth)
    b = _shuffle_file(a, str(tmp_path / "b.uevt"), [2, 0, 3, 1])
    m = compare_score_files(a, b, "scores", "scores")
    assert m["label_agreement"] == 1.0
    for c in range(3):
        assert m[f"meanabsdiff_class{c}"] == 0.0
