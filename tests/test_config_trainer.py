"""Config system + end-to-end trainer smoke tests."""
import json

import numpy as np
import pytest

from ubresnet_tpu.core.config import (
    DataConfig,
    TrainConfig,
    emit_pset,
    parse_pset,
)
from ubresnet_tpu.data import make_synthetic_file


PSET_TEXT = """
ThreadProcessorTrain: {
  Verbosity:3
  NumThreads: 2
  NumBatchStorage: 2
  RandomAccess: true
  InputFiles: ["a.root","b.root"]
  ProcessName: ["source_train","label_train","weight_train"]
  ProcessType: ["BatchFillerImage2D","BatchFillerImage2D","BatchFillerImage2D"]
  ProcessList: {
    source_train: { ImageProducer: "wire" Channels: [2] EnableMirror: false }
    label_train: { ImageProducer: "segment" Channels: [2] EnableMirror: false }
    weight_train: { ImageProducer: "ts_keyspweight" Channels: [2] EnableMirror: true }
  }
}
"""


def test_parse_pset_reference_dialect():
    p = parse_pset(PSET_TEXT)
    tp = p["ThreadProcessorTrain"]
    assert tp["NumThreads"] == 2
    assert tp["RandomAccess"] is True
    assert tp["InputFiles"] == ["a.root", "b.root"]
    assert tp["ProcessList"]["source_train"]["ImageProducer"] == "wire"
    assert tp["ProcessList"]["source_train"]["Channels"] == [2]


def test_pset_roundtrip():
    p = parse_pset(PSET_TEXT)
    again = parse_pset(emit_pset(p))
    assert again == p


def test_dataconfig_from_pset():
    d = DataConfig.from_pset(parse_pset(PSET_TEXT), role="train")
    assert d.files == ["a.root", "b.root"]
    assert d.image_producer == "wire"
    assert d.label_producer == "segment"
    assert d.weight_producer == "ts_keyspweight"
    assert d.mirror is True  # any EnableMirror true


def test_trainconfig_json_roundtrip(tmp_path):
    cfg = TrainConfig.from_dict(
        {
            "model": {"inplanes": 8, "precision": "f32"},
            "optim": {"lr": 1e-3, "name": "adam"},
            "train_data": {"files": ["x.uevt"], "batch_size": 2},
            "num_iters": 5,
        }
    )
    path = tmp_path / "c.json"
    path.write_text(cfg.to_json())
    again = TrainConfig.load(str(path))
    assert again.model.inplanes == 8
    assert again.train_data.files == ["x.uevt"]
    with pytest.raises(KeyError):
        TrainConfig.from_dict({"nonsense": 1})


def test_trainer_end_to_end(tmp_path):
    """Full loop: synthetic file -> loader -> train -> validate ->
    checkpoint -> resume."""
    train_file = make_synthetic_file(str(tmp_path / "tr.uevt"), n_events=8, hw=(64, 64))
    valid_file = make_synthetic_file(
        str(tmp_path / "va.uevt"), n_events=4, hw=(64, 64), seed=9
    )
    cfg = TrainConfig.from_dict(
        {
            "model": {"inplanes": 4, "precision": "f32"},
            "optim": {"lr": 1e-3},
            "train_data": {"files": [train_file], "batch_size": 2, "mirror": True},
            "valid_data": {"files": [valid_file], "batch_size": 2},
            "num_iters": 6,
            "valid_every": 3,
            "valid_batches": 1,
            "checkpoint_every": 5,
            "print_every": 2,
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "log_dir": str(tmp_path / "logs"),
            "model_axis": 1,
        }
    )
    from ubresnet_tpu.train.trainer import train

    summary = train(cfg)
    assert "error" not in summary, summary.get("error")
    assert summary["final_iter"] == 6
    assert (tmp_path / "ckpt").is_dir()
    # jsonl log written
    log = (tmp_path / "logs" / "run.jsonl").read_text().strip().splitlines()
    tags = {json.loads(l)["tag"] for l in log}
    assert "train/loss" in tags and "valid/acc_total" in tags

    # resume continues from final checkpoint
    cfg.resume = True
    cfg.num_iters = 8
    summary2 = train(cfg)
    assert "error" not in summary2
    assert summary2["final_iter"] == 8


def test_cli_overrides(tmp_path):
    from ubresnet_tpu.cli.train import apply_overrides

    cfg = TrainConfig()
    apply_overrides(cfg, ["optim.lr=0.001", "model.inplanes=8", "num_iters=3"])
    assert cfg.optim.lr == 0.001
    assert cfg.model.inplanes == 8
    assert cfg.num_iters == 3
    with pytest.raises(SystemExit):
        apply_overrides(cfg, ["bogus.key=1"])
