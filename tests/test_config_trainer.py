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
    assert d.plane == 2  # Channels: [2] (ubresnet_train.cfg:13)
    assert d.shuffle is True  # RandomAccess


SEGFILLER_TEXT = """
ThreadDatumFillerTrain: {
  Verbosity: 2
  EnableFilter: false
  RandomAccess: false
  UseThread: false
  InputFiles: ["t.root"]
  ProcessType: ["SegFiller"]
  ProcessName: ["SegFiller"]
  ProcessList: {
    SegFiller: {
      Verbosity: 2
      ImageProducer: "wire"
      LabelProducer: "segment"
      WeightProducer: "ts_keyspweight"
      Channels: [2]
      SegChannel: 2
      EnableMirror: true
      EnableCrop: false
      ClassTypeList: [0,1,2]
      ClassTypeDef: [0,0,0,2,2,2,1,1,1,1]
    }
  }
}
"""


def test_dataconfig_from_segfiller_pset():
    """The LArCV1 SegFiller dialect (train_ubresnet2018_wlarcv1.py:
    136-211): producers via Label/WeightProducer keys, Channels plane
    select, ClassTypeDef 10->3 remap, RandomAccess false."""
    d = DataConfig.from_pset(parse_pset(SEGFILLER_TEXT), role="train")
    assert d.files == ["t.root"]
    assert d.image_producer == "wire"
    assert d.label_producer == "segment"
    assert d.weight_producer == "ts_keyspweight"
    assert d.plane == 2
    assert d.class_map == [0, 0, 0, 2, 2, 2, 1, 1, 1, 1]
    assert d.mirror is True
    assert d.shuffle is False  # RandomAccess: false
    assert d.pad_crop == 0  # EnableCrop: false


def test_from_pset_warns_on_dropped_keys():
    import warnings

    text = PSET_TEXT.replace(
        'ImageProducer: "wire"', 'ImageProducer: "wire" FancyOption: 3'
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        DataConfig.from_pset(parse_pset(text), role="train")
    assert any("FancyOption" in str(w.message) for w in rec)


def test_from_pset_reference_cfgs():
    """Ingest the reference's actual cfg files when mounted: the exact
    selection semantics of ubresnet_train.cfg:1-29."""
    import os

    import pytest

    path = "/root/reference/training/ubresnet_train.cfg"
    if not os.path.exists(path):
        pytest.skip("reference checkout not mounted")
    with open(path) as f:
        d = DataConfig.from_pset(parse_pset(f.read()), role="train")
    assert d.image_producer == "wire"
    assert d.label_producer == "segment"
    assert d.weight_producer == "ts_keyspweight"
    assert d.plane == 2
    assert d.n_threads == 2 and d.n_buffers == 2
    assert d.shuffle is True
    assert d.mirror is False
    assert len(d.files) == 4


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


@pytest.mark.slow
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


@pytest.mark.slow
def test_trainer_qat_remat_config(tmp_path):
    """model.qat / model.remat config keys reach the Policy and the
    loop still trains + checkpoints (the QAT-finetune entry point:
    resume a checkpoint with --set model.qat=true)."""
    train_file = make_synthetic_file(
        str(tmp_path / "tr.uevt"), n_events=4, hw=(64, 64)
    )
    cfg = TrainConfig.from_dict(
        {
            "model": {"inplanes": 8, "qat": True, "qat_percentile": 99.5,
                      "remat": True},
            "optim": {"lr": 1e-3},
            "train_data": {"files": [train_file], "batch_size": 2},
            "num_iters": 2,
            "checkpoint_every": 2,
            "print_every": 1,
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "log_dir": str(tmp_path / "logs"),
            "model_axis": 1,
        }
    )
    from ubresnet_tpu.train.trainer import Trainer, train

    t = Trainer(cfg)
    assert t.model.policy.quant_train and t.model.policy.remat
    assert t.model.policy.quant_percentile == 99.5
    summary = train(cfg)
    assert "error" not in summary, summary.get("error")
    assert summary["final_iter"] == 2
