"""Reference-checkpoint exporter: flax variables → torch state_dict.

The exact inverse of deploy/importers.py, completing the two-way
migration story: models trained here can be saved as the reference's
`.tar` checkpoints ({iter, epoch, state_dict, best_prec1, optimizer},
train_ubresnet2018_wlarcv2.py:474-479) and loaded by the reference
deploy stack (deploy/ubresnet_funcs.py:41-68) unchanged.

Layout transforms (mirror of the importer):
  conv kernel   HWIO → OIHW           (transpose 3, 2, 0, 1)
  deconv kernel HWIO → IOHW           (transpose 2, 3, 0, 1)
  BN            scale/bias → weight/bias; batch_stats → running_*
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _t(a):
    import torch

    return torch.from_numpy(np.array(a, np.float32, copy=True))


def _conv(out, key, p, transpose=(3, 2, 0, 1)):
    out[f"{key}.weight"] = _t(np.asarray(p["kernel"]).transpose(*transpose))
    if "bias" in p:
        out[f"{key}.bias"] = _t(p["bias"])


def _bn(out, key, p, s):
    import torch

    out[f"{key}.weight"] = _t(p["scale"])
    out[f"{key}.bias"] = _t(p["bias"])
    out[f"{key}.running_mean"] = _t(s["mean"])
    out[f"{key}.running_var"] = _t(s["var"])
    # torch BN tracks update count; the reference never reads it but
    # strict load_state_dict on torch>=0.4.1 expects the key
    out[f"{key}.num_batches_tracked"] = torch.zeros((), dtype=torch.long)


def _convbn(out, conv_key, bn_key, p, s):
    _conv(out, conv_key, p["conv"])
    _bn(out, bn_key, p["bn"], s["bn"])


def _basic_block(out, pref, p, s):
    _convbn(out, f"{pref}.conv1", f"{pref}.bn1", p["cb1"], s["cb1"])
    _convbn(out, f"{pref}.conv2", f"{pref}.bn2", p["cb2"], s["cb2"])
    if "bypass" in p:
        _convbn(out, f"{pref}.bypass", f"{pref}.bnpass",
                p["bypass"], s["bypass"])


def _double_resnet(out, pref, p, s):
    for r in ("res1", "res2"):
        _basic_block(out, f"{pref}.{r}", p[r], s[r])


def _decoder(out, pref, p, s):
    _conv(out, f"{pref}.deconv", p["deconv"], transpose=(2, 3, 0, 1))
    _double_resnet(out, f"{pref}.res", p["res"], s["res"])


def export_uresnet_state_dict(variables: Dict,
                              data_parallel: bool = False) -> Dict:
    """Flax variables {params, batch_stats} → reference UResNet
    state_dict (ub_uresnet.py naming; importers.py inverse).

    ``data_parallel`` prefixes every key with ``module.`` so the file
    round-trips through the reference's DataParallel detection
    (ubresnet_funcs.py:52-64)."""
    p, s = variables["params"], variables["batch_stats"]
    out: Dict = {}
    _convbn(out, "conv1", "bn1", p["stem"], s["stem"])
    for i in range(1, 6):
        _double_resnet(out, f"enc_layer{i}", p[f"enc{i}"], s[f"enc{i}"])
        _decoder(out, f"dec_layer{i}", p[f"dec{i}"], s[f"dec{i}"])
    _convbn(out, "conv10", "bn10", p["head"], s["head"])
    _conv(out, "conv11", p["classifier"])
    if data_parallel:
        out = {f"module.{k}": v for k, v in out.items()}
    return out


def export_aspp_state_dict(variables: Dict,
                           data_parallel: bool = False) -> Dict:
    """Flax ASPP_ResNet variables → reference state_dict
    (ASPP_ResNet.py naming; inverse of import_aspp_state_dict)."""
    p, s = variables["params"], variables["batch_stats"]
    out: Dict = {}
    _convbn(out, "conv1", "bn1", p["stem"], s["stem"])
    for i in range(1, 6):
        _double_resnet(out, f"enc_layer{i}", p[f"enc{i}"], s[f"enc{i}"])
        _decoder(out, f"dec_layer{i}", p[f"dec{i}"], s[f"dec{i}"])
    for i in (3, 4, 5):
        for b in (1, 2, 3, 4):
            _convbn(out, f"ASPP_layer_enc{i}.B{b}_conv",
                    f"ASPP_layer_enc{i}.B{b}_bn",
                    p[f"aspp{i}"][f"b{b}"], s[f"aspp{i}"][f"b{b}"])
        _convbn(out, f"ASPP_combine_enc{i}.ASPP_conv",
                f"ASPP_combine_enc{i}.ASPP_bn",
                p[f"aspp{i}_post"]["post"], s[f"aspp{i}_post"]["post"])
    _convbn(out, "conv10", "bn10", p["head"], s["head"])
    _conv(out, "conv11", p["classifier"])
    if data_parallel:
        out = {f"module.{k}": v for k, v in out.items()}
    return out


def save_reference_checkpoint(
    variables: Dict,
    path: str,
    *,
    iteration: int = 0,
    epoch: float = 0.0,
    best_prec1: float = 0.0,
    data_parallel: bool = False,
    optimizer: Optional[Dict] = None,
    arch: str = "uresnet",
) -> str:
    """Write a reference-format `.tar` checkpoint
    (train_ubresnet2018_wlarcv2.py:474-479 envelope) loadable by
    torch.load + load_cosmic_retrain_model. ``arch``: "uresnet" or
    "aspp"."""
    import torch

    export = (export_uresnet_state_dict if arch == "uresnet"
              else export_aspp_state_dict)
    state = {
        "iter": iteration,
        "epoch": epoch,
        "state_dict": export(variables, data_parallel=data_parallel),
        "best_prec1": best_prec1,
        "optimizer": optimizer if optimizer is not None else {},
    }
    torch.save(state, path)
    return path
