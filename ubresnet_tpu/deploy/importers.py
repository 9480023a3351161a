"""Reference-checkpoint importers: torch state_dict → flax variables.

Ingests the reference's `.tar` checkpoints
({iter, epoch, state_dict, best_prec1, optimizer},
train_ubresnet2018_wlarcv2.py:474-479), including DataParallel
checkpoints whose keys carry a ``module.`` prefix (detected and
stripped exactly as deploy/ubresnet_funcs.py:52-64 does).

Layout transforms:
  conv weight   OIHW → HWIO           (transpose 2,3,1,0)
  deconv weight IOHW → HWIO           (transpose 2,3,0,1; our Deconv2x
                                       flips spatially at apply time,
                                       matching torch ConvTranspose2d)
  BN            weight/bias → scale/bias; running_mean/var → batch_stats

Model geometry (inplanes, classes, input channels) is inferred from
the checkpoint, so the reference's divergent constructions (deploy uses
num_classes=4, ubresnet_funcs.py:43; training uses 3) both import.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def strip_module_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove DataParallel's 'module.' key prefix when present."""
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in sd.items()}
    return sd


def _conv(sd, key, transpose=(2, 3, 1, 0)):
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(*transpose)}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _bn(sd, key) -> Tuple[dict, dict]:
    params = {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}
    stats = {
        "mean": _np(sd[f"{key}.running_mean"]),
        "var": _np(sd[f"{key}.running_var"]),
    }
    return params, stats


def _convbn(sd, conv_key, bn_key):
    bn_p, bn_s = _bn(sd, bn_key)
    return {"conv": _conv(sd, conv_key), "bn": bn_p}, {"bn": bn_s}


def _basic_block(sd, pref):
    p, s = {}, {}
    p["cb1"], s["cb1"] = _convbn(sd, f"{pref}.conv1", f"{pref}.bn1")
    p["cb2"], s["cb2"] = _convbn(sd, f"{pref}.conv2", f"{pref}.bn2")
    if f"{pref}.bypass.weight" in sd:
        p["bypass"], s["bypass"] = _convbn(sd, f"{pref}.bypass", f"{pref}.bnpass")
    return p, s


def _double_resnet(sd, pref):
    p, s = {}, {}
    for r in ("res1", "res2"):
        p[r], s[r] = _basic_block(sd, f"{pref}.{r}")
    return p, s


def _decoder(sd, pref):
    p, s = {}, {}
    p["deconv"] = {"kernel": _np(sd[f"{pref}.deconv.weight"]).transpose(2, 3, 0, 1)}
    p["res"], s["res"] = _double_resnet(sd, f"{pref}.res")
    return p, s


def import_uresnet_state_dict(sd: Dict) -> Dict:
    """Reference UResNet state_dict (ub_uresnet.py naming) → flax
    variables {params, batch_stats}."""
    sd = strip_module_prefix(sd)
    p, s = {}, {}
    p["stem"], s["stem"] = _convbn(sd, "conv1", "bn1")
    for i in range(1, 6):
        p[f"enc{i}"], s[f"enc{i}"] = _double_resnet(sd, f"enc_layer{i}")
        p[f"dec{i}"], s[f"dec{i}"] = _decoder(sd, f"dec_layer{i}")
    p["head"], s["head"] = _convbn(sd, "conv10", "bn10")
    p["classifier"] = _conv(sd, "conv11")
    return {"params": p, "batch_stats": s}


def import_aspp_state_dict(sd: Dict) -> Dict:
    """Reference ASPP_ResNet state_dict (ASPP_ResNet.py naming) → flax
    variables."""
    sd = strip_module_prefix(sd)
    p, s = {}, {}
    p["stem"], s["stem"] = _convbn(sd, "conv1", "bn1")
    for i in range(1, 6):
        p[f"enc{i}"], s[f"enc{i}"] = _double_resnet(sd, f"enc_layer{i}")
        p[f"dec{i}"], s[f"dec{i}"] = _decoder(sd, f"dec_layer{i}")
    for i in (3, 4, 5):
        ap, asn = {}, {}
        for b in (1, 2, 3, 4):
            ap[f"b{b}"], asn[f"b{b}"] = _convbn(
                sd, f"ASPP_layer_enc{i}.B{b}_conv", f"ASPP_layer_enc{i}.B{b}_bn"
            )
        p[f"aspp{i}"], s[f"aspp{i}"] = ap, asn
        cp, cs = _convbn(
            sd, f"ASPP_combine_enc{i}.ASPP_conv", f"ASPP_combine_enc{i}.ASPP_bn"
        )
        p[f"aspp{i}_post"], s[f"aspp{i}_post"] = {"post": cp}, {"post": cs}
    p["head"], s["head"] = _convbn(sd, "conv10", "bn10")
    p["classifier"] = _conv(sd, "conv11")
    return {"params": p, "batch_stats": s}


def import_torch_checkpoint(path: str, arch: str = "uresnet") -> Tuple[Dict, Dict]:
    """Load a reference .tar checkpoint file.

    Returns (variables, info) where info carries the checkpoint's
    geometry (inplanes, num_classes, input_channels) and bookkeeping
    (iter, best_prec1) when present.
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload) if isinstance(payload, dict) else payload
    sd = strip_module_prefix({k: _np(v) for k, v in sd.items()})
    w = sd["conv1.weight"]  # (inplanes, in_ch, 7, 7)
    info = {
        "inplanes": int(w.shape[0]),
        "input_channels": int(w.shape[1]),
        "num_classes": int(sd["conv11.weight"].shape[0]),
        "iter": payload.get("iter") if isinstance(payload, dict) else None,
        "best_prec1": payload.get("best_prec1") if isinstance(payload, dict) else None,
    }
    importer = (
        import_aspp_state_dict
        if arch == "aspp_resnet" or any(k.startswith("ASPP_layer") for k in sd)
        else import_uresnet_state_dict
    )
    return importer(sd), info


def load_reference_model(path: str, policy=None, arch: str = "uresnet"):
    """load_cosmic_retrain_model equivalent (ubresnet_funcs.py:41-68):
    build the right model for a reference checkpoint and return
    (model, variables)."""
    from ubresnet_tpu.core.precision import Policy
    from ubresnet_tpu.models import get_model

    variables, info = import_torch_checkpoint(path, arch)
    arch = "aspp_resnet" if "aspp3" in variables["params"] else "uresnet"
    model = get_model(
        arch,
        policy=policy or Policy.tpu(),
        num_classes=info["num_classes"],
        input_channels=info["input_channels"],
        inplanes=info["inplanes"],
    )
    import jax

    variables = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), variables)
    return model, variables
