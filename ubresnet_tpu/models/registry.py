"""Model registry — name → (module class, config class).

The reference selects models by editing the import line of a copied
training script (training/README.md workflow); here it is a config key.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models.aspp_resnet import ASPPResNet, ASPPResNetConfig
from ubresnet_tpu.models.uresnet import UResNet, UResNetConfig

MODEL_REGISTRY: Dict[str, Tuple[Any, Any]] = {
    "uresnet": (UResNet, UResNetConfig),
    "aspp_resnet": (ASPPResNet, ASPPResNetConfig),
}


def get_model(name: str, policy: Policy = Policy(), **config_kwargs):
    """Instantiate a registered model with config overrides."""
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model '{name}'; have {sorted(MODEL_REGISTRY)}")
    cls, cfg_cls = MODEL_REGISTRY[name]
    return cls(config=cfg_cls(**config_kwargs), policy=policy)
