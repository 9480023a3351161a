"""Training CLI — `python -m ubresnet_tpu.cli.train --config cfg.json`.

Replaces the reference's copy-the-script workflow (training/README.md)
with a config file + overrides. Override syntax: --set a.b=c, e.g.
--set optim.lr=1e-4 --set model.inplanes=32.
"""
from __future__ import annotations

import argparse
import json

from ubresnet_tpu.core.config import TrainConfig


def apply_overrides(cfg: TrainConfig, overrides):
    for ov in overrides or []:
        key, _, raw = ov.partition("=")
        if not raw:
            raise SystemExit(f"--set expects key=value, got '{ov}'")
        try:
            val = json.loads(raw)
        except json.JSONDecodeError:
            val = raw
        obj = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if not hasattr(obj, p):
                raise SystemExit(f"unknown config section '{p}'")
            obj = getattr(obj, p)
            if obj is None:
                raise SystemExit(f"config section '{p}' is unset")
        if not hasattr(obj, parts[-1]):
            raise SystemExit(f"unknown config key '{key}'")
        setattr(obj, parts[-1], val)
    return cfg


def main(argv=None):
    from ubresnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description="Train a ubresnet_tpu model")
    ap.add_argument("--config", "-c", required=True, help="JSON or PSet config file")
    ap.add_argument(
        "--set", action="append", dest="overrides", metavar="KEY=VALUE",
        help="override config entries (dot paths)",
    )
    ap.add_argument("--dump-config", action="store_true",
                    help="print the resolved config and exit")
    args = ap.parse_args(argv)

    cfg = apply_overrides(TrainConfig.load(args.config), args.overrides)
    if args.dump_config:
        print(cfg.to_json())
        return 0
    from ubresnet_tpu.train.trainer import train

    summary = train(cfg)
    print(json.dumps({k: v for k, v in summary.items() if k != "error"}, indent=2))
    return 1 if "error" in summary else 0


if __name__ == "__main__":
    raise SystemExit(main())
