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
    # multi-host: one training across processes when the launcher set
    # UBTPU_COORDINATOR / UBTPU_NUM_PROCESSES / UBTPU_PROCESS_ID
    # (no-op single-process otherwise)
    from ubresnet_tpu.parallel import distributed

    if distributed.initialize():
        import jax

        print(
            f"distributed: process {jax.process_index()}/"
            f"{jax.process_count()}, {len(jax.local_devices())} local / "
            f"{len(jax.devices())} global devices",
            flush=True,
        )
    ap = argparse.ArgumentParser(description="Train a ubresnet_tpu model")
    ap.add_argument("--config", "-c", required=True, help="JSON or PSet config file")
    ap.add_argument(
        "--set", action="append", dest="overrides", metavar="KEY=VALUE",
        help="override config entries (dot paths)",
    )
    ap.add_argument("--dump-config", action="store_true",
                    help="print the resolved config and exit")
    ap.add_argument("--debug-dump", default=None, metavar="DIR",
                    help="dump one batch as ADC/label/weight PNGs and exit "
                         "(the reference's debug fixture, "
                         "train_ubresnet2018_wlarcv2.py:188-207)")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="wrap training in a jax.profiler trace written "
                         "here (TensorBoard profile plugin; the "
                         "reference's RUNPROFILER block, "
                         "train_ubresnet2018_wlarcv2.py:51,209)")
    args = ap.parse_args(argv)

    cfg = apply_overrides(TrainConfig.load(args.config), args.overrides)
    if args.dump_config:
        print(cfg.to_json())
        return 0
    if args.debug_dump:
        import os

        from ubresnet_tpu.train.trainer import make_loader
        from ubresnet_tpu.utils.png import save_heatmap

        os.makedirs(args.debug_dump, exist_ok=True)
        loader = make_loader(cfg.train_data, seed=cfg.seed).start()
        try:
            batch = loader[0]
        finally:
            loader.stop()
        for i in range(batch["image"].shape[0]):
            save_heatmap(os.path.join(args.debug_dump, f"adc_{i}.png"),
                         batch["image"][i, ..., 0])
            save_heatmap(os.path.join(args.debug_dump, f"label_{i}.png"),
                         batch["label"][i], 0, cfg.model.num_classes - 1)
            save_heatmap(os.path.join(args.debug_dump, f"weight_{i}.png"),
                         batch["weight"][i])
        print(f"dumped {batch['image'].shape[0]} samples to {args.debug_dump}")
        return 0
    from ubresnet_tpu.train.trainer import train

    if args.trace:
        from ubresnet_tpu.utils.profiling import trace

        with trace(args.trace):
            summary = train(cfg)
    else:
        summary = train(cfg)
    print(json.dumps({k: v for k, v in summary.items() if k != "error"}, indent=2))
    return 1 if "error" in summary else 0


if __name__ == "__main__":
    raise SystemExit(main())
