"""Precropped inference CLI.

Arg surface mirrors deploy/run_ubresnet_precropped.py:17-27
(-i -o -c -p -t [-b -n -v]); checkpoints may be reference .tar files
(imported) or this framework's orbax checkpoint dirs (with --config).
"""
from __future__ import annotations

import argparse
import json


def load_model_and_variables(args):
    from ubresnet_tpu.core.precision import Policy

    if args.f32:
        policy = Policy.f32()
    elif getattr(args, "int8", False):
        policy = Policy.tpu_int8()
    else:
        policy = Policy.tpu()
    if args.checkpoint.endswith(".tar"):
        from ubresnet_tpu.deploy.importers import load_reference_model

        return load_reference_model(args.checkpoint, policy=policy, arch=args.arch)
    # orbax checkpoint dir + config
    if not args.config:
        raise SystemExit("--config required for orbax checkpoint dirs")
    import jax

    from ubresnet_tpu.core.config import TrainConfig
    from ubresnet_tpu.models import get_model
    from ubresnet_tpu.train import create_train_state, restore_checkpoint
    from ubresnet_tpu.train.optimizers import optimizer_from_config

    cfg = TrainConfig.load(args.config)
    model = get_model(
        cfg.model.name,
        policy=policy,
        num_classes=cfg.model.num_classes,
        input_channels=cfg.model.input_channels,
        inplanes=cfg.model.inplanes,
    )
    # the optimizer must match training's so the checkpointed opt_state
    # tree structure restores (we only keep params/batch_stats after)
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        jax.numpy.zeros((1, 64, 64, cfg.model.input_channels)),
        optimizer_from_config(cfg.optim),
    )
    state = restore_checkpoint(args.checkpoint, state, best=args.best)
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def build_parser():
    ap = argparse.ArgumentParser(description="Score precropped event images")
    ap.add_argument("-i", "--input", required=True, help="input event file (.uevt or larcv .root)")
    ap.add_argument("-o", "--output", required=True,
                    help="output file (.uevt, or .root for larcv write-back)")
    ap.add_argument("-c", "--checkpoint", required=True,
                    help="reference .tar or orbax checkpoint dir")
    ap.add_argument("-p", "--plane", type=int, default=2, help="wire plane id")
    ap.add_argument("-t", "--producer", default="wire", help="ADC image producer")
    ap.add_argument("-b", "--batchsize", type=int, default=8)
    ap.add_argument("-n", "--nevents", type=int, default=None)
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("--config", default=None, help="TrainConfig for orbax ckpts")
    ap.add_argument("--arch", default="uresnet", choices=["uresnet", "aspp_resnet"])
    ap.add_argument("--best", action="store_true", help="load best checkpoint")
    ap.add_argument("--f32", action="store_true", help="full-f32 (parity) mode")
    ap.add_argument(
        "--compact-readback", nargs="?", const="f16", default=False,
        choices=["f16", "u8", "sparse"],
        help="ship K-1 class scores off-device in f16 (6x fewer D2H "
        "bytes, ~5e-4 score quantisation; the default when the flag "
        "is given bare), u8 fixed point (12x fewer bytes, ~2e-3), or "
        "sparse (u8 scores at charge pixels + a --readback-dilate "
        "halo only; empty pixels filled from the network's zero-input "
        "response — the pixels the reference's comparison discipline "
        "masks anyway, ~20-60x fewer bytes again at LArTPC occupancy)."
        " The throughput dial when host<->device readback bandwidth "
        "binds the deploy loop",
    )
    ap.add_argument("--readback-dilate", type=int, default=4, metavar="R",
                    help="halo radius (pixels) around charge kept in "
                         "--compact-readback sparse mode (default 4)")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="wrap the run in a jax.profiler trace "
                         "(TensorBoard profile plugin)")
    ap.add_argument("--int8", action="store_true",
                    help="int8 PTQ inference (ops/quant.py): calibrate "
                         "activation scales on the first --int8-calib "
                         "input images, then run packed convs s8xs8->s32 "
                         "on the MXU (2x its bf16 rate)")
    ap.add_argument("--int8-calib", type=int, default=32, metavar="N",
                    help="calibration images taken from the input "
                         "(default 32)")
    ap.add_argument("--int8-percentile", type=float, default=None,
                    metavar="P",
                    help="calibrate scales from the P-th percentile of "
                         "nonzero |x| instead of abs-max (e.g. 99.9; "
                         "outlier-robust, saturates the largest "
                         "activations)")
    ap.add_argument("--f16-scores", action="store_true",
                    help="store score images as float16 in .uevt "
                         "outputs (half the bytes, ~5e-4 quantisation; "
                         ".root outputs stay f32)")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard each batch over every visible device "
                         "(GSPMD data-parallel inference; -b must "
                         "divide by the device count)")
    return ap


def main(argv=None):
    from ubresnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    from ubresnet_tpu.deploy import PrecroppedRunner

    model, variables = load_model_and_variables(args)
    import numpy as np

    data_mesh = None
    if args.data_parallel:
        import jax
        from jax.sharding import Mesh

        data_mesh = Mesh(np.array(jax.devices()), ("data",))
    runner = PrecroppedRunner(
        model,
        variables,
        batch_size=args.batchsize,
        compact_readback=args.compact_readback,
        readback_dilate=args.readback_dilate,
        score_dtype=np.float16 if args.f16_scores else np.float32,
        data_mesh=data_mesh,
    )
    if args.int8:
        if args.f32:
            raise SystemExit("--int8 and --f32 are mutually exclusive")
        n_cal = runner.calibrate_from(
            args.input, plane=args.plane, producer=args.producer,
            n_images=args.int8_calib,
            percentile=args.int8_percentile,
        )
        if args.verbose:
            print(f"int8: calibrated on {n_cal} images")
    import contextlib

    ctx = contextlib.nullcontext()
    if args.trace:
        from ubresnet_tpu.utils.profiling import trace

        ctx = trace(args.trace)
    with ctx:
        timing = runner.run(
            args.input,
            args.output,
            plane=args.plane,
            producer=args.producer,
            n_entries=args.nevents,
            verbose=args.verbose,
        )
    print(json.dumps(timing))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
