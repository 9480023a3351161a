"""Whole-view inference CLI (run_ubresnet_wholeview.py equivalent):
split whole-plane images into overlapping crops, score, stitch."""
from __future__ import annotations

import argparse
import json

from ubresnet_tpu.cli.infer_precropped import load_model_and_variables


def resolve_spatial(spatial, stitched, detsplit) -> bool:
    """Whether to score whole planes in one row-sharded forward.

    Spatial is the measured default (round-5 chip A/B: 13.28 vs 12.98
    planes/s stitched, docs/roofline.md); ``--stitched`` opts out,
    ``--detsplit`` implies crops (UBSplitDetector triplet geometry
    only exists in crop space), and an explicit ``--spatial`` with
    ``--detsplit`` is a contradiction."""
    if spatial and detsplit:
        raise SystemExit("--spatial and --detsplit are mutually "
                         "exclusive (detsplit defines crop triplets)")
    if spatial is None:
        return not stitched and not detsplit
    return spatial and not stitched


def main(argv=None):
    from ubresnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description="Score whole-plane event images")
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-c", "--checkpoint", required=True)
    ap.add_argument("-t", "--producer", default="wire")
    ap.add_argument("-n", "--nevents", type=int, default=None)
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("--planes", type=int, nargs="*", default=None)
    ap.add_argument("--tile-rows", type=int, default=512)
    ap.add_argument("--tile-cols", type=int, default=832)
    ap.add_argument("--overlap-rows", type=int, default=16)
    ap.add_argument("--overlap-cols", type=int, default=176)
    ap.add_argument("--crop-batch", type=int, default=10)
    ap.add_argument("--config", default=None)
    ap.add_argument("--arch", default="uresnet", choices=["uresnet", "aspp_resnet"])
    ap.add_argument("--best", action="store_true")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--detsplit", action="store_true",
                    help="3D-consistent crop triplets across U/V/Y "
                         "(UBSplitDetector semantics) instead of "
                         "independent per-plane grids")
    ap.add_argument("--passthrough", action="store_true",
                    help="copy input event content to the output file "
                         "(IOManager kBOTH mode)")
    ap.add_argument("--spatial", action="store_true", default=None,
                    help="score each whole plane in ONE row-sharded "
                         "forward over all devices (GSPMD halo "
                         "exchange) instead of crop-and-stitch. The "
                         "DEFAULT since the round-5 chip A/B (13.28 "
                         "vs 12.98 planes/s stitched, BENCH_r05); "
                         "implied off by --detsplit (crop semantics)")
    ap.add_argument("--stitched", action="store_true",
                    help="force crop-and-stitch scoring (the "
                         "pre-round-5 default)")
    ap.add_argument("--int8", action="store_true",
                    help="int8 PTQ inference (ops/quant.py): calibrate "
                         "activation scales on occupied tiles of the "
                         "first --int8-calib input planes, then run "
                         "packed convs s8xs8->s32 on the MXU")
    ap.add_argument("--int8-calib", type=int, default=4, metavar="N",
                    help="whole-plane images used for calibration "
                         "(default 4; every occupied tile of each)")
    ap.add_argument("--int8-percentile", type=float, default=None,
                    metavar="P",
                    help="calibrate scales from the P-th percentile of "
                         "nonzero |x| instead of abs-max (e.g. 99.9)")
    args = ap.parse_args(argv)
    if args.int8 and args.f32:
        raise SystemExit("--int8 and --f32 are mutually exclusive")

    from ubresnet_tpu.deploy import WholeViewRunner

    model, variables = load_model_and_variables(args)
    use_spatial = resolve_spatial(args.spatial, args.stitched,
                                  args.detsplit)
    spatial_mesh = None
    if use_spatial:
        import jax
        from jax.sharding import Mesh
        import numpy as np

        spatial_mesh = Mesh(np.array(jax.devices()), ("devices",))
    runner = WholeViewRunner(
        model,
        variables,
        tile_rows=args.tile_rows,
        tile_cols=args.tile_cols,
        min_overlap_rows=args.overlap_rows,
        min_overlap_cols=args.overlap_cols,
        crop_batch=args.crop_batch,
        spatial_mesh=spatial_mesh,
    )
    if args.int8:
        n_cal = runner.calibrate_from(
            args.input, producer=args.producer, planes=args.planes,
            n_images=args.int8_calib, percentile=args.int8_percentile,
        )
        if args.verbose:
            print(f"int8: calibrated on {n_cal} tiles")
    timing = runner.run(
        args.input,
        args.output,
        producer=args.producer,
        planes=args.planes,
        n_entries=args.nevents,
        detsplit=args.detsplit,
        passthrough=args.passthrough,
        verbose=args.verbose,
    )
    print(json.dumps(timing))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
