"""Watch-dir serving mode: continuously score event files as they
arrive — the production-deployment wrapper around the precropped
runner (the reference's workflow runs run_ubresnet_precropped.py once
per file by hand; this keeps one warm process + compiled program
across files, so per-file cost is IO + forward only).

    ubtpu-serve --watch-dir in/ --out-dir out/ -c model.tar -p 2
    ubtpu-serve ... --once            # drain the backlog and exit
    ubtpu-serve ... --wholeview       # whole-plane split/score/stitch

Files count as processed when their output exists; a `<name>.failed`
marker quarantines files that raise, so one bad file can't wedge the
loop. New files are picked up only after their size is stable across
two polls (avoids racing a writer mid-copy).
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time


def build_parser():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--watch-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("-c", "--checkpoint", required=True,
                    help="reference .tar or orbax checkpoint dir")
    ap.add_argument("--config", help="TrainConfig JSON (orbax ckpts)")
    ap.add_argument("--best", action="store_true")
    ap.add_argument("--arch", default="uresnet")
    ap.add_argument("-p", "--plane", type=int, default=2)
    ap.add_argument("-t", "--producer", default="wire")
    ap.add_argument("-b", "--batchsize", type=int, default=8)
    ap.add_argument("--wholeview", action="store_true",
                    help="serve whole-plane images (split/score/stitch, "
                         "deploy/wholeview.py) instead of precropped; "
                         "-p is ignored, use --planes")
    ap.add_argument("--planes", type=int, nargs="*", default=None,
                    help="wholeview: planes to score (default all)")
    ap.add_argument("--tile-rows", type=int, default=512)
    ap.add_argument("--tile-cols", type=int, default=832)
    ap.add_argument("--overlap-rows", type=int, default=16)
    ap.add_argument("--overlap-cols", type=int, default=176)
    ap.add_argument("--crop-batch", type=int, default=10)
    ap.add_argument("--poll", type=float, default=2.0,
                    help="seconds between directory scans")
    ap.add_argument("--once", action="store_true",
                    help="process the current backlog, then exit")
    ap.add_argument("--root-out", action="store_true",
                    help="write .root (larcv write-back) outputs")
    ap.add_argument("--f16-scores", action="store_true",
                    help="store score images as float16 in .uevt "
                         "outputs (half the bytes)")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="int8 PTQ inference; activation scales are "
                         "calibrated on the first served file "
                         "(ops/quant.py)")
    ap.add_argument("--int8-calib", type=int, default=32, metavar="N",
                    help="calibration images from the first file "
                         "(default 32; with --wholeview: whole planes, "
                         "every occupied tile of each)")
    ap.add_argument("--int8-percentile", type=float, default=None,
                    metavar="P",
                    help="calibrate scales from the P-th percentile of "
                         "nonzero |x| instead of abs-max (e.g. 99.9)")
    ap.add_argument("-v", "--verbose", action="store_true")
    return ap


def _candidates(watch_dir):
    for name in sorted(os.listdir(watch_dir)):
        if name.endswith((".uevt", ".root")):
            yield name


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ubresnet_tpu.cli.infer_precropped import load_model_and_variables
    from ubresnet_tpu.deploy.precropped import PrecroppedRunner
    from ubresnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    if args.int8 and args.f32:
        raise SystemExit("--int8 and --f32 are mutually exclusive")
    os.makedirs(args.out_dir, exist_ok=True)
    import numpy as np

    model, variables = load_model_and_variables(args)
    score_dtype = np.float16 if args.f16_scores else np.float32
    if args.wholeview:
        from ubresnet_tpu.deploy.wholeview import WholeViewRunner

        runner = WholeViewRunner(
            model, variables, score_dtype=score_dtype,
            tile_rows=args.tile_rows, tile_cols=args.tile_cols,
            min_overlap_rows=args.overlap_rows,
            min_overlap_cols=args.overlap_cols,
            crop_batch=args.crop_batch,
        )
    else:
        runner = PrecroppedRunner(
            model, variables, batch_size=args.batchsize,
            score_dtype=score_dtype,
        )

    stop = {"flag": False}

    def _sig(*_):
        stop["flag"] = True

    signal.signal(signal.SIGTERM, _sig)
    signal.signal(signal.SIGINT, _sig)

    ext = ".root" if args.root_out else ".uevt"
    sizes = {}
    served = 0
    while not stop["flag"]:
        backlog = []
        for name in _candidates(args.watch_dir):
            base = os.path.splitext(name)[0]
            out = os.path.join(args.out_dir, base + "_scores" + ext)
            failed = os.path.join(args.out_dir, name + ".failed")
            if os.path.exists(out) or os.path.exists(failed):
                continue
            path = os.path.join(args.watch_dir, name)
            size = os.path.getsize(path)
            # require TWO consecutive stable-size polls before serving:
            # one stable pair can be a writer merely descheduled for a
            # poll period mid-copy
            last, stable = sizes.get(name, (None, 0))
            stable = stable + 1 if size == last else 0
            sizes[name] = (size, stable)
            if not args.once and stable < 2:
                continue
            backlog.append((name, path, out, failed))
        for name, path, out, failed in backlog:
            if stop["flag"]:
                break
            try:
                t0 = time.time()
                if args.int8 and "quant" not in runner.variables:
                    if args.wholeview:
                        n_cal = runner.calibrate_from(
                            path, producer=args.producer,
                            planes=args.planes,
                            n_images=args.int8_calib,
                            percentile=args.int8_percentile,
                        )
                        unit = "tiles"
                    else:
                        n_cal = runner.calibrate_from(
                            path, plane=args.plane,
                            producer=args.producer,
                            n_images=args.int8_calib,
                            percentile=args.int8_percentile,
                        )
                        unit = "images"
                    if args.verbose:
                        print(f"int8: calibrated on {n_cal} {unit} "
                              f"from {name}", flush=True)
                if args.wholeview:
                    timing = runner.run(
                        path, out, producer=args.producer,
                        planes=args.planes, verbose=args.verbose,
                    )
                else:
                    timing = runner.run(
                        path, out, plane=args.plane,
                        producer=args.producer, verbose=args.verbose,
                    )
                served += 1
                print(json.dumps({
                    "served": name, "output": os.path.basename(out),
                    "seconds": round(time.time() - t0, 3),
                    "timing": {k: round(v, 3) for k, v in timing.items()},
                }), flush=True)
            except Exception as exc:  # quarantine, keep serving
                if os.path.exists(out):
                    os.remove(out)
                with open(failed, "w") as f:
                    f.write(f"{type(exc).__name__}: {exc}\n")
                print(json.dumps({"failed": name, "error": str(exc)}),
                      file=sys.stderr, flush=True)
        if args.once:
            break
        time.sleep(args.poll)
    print(json.dumps({"shutdown": True, "served": served}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
