"""Export an orbax training checkpoint as a reference-format torch
`.tar` — the reverse-migration CLI: models trained here drop straight
into the reference deploy stack
(/root/reference/deploy/run_ubresnet_precropped.py -c <out.tar>).

    ubtpu-export-torch --checkpoint-dir ckpt/ --out model_best.tar
    ubtpu-export-torch --checkpoint-dir ckpt/ --best --arch aspp ...
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint-dir", required=True,
                    help="orbax checkpoint directory (Trainer output)")
    ap.add_argument("--step", type=int, default=None,
                    help="specific step (default: latest)")
    ap.add_argument("--best", action="store_true",
                    help="export the best-metric checkpoint")
    ap.add_argument("--out", required=True, help="output .tar path")
    ap.add_argument("--arch", choices=("uresnet", "aspp"),
                    default="uresnet")
    ap.add_argument("--data-parallel", action="store_true",
                    help="prefix keys with module. (DataParallel form)")
    args = ap.parse_args(argv)

    import orbax.checkpoint as ocp

    from ubresnet_tpu.deploy.exporters import save_reference_checkpoint
    from ubresnet_tpu.train.checkpoint import latest_step

    directory = os.path.abspath(args.checkpoint_dir)
    if args.best:
        path = os.path.join(directory, "best")
    else:
        step = args.step if args.step is not None else latest_step(directory)
        if step is None:
            print(f"no checkpoints under {directory}", file=sys.stderr)
            return 2
        path = os.path.join(directory, f"step_{step:08d}")
    payload = ocp.PyTreeCheckpointer().restore(path)
    variables = {
        "params": payload["params"],
        "batch_stats": payload["batch_stats"],
    }
    save_reference_checkpoint(
        variables,
        args.out,
        iteration=int(payload.get("step", 0)),
        best_prec1=float(payload.get("best_metric", 0.0)),
        data_parallel=args.data_parallel,
        arch=args.arch,
    )
    print(f"wrote {args.out} (iter {int(payload.get('step', 0))}, "
          f"arch {args.arch})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
