"""Caffe-graph inference CLI — run_caffe_precropped.py equivalent.

Runs the 2018-paper caffe network (official .caffemodel weights per
plane, caffe/run_caffe_precropped.py:26-30) natively on TPU via the
CaffeNet executor, writing per-class score images to ``ssnet_plane%d``
with the reference's per-stage timing report.
"""
from __future__ import annotations

import argparse
import json
import time
from collections import OrderedDict

import numpy as np


def main(argv=None):
    from ubresnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description="Run a caffe graph on event images")
    ap.add_argument("-i", "--input", required=True, help="input UEVT file")
    ap.add_argument("-o", "--output", required=True, help="output UEVT file")
    ap.add_argument(
        "--prototxt",
        default=None,
        help="model prototxt (default: built-in ssnet2018 generator)",
    )
    ap.add_argument(
        "-w",
        "--weights",
        action="append",
        default=None,
        metavar="PLANE:FILE",
        help="per-plane caffemodel, e.g. 0:plane0.caffemodel (repeatable)",
    )
    ap.add_argument("-t", "--producer", default="wire")
    ap.add_argument("-n", "--nevents", type=int, default=None)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ubresnet_tpu.data.meta import Image2D
    from ubresnet_tpu.data.rootio import open_event_file
    from ubresnet_tpu.data.uevt import EventFileWriter
    from ubresnet_tpu.models.ssnet2018 import ssnet2018_prototxt
    from ubresnet_tpu.parity.caffe import CaffeNet, parse_caffemodel

    prototxt = args.prototxt or ssnet2018_prototxt()
    weights_by_plane = {}
    for spec in args.weights or []:
        plane, _, path = spec.partition(":")
        weights_by_plane[int(plane)] = parse_caffemodel(path)

    nets = {}

    def net_for(plane):
        if plane not in nets:
            w = weights_by_plane.get(plane)
            nets[plane] = CaffeNet(prototxt, weights=w)
        return nets[plane]

    timing = OrderedDict(
        [("total", 0.0), ("read", 0.0), ("forward", 0.0), ("write", 0.0)]
    )
    t_total = time.time()
    reader = open_event_file(args.input)
    writer = EventFileWriter(args.output)
    n = len(reader) if args.nevents is None else min(args.nevents, len(reader))
    fwd_cache = {}
    for i in range(n):
        t0 = time.time()
        ev = reader.read_entry(i, producers=[args.producer])
        timing["read"] += time.time() - t0
        for img in ev[args.producer]:
            plane = img.meta.plane
            net = net_for(plane)
            key = (plane, img.pixels.shape)
            if key not in fwd_cache:
                fwd_cache[key] = net.jit_forward("softmax")
            t0 = time.time()
            scores = np.asarray(
                jax.device_get(
                    fwd_cache[key](
                        net.params,
                        jnp.asarray(img.pixels, jnp.float32)[None, ..., None],
                    )
                )
            )[0]
            timing["forward"] += time.time() - t0
            t0 = time.time()
            for c in range(scores.shape[-1]):
                writer.append(
                    f"ssnet_plane{plane}",
                    Image2D(scores[..., c].astype(np.float32), img.meta, *img.rse),
                )
            timing["write"] += time.time() - t0
        writer.set_id(*reader.rse(i))
        writer.save_entry()
        if args.verbose:
            print(f"entry {i} done", flush=True)
    writer.close()
    timing["total"] = time.time() - t_total
    if args.verbose:
        print("------ timing -------")
        for k, v in timing.items():
            print(f"{k} : {v:.3f} s / {v / max(n, 1):.5f} s per event")
    print(json.dumps(timing))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
