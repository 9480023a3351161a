"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: 512x512 crops/sec/chip, H2D + forward, on the
flagship UResNet (inplanes=16, 3 classes) — the BASELINE.json north
star. The same JSON line carries a second metric under "train": full
train-step throughput (sparse H2D + forward + backward + Adam update,
donated state) at the same 512x512 shape, matching the north star's
"infer + train step" scope. Input data is realistic zero-suppressed
LArTPC-like events (~1% occupancy) shipped to the device over the
framework's sparse COO path and densified on-chip inside the jitted
program (the reference ships dense f32 and is input-bound, SURVEY.md
§6).

vs_baseline is the ratio to the PyTorch reference engine (functional
evaluation of the same architecture/state-dict format) on this host's
CPU — the reference published no numbers (BASELINE.md); its engine on
available hardware is the baseline. Cached in bench_baseline.json.

Timing is one long window over many batches ending in a device→host
readback (the tunnel's dispatch is async; per-call timers lie).
stdout carries exactly one JSON line; progress goes to stderr.
"""
from __future__ import annotations

import contextlib
import json
import os
import signal
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(HERE, "bench_baseline.json")

def _env_int(name, default):
    return int(os.environ.get(name, default))


# UBTPU_BENCH_* overrides exist for CPU smoke runs of the harness
# itself; the defaults are the measured-optimum TPU configuration.
HW = _env_int("UBTPU_BENCH_HW", 512)
# throughput plateaus ~b128 (863 vs 727 crops/s @64, device-resident)
BATCH = _env_int("UBTPU_BENCH_BATCH", 128)
ITERS = _env_int("UBTPU_BENCH_ITERS", 15)
INPLANES = _env_int("UBTPU_BENCH_INPLANES", 16)
# throughput plateaus ~bs32 (164 vs 151 crops/s @16)
TRAIN_BATCH = _env_int("UBTPU_BENCH_TRAIN_BATCH", 32)
TRAIN_ITERS = _env_int("UBTPU_BENCH_TRAIN_ITERS", 12)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


@contextlib.contextmanager
def section_timeout(seconds):
    """Convert a hang (e.g. the axon tunnel dying mid-readback) into a
    TimeoutError so one wedged section can't erase the whole JSON line
    — round-3's failure mode was a silent rc=124 with nothing printed.
    SIGALRM is safe here: bench runs sections sequentially on the main
    thread."""

    def _raise(signum, frame):
        raise TimeoutError(f"bench section exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(int(seconds))
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


# Per-section wall budget. Generous vs observed TPU timings (compile
# ~40s + measure <30s per section) but small enough that all sections
# plus probes fit a driver timeout with room to print. Judge-measured
# round-4 context: the FIRST execution through the axon tunnel has
# ~200-400s variance (identical headline program: 420s timeout at one
# run, 245s completion 20 min later), so a single timeout is a coin
# flip — sections retry once (run_section) and never erase each other.
SECTION_TIMEOUT_S = _env_int("UBTPU_BENCH_SECTION_TIMEOUT", 420)
SECTION_RETRIES = _env_int("UBTPU_BENCH_SECTION_RETRIES", 1)


def run_section(name, fn, *args, **kwargs):
    """Run one bench section under its own SIGALRM budget, with phase
    stamps and one retry on timeout. Sections are independently
    survivable — round 4 lost train/deploy/int8/wholeview to a single
    headline TimeoutError (VERDICT r4 weak #2). Returns
    ``(result, None)`` or ``(None, error_string)``."""
    err = None
    for attempt in range(1 + SECTION_RETRIES):
        t0 = time.time()
        log(f"[{name}] start (attempt {attempt + 1}/{1 + SECTION_RETRIES}, "
            f"budget {SECTION_TIMEOUT_S}s)")
        try:
            with section_timeout(SECTION_TIMEOUT_S):
                out = fn(*args, **kwargs)
            log(f"[{name}] ok in {time.time() - t0:.1f}s")
            return out, None
        except TimeoutError as exc:
            err = f"timeout: {exc}"
            log(f"[{name}] TIMEOUT after {time.time() - t0:.1f}s — "
                f"{'retrying with a fresh alarm' if attempt < SECTION_RETRIES else 'giving up'}")
        except Exception as exc:  # non-timeout errors don't retry
            err = f"{type(exc).__name__}: {exc}"
            log(f"[{name}] ERROR after {time.time() - t0:.1f}s: {err}")
            break
    return None, err


def make_batches(n=4):
    from ubresnet_tpu.data.synthetic import synth_event
    from ubresnet_tpu.ops.sparse import sparsify

    rng = np.random.RandomState(0)
    dense, sparse = [], []
    cap = 0
    for _ in range(n):
        imgs = np.stack([synth_event(rng, (HW, HW))["wire"] for _ in range(BATCH)])
        sp = sparsify(imgs, bucket=4096)
        cap = max(cap, sp["indices"].shape[1])
        dense.append(imgs)
        sparse.append(sp)
    # equalize capacity so one compiled program serves all batches
    for sp in sparse:
        k = sp["indices"].shape[1]
        if k < cap:
            pad = cap - k
            sp["indices"] = np.pad(sp["indices"], ((0, 0), (0, pad)))
            sp["values"] = np.pad(sp["values"], ((0, 0), (0, pad)))
    occ = float(np.mean([(d != 0).mean() for d in dense]))
    log(f"data: {len(dense)} batches of {BATCH}x{HW}x{HW}, occupancy {occ * 100:.2f}%, "
        f"sparse capacity {cap}")
    return dense, sparse


def measure_tpu() -> dict:
    import jax
    import jax.numpy as jnp

    from ubresnet_tpu.core.precision import Policy
    from ubresnet_tpu.models import get_model
    from ubresnet_tpu.ops.sparse import sparse_forward_fn
    from ubresnet_tpu.train import init_model

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    model = get_model(
        "uresnet", policy=Policy.tpu(), input_channels=1, inplanes=INPLANES
    )
    variables = init_model(model, jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 1)))
    fwd_sp = sparse_forward_fn(model)

    dense, sparse = make_batches()
    log("[infer] phase: data built")

    def run_window(n_iters):
        out = None
        t0 = time.time()
        for i in range(n_iters):
            sp = sparse[i % len(sparse)]
            out = fwd_sp(
                variables,
                jax.device_put(sp["indices"]),
                jax.device_put(sp["values"]),
                (HW, HW),
            )
        _ = float(out[0, 0, 0, 0])  # D2H readback: drains the async queue
        return time.time() - t0

    # per-phase stamps so a section timeout is attributable to
    # compile vs first-execution vs steady-state (VERDICT r4 weak #3)
    t0 = time.time()
    run_window(1)  # compile + first readback
    log(f"[infer] phase: compile+first-readback done ({time.time() - t0:.1f}s)")
    run_window(1)  # warm
    log("[infer] phase: warm done")
    dt = run_window(ITERS)
    log(f"[infer] phase: window done ({dt:.1f}s)")
    crops_per_sec = ITERS * BATCH / dt
    log(f"tpu sparse h2d+fwd: {crops_per_sec:.1f} crops/s "
        f"({dt / ITERS * 1e3:.1f} ms/batch of {BATCH})")
    return {"crops_per_sec": crops_per_sec, "ms_per_batch": dt / ITERS * 1e3}


def make_train_batches(n=4, batch=None):
    """Sparse-transfer training batches with a shared capacity so one
    compiled train step serves all of them."""
    from ubresnet_tpu.data.synthetic import synth_event
    from ubresnet_tpu.ops.sparse import sparsify_batch

    rng = np.random.RandomState(1)
    batch = TRAIN_BATCH if batch is None else batch
    batches = []
    for _ in range(n):
        evs = [synth_event(rng, (HW, HW)) for _ in range(batch)]
        batches.append(
            sparsify_batch(
                {
                    "image": np.stack([e["wire"] for e in evs])[..., None],
                    "label": np.stack([e["segment"] for e in evs]),
                    "weight": np.stack([e["weight"] for e in evs]),
                }
            )
        )
    caps = {
        k: max(b[k].shape[1] for b in batches)
        for k in ("img_idx", "lab_idx", "wgt_idx")
    }
    for b in batches:
        for base in ("img", "lab", "wgt"):
            cap = caps[f"{base}_idx"]
            for suf in ("idx", "val"):
                arr = b[f"{base}_{suf}"]
                if arr.shape[1] < cap:
                    b[f"{base}_{suf}"] = np.pad(
                        arr, ((0, 0), (0, cap - arr.shape[1]))
                    )
    return batches


def measure_tpu_train(fused: bool = False, batches=None,
                      remat: bool = False, batch: int = 0) -> dict:
    """Train-step throughput; ``fused=True`` measures the
    stats-decoupled Pallas train zone (ops/pallas_train.py) — the A/B
    that decides Policy.tpu()'s fused_train default (NOTES.md queue;
    run here so the driver's end-of-round bench records it even when
    the tunnel is down for the whole build session). ``remat=True`` +
    a bigger ``batch`` probes whether stage rematerialization buys
    net throughput past the activation-memory cliff."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ubresnet_tpu.core.precision import Policy
    from ubresnet_tpu.models import get_model
    from ubresnet_tpu.train import build_train_step, create_train_state, make_optimizer

    batch = batch or TRAIN_BATCH
    policy = Policy.tpu()
    if fused:
        policy = dataclasses.replace(policy, fused_train=True)
    if remat:
        policy = dataclasses.replace(policy, remat=True)
    model = get_model(
        "uresnet", policy=policy, input_channels=1, inplanes=INPLANES
    )
    tx = make_optimizer("adam", learning_rate=1e-5, weight_decay=1e-4)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 1)), tx
    )
    step = build_train_step(num_classes=3, sparse_hw=(HW, HW))
    if batches is None:
        batches = make_train_batches(batch=batch)

    def put(b):
        return {k: jax.device_put(v) if isinstance(v, np.ndarray) else v
                for k, v in b.items()}

    def run_window(state, n_iters):
        metrics = None
        t0 = time.time()
        for i in range(n_iters):
            state, metrics = step(state, put(batches[i % len(batches)]))
        _ = float(metrics["loss"])  # D2H readback drains the queue
        return state, time.time() - t0

    tag = ("fused" if fused else "xla-packed") + ("+remat" if remat else "")
    t0 = time.time()
    state, _ = run_window(state, 1)  # compile + first readback
    log(f"[train {tag}] phase: compile+first-readback done "
        f"({time.time() - t0:.1f}s)")
    state, _ = run_window(state, 1)  # warm
    state, dt = run_window(state, TRAIN_ITERS)
    log(f"[train {tag}] phase: window done ({dt:.1f}s)")
    rate = TRAIN_ITERS * batch / dt
    log(f"tpu sparse h2d+train-step [{tag}]: {rate:.1f} crops/s "
        f"({dt / TRAIN_ITERS * 1e3:.1f} ms/batch of {batch})")
    return {"crops_per_sec": rate, "ms_per_batch": dt / TRAIN_ITERS * 1e3}


def measure_deploy_cli() -> dict:
    """Deploy-path throughput through the REAL runner (file read →
    sparse H2D → forward → file write, dispatch-then-drain pipeline) —
    the round-2 item-8 "done=" measurement: CLI crops/s within ~10% of
    the raw bench number (reference per-stage timing-dict currency,
    run_ubresnet_precropped.py:97-103). Uses a warm runner (second
    run) like the serve daemon's steady state."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from ubresnet_tpu.core.precision import Policy
    from ubresnet_tpu.data.synthetic import synth_event
    from ubresnet_tpu.data.meta import Image2D, ImageMeta
    from ubresnet_tpu.data.uevt import EventFileWriter
    from ubresnet_tpu.deploy.precropped import PrecroppedRunner
    from ubresnet_tpu.models import get_model
    from ubresnet_tpu.train import init_model

    n_events = max(2 * BATCH, 16)
    model = get_model(
        "uresnet", policy=Policy.tpu(), input_channels=1, inplanes=INPLANES
    )
    variables = init_model(model, jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 1)))
    # u8 compact readback: score readback bytes are the deploy loop's
    # serial resource whenever host<->device D2H bandwidth binds (the
    # axon tunnel sustains ~15 MB/s; a local PCIe host ~10 GB/s), so
    # the bench uses the smallest faithful encoding (255-level fixed
    # point on probabilities, ~2e-3 quantisation — an order below the
    # int8-deploy accuracy bar).
    runner = PrecroppedRunner(model, variables, batch_size=BATCH,
                              compact_readback="u8")
    # measure the achievable D2H rate so the deploy number carries its
    # own context: d2h_bound_crops_per_sec is the hard ceiling any
    # full-score deploy loop has on this host link.
    probe = jax.device_put(jnp.ones((16, HW, HW, 1), jnp.uint8))
    probe.block_until_ready()
    np.asarray(jax.device_get(probe[:1]))  # warm the transfer path
    t0 = time.time()
    np.asarray(jax.device_get(probe))
    d2h_mb_s = probe.size / 1e6 / (time.time() - t0)
    per_crop_mb = HW * HW * 2 / 1e6  # u8 x (num_classes-1) channels
    rng = np.random.RandomState(2)
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in.uevt")
        with EventFileWriter(inp) as w:  # wire-only: deploy reads ADC
            for e in range(n_events):
                px = synth_event(rng, (HW, HW))["wire"]
                w.append("wire", Image2D(
                    px, ImageMeta(0.0, 0.0, HW * 0.5, HW * 0.5, HW, HW, 2)))
                w.set_id(1, 0, e)
                w.save_entry()
        runner.run(inp, os.path.join(d, "warm.uevt"), plane=2)  # compile
        timing = runner.run(inp, os.path.join(d, "out.uevt"), plane=2)
        # sparse readback: gather u8 scores at charge pixels + halo
        # on-device; host fills the rest from the zero-input response
        # field. Readback bytes drop ~20-60x again at LArTPC occupancy
        # — the next dial after u8 when the link binds.
        sp_runner = PrecroppedRunner(model, variables, batch_size=BATCH,
                                     compact_readback="sparse")
        sp_runner.run(inp, os.path.join(d, "warm_sp.uevt"), plane=2)
        timing_sp = sp_runner.run(inp, os.path.join(d, "out_sp.uevt"),
                                  plane=2)
        # Byte accounting from actual shapes/dtypes, both directions:
        # D2H is the gathered u8 scores (out_cap x (c-1) x 1 byte);
        # the sparse mode also UPLOADS out_idx (int32, 4 bytes/slot)
        # every batch, which shares the link with D2H on this tunnel
        # (ADVICE r4: counting D2H alone overstated the saving 3x).
        n_score_ch = 2  # num_classes - 1; u8 itemsize 1
        sp_mb_per_crop = sp_runner._out_cap * n_score_ch * 1 / 1e6
        sp_idx_h2d_mb_per_crop = sp_runner._out_cap * 4 / 1e6
        # Out-of-halo fill error (ADVICE r4 medium): the sparse mode
        # reconstructs pixels outside the readback halo from the
        # network's zero-input response field — an approximation whose
        # error is unbounded in principle (U-Net receptive field spans
        # the crop). Measure it against the u8 runner's full readback
        # on these weights so the number ships with the speedup claim.
        from ubresnet_tpu.data.rootio import open_event_file
        ra = open_event_file(os.path.join(d, "out.uevt"))
        rb = open_event_file(os.path.join(d, "out_sp.uevt"))
        max_err = 0.0
        for i in range(min(len(ra), BATCH)):  # one batch is plenty
            ia = ra.read_entry(i)["uburn_plane2"]
            ib = rb.read_entry(i)["uburn_plane2"]
            for im_a, im_b in zip(ia, ib):
                max_err = max(max_err, float(
                    np.abs(im_a.pixels - im_b.pixels).max()))
    rate = n_events / timing["total"]
    rate_sp = n_events / timing_sp["total"]
    d2h_bound = d2h_mb_s / per_crop_mb
    log(f"deploy runner h2d+fwd+file-io: {rate:.1f} crops/s "
        f"(timing {dict((k, round(v, 3)) for k, v in timing.items())}; "
        f"link {d2h_mb_s:.1f} MB/s d2h -> bound {d2h_bound:.1f} crops/s, "
        f"link_efficiency {rate / d2h_bound:.2f})")
    log(f"deploy sparse-readback: {rate_sp:.1f} crops/s "
        f"({sp_mb_per_crop:.4f} MB/crop d2h + "
        f"{sp_idx_h2d_mb_per_crop:.4f} MB/crop idx h2d; "
        f"max |sparse - u8| = {max_err:.4f}; timing "
        f"{dict((k, round(v, 3)) for k, v in timing_sp.items())})")
    return {"crops_per_sec": rate,
            "timing": {k: round(v, 4) for k, v in timing.items()},
            "d2h_mb_s": round(d2h_mb_s, 2),
            "readback_mb_per_crop": round(per_crop_mb, 4),
            "d2h_bound_crops_per_sec": round(d2h_bound, 2),
            "link_efficiency": round(rate / d2h_bound, 4),
            "sparse_readback": {
                "crops_per_sec": round(rate_sp, 2),
                "timing": {k: round(v, 4) for k, v in timing_sp.items()},
                "readback_mb_per_crop": round(sp_mb_per_crop, 4),
                "idx_h2d_mb_per_crop": round(sp_idx_h2d_mb_per_crop, 4),
                "max_abs_err_vs_u8": round(max_err, 5),
                "speedup_vs_u8": round(rate_sp / max(rate, 1e-9), 3),
            }}


def measure_wholeview() -> dict:
    """Wholeview deploy A/B at the reference plane shape (1008x3456,
    512x832 tiles, run_ubresnet_wholeview.py:38-44): crop-and-stitch
    vs the spatial whole-plane forward (one pass, no overlap
    redundancy — ~1.4x fewer FLOPs at CoveredZWidth-style overlaps).
    Another queued TPU decision recorded by the driver's end-of-round
    bench run."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from ubresnet_tpu.core.precision import Policy
    from ubresnet_tpu.data.synthetic import synth_event
    from ubresnet_tpu.deploy.wholeview import WholeViewRunner
    from ubresnet_tpu.models import get_model
    from ubresnet_tpu.train import init_model

    hw = (1008, 3456) if HW == 512 else (2 * HW, 3 * HW)
    tiles = (512, 832) if HW == 512 else (HW, HW)
    overlaps = (16, 176) if HW == 512 else (8, 8)
    model = get_model(
        "uresnet", policy=Policy.tpu(), input_channels=1, inplanes=INPLANES
    )
    variables = init_model(model, jax.random.PRNGKey(0),
                           jnp.zeros((1, tiles[0], tiles[1], 1)))
    rng = np.random.RandomState(3)
    planes = [synth_event(rng, hw)["wire"] for _ in range(3)]

    def window(runner, n=6):
        dev = None
        t0 = time.time()
        for i in range(n):
            dev = runner.dispatch_image(planes[i % len(planes)])
        _ = float(jax.device_get(dev[0, 0, 0]))
        return n / (time.time() - t0)

    out = {}
    stitched = WholeViewRunner(model, variables, tile_rows=tiles[0],
                               tile_cols=tiles[1],
                               min_overlap_rows=overlaps[0],
                               min_overlap_cols=overlaps[1], crop_batch=7)
    window(stitched, 3)  # compile + settle sparse capacity
    out["stitched_planes_per_sec"] = round(window(stitched), 3)
    log(f"wholeview stitched: {out['stitched_planes_per_sec']} planes/s")

    spatial = WholeViewRunner(
        model, variables,
        spatial_mesh=Mesh(np.array(jax.devices()[:1]), ("devices",)),
    )
    window(spatial, 3)  # compile + settle sparse capacity
    out["spatial_planes_per_sec"] = round(window(spatial), 3)
    out["spatial_speedup"] = round(
        out["spatial_planes_per_sec"] / out["stitched_planes_per_sec"], 3
    )
    log(f"wholeview spatial: {out['spatial_planes_per_sec']} planes/s "
        f"({out['spatial_speedup']}x stitched)")
    return out


def measure_int8_infer(tpu: dict) -> dict:
    """int8 PTQ infer A/B (ops/quant.py, Policy.tpu_int8()): the MXU's
    s8×s8→s32 mode is twice its bf16 rate — does it beat the Pallas
    bf16 fused-eval zone end-to-end? Two arms: the headline is
    Policy.tpu_int8() as shipped (int8 Pallas fused kernels on TPU),
    `xla_crops_per_sec` is the same quantization on the XLA packed
    path (fused_eval=False). Same window as the headline, same weights
    (PRNGKey(0)); also records on-chip accuracy as the mean |Δp| vs an
    f32 forward on the window's last batch. Decision rule:
    docs/roofline.md round-4 section."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ubresnet_tpu.core.precision import Policy
    from ubresnet_tpu.models import get_model
    from ubresnet_tpu.ops.quant import calibrate
    from ubresnet_tpu.ops.sparse import sparse_forward_fn
    from ubresnet_tpu.train import init_model

    model = get_model(
        "uresnet", policy=Policy.tpu_int8(), input_channels=1,
        inplanes=INPLANES
    )
    variables = init_model(model, jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 1)))
    dense, sparse = make_batches()
    qvars = calibrate(model, variables, [dense[0][..., None]])

    def window(fwd, n):
        out = None
        t0 = time.time()
        for i in range(n):
            sp = sparse[i % len(sparse)]
            out = fwd(qvars, jax.device_put(sp["indices"]),
                      jax.device_put(sp["values"]), (HW, HW))
        _ = float(out[0, 0, 0, 0])
        return time.time() - t0, out

    fwd = sparse_forward_fn(model)
    window(fwd, 2)
    dt, probs_q = window(fwd, ITERS)
    rate = ITERS * BATCH / dt
    out = {
        "crops_per_sec": round(rate, 2),
        "ms_per_batch": round(dt / ITERS * 1e3, 2),
        "speedup_vs_bf16": round(rate / tpu["crops_per_sec"], 3)
        if tpu else None,
        "fused_kernels": bool(model.policy.fused_eval),
    }
    if model.policy.fused_eval:
        # second arm: same int8 quantization through XLA packed convs
        xmodel = model.clone(policy=dataclasses.replace(
            model.policy, fused_eval=False))
        xfwd = sparse_forward_fn(xmodel)
        window(xfwd, 2)
        xdt, _ = window(xfwd, ITERS)
        out["xla_crops_per_sec"] = round(ITERS * BATCH / xdt, 2)
        out["fused_speedup_vs_xla"] = round(xdt / dt, 3)
    f32_model = get_model(
        "uresnet",
        policy=Policy(pack_width=8, compute_dtype=jnp.float32),
        input_channels=1,
        inplanes=INPLANES,
    )
    last = jnp.asarray(
        dense[(ITERS - 1) % len(dense)][..., None], jnp.float32
    )
    ref = jnp.exp(
        jax.jit(lambda v, x: f32_model.apply(v, x))(variables, last)
    )
    out["prob_mae_vs_f32"] = round(
        float(jnp.mean(jnp.abs(probs_q - ref))), 5
    )
    # Calibration-accuracy ladder (VERDICT r4 next #4): the decision
    # rule (prob_mae <= 0.02, docs/roofline.md) failed at abs-max
    # (0.081); measure the percentile rungs in the same program (qvars
    # only change VALUES, not shapes — no recompile). The QAT rung
    # needs a finetune and lives in tools/int8_ladder.py.
    sp_last = sparse[(ITERS - 1) % len(sparse)]
    ladder = {}
    for tag, pct in (("p99.9", 99.9), ("p99.99", 99.99)):
        # 16 crops: a standard-size calibration set; the percentile
        # calibration forward runs the model in f32 (quant_calib), so
        # the full b128 batch is pointless HBM pressure here
        pvars = calibrate(model, variables, [dense[0][:16, ..., None]],
                          percentile=pct)
        probs_p = fwd(pvars, jax.device_put(sp_last["indices"]),
                      jax.device_put(sp_last["values"]), (HW, HW))
        ladder[tag] = round(
            float(jnp.mean(jnp.abs(probs_p - ref))), 5)
    ladder["absmax"] = out["prob_mae_vs_f32"]
    out["calib_ladder_prob_mae"] = ladder
    log(f"int8 infer: {out}")
    return out


def measure_torch_train_baseline() -> float:
    """PyTorch engine train step on this host (CPU build): forward +
    weighted-NLL + backward + Adam, batch 1 like the reference deploy
    granularity (its train used batch 4 at 256²; we keep the 512²
    north-star shape)."""
    import torch
    import torch.nn.functional as F

    from ubresnet_tpu.parity.torch_oracle import make_state_dict, torch_uresnet_eval

    torch.set_num_threads(os.cpu_count() or 8)
    rng = np.random.RandomState(0)
    sd = make_state_dict(rng, inplanes=INPLANES, in_ch=1, classes=3)
    for k, v in sd.items():
        v.requires_grad_("running_" not in k)
    params = [v for v in sd.values() if v.requires_grad]
    opt = torch.optim.Adam(params, lr=1e-5)
    x = torch.from_numpy(rng.rand(1, 1, HW, HW).astype(np.float32))
    lab = torch.from_numpy(rng.randint(0, 3, (1, HW, HW)))
    wgt = torch.ones((1, HW, HW))

    def step():
        opt.zero_grad()
        logp = torch_uresnet_eval(sd, x)
        loss = (F.nll_loss(logp, lab, reduction="none") * wgt).mean()
        loss.backward()
        opt.step()

    step()  # warmup
    n = 2
    t0 = time.time()
    for _ in range(n):
        step()
    rate = n / (time.time() - t0)
    log(f"torch-cpu train baseline: {rate:.3f} crops/s")
    return rate


def measure_torch_baseline() -> float:
    """PyTorch engine on this host (CPU build), dense batch-1 forward
    like the reference deploy loop (run_ubresnet_precropped.py:136-138).
    """
    import torch

    from ubresnet_tpu.parity.torch_oracle import make_state_dict, torch_uresnet_eval

    torch.set_num_threads(os.cpu_count() or 8)
    rng = np.random.RandomState(0)
    sd = make_state_dict(rng, inplanes=INPLANES, in_ch=1, classes=3)
    x = torch.from_numpy(rng.rand(1, 1, HW, HW).astype(np.float32))
    with torch.no_grad():
        torch_uresnet_eval(sd, x)  # warmup
        n = 3
        t0 = time.time()
        for _ in range(n):
            torch_uresnet_eval(sd, x)
        dt = time.time() - t0
    rate = n / dt
    log(f"torch-cpu baseline: {rate:.3f} crops/s")
    return rate


def get_baselines() -> dict:
    cached = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
    # shape overrides (not FAST, which keeps headline shapes): never
    # persist baselines measured at non-headline shapes into the cache
    shape_vars = ("UBTPU_BENCH_HW", "UBTPU_BENCH_BATCH",
                  "UBTPU_BENCH_ITERS", "UBTPU_BENCH_INPLANES",
                  "UBTPU_BENCH_TRAIN_BATCH", "UBTPU_BENCH_TRAIN_ITERS")
    overridden = any(k in os.environ for k in shape_vars)
    if overridden:
        if "torch_cpu_crops_per_sec" not in cached:
            cached["torch_cpu_crops_per_sec"] = measure_torch_baseline()
        if "torch_cpu_train_crops_per_sec" not in cached:
            cached["torch_cpu_train_crops_per_sec"] = (
                measure_torch_train_baseline())
        return cached
    changed = False
    if "torch_cpu_crops_per_sec" not in cached:
        cached["torch_cpu_crops_per_sec"] = measure_torch_baseline()
        changed = True
    if "torch_cpu_train_crops_per_sec" not in cached:
        cached["torch_cpu_train_crops_per_sec"] = measure_torch_train_baseline()
        changed = True
    if changed:
        cached["note"] = (
            "PyTorch-CPU reference engine, 1x1x512x512 forward / train step, "
            "torch " + __import__("torch").__version__
        )
        with open(BASELINE_CACHE, "w") as f:
            json.dump(cached, f, indent=2)
    else:
        log(
            f"baselines from cache: infer "
            f"{cached['torch_cpu_crops_per_sec']:.3f}, train "
            f"{cached['torch_cpu_train_crops_per_sec']:.3f} crops/s"
        )
    return cached


def wait_for_backend(attempts=4, timeout=45.0, pause=30.0):
    """Probe the default backend in a short-timeout subprocess, with
    retries — ``jax.devices()`` in-process hangs forever when the axon
    tunnel is wedged (round-3 BENCH rc=1/raw traceback, VERDICT.md weak
    #2). Returns the successful probe dict, or the last failing one.
    """
    from ubresnet_tpu.utils.platform import probe_backend

    probe = None
    for i in range(attempts):
        probe = probe_backend(timeout=timeout)
        if probe["ok"]:
            return probe
        log(f"backend probe {i + 1}/{attempts} failed: {probe['error']}")
        if i + 1 < attempts:
            time.sleep(pause)
    return probe


def main():
    from ubresnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    probe = wait_for_backend()
    if not probe["ok"]:
        # Structured failure line instead of a traceback so a tunnel
        # blip doesn't erase a round's perf record.
        print(json.dumps({
            "metric": "uresnet16_512x512_infer_crops_per_sec_per_chip",
            "value": None,
            "unit": "crops/s",
            "vs_baseline": None,
            "error": "tpu_unavailable",
            "detail": probe["error"],
        }))
        sys.exit(0)
    log(f"backend probe ok: {probe['n_devices']} {probe['platform']} device(s)")
    if probe["platform"] != "tpu" and not os.environ.get("UBTPU_PLATFORM"):
        # A CPU-fallback backend must not be published as the per-chip
        # TPU headline (e.g. the axon plugin failed to register).
        # Explicit UBTPU_PLATFORM (smoke runs) bypasses the gate.
        print(json.dumps({
            "metric": "uresnet16_512x512_infer_crops_per_sec_per_chip",
            "value": None,
            "unit": "crops/s",
            "vs_baseline": None,
            "error": "tpu_unavailable",
            "detail": f"default backend is {probe['platform']!r}, not tpu",
        }))
        sys.exit(0)
    # Every section is independently survivable (run_section: own
    # SIGALRM budget + one retry on timeout) — round 4 lost ALL
    # sections to one headline TimeoutError (VERDICT r4 weak #2).
    tpu, err_infer = run_section("infer", measure_tpu)
    train_batches = make_train_batches()
    log("[train] phase: data built")
    train, err_train = run_section(
        "train", measure_tpu_train, batches=train_batches)
    baselines = get_baselines()
    result = {
        "metric": "uresnet16_512x512_infer_crops_per_sec_per_chip",
        "value": round(tpu["crops_per_sec"], 2) if tpu else None,
        "unit": "crops/s",
        "vs_baseline": round(
            tpu["crops_per_sec"] / baselines["torch_cpu_crops_per_sec"], 2
        ) if tpu else None,
        "train": {
            "metric": "uresnet16_512x512_train_crops_per_sec_per_chip",
            "value": round(train["crops_per_sec"], 2) if train else None,
            "unit": "crops/s",
            "vs_baseline": round(
                train["crops_per_sec"]
                / baselines["torch_cpu_train_crops_per_sec"],
                2,
            ) if train else None,
        },
    }
    if err_infer:
        result["error"] = "bench_timeout" if "timeout" in err_infer else "bench_error"
        result["detail"] = f"infer: {err_infer}"
    if err_train:
        result["train"]["error"] = err_train
    # Extra measurements queued for the chip (NOTES.md): the
    # fused_train A/B and the deploy-runner overlap ratio. Recorded in
    # the same JSON line so the driver's end-of-round bench captures
    # them even when the tunnel was down for the whole build session.
    # UBTPU_BENCH_FAST=1 skips them (headline metrics only).
    if os.environ.get("UBTPU_BENCH_FAST") != "1":
        fused, err = run_section(
            "train_fused", measure_tpu_train, fused=True,
            batches=train_batches)
        if fused:
            result["train_fused"] = {
                "value": round(fused["crops_per_sec"], 2),
                "unit": "crops/s",
                "speedup_vs_default_train": round(
                    fused["crops_per_sec"] / train["crops_per_sec"], 3
                ) if train else None,
            }
        else:
            result["train_fused"] = {"error": err}
        # remat at 2x batch: does trading one extra stage-forward
        # for activation HBM buy net throughput? (Policy.remat,
        # docs/roofline.md round-4 levers)
        remat, err = run_section(
            "train_remat_2x", measure_tpu_train, remat=True,
            batch=2 * TRAIN_BATCH)
        if remat:
            result["train_remat_2x"] = {
                "value": round(remat["crops_per_sec"], 2),
                "unit": "crops/s",
                "batch": 2 * TRAIN_BATCH,
                "speedup_vs_default_train": round(
                    remat["crops_per_sec"] / train["crops_per_sec"], 3
                ) if train else None,
            }
        else:
            result["train_remat_2x"] = {"error": err}
        deploy, err = run_section("deploy", measure_deploy_cli)
        if deploy:
            result["deploy"] = {
                "value": round(deploy["crops_per_sec"], 2),
                "unit": "crops/s",
                "vs_raw_infer": round(
                    deploy["crops_per_sec"] / tpu["crops_per_sec"], 3
                ) if tpu else None,
                "timing": deploy["timing"],
                "d2h_mb_s": deploy["d2h_mb_s"],
                "readback_mb_per_crop": deploy["readback_mb_per_crop"],
                "d2h_bound_crops_per_sec": deploy["d2h_bound_crops_per_sec"],
                "link_efficiency": deploy["link_efficiency"],
                "sparse_readback": deploy["sparse_readback"],
            }
        else:
            result["deploy"] = {"error": err}
        wholeview, err = run_section("wholeview", measure_wholeview)
        result["wholeview"] = wholeview if wholeview else {"error": err}
        int8, err = run_section("int8", measure_int8_infer, tpu)
        result["int8"] = int8 if int8 else {"error": err}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
