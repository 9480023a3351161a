"""int8 accuracy ladder on TRAINED weights (VERDICT r4 next #4).

The bench's ``prob_mae_vs_f32`` measured abs-max PTQ on random-init
weights and missed the ≤0.02 decision bar (0.081, docs/roofline.md
round-4 table). This tool measures the whole documented ladder at the
bench shape, on weights briefly trained on the synthetic task so the
activation distributions are real rather than init noise:

  1. PTQ abs-max            (ops/quant.calibrate, percentile=None)
  2. PTQ percentile 99.9    (--int8-percentile analog)
  3. PTQ percentile 99.99
  4. QAT finetune           (Policy.quant_train fake-quant, then PTQ)

Each rung reports mean |Δp| and argmax agreement of the int8 eval
forward vs the f32 eval forward OF THE SAME WEIGHTS (so QAT weight
drift doesn't pollute the quantization-error metric). Results feed
docs/roofline.md's int8 decision row and the README --int8 guidance.

Run on the real chip:  python tools/int8_ladder.py [train_steps]
CPU smoke:             UBTPU_BENCH_HW=64 ... python tools/int8_ladder.py 2
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import json
import sys
import time

import numpy as np

import bench


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from ubresnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from ubresnet_tpu.core.precision import Policy
    from ubresnet_tpu.models import get_model
    from ubresnet_tpu.ops.quant import calibrate
    from ubresnet_tpu.train import (
        build_train_step,
        create_train_state,
        make_optimizer,
    )

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    hw, inplanes = bench.HW, bench.INPLANES
    batches = bench.make_train_batches()
    log(f"data built: {len(batches)} train batches of {bench.TRAIN_BATCH}x{hw}x{hw}")

    def finetune(policy, params_src, tag, n_steps):
        model = get_model("uresnet", policy=policy, input_channels=1,
                          inplanes=inplanes)
        tx = make_optimizer("adam", learning_rate=1e-4, weight_decay=1e-4)
        state = create_train_state(
            model, jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 1)), tx
        )
        if params_src is not None:
            state = state.replace(params=params_src)
        step = build_train_step(num_classes=3, sparse_hw=(hw, hw))
        t0 = time.time()
        m = None
        for i in range(n_steps):
            b = {k: jax.device_put(v) if isinstance(v, np.ndarray) else v
                 for k, v in batches[i % len(batches)].items()}
            state, m = step(state, b)
            if i == 0:
                log(f"[{tag}] compile+step0 {time.time() - t0:.1f}s "
                    f"loss {float(m['loss']):.4f}")
        log(f"[{tag}] {n_steps} steps in {time.time() - t0:.1f}s, "
            f"final loss {float(m['loss']):.4f}")
        return state

    # 1) brief f32-task training (bf16 compute like production train)
    state = finetune(Policy.tpu(), None, "train", steps)
    trained = jax.device_get(state.params)
    bstats = jax.device_get(state.batch_stats)

    # eval batch: dense images from a fresh synthetic draw
    from ubresnet_tpu.data.synthetic import synth_event

    rng = np.random.RandomState(99)
    xeval = np.stack(
        [synth_event(rng, (hw, hw))["wire"] for _ in range(8)]
    )[..., None].astype(np.float32)

    f32_pol = Policy(pack_width=8, compute_dtype=jnp.float32)

    def eval_probs(policy, params, batch_stats, extra=None):
        model = get_model("uresnet", policy=policy, input_channels=1,
                          inplanes=inplanes)
        variables = {"params": params, "batch_stats": batch_stats}
        if extra:
            variables.update(extra)
        out = jax.jit(lambda v, x: jnp.exp(model.apply(v, x)))(
            variables, jnp.asarray(xeval))
        return np.asarray(jax.device_get(out))

    def ptq_rung(params, batch_stats, percentile, ref):
        f32m = get_model("uresnet", policy=f32_pol, input_channels=1,
                         inplanes=inplanes)
        qvars = calibrate(
            f32m, {"params": params, "batch_stats": batch_stats},
            [xeval], percentile=percentile,
        )
        qpol = dataclasses.replace(f32_pol, quant_eval=True)
        probs = eval_probs(qpol, params, batch_stats,
                           extra={"quant": qvars["quant"]})
        return {
            "prob_mae_vs_f32": round(float(np.abs(probs - ref).mean()), 5),
            "argmax_agreement": round(
                float((probs.argmax(-1) == ref.argmax(-1)).mean()), 5),
        }

    ref = eval_probs(f32_pol, trained, bstats)
    results = {"train_steps": steps, "hw": hw, "inplanes": inplanes}
    for tag, pct in (("absmax", None), ("p99.9", 99.9), ("p99.99", 99.99)):
        results[f"ptq_{tag}"] = ptq_rung(trained, bstats, pct, ref)
        log(f"ptq {tag}: {results[f'ptq_{tag}']}")

    # 4) QAT: continue from the trained weights with fake-quant train
    qat_pol = dataclasses.replace(
        Policy.tpu(), quant_train=True, quant_percentile=0.0)
    qstate = finetune(qat_pol, state.params, "qat", steps)
    qtrained = jax.device_get(qstate.params)
    qbstats = jax.device_get(qstate.batch_stats)
    qref = eval_probs(f32_pol, qtrained, qbstats)
    results["qat_absmax"] = ptq_rung(qtrained, qbstats, None, qref)
    log(f"qat absmax: {results['qat_absmax']}")
    results["qat_p99.9"] = ptq_rung(qtrained, qbstats, 99.9, qref)
    log(f"qat p99.9: {results['qat_p99.9']}")
    # does QAT keep the f32 task behavior? argmax vs pre-QAT f32 ref
    results["qat_f32_argmax_vs_pre_qat"] = round(
        float((qref.argmax(-1) == ref.argmax(-1)).mean()), 5)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
