"""Train-step pack_width sweep on the real chip.

The fused_train Pallas zone lost its A/B (b32: 79 vs 160 crops/s —
docs/roofline.md round-4 table), so the XLA packed path stays the
train baseline. Its FLOP inflation (the kernel densified by the pack
factor) is what separates the measured ~160 crops/s from the ≥250
target. Forward-only packing was swept in round 1 (p=8 the clear
winner for eval); the TRAIN step was never swept — the backward's dW
convs (input × cotangent at full spatial size, tiny channel counts)
see a different inflation/efficiency trade, so the optimal train pack
factor may differ. This sweeps pack_width for the full train step at
the bench shape, plus the remat × 2x-batch cross.

Usage: python tools/train_pack_sweep.py [quick]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import dataclasses, sys, time

import numpy as np


def measure(pack, batch, batches_by_size, remat=False, iters=10):
    import jax
    import jax.numpy as jnp

    import bench
    from ubresnet_tpu.core.precision import Policy
    from ubresnet_tpu.models import get_model
    from ubresnet_tpu.train import (build_train_step, create_train_state,
                                    make_optimizer)

    pol = dataclasses.replace(Policy.tpu(), pack_width=pack, remat=remat)
    model = get_model("uresnet", policy=pol, input_channels=1,
                      inplanes=bench.INPLANES)
    tx = make_optimizer("adam", learning_rate=1e-5, weight_decay=1e-4)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, bench.HW, bench.HW, 1)), tx)
    step = build_train_step(num_classes=3, sparse_hw=(bench.HW, bench.HW))
    if batch not in batches_by_size:
        batches_by_size[batch] = bench.make_train_batches(batch=batch)
    batches = batches_by_size[batch]

    def put(b):
        return {k: jax.device_put(v) if isinstance(v, np.ndarray) else v
                for k, v in b.items()}

    def window(state, n):
        m = None
        t0 = time.time()
        for i in range(n):
            state, m = step(state, put(batches[i % len(batches)]))
        _ = float(m["loss"])
        return state, time.time() - t0

    state, _ = window(state, 2)
    state, dt = window(state, iters)
    rate = iters * batch / dt
    tag = f"p{pack} b{batch}" + ("+remat" if remat else "")
    print(f"{tag}: {rate:6.1f} crops/s ({dt / iters * 1e3:6.1f} ms/batch)",
          flush=True)
    return rate


if __name__ == "__main__":
    from ubresnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # persistent compile cache + rbg PRNG
    import jax

    print("devices:", jax.devices(), flush=True)
    quick = "quick" in sys.argv[1:]
    cache = {}
    for pack in (8, 4, 16, 0):
        measure(pack, 32, cache)
        if quick:
            break
    if not quick:
        # best-of cross-checks at 2x batch (remat vs not)
        measure(8, 64, cache)
        measure(8, 64, cache, remat=True)
