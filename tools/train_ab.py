"""A/B: train step fused_train off vs on (new Pallas-complete zone)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import dataclasses, time, sys
import numpy as np
import bench  # repo-root bench helpers

def measure(fused, batch):
    from ubresnet_tpu.utils.platform import apply_platform_env
apply_platform_env()  # persistent compile cache + rbg PRNG
import jax, jax.numpy as jnp
    from ubresnet_tpu.core.precision import Policy
    from ubresnet_tpu.models import get_model
    from ubresnet_tpu.train import build_train_step, create_train_state, make_optimizer

    bench.TRAIN_BATCH = batch
    pol = dataclasses.replace(Policy.tpu(), fused_train=fused)
    model = get_model("uresnet", policy=pol, input_channels=1, inplanes=bench.INPLANES)
    tx = make_optimizer("adam", learning_rate=1e-5, weight_decay=1e-4)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, bench.HW, bench.HW, 1)), tx)
    step = build_train_step(num_classes=3, sparse_hw=(bench.HW, bench.HW))
    batches = bench.make_train_batches()
    def put(b):
        return {k: jax.device_put(v) if isinstance(v, np.ndarray) else v
                for k, v in b.items()}
    def run_window(state, n):
        m = None
        t0 = time.time()
        for i in range(n):
            state, m = step(state, put(batches[i % len(batches)]))
        _ = float(m["loss"])
        return state, time.time() - t0
    state, _ = run_window(state, 2)
    state, dt = run_window(state, bench.TRAIN_ITERS)
    rate = bench.TRAIN_ITERS * batch / dt
    print(f"fused_train={fused} b{batch}: {rate:.1f} crops/s "
          f"({dt/bench.TRAIN_ITERS*1e3:.1f} ms/batch)", flush=True)
    return rate

if __name__ == "__main__":
    for batch in (16, 32):
        for fused in (False, True):
            measure(fused, batch)
