"""Verify drive: real-TPU train steps with fused_train on — loss
finite/decreasing + steady-state ms/step vs the XLA packed path."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import dataclasses, time
import numpy as np
from ubresnet_tpu.utils.platform import apply_platform_env
apply_platform_env()  # persistent compile cache + rbg PRNG
import jax, jax.numpy as jnp

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models import get_model
from ubresnet_tpu.train import (build_train_step, create_train_state,
                                make_optimizer)

HW, B = 512, 16
rng = np.random.RandomState(0)


def make_batch():
    adc = (rng.rand(B, HW, HW, 1) > 0.9) * rng.rand(B, HW, HW, 1) * 50
    lbl = rng.randint(0, 3, (B, HW, HW))
    wgt = np.ones((B, HW, HW), np.float32)
    return {"image": jnp.asarray(adc, jnp.float32),
            "label": jnp.asarray(lbl, jnp.int32),
            "weight": jnp.asarray(wgt)}


def drive(fused):
    print(f"--- fused_train={fused}", flush=True)
    pol = dataclasses.replace(Policy.tpu(), fused_train=fused)
    model = get_model("uresnet", policy=pol, input_channels=1, inplanes=16)
    tx = make_optimizer("adam", learning_rate=1e-4, weight_decay=1e-4)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, HW, HW, 1)), tx)
    step = build_train_step(num_classes=3)
    batch = make_batch()
    t0 = time.time()
    losses = []
    for i in range(7):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        if i == 1:
            jax.block_until_ready(state.params)
            t0 = time.time()
    jax.block_until_ready(state.params)
    dt = (time.time() - t0) / 5
    print("losses:", " ".join(f"{l:.4f}" for l in losses), flush=True)
    assert all(np.isfinite(losses)), "non-finite loss"
    assert losses[-1] < losses[0], "loss not decreasing"
    print(f"steady: {dt*1e3:.1f} ms/step b{B} = {B/dt:.1f} crops/s", flush=True)
    return B / dt


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    r0 = drive(False)
    r1 = drive(True)
    print(f"XLA {r0:.1f} vs fused {r1:.1f} crops/s ({r1/r0:.2f}x)")
