"""TPU train-step profiler: per-config timing + optional jax.profiler
trace. Run when the tunnel is back:

    python tools/profile_train.py            # A/B matrix
    python tools/profile_train.py trace      # + profiler trace dump
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import dataclasses, sys, time
import numpy as np
from ubresnet_tpu.utils.platform import apply_platform_env
apply_platform_env()  # persistent compile cache + rbg PRNG
import jax, jax.numpy as jnp

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models import get_model
from ubresnet_tpu.train import (build_train_step, create_train_state,
                                make_optimizer)

HW = 512
rng = np.random.RandomState(0)


def make_batch(B):
    adc = (rng.rand(B, HW, HW, 1) > 0.9) * rng.rand(B, HW, HW, 1) * 50
    return {"image": jnp.asarray(adc, jnp.float32),
            "label": jnp.asarray(rng.randint(0, 3, (B, HW, HW)), jnp.int32),
            "weight": jnp.ones((B, HW, HW), jnp.float32)}


def drive(B, n, tag, **pol_kw):
    pol = dataclasses.replace(Policy.tpu(), **pol_kw)
    model = get_model("uresnet", policy=pol, input_channels=1, inplanes=16)
    tx = make_optimizer("adam", learning_rate=1e-4, weight_decay=1e-4)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, HW, HW, 1)), tx)
    step = build_train_step(num_classes=3)
    batch = make_batch(B)
    for _ in range(2):
        state, m = step(state, batch)
    jax.block_until_ready(state.params)
    t0 = time.time()
    for _ in range(n):
        state, m = step(state, batch)
    jax.block_until_ready(state.params)
    dt = (time.time() - t0) / n
    print(f"{tag:28s} b{B}: {dt*1e3:7.1f} ms/step  {B/dt:7.1f} crops/s",
          flush=True)
    return state, step, batch


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    mode = sys.argv[1] if len(sys.argv) > 1 else "ab"
    for B in (16, 32):
        drive(B, 8, "xla-packed (default)")
        drive(B, 8, "stats+conv_ad+pool", fused_train=True)
        drive(B, 8, "stats+pool+deconv_ad", fused_train=True,
              fused_train_deconv=True)
    if mode == "trace":
        state, step, batch = drive(16, 2, "trace-target", fused_train=True)
        with jax.profiler.trace("/tmp/ubtpu_trace"):
            for _ in range(3):
                state, m = step(state, batch)
            jax.block_until_ready(state.params)
        print("trace written to /tmp/ubtpu_trace")
