"""Trace the train step at TPU shapes; count non-Pallas hot ops."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import dataclasses, sys
from collections import Counter
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_prng_impl", "rbg")

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models import get_model
from ubresnet_tpu.train import (build_train_step, create_train_state,
                                make_optimizer)

fused = sys.argv[1] == "1" if len(sys.argv) > 1 else True
HW, B = 512, 4
pol = dataclasses.replace(Policy.tpu_like() if hasattr(Policy, "tpu_like")
                          else Policy.tpu(), fused_train=fused)
# Policy.tpu() may gate on actual backend; force the TPU pack plan
print("policy:", pol)
model = get_model("uresnet", policy=pol, input_channels=1, inplanes=16)
tx = make_optimizer("adam", learning_rate=1e-4, weight_decay=1e-4)
state = create_train_state(model, jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 1)), tx)
step = build_train_step(num_classes=3)
batch = {"image": jnp.zeros((B, HW, HW, 1), jnp.float32),
         "label": jnp.zeros((B, HW, HW), jnp.int32),
         "weight": jnp.ones((B, HW, HW), jnp.float32)}
jaxpr = jax.make_jaxpr(lambda s, b: step.__wrapped__(s, b)
                       if hasattr(step, "__wrapped__") else step(s, b)
                       )(state, batch)
cnt = Counter()
convs = []

def walk(jx):
    for eqn in jx.eqns:
        cnt[eqn.primitive.name] += 1
        if eqn.primitive.name == "conv_general_dilated":
            shp = eqn.invars[0].aval.shape
            kshp = eqn.invars[1].aval.shape
            convs.append((shp, kshp))
        for sub in eqn.params.values():
            if hasattr(sub, "eqns"):
                walk(sub)
            elif isinstance(sub, (list, tuple)):
                for s2 in sub:
                    if hasattr(s2, "eqns"):
                        walk(s2)
            elif hasattr(sub, "jaxpr"):
                walk(sub.jaxpr)

walk(jaxpr.jaxpr)
print("fused_train =", fused)
for k in ("conv_general_dilated", "reduce_window_max",
          "select_and_scatter_add", "pallas_call", "reduce_sum",
          "dot_general", "custom_vjp_call", "scatter_add"):
    print(f"  {k}: {cnt.get(k, 0)}")
print("XLA convs (input, kernel):")
for s, k in convs:
    print("   ", s, k)
