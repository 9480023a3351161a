"""f64 oracle, split by process: python tools/f64.py {U,T,64,cmp}"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
mode = sys.argv[1]
import dataclasses
import numpy as np

if mode == "cmp":
    U = np.load("/tmp/g_U.npz"); T = np.load("/tmp/g_T.npz")
    O = np.load("/tmp/g_64.npz")
    gsc = max(float(np.abs(O[k]).max()) for k in O.files)
    rows = []
    for k in O.files:
        du = float(np.abs(U[k] - O[k]).max()) / gsc
        dt = float(np.abs(T[k] - O[k]).max()) / gsc
        rows.append((max(du, dt), du, dt, k))
    rows.sort(reverse=True)
    print(f"gsc={gsc:.3f}")
    for _, du, dt, k in rows[:12]:
        print(f"{k:55s} U-vs-64 {du:9.2e}  T-vs-64 {dt:9.2e}")
    print(f"worst: U {max(r[1] for r in rows):.2e}  "
          f"T {max(r[2] for r in rows):.2e}")
    sys.exit()

import jax, jax.numpy as jnp
if mode == "64":
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/ubtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models import get_model

rng = np.random.RandomState(42)
x = jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)
pol = dataclasses.replace(Policy.f32(), pack_width=8,
                          fused_train=(mode == "T"))
if mode == "64":
    pol = dataclasses.replace(
        pol, param_dtype=jnp.float64, compute_dtype=jnp.float64,
        output_dtype=jnp.float64)
m = get_model("uresnet", policy=pol, input_channels=1, inplanes=16)

# deterministic init: always from the f32 model, cast if needed
polI = dataclasses.replace(Policy.f32(), pack_width=8)
mI = get_model("uresnet", policy=polI, input_channels=1, inplanes=16)
v = mI.init(jax.random.PRNGKey(0), x, train=False)
dt = jnp.float64 if mode == "64" else jnp.float32
params = jax.tree.map(lambda a: a.astype(dt), v["params"])
bs = jax.tree.map(lambda a: a.astype(dt), v["batch_stats"])

def loss(p):
    out, _ = m.apply({"params": p, "batch_stats": bs},
                     x.astype(dt), train=True, logits=True,
                     mutable=["batch_stats"])
    return jnp.mean(out ** 2)

g = jax.grad(loss)(params)
flat = jax.tree_util.tree_flatten_with_path(g)[0]
np.savez("/tmp/g_%s.npz" % mode,
         **{jax.tree_util.keystr(p): np.asarray(a, np.float64)
            for p, a in flat})
print("saved", mode)
