"""Does the fused_train zone work under pjit batch sharding? (CPU
virtual mesh, interpret kernels)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import dataclasses
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/ubtpu_jax_cache")
jax.config.update("jax_default_prng_impl", "rbg")
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models import get_model

pol = dataclasses.replace(Policy.f32(), pack_width=8, fused_train=True)
model = get_model("uresnet", policy=pol, input_channels=1, inplanes=16)
x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 1), jnp.float32)
v = model.init(jax.random.PRNGKey(0), x, train=False)

mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
xs = jax.device_put(x, NamedSharding(mesh, P("data")))
vr = jax.device_put(v, NamedSharding(mesh, P()))

@jax.jit
def loss(v, x):
    out, _ = model.apply(v, x, train=True, logits=True,
                         mutable=["batch_stats"])
    return jnp.mean(out ** 2)

g = jax.jit(jax.grad(loss))(vr, xs)
jax.block_until_ready(g)
print("sharded fused_train grad OK; stem kernel grad norm:",
      float(jnp.linalg.norm(g["params"]["stem"]["conv"]["kernel"])))

# correctness: sharded == single-device?
g1 = jax.jit(jax.grad(loss))(v, x)
jax.block_until_ready(g1)
worst = 0.0
for (pa, a), (_, b) in zip(
    jax.tree_util.tree_flatten_with_path(g)[0],
    jax.tree_util.tree_flatten_with_path(g1)[0],
):
    d = float(jnp.abs(a - b).max())
    if d > worst:
        worst, wk = d, jax.tree_util.keystr(pa)
print(f"worst sharded-vs-single grad diff: {worst:.3e} at {wk}")

# discriminator: the BN batch-stat UPDATES must match exactly (up to
# rounding) if the kernel-accumulated sums are globally reduced
@jax.jit
def stats(v, x):
    _, upd = model.apply(v, x, train=True, logits=True,
                         mutable=["batch_stats"])
    return upd["batch_stats"]

s_sh = stats(vr, xs)
s_1d = stats(v, x)
worst = 0.0
for (pa, a), (_, b) in zip(
    jax.tree_util.tree_flatten_with_path(s_sh)[0],
    jax.tree_util.tree_flatten_with_path(s_1d)[0],
):
    d = float(jnp.abs(a - b).max())
    if d > worst:
        worst, wk = d, jax.tree_util.keystr(pa)
print(f"worst sharded-vs-single BATCH-STAT diff: {worst:.3e} at {wk}")

# same comparison with fused_train OFF (the known-correct reference)
polU = dataclasses.replace(pol, fused_train=False)
modelU = get_model("uresnet", policy=polU, input_channels=1, inplanes=16)

@jax.jit
def statsU(v, x):
    _, upd = modelU.apply(v, x, train=True, logits=True,
                          mutable=["batch_stats"])
    return upd["batch_stats"]

su_sh = statsU(vr, xs)
su_1d = statsU(v, x)
worst = 0.0
for (pa, a), (_, b) in zip(
    jax.tree_util.tree_flatten_with_path(su_sh)[0],
    jax.tree_util.tree_flatten_with_path(su_1d)[0],
):
    d = float(jnp.abs(a - b).max())
    if d > worst:
        worst, wk = d, jax.tree_util.keystr(pa)
print(f"unfused worst sharded-vs-single BATCH-STAT diff: {worst:.3e} at {wk}")
