"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubresnet_tpu.core.mesh import make_mesh
from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models import UResNet, UResNetConfig
from ubresnet_tpu.parallel import make_param_shardings, shard_batch, shard_state
from ubresnet_tpu.train import build_train_step, create_train_state, make_optimizer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def make_state(inplanes=8, opt="adam"):
    # NB: TP-vs-single comparisons use plain SGD — Adam's first step is
    # ±lr·sign(grad), which amplifies reduction-order noise at grad≈0
    # into full-size update flips.
    model = UResNet(
        config=UResNetConfig(inplanes=inplanes, input_channels=1), policy=Policy.f32()
    )
    tx = make_optimizer(opt, learning_rate=1e-3, momentum=0.0)
    x = jnp.zeros((1, 32, 32, 1))
    return model, create_train_state(model, jax.random.PRNGKey(0), x, tx)


def batch_of(b, seed=0):
    k = jax.random.PRNGKey(seed)
    img = jax.random.uniform(k, (b, 32, 32, 1)) * 10
    return {
        "image": img,
        "label": (img[..., 0] > 6).astype(jnp.int32),
        "weight": jnp.ones((b, 32, 32)),
    }


@pytest.mark.slow
def test_data_parallel_matches_single_device():
    """Sharded-step loss == single-device loss on the same batch."""
    model, state = make_state()
    step = build_train_step(donate=False)
    batch = batch_of(8)

    _, m_single = step(state, batch)

    mesh = make_mesh(jax.devices()[:8], model_axis=1)
    with mesh:
        st = shard_state(state, mesh)
        bt = shard_batch(batch, mesh)
        _, m_shard = step(st, bt)
    np.testing.assert_allclose(
        float(m_shard["loss"]), float(m_single["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_shard["acc_total"]), float(m_single["acc_total"]), rtol=1e-5
    )


def test_model_axis_sharding_matches():
    """(data=4, model=2) TP sharding reproduces single-device numerics."""
    model, state = make_state(opt="sgd")
    step = build_train_step(donate=False)
    batch = batch_of(4)

    s1, m_single = step(state, batch)

    mesh = make_mesh(jax.devices()[:8], model_axis=2)
    with mesh:
        st = shard_state(state, mesh, min_features=32)
        shardings = make_param_shardings(state.params, mesh, min_features=32)
        specs = {
            s.spec
            for s in jax.tree_util.tree_leaves(shardings)
        }
        assert any("model" in str(sp) for sp in specs), "nothing TP-sharded"
        bt = shard_batch(batch, mesh)
        s2, m_shard = step(st, bt)
    np.testing.assert_allclose(
        float(m_shard["loss"]), float(m_single["loss"]), rtol=1e-5
    )
    # updated params agree
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        # two different XLA programs: allow reduction-order noise; a
        # wrong collective/halo would produce O(1) errors
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-4)


def test_data_parallel_scaling_constant_per_device_share():
    """Weak-scaling invariant (VERDICT r4 next #9): growing the data
    mesh with a proportionally larger global batch keeps every device's
    batch share constant — each device holds exactly b/n rows (one
    contiguous shard, no replication), so per-device work is flat and
    throughput scales with the mesh."""
    model, state = make_state()
    step = build_train_step(donate=False)
    per_device = 2
    losses = {}
    for n in (2, 4, 8):
        mesh = make_mesh(jax.devices()[:n], model_axis=1)
        batch = batch_of(per_device * n)
        with mesh:
            st = shard_state(state, mesh)
            bt = shard_batch(batch, mesh)
            shard_shapes = {
                s.data.shape for s in bt["image"].addressable_shards
            }
            assert shard_shapes == {(per_device, 32, 32, 1)}, (
                f"n={n}: per-device share {shard_shapes} != "
                f"{(per_device, 32, 32, 1)}"
            )
            assert len(bt["image"].addressable_shards) == n
            _, m = step(st, bt)
            losses[n] = float(m["loss"])
    # same per-device distribution at every mesh size -> comparable
    # losses (weak sanity that the bigger mesh computed real work)
    for v in losses.values():
        assert np.isfinite(v)


def test_spatial_sharding_forward_matches():
    """Row-sharded conv forward (halo exchange) == replicated forward."""
    from ubresnet_tpu.parallel import spatial_sharding

    model, state = make_state()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 1))

    ref = model.apply(variables, x)
    mesh = make_mesh(jax.devices()[:8], model_axis=4)
    with mesh:
        xs = jax.device_put(x, spatial_sharding(mesh))
        out = jax.jit(lambda v, im: model.apply(v, im))(variables, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_fused_train_stats_sharded_match_single_device(rng):
    """The stats-decoupled train zone under pjit batch sharding: the
    kernel-emitted BN moment sums are grid-accumulated VMEM outputs,
    and GSPMD must all-reduce them across batch shards. Batch-stat
    updates are a deterministic function of the global batch, so
    sharded == single-device pins that reduction (grads are NOT
    compared here - f32 BN-train grads carry ~1e-2*scale inherent
    noise, see test_pallas_conv.py threshold calibration)."""
    import dataclasses

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ubresnet_tpu.models import get_model

    pol = dataclasses.replace(Policy.f32(), pack_width=8, fused_train=True)
    model = get_model("uresnet", policy=pol, input_channels=1, inplanes=16)
    x = jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    vr = jax.device_put(v, NamedSharding(mesh, P()))

    @jax.jit
    def stats(v, x):
        _, upd = model.apply(v, x, train=True, logits=True,
                             mutable=["batch_stats"])
        return upd["batch_stats"]

    s_sh = stats(vr, xs)
    s_1d = stats(v, x)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(s_sh)[0],
        jax.tree_util.tree_flatten_with_path(s_1d)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(pa),
        )


@pytest.mark.slow
def test_remat_sharded_matches_single_device(rng):
    """Policy.remat composes with GSPMD batch sharding: the rematted
    train forward + grads on a 2-device data mesh match the rematted
    single-device run (remat boundaries must not break the partitioner
    or the collective placement)."""
    import dataclasses

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ubresnet_tpu.models import get_model

    pol = dataclasses.replace(Policy.f32(), pack_width=8, remat=True)
    model = get_model("uresnet", policy=pol, input_channels=1, inplanes=16)
    x = jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    vr = jax.device_put(v, NamedSharding(mesh, P()))

    @jax.jit
    def loss_and_grad(v, x):
        def f(params):
            out, upd = model.apply(
                {**v, "params": params}, x, train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean(out**2), upd["batch_stats"]

        (loss, bs), g = jax.value_and_grad(f, has_aux=True)(v["params"])
        return loss, bs, g

    l_sh, s_sh, g_sh = loss_and_grad(vr, xs)
    l_1d, s_1d, g_1d = loss_and_grad(v, x)
    np.testing.assert_allclose(float(l_sh), float(l_1d), rtol=1e-5)
    # batch-stat updates are a deterministic function of the global
    # batch — compared tightly, as in the fused-stats test above
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(s_sh)[0],
        jax.tree_util.tree_flatten_with_path(s_1d)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(pa),
        )
    # grads carry the inherent ~1e-2*scale f32 BN-train noise across
    # reduction orders (see the fused-stats test docstring); leaves
    # whose true grad is ~0 (conv biases absorbed by BN's mean
    # subtraction) are pure cancellation noise, so the bound has an
    # absolute floor anchored to the global grad scale
    gmax = max(
        float(np.abs(np.asarray(l)).max())
        for l in jax.tree_util.tree_leaves(g_1d)
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_sh)[0],
        jax.tree_util.tree_flatten_with_path(g_1d)[0],
    ):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert np.isfinite(a).all(), jax.tree_util.keystr(pa)
        err = np.linalg.norm(a - b)
        tol = 3e-2 * np.linalg.norm(b) + 1e-4 * gmax * np.sqrt(b.size)
        assert err < tol, (jax.tree_util.keystr(pa), err, tol)
