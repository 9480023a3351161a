"""Model-level tests: shapes, normalization, jit, gradient flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models import (
    ASPPResNet,
    ASPPResNetConfig,
    UResNet,
    UResNetConfig,
    get_model,
)

F32 = Policy.f32()


def small_uresnet(**kw):
    cfg = UResNetConfig(num_classes=3, input_channels=1, inplanes=4, **kw)
    return UResNet(config=cfg, policy=F32)


@pytest.mark.parametrize("hw", [(64, 64), (32, 64)])
def test_uresnet_shapes(hw):
    model = small_uresnet()
    x = jnp.zeros((2, hw[0], hw[1], 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, hw[0], hw[1], 3)
    assert out.dtype == jnp.float32


def test_uresnet_log_softmax_normalized():
    model = small_uresnet()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    probs = jnp.exp(out)
    np.testing.assert_allclose(np.asarray(jnp.sum(probs, -1)), 1.0, atol=1e-5)
    # logits path consistent with log-softmax path
    logits = model.apply(variables, x, logits=True)
    np.testing.assert_allclose(
        np.asarray(jax.nn.log_softmax(logits, -1)), np.asarray(out), atol=1e-5
    )


def test_uresnet_channel_plan():
    """Encoder widens x2/stage to 32*inplanes; decoder mirrors back
    (ub_uresnet.py:46-56). Verified via parameter shapes."""
    model = small_uresnet()
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    p = 4
    assert params["stem"]["conv"]["kernel"].shape == (7, 7, 1, p)
    assert params["enc5"]["res1"]["cb1"]["conv"]["kernel"].shape[-1] == 32 * p
    assert params["dec5"]["deconv"]["kernel"].shape == (4, 4, 32 * p, 16 * p)
    # decoder res consumes deconv output + skip concat
    assert params["dec5"]["res"]["res1"]["cb1"]["conv"]["kernel"].shape[-2] == 32 * p
    assert params["classifier"]["kernel"].shape == (7, 7, p * 4, 3)


def test_uresnet_jit_and_grad():
    model = small_uresnet()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    @jax.jit
    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        return jnp.mean(out**2)

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_aspp_resnet_shapes():
    cfg = ASPPResNetConfig(num_classes=3, input_channels=1, inplanes=4,
                           aspp_branch_features=4)
    model = ASPPResNet(config=cfg, policy=F32)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 64, 64, 3)
    probs = jnp.exp(out)
    np.testing.assert_allclose(np.asarray(jnp.sum(probs, -1)), 1.0, atol=1e-5)


def test_aspp_channel_plan():
    """ASPP widened-skip channel plan (ASPP_ResNet.py:342-375)."""
    p = 4
    cfg = ASPPResNetConfig(inplanes=p, input_channels=1, aspp_branch_features=p)
    model = ASPPResNet(config=cfg, policy=F32)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    # ASPP at enc3: branches 4*p + passthrough 8p = 12p into post
    assert params["aspp3_post"]["post"]["conv"]["kernel"].shape[-2] == 12 * p
    assert params["aspp3_post"]["post"]["conv"]["kernel"].shape[-1] == 8 * p
    # dec5 consumes e5_skip (64p), deconvs to 16p, res over 16p+32p -> 32p
    assert params["dec5"]["deconv"]["kernel"].shape == (4, 4, 64 * p, 16 * p)
    assert params["dec5"]["res"]["res1"]["cb1"]["conv"]["kernel"].shape[-2] == 48 * p
    assert params["dec5"]["res"]["res1"]["cb1"]["conv"]["kernel"].shape[-1] == 32 * p


def test_registry():
    m = get_model("uresnet", policy=F32, inplanes=4, input_channels=1)
    assert isinstance(m, UResNet)
    with pytest.raises(KeyError):
        get_model("nope")


def test_bf16_policy_output_is_f32():
    model = UResNet(
        config=UResNetConfig(inplanes=4, input_channels=1), policy=Policy.bf16()
    )
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.dtype == jnp.float32
    # params stored f32
    k = variables["params"]["stem"]["conv"]["kernel"]
    assert k.dtype == jnp.float32


def test_remat_grad_and_stats_parity():
    """Policy.remat: identical params tree, identical forward, grads,
    and batch_stats updates vs the un-rematted model (f32 — the
    recompute is deterministic), in the packed zone."""
    import dataclasses

    pol = Policy(pack_width=8, compute_dtype=jnp.float32)
    cfg = UResNetConfig(num_classes=3, input_channels=1, inplanes=8)
    base = UResNet(config=cfg, policy=pol)
    rem = UResNet(config=cfg, policy=dataclasses.replace(pol, remat=True))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    variables = base.init(jax.random.PRNGKey(0), x, train=True)
    vr = rem.init(jax.random.PRNGKey(0), x, train=True)
    assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(
        variables
    )

    def run(model):
        def loss_fn(params):
            out, upd = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean(out**2), upd

        (loss, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        return loss, upd, g

    l0, u0, g0 = run(base)
    l1, u1, g1 = run(rem)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(u0), jax.tree_util.tree_leaves(u1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)
    # the recompute reassociates f32 reductions, and BN train-mode
    # grads carry inherent E[x²]−E[x]² cancellation noise
    # (tests/test_pallas_conv.py:254) — near-zero leaves shift by
    # ~1e-5 absolute, so tolerance is anchored to the global grad
    # scale, not each leaf's own.
    gmax = max(
        float(np.abs(np.asarray(l)).max())
        for l in jax.tree_util.tree_leaves(g0)
    )
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5 * gmax
        )


def test_aspp_remat_grad_parity():
    """Policy.remat on ASPPResNet (stages + ASPP pyramids): identical
    tree, forward, and grads vs un-rematted, as for UResNet."""
    import dataclasses

    pol = Policy(pack_width=8, compute_dtype=jnp.float32)
    cfg = ASPPResNetConfig(num_classes=3, input_channels=1, inplanes=8,
                           aspp_branch_features=8)
    base = ASPPResNet(config=cfg, policy=pol)
    rem = ASPPResNet(config=cfg, policy=dataclasses.replace(pol, remat=True))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 1))
    variables = base.init(jax.random.PRNGKey(0), x, train=True)
    vr = rem.init(jax.random.PRNGKey(0), x, train=True)
    assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(
        variables
    )

    def run(model):
        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.mean(out**2)

        return jax.value_and_grad(loss_fn)(variables["params"])

    l0, g0 = run(base)
    l1, g1 = run(rem)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    gmax = max(
        float(np.abs(np.asarray(l)).max())
        for l in jax.tree_util.tree_leaves(g0)
    )
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5 * gmax
        )
