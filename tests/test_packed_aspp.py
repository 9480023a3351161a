"""Packed-execution ASPP-ResNet equivalence."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models import ASPPResNet, ASPPResNetConfig

CFG = ASPPResNetConfig(num_classes=3, input_channels=1, inplanes=4,
                       final_conv_kernels=4, aspp_branch_features=4)
F32 = Policy.f32()
F32P = dataclasses.replace(F32, pack_width=8)


def test_packed_aspp_matches_unpacked(rng):
    x = jnp.asarray(rng.rand(1, 64, 64, 1).astype(np.float32) * 10)
    model = ASPPResNet(config=CFG, policy=F32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(variables, x)
    got = ASPPResNet(config=CFG, policy=F32P).apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3,
                               atol=1e-3)


def test_packed_aspp_param_tree_identical():
    x = jnp.zeros((1, 64, 64, 1))
    v_plain = ASPPResNet(config=CFG, policy=F32).init(jax.random.PRNGKey(0), x)
    v_pack = ASPPResNet(config=CFG, policy=F32P).init(jax.random.PRNGKey(0), x)

    def paths(tree):
        return {
            jax.tree_util.keystr(p): tuple(a.shape)
            for p, a in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(v_plain["params"]) == paths(v_pack["params"])
    assert paths(v_plain["batch_stats"]) == paths(v_pack["batch_stats"])


@pytest.mark.slow
def test_aspp_fused_train_matches_unfused(rng):
    """ASPP_ResNet under Policy.fused_train: loss + grads track the
    unfused packed path (the packed zone shares blocks.py with UResNet;
    this pins the ASPP-specific plumbing — stem/enc1/dec/head routing
    and the unpacked ASPP stages - end to end)."""
    import dataclasses

    import jax
    import numpy as np

    from ubresnet_tpu.models import get_model

    polT = dataclasses.replace(Policy.f32(), pack_width=8, fused_train=True)
    polU = dataclasses.replace(polT, fused_train=False)
    x = jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)
    mT = get_model("aspp_resnet", policy=polT, input_channels=1, inplanes=16)
    mU = get_model("aspp_resnet", policy=polU, input_channels=1, inplanes=16)
    v = mU.init(jax.random.PRNGKey(0), x, train=False)

    def loss(m, params):
        out, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, logits=True, mutable=["batch_stats"],
        )
        return jnp.mean(out ** 2)

    lT, gT = jax.value_and_grad(lambda p: loss(mT, p))(v["params"])
    lU, gU = jax.value_and_grad(lambda p: loss(mU, p))(v["params"])
    np.testing.assert_allclose(float(lT), float(lU), rtol=1e-5)
    flatT = jax.tree_util.tree_flatten_with_path(gT)[0]
    flatU = jax.tree_util.tree_flatten_with_path(gU)[0]
    gsc = max(float(jnp.abs(b).max()) for _, b in flatU)
    # threshold calibrated against the measured f32-BN-train noise
    # floor (see test_pallas_conv.py::test_fused_train_model_grads...)
    for (pa, a), (_, b) in zip(flatT, flatU):
        assert float(jnp.abs(a - b).max()) < 5e-2 * gsc, (
            jax.tree_util.keystr(pa)
        )
