"""Packed-execution ASPP-ResNet equivalence."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

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
