"""Packed-execution UResNet == unpacked UResNet with shared params."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models import UResNet, UResNetConfig

CFG = UResNetConfig(num_classes=3, input_channels=1, inplanes=4,
                    final_conv_kernels=4)
F32 = Policy.f32()
F32P = dataclasses.replace(F32, pack_width=8)


def paths(tree):
    return {
        jax.tree_util.keystr(p): tuple(x.shape)
        for p, x in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_packed_param_tree_identical():
    x = jnp.zeros((1, 64, 64, 1))
    v_plain = UResNet(config=CFG, policy=F32).init(jax.random.PRNGKey(0), x)
    v_pack = UResNet(config=CFG, policy=F32P).init(jax.random.PRNGKey(0), x)
    assert paths(v_plain["params"]) == paths(v_pack["params"])
    assert paths(v_plain["batch_stats"]) == paths(v_pack["batch_stats"])


def test_packed_eval_matches_unpacked(rng):
    x = jnp.asarray(rng.rand(2, 64, 64, 1).astype(np.float32) * 10)
    model = UResNet(config=CFG, policy=F32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(variables, x))
    got = np.asarray(UResNet(config=CFG, policy=F32P).apply(variables, x))
    # Random-init logits reach O(1e4); f32 summation-order noise scales
    # with the logit magnitude, so compare relative to that scale (an
    # elementwise rtol trips on near-zero logits).
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 1e-5 * scale
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree >= 0.999


def test_packed_train_step_matches_unpacked(rng):
    """Train-mode forward + BN stat updates agree."""
    x = jnp.asarray(rng.rand(2, 64, 64, 1).astype(np.float32) * 10)
    model = UResNet(config=CFG, policy=F32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref, upd_ref = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    got, upd_got = UResNet(config=CFG, policy=F32P).apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(upd_ref["batch_stats"])[0],
        jax.tree_util.tree_flatten_with_path(upd_got["batch_stats"])[0],
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                                   atol=1e-5, err_msg=jax.tree_util.keystr(pa))


@pytest.mark.slow
def test_packed_grads_match_unpacked(rng):
    x = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32) * 10)
    model = UResNet(config=CFG, policy=F32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(m, params):
        out, _ = m.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, logits=True, mutable=["batch_stats"],
        )
        return jnp.mean(out ** 2)

    g_ref = jax.grad(lambda p: loss(model, p))(variables["params"])
    g_pack = jax.grad(lambda p: loss(UResNet(config=CFG, policy=F32P), p))(
        variables["params"]
    )
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pack)):
        # two analytically-equivalent programs: allow f32 cancellation
        # noise on near-zero gradients
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                                   atol=5e-4)


def test_pack_disabled_for_unaligned_width():
    """Widths not divisible by 2*pack fall back to unpacked execution."""
    x = jnp.zeros((1, 40, 40, 1))
    model = UResNet(config=CFG, policy=F32P)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 40, 40, 3)
