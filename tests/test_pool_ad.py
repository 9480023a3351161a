"""Dense-backward maxpool (ops/pool_ad.py): forward and gradient must
be BIT-identical to jax's native max_pool + SelectAndScatterAdd VJP,
including tie routing (first max in row-major window order — the case
that matters for LArTPC images, which are ~90% equal zeros)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from ubresnet_tpu.ops.pool_ad import maxpool3x3s2_ad


def _native(x):
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                       padding=[(1, 1), (1, 1)])


def _check(x, dtype=jnp.float32):
    x = jnp.asarray(x, dtype)
    y = maxpool3x3s2_ad(x)
    yr = _native(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(yr))

    def loss(f, x):
        return jnp.sum(f(x) * jnp.cos(jnp.arange(y.size, dtype=jnp.float32)
                                      .reshape(y.shape)).astype(x.dtype))

    g = jax.grad(lambda x: loss(maxpool3x3s2_ad, x))(x)
    gr = jax.grad(lambda x: loss(_native, x))(x)
    # positions covered by several windows sum their contributions in
    # a different order than SelectAndScatterAdd — last-ulp noise only;
    # a tie-ROUTING error would move O(1) gradient mass and still fail
    tol = dict(rtol=1e-1, atol=8e-3) if dtype == jnp.bfloat16 else dict(
        rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g, np.float32),
                               np.asarray(gr, np.float32), **tol)


def test_random(rng):
    _check(rng.randn(2, 16, 24, 5))


def test_tie_heavy_sparse(rng):
    """Quantized mostly-zero input: nearly every window has tied
    maxima — tie routing must match SelectAndScatter exactly."""
    x = (rng.rand(2, 32, 32, 3) > 0.9) * rng.randint(1, 4, (2, 32, 32, 3))
    _check(x)


def test_all_zero():
    _check(np.zeros((1, 8, 8, 2)))


def test_bf16(rng):
    x = (rng.rand(1, 16, 16, 4) > 0.8) * rng.rand(1, 16, 16, 4) * 50
    _check(x, jnp.bfloat16)


def test_stem_shape(rng):
    """The model's stem shape class (post-conv 512x512 scaled down)."""
    x = (rng.rand(1, 64, 64, 16) > 0.9) * rng.rand(1, 64, 64, 16)
    _check(x)


@pytest.mark.parametrize("fused_train", [False, True])
def test_model_pool_routing(rng, fused_train):
    """stem_pool with ad= gives identical forward + grads to native."""
    import dataclasses

    from ubresnet_tpu.core.precision import Policy
    from ubresnet_tpu.models.blocks import stem_pool

    x = jnp.asarray((rng.rand(1, 16, 16, 4) > 0.8) * 3.0, jnp.float32)
    pol = dataclasses.replace(Policy.f32(), fused_train=fused_train)
    y = stem_pool(x, ad=pol.fused_train)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(_native(x)))
    g = jax.grad(lambda x: jnp.sum(stem_pool(x, ad=pol.fused_train) ** 2))(x)
    gr = jax.grad(lambda x: jnp.sum(_native(x) ** 2))(x)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(gr))


def test_packed_pool_ad_matches_unpacked(rng):
    """packed_pool_ad (Pallas fwd + dense bwd on reshape views) ==
    the unpacked native pool fwd + VJP, on non-negative packed input."""
    from ubresnet_tpu.ops.packed import pack, unpack
    from ubresnet_tpu.ops.pool_ad import packed_pool_ad

    p = 8
    x = jnp.asarray((rng.rand(2, 16, 16 * p, 16) > 0.8)
                    * rng.rand(2, 16, 16 * p, 16) * 7, jnp.float32)
    xp = pack(x, p)
    y = packed_pool_ad(xp, p, True)
    yr = _native(x)
    np.testing.assert_array_equal(np.asarray(unpack(y, p)), np.asarray(yr))

    r = jnp.asarray(rng.rand(*yr.shape), jnp.float32)

    def loss_p(xp):
        return jnp.sum(unpack(packed_pool_ad(xp, p, True), p) * r)

    def loss_u(x):
        return jnp.sum(_native(x) * r)

    g = unpack(jax.grad(loss_p)(xp), p)
    gr = jax.grad(loss_u)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=2e-6, atol=1e-7)
