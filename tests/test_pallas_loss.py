"""Pallas fused loss kernel vs the jnp reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubresnet_tpu.losses import pixelwise_weighted_nll_from_logits
from ubresnet_tpu.ops.pallas_loss import pallas_weighted_nll


def data(rng, b=2, h=64, w=128, c=3):
    logits = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 3)
    labels = jnp.asarray(rng.randint(0, c, (b, h, w)).astype(np.int32))
    weights = jnp.asarray(rng.rand(b, h, w).astype(np.float32) * 2)
    return logits, labels, weights


def test_forward_matches_reference(rng):
    logits, labels, weights = data(rng)
    ref = pixelwise_weighted_nll_from_logits(logits, labels, weights)
    got = pallas_weighted_nll(logits, labels, weights, True)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_grad_matches_reference(rng):
    logits, labels, weights = data(rng)
    ref = jax.grad(
        lambda lg: pixelwise_weighted_nll_from_logits(lg, labels, weights)
    )(logits)
    got = jax.grad(lambda lg: pallas_weighted_nll(lg, labels, weights, True))(
        logits
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-6)


def test_fallback_for_unaligned_width(rng):
    # w=100 not lane-aligned -> jnp fallback path (still correct)
    logits, labels, weights = data(rng, h=16, w=100)
    ref = pixelwise_weighted_nll_from_logits(logits, labels, weights)
    got = pallas_weighted_nll(logits, labels, weights, False)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_bf16_logits(rng):
    logits, labels, weights = data(rng)
    got = pallas_weighted_nll(logits.astype(jnp.bfloat16), labels, weights, True)
    ref = pixelwise_weighted_nll_from_logits(
        logits.astype(jnp.bfloat16), labels, weights
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-2)
