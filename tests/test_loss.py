"""Loss parity vs torch F.nll_loss * pixelweights mean
(reference semantics: training/pixelwise_nllloss.py:41-61)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ubresnet_tpu.losses import (
    pixelwise_weighted_nll,
    pixelwise_weighted_nll_from_logits,
)


def _ref_loss(logits_nchw, targets, pixw, class_w=None):
    lp = F.log_softmax(torch.from_numpy(logits_nchw), dim=1)
    w = torch.from_numpy(class_w) if class_w is not None else None
    pl = F.nll_loss(lp, torch.from_numpy(targets), weight=w, reduction="none")
    return float(torch.mean(pl * torch.from_numpy(pixw)))


def test_loss_matches_torch(rng):
    b, c, h, w = 2, 3, 8, 8
    logits = rng.randn(b, c, h, w).astype(np.float32)
    targets = rng.randint(0, c, (b, h, w)).astype(np.int64)
    pixw = rng.rand(b, h, w).astype(np.float32) * 2

    ref = _ref_loss(logits, targets, pixw)
    lp = jax.nn.log_softmax(jnp.asarray(logits.transpose(0, 2, 3, 1)), -1)
    got = pixelwise_weighted_nll(lp, jnp.asarray(targets), jnp.asarray(pixw))
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)

    got2 = pixelwise_weighted_nll_from_logits(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(targets), jnp.asarray(pixw)
    )
    np.testing.assert_allclose(float(got2), ref, rtol=1e-5)


def test_loss_with_class_weights(rng):
    b, c, h, w = 2, 3, 4, 4
    logits = rng.randn(b, c, h, w).astype(np.float32)
    targets = rng.randint(0, c, (b, h, w)).astype(np.int64)
    pixw = np.ones((b, h, w), np.float32)
    cw = np.array([0.2, 1.0, 3.0], np.float32)

    ref = _ref_loss(logits, targets, pixw, cw)
    got = pixelwise_weighted_nll_from_logits(
        jnp.asarray(logits.transpose(0, 2, 3, 1)),
        jnp.asarray(targets),
        jnp.asarray(pixw),
        class_weights=jnp.asarray(cw),
    )
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)


def test_loss_grad_matches_torch(rng):
    b, c, h, w = 1, 3, 4, 4
    logits = rng.randn(b, c, h, w).astype(np.float32)
    targets = rng.randint(0, c, (b, h, w)).astype(np.int64)
    pixw = rng.rand(b, h, w).astype(np.float32)

    t = torch.from_numpy(logits).requires_grad_(True)
    lp = F.log_softmax(t, dim=1)
    pl = F.nll_loss(lp, torch.from_numpy(targets), reduction="none")
    (pl * torch.from_numpy(pixw)).mean().backward()

    g = jax.grad(
        lambda z: pixelwise_weighted_nll_from_logits(
            z, jnp.asarray(targets), jnp.asarray(pixw)
        )
    )(jnp.asarray(logits.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(g).transpose(0, 3, 1, 2), t.grad.numpy(), rtol=1e-4, atol=1e-6
    )
