"""Pixel-weighted negative log-likelihood loss.

Semantics of /root/reference/training/pixelwise_nllloss.py:34-61:
per-pixel NLL on log-softmax input, optional per-class weight vector,
multiplied by a (b,h,w) pixel-weight image (class balancing + vertex
up-weighting), reduced by a plain mean over every pixel in the batch.

TPU-first shape: inputs are NHWC, class axis last — the 3-wide gather
along the minor axis lowers to a cheap select; the whole loss fuses into
the preceding convolution's epilogue under XLA. The from-logits variant
folds the log-softmax in so the head never materialises a normalized
tensor during training (the reference always does, ub_uresnet.py:143).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _gather_class(values, targets):
    """values (b,h,w,c) gathered at targets (b,h,w) → (b,h,w).

    With c==3 a one-hot contraction beats a gather on TPU (VPU selects,
    no scatter/gather unit); XLA turns this into fused selects.
    """
    c = values.shape[-1]
    onehot = jax.nn.one_hot(targets, c, dtype=values.dtype)
    return jnp.sum(values * onehot, axis=-1)


def pixelwise_weighted_nll(
    log_probs: jax.Array,
    targets: jax.Array,
    pixel_weights: jax.Array,
    class_weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean over (b,h,w) of -log p[target] * class_w[target] * pixel_w.

    log_probs:     (b, h, w, c) log-softmax output
    targets:       (b, h, w) int class ids
    pixel_weights: (b, h, w) float per-pixel loss weights
    class_weights: optional (c,) vector (the torch ``weight`` arg)
    """
    log_probs = log_probs.astype(jnp.float32)
    nll = -_gather_class(log_probs, targets)
    if class_weights is not None:
        nll = nll * class_weights.astype(nll.dtype)[targets]
    return jnp.mean(nll * pixel_weights.astype(nll.dtype))


def pixelwise_weighted_nll_from_logits(
    logits: jax.Array,
    targets: jax.Array,
    pixel_weights: jax.Array,
    class_weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Fused log-softmax + weighted NLL from raw logits.

    Numerically stable: logsumexp subtracted after gathering the target
    logit, so only two reductions over the (tiny) class axis remain.
    """
    logits = logits.astype(jnp.float32)
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    shifted = logits - m
    lse = jnp.log(jnp.sum(jnp.exp(shifted), axis=-1))
    tgt = _gather_class(shifted, targets)
    nll = lse - tgt
    if class_weights is not None:
        nll = nll * class_weights.astype(nll.dtype)[targets]
    return jnp.mean(nll * pixel_weights.astype(nll.dtype))
