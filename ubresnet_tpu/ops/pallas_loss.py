"""Pallas TPU kernel: fused pixel-weighted NLL from logits.

The training loss (training/pixelwise_nllloss.py semantics) as a single
VMEM-resident kernel: per spatial tile, compute logsumexp over the
(tiny, unrolled) class axis, select the target logit with VPU masks,
apply pixel weights, and accumulate one partial sum per tile — logits
are read exactly once and neither softmax nor the per-pixel loss image
ever reaches HBM. A custom VJP computes d logits = (softmax − onehot) ·
w / N in one more pass.

Layout: the class axis is moved off the minor (lane) dimension —
kernels see (C, BH, W) blocks so tiles stay (8·k, 128)-aligned.
Falls back to the jnp implementation off-TPU or for unaligned widths.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from ubresnet_tpu.losses.pixelwise_nll import pixelwise_weighted_nll_from_logits

BH = 64  # spatial rows per tile


def _supported(logits, interpret: bool) -> bool:
    if interpret:
        return True
    if jax.devices()[0].platform != "tpu":
        return False
    b, h, w, c = logits.shape
    return w % 128 == 0 and h % 8 == 0


def _fwd_kernel(nc: int, logits_ref, labels_ref, weights_ref, out_ref):
    from jax.experimental import pallas as pl

    lg = logits_ref[0].astype(jnp.float32)  # (C, BH, W)
    lab = labels_ref[0]
    wgt = weights_ref[0].astype(jnp.float32)
    m = lg[0]
    for c in range(1, nc):
        m = jnp.maximum(m, lg[c])
    acc = jnp.exp(lg[0] - m)
    tgt = jnp.where(lab == 0, lg[0], 0.0)
    for c in range(1, nc):
        acc = acc + jnp.exp(lg[c] - m)
        tgt = tgt + jnp.where(lab == c, lg[c], 0.0)
    lse = m + jnp.log(acc)
    partial = jnp.sum((lse - tgt) * wgt)

    # TPU grid runs sequentially: accumulate into the single scalar out
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += partial


def _bwd_kernel(nc: int, logits_ref, labels_ref, weights_ref, grad_ref):
    lg = logits_ref[0].astype(jnp.float32)
    lab = labels_ref[0]
    wgt = weights_ref[0].astype(jnp.float32)
    m = lg[0]
    for c in range(1, nc):
        m = jnp.maximum(m, lg[c])
    acc = jnp.exp(lg[0] - m)
    for c in range(1, nc):
        acc = acc + jnp.exp(lg[c] - m)
    lse = m + jnp.log(acc)
    for c in range(nc):
        p = jnp.exp(lg[c] - lse)
        grad_ref[0, c] = (p - jnp.where(lab == c, 1.0, 0.0)) * wgt


def _tiles(logits_t, labels, weights, kernel, out_shape, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, nc, h, w = logits_t.shape
    grid = (b, h // BH)
    return pl.pallas_call(
        functools.partial(kernel, nc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nc, BH, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BH, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BH, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_shape[1],
        out_shape=out_shape[0],
        interpret=interpret,
    )(logits_t, labels, weights)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_weighted_nll(logits, labels, weights, interpret: bool = False):
    """Mean over all pixels of -log softmax(logits)[label] * weight.

    logits (b,h,w,c) [c small], labels (b,h,w) int32, weights (b,h,w).
    """
    return _forward(logits, labels, weights, interpret)


def _forward(logits, labels, weights, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not _supported(logits, interpret):
        return pixelwise_weighted_nll_from_logits(logits, labels, weights)
    b, h, w, nc = logits.shape
    lt = jnp.transpose(logits, (0, 3, 1, 2))  # class off the lane dim
    total = _tiles(
        lt,
        labels,
        weights.astype(jnp.float32),
        _fwd_kernel,
        (
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            # single scalar accumulator in SMEM; full-array block shape
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ),
        interpret,
    )
    return total[0, 0] / (b * h * w)


def _fwd_rule(logits, labels, weights, interpret):
    return _forward(logits, labels, weights, interpret), (logits, labels, weights)


def _bwd_rule(interpret, res, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    logits, labels, weights = res
    if not _supported(logits, interpret):
        _, vjp = jax.vjp(
            lambda lg: pixelwise_weighted_nll_from_logits(lg, labels, weights),
            logits,
        )
        return (vjp(g)[0], None, None)
    b, h, w, nc = logits.shape
    lt = jnp.transpose(logits, (0, 3, 1, 2))
    grad_t = _tiles(
        lt,
        labels,
        weights.astype(jnp.float32),
        _bwd_kernel,
        (
            jax.ShapeDtypeStruct((b, nc, h, w), jnp.float32),
            pl.BlockSpec((1, nc, BH, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret,
    )
    scale = g / (b * h * w)
    grad = jnp.transpose(grad_t, (0, 2, 3, 1)) * scale
    return (grad.astype(logits.dtype), None, None)


pallas_weighted_nll.defvjp(_fwd_rule, _bwd_rule)
