"""Stats-decoupled Pallas training ops for the W-packed zone.

Why this exists: the two previous attempts at a Pallas training path
(round 2: conv-ad only; round 3a: the complete per-leg AD family) both
LOST to the XLA packed path because the training graph kept full-tensor
XLA ops between Pallas calls — BatchNorm batch-statistic reductions,
the affine, and XLA convs at the seams — and XLA inserts full-tensor
layout-conversion copies at every such boundary (docs/roofline.md).

The fix implemented here decouples the statistics from the
normalisation:

    y, s1, s2 = train_conv_stats(x, w)     # ONE Pallas kernel
    mean, var = f(s1, s2, n)               # per-channel vectors (XLA)
    out = relu(g * y + b)                  # elementwise (XLA fuses)

The conv kernel itself emits the per-channel sums (s1 = Σy, s2 = Σy²)
as grid-accumulated VMEM outputs, so BN statistics never appear as XLA
reductions over activation tensors. What remains between Pallas calls
is elementwise-only XLA (layout-agnostic, fused into single passes) and
per-channel vector math.

The custom VJP folds the statistic cotangents into the conv cotangent
(dc = ȳ + s̄1 + 2·y·s̄2 — one fused elementwise pass) and reuses the
existing Pallas backward legs (halo-matmul dx via the transposed
kernel, the grad-weights accumulator kernel), so forward AND backward
stay free of XLA convolutions throughout the packed zone.

Reference motif being trained: conv+BN+ReLU chains of
/root/reference/models/common_layers.py:18-58 driven by
/root/reference/training/train_ubresnet2018_wlarcv2.py:319-396.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ubresnet_tpu.ops.pallas_conv import (
    COMBO,
    _combo,
    _conv_ad_bwd,
    _fit_th,
    _halo_stream,
    conv_ad_supported,
    halo_weights,
)


def _conv_stats_kernel(
    x_hbm,
    wm_ref,
    wh_ref,
    b_ref,
    y_ref,
    s1_ref,
    s2_ref,
    xs,
    sems,
    *,
    kh: int,
    hwci: int,
    th: int,
    wc: int,
    nh: int,
    has_bias: bool,
):
    """fused_packed_conv's halo-matmul body + per-channel stat
    accumulators: s1 += Σ_rows y, s2 += Σ_rows y² (computed on the
    EMITTED values so statistics match the XLA path's cast order).
    TPU grid steps run sequentially, so the constant-index stat
    outputs accumulate in VMEM across programs (same pattern as the
    grad-weights kernel)."""
    idx = pl.program_id(0)
    m = th * wc
    slot = _halo_stream(x_hbm, xs, sems, nh=nh, th=th, wc=wc, hb=kh // 2)
    pco = y_ref.shape[-1]

    @pl.when(idx == 0)
    def _():
        s1_ref[...] = jnp.zeros(s1_ref.shape, s1_ref.dtype)
        s2_ref[...] = jnp.zeros(s2_ref.shape, s2_ref.dtype)

    xall = xs[slot]
    call = _combo(xall, hwci, wc) if hwci else None
    acc = jnp.zeros((m, pco), jnp.float32)
    for k in range(kh):
        row0 = k * wc
        acc = acc + jnp.dot(
            xall[row0 : row0 + m],
            wm_ref[k],
            preferred_element_type=jnp.float32,
        )
        if hwci:
            acc = acc + jnp.dot(
                call[row0 : row0 + m],
                wh_ref[k],
                preferred_element_type=jnp.float32,
            )
    if has_bias:
        acc = acc + b_ref[0]
    yv = acc.astype(y_ref.dtype)
    y_ref[0] = yv
    yf = yv.astype(jnp.float32)
    s1_ref[0] += jnp.sum(yf, axis=0, keepdims=True)[0]
    s2_ref[0] += jnp.sum(yf * yf, axis=0, keepdims=True)[0]


@functools.partial(jax.jit, static_argnames=("p", "th", "interpret"))
def _conv_stats_fwd(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array],
    *,
    p: int,
    th: int = 64,
    interpret: bool = False,
):
    """Stride-1 'same' packed conv emitting (y, s1, s2).

    x: (B, H, WC, p*ci) packed; w: (kh, kw, ci, co) unpacked
    (checkpoint layout); bias: optional (co,) conv bias. Returns
    y (B, H, WC, p*co), s1/s2 (p*co,) f32 — per-PACKED-channel sums
    (fold offsets with .reshape(p, co).sum(0))."""
    bsz, h, wc, pci = x.shape
    kh, kw, ci, co = w.shape
    assert pci == p * ci, (pci, p, ci)
    assert kh % 2 == 1 and kw % 2 == 1, "odd kernels only ('same' conv)"
    pco = p * co
    hwci = (kw // 2) * ci
    assert 2 * hwci <= COMBO and pci >= COMBO
    hb = kh // 2
    nb = x.dtype.itemsize
    th = _fit_th(h, th, lambda t: (
        2 * (t + 2 * hb) * wc * pci * nb      # xs double buffer
        + 2 * (t + 2 * hb) * wc * COMBO * 4   # combo + roll temps (f32)
        + t * wc * pco * 4                    # f32 accumulator
        + t * wc * pco * nb                   # out block
    ))
    wmain, whalo = halo_weights(w, p)
    has_bias = bias is not None
    bt = (
        jnp.tile(bias.astype(jnp.float32), p).reshape(1, pco)
        if has_bias
        else jnp.zeros((1, pco), jnp.float32)
    )
    nh = h // th
    grid = (bsz * nh,)
    kernel = functools.partial(
        _conv_stats_kernel,
        kh=kh,
        hwci=hwci,
        th=th,
        wc=wc,
        nh=nh,
        has_bias=has_bias,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    y, s1, s2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        + [vmem] * 3,
        out_specs=[
            pl.BlockSpec(
                (1, th * wc, pco),
                lambda i: (i // nh, i % nh, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, pco), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pco), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h * wc, pco), x.dtype),
            jax.ShapeDtypeStruct((1, pco), jnp.float32),
            jax.ShapeDtypeStruct((1, pco), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, (th + 2 * hb) * wc, pci), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wc * kh * (pci + COMBO) * pco,
            bytes_accessed=bsz * h * wc * (pci + pco) * nb,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.reshape(bsz, h * wc, pci), wmain.astype(x.dtype),
      whalo.astype(x.dtype), bt)
    return y.reshape(bsz, h, wc, pco), s1[0], s2[0]


def train_conv_supported(p: int, kw: int, ci: int, co: int) -> bool:
    """Forward + both backward legs must fit their kernels (shared
    constraint set with the plain differentiable conv)."""
    return conv_ad_supported(p, kw, ci, co)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def train_conv_stats(x, w, bias, p, interpret=False):
    """Differentiable stride-1 'same' packed conv with fused batch-
    statistic outputs — the training-zone primitive.

    Returns (y, s1, s2): the conv output and per-packed-channel
    Σy / Σy² (f32, (p*co,)). The VJP folds the stat cotangents into
    the conv cotangent (dc = ȳ + s̄1 + 2·y·s̄2, one fused elementwise
    pass) and runs dx/dW on the existing Pallas backward kernels —
    no XLA convolution on any leg.

    x: (B, H, WC, p*ci) packed; w: (kh, kw, ci, co) checkpoint layout;
    bias: optional (co,). Requires train_conv_supported(...).
    """
    return _conv_stats_fwd(x, w, bias, p=p, interpret=interpret)


def _tcs_fwd(x, w, bias, p, interpret):
    y, s1, s2 = _conv_stats_fwd(x, w, bias, p=p, interpret=interpret)
    return (y, s1, s2), (x, w, bias, y)


def _tcs_bwd(p, interpret, saved, cot):
    x, w, bias, y = saved
    dy, ds1, ds2 = cot
    pco = y.shape[-1]
    # fold the statistic cotangents into the conv cotangent — XLA fuses
    # this into one elementwise pass over dy/y
    dc = dy.astype(jnp.float32)
    if ds1 is not None:
        dc = dc + ds1.reshape(1, 1, 1, pco)
    if ds2 is not None:
        dc = dc + 2.0 * y.astype(jnp.float32) * ds2.reshape(1, 1, 1, pco)
    dc = dc.astype(x.dtype)
    dx, dw = _conv_ad_bwd(p, interpret, (x, w), dc)
    if bias is None:
        dbias = None
    else:
        co = bias.shape[0]
        dbias = (
            jnp.sum(dc.astype(jnp.float32), axis=(0, 1, 2))
            .reshape(p, co)
            .sum(axis=0)
            .astype(bias.dtype)
        )
    return dx, dw, dbias


train_conv_stats.defvjp(_tcs_fwd, _tcs_bwd)
