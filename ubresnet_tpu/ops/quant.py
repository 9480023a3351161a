"""int8 post-training quantization (PTQ) for the packed eval path.

The MXU executes s8×s8→s32 at twice its native bf16 rate, so a
compute-bound inference graph has ~2x headroom over the bf16 zone.
This module provides the three pieces:

* per-output-channel weight quantization, computed IN-GRAPH from the
  f32 parameters (no separate int8 checkpoint format — reference
  checkpoints imported by deploy/importers.py quantize transparently);
* per-conv activation scales, calibrated by running a few eval batches
  with ``Policy.quant_calib=True`` and ``mutable=['quant']`` — each
  ConvBN records the running abs-max of its input into the 'quant'
  variable collection (``calibrate`` below wraps this);
* the quantized conv itself: symmetric int8 for both operands,
  ``packed_conv(..., preferred=int32)``, dequantized into the BN fold.

The reference has no analog — its engine is f32 CUDA end-to-end
(deploy/run_ubresnet_precropped.py:136-138); this is a TPU-native
capability beyond parity. Eval-only: training keeps bf16/f32.

Accuracy note: scales are symmetric abs-max. Activations in this
network are non-negative (ADC inputs, post-ReLU features), so half the
int8 range idles; the measured probability error vs f32 stays ~1e-2
(tests/test_quant.py) because BN re-centers each layer. Percentile
calibration is the first lever if a real-weight model ever shows more.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable

import jax
import jax.numpy as jnp

INT8_MAX = 127.0


def calib_batch_range(x: jax.Array, percentile: float = 0.0) -> jax.Array:
    """The |x| range one calibration batch contributes to a conv's
    activation scale: abs-max when ``percentile`` is 0, else the
    percentile of NONZERO |x| (zeros dominate ADC inputs and post-ReLU
    features and would collapse the scale; they quantize to 0 exactly
    under any scale). Modules take the running max of this across
    batches (ConvBN / Deconv2x quant_calib branches)."""
    if not percentile:
        return jnp.max(jnp.abs(x.astype(jnp.float32)))
    # Percentile lowers to a full O(n) sort; at the bench calibration
    # shape (b128 512² × 64-256 ch) the sort buffers + the f32 |x|
    # temp exceed HBM (measured: 16-20G vs 15.75G). Subsample on a
    # regular strided grid over the leading (batch/spatial) axes
    # BEFORE any elementwise math — the slice reads the live
    # activation without a full-size temp, the channel axis stays
    # complete, and ~1M grid samples estimate any calibration
    # percentile to ~1e-3 rank error. Deterministic: pure function of
    # the shape.
    cap = 1 << 20
    if x.size > cap:
        import math

        need = x.size / cap
        slices = []
        for i, n in enumerate(x.shape):
            last = i == x.ndim - 1
            if need <= 1 or (last and x.ndim > 1):
                slices.append(slice(None))
                continue
            rest = max(1, (x.ndim if x.ndim == 1 else x.ndim - 1) - i)
            s = max(1, min(n, math.ceil(need ** (1.0 / rest))))
            slices.append(slice(None, None, s))
            need /= s
        x = x[tuple(slices)]
    ax = jnp.abs(x.astype(jnp.float32))
    val = jnp.nanpercentile(jnp.where(ax > 0, ax, jnp.nan), percentile)
    return jnp.where(jnp.isnan(val), 0.0, val)


def weight_scales(w: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Per-output-channel symmetric scales for an (kh, kw, ci, co)
    kernel: co-vector s with w ≈ s · round(w / s)."""
    return jnp.maximum(
        jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2)), eps
    ) / INT8_MAX


def quantize_weight(w: jax.Array, sw: jax.Array) -> jax.Array:
    """Round an (kh, kw, ci, co) kernel to int8 with per-co scales."""
    return jnp.round(w.astype(jnp.float32) / sw).astype(jnp.int8)


def quantize_act(x: jax.Array, sx: jax.Array) -> jax.Array:
    """Symmetric int8 quantization of an activation tensor with a
    scalar scale (clips to ±127)."""
    return jnp.round(
        jnp.clip(x.astype(jnp.float32) / sx, -INT8_MAX, INT8_MAX)
    ).astype(jnp.int8)


def fake_quant_weight(w: jax.Array) -> jax.Array:
    """QAT fake-quantization of an (kh, kw, ci, co) kernel: round to
    the per-output-channel int8 grid and dequantize, with a
    straight-through estimator (gradient = identity; weight-range
    scales track the live weights, so no clipping region exists)."""
    wf = w.astype(jnp.float32)
    sw = weight_scales(wf)
    wq = jnp.round(wf / sw) * sw
    return (wf + jax.lax.stop_gradient(wq - wf)).astype(w.dtype)


def fake_quant_act(x: jax.Array, percentile: float = 0.0) -> jax.Array:
    """QAT fake-quantization of an activation tensor with a DYNAMIC
    per-batch scale (stateless — no 'quant' collection during
    training; deploy calibrates the finetuned weights with the normal
    PTQ ``calibrate`` afterwards): clip to the batch range, round to
    the int8 grid, dequantize. Straight-through estimator: gradient is
    identity inside the clip range, zero outside (the clip's own VJP).
    All-zero batches pass through unchanged."""
    xf = x.astype(jnp.float32)
    s = jax.lax.stop_gradient(
        calib_batch_range(xf, percentile)
    ) / INT8_MAX
    lim = s * INT8_MAX
    # where-based clip: lax.min/max split the gradient 0.5/0.5 at
    # exact ties, and the abs-max element always ties the boundary —
    # this keeps the STE gradient exactly 1 on [-lim, lim].
    xc = jnp.where(
        jnp.abs(xf) <= lim, xf, jnp.sign(xf) * lim
    )
    xq = jnp.round(xc / jnp.maximum(s, 1e-12)) * s
    y = xc + jax.lax.stop_gradient(xq - xc)
    return jnp.where(s > 0, y, xf).astype(x.dtype)


def calibrate(
    model: Any,
    variables: Dict[str, Any],
    batches: Iterable[jax.Array],
    percentile: float = None,
    **apply_kwargs: Any,
) -> Dict[str, Any]:
    """Run eval forwards over ``batches`` (dense NHWC images) recording
    every ConvBN's and Deconv2x's input range; returns ``variables``
    with the 'quant' collection added. Feed the result to a model whose
    policy has ``quant_eval=True`` (e.g. ``Policy.tpu_int8()``).

    ``percentile``: overrides the policy's ``quant_percentile`` for
    this calibration run (0 = abs-max; e.g. 99.9 = percentile of
    nonzero |x|, the outlier-robust lever — see calib_batch_range).

    The calibration model is the same module tree with
    ``quant_calib=True`` — scale variable paths therefore line up with
    the quantized model's reads exactly.
    """
    import dataclasses

    # fused paths are disabled during calibration: the whole-block
    # Pallas kernels call their ConvBNs with params_only dummies, so a
    # fused-routed calibration would record zero scales for the inner
    # convs (blocks.py BasicBlock fused path).
    cal_pol = dataclasses.replace(
        model.policy, quant_calib=True, quant_eval=False,
        fused_eval=False, fused_train=False,
        **(
            {}
            if percentile is None
            else {"quant_percentile": percentile}
        ),
    )
    cal_model = model.clone(policy=cal_pol)

    @jax.jit
    def step(vs, x):
        _, mut = cal_model.apply(
            vs, x, train=False, mutable=["quant"], **apply_kwargs
        )
        return mut["quant"]

    quant = None
    base = dict(variables)
    base.pop("quant", None)
    for x in batches:
        vs = {**base, "quant": quant} if quant is not None else base
        quant = step(vs, jnp.asarray(x))
    if quant is None:
        raise ValueError("calibrate() needs at least one batch")
    return {**base, "quant": jax.device_get(quant)}
