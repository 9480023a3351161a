"""Mixed-precision policy for TPU execution.

The reference stack runs everything in float32 on CUDA (PyTorch 0.4,
cudnn.benchmark at train_ubresnet2018_wlarcv2.py:160). On TPU the MXU's
native input type is bfloat16; we keep parameters and batch-norm
statistics in float32 and run conv/matmul compute in bfloat16 by
default. Parity tests against the reference use the full-float32
policy.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Precision policy threaded through every module.

    param_dtype:   dtype parameters are stored in.
    compute_dtype: dtype convolutions / matmuls execute in (MXU input).
    output_dtype:  dtype of the network head output (kept float32 so the
                   log-softmax + loss are numerically stable).
    """

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    output_dtype: Any = jnp.float32
    # W-packing factor for low-channel stages (ops/packed.py): folds
    # `pack_width` columns into channels so tiles stay lane-full.
    # 0 disables. 8 is the sweet spot for 16-32 channel stages.
    pack_width: int = 0
    # Pallas fused conv / whole-BasicBlock / deconv2x / dual-input /
    # pool kernels on packed eval paths (ops/pallas_conv.py): fewer
    # MXU passes (halo matmul) + fused epilogues. With the packed zone
    # Pallas-complete (stem pool, blocks, deconvs, skip joins, head,
    # classifier) there are no XLA<->Pallas layout boundaries left and
    # the fused path wins model-wide: 688 vs 532 crops/s measured on
    # the real chip (batch-64 512x512 sparse-H2D forward). Eval-only
    # (train steps keep the differentiable XLA packed path). On
    # non-TPU backends the kernels run in interpret mode, so default
    # it on only when the backend is TPU.
    fused_eval: bool = False
    # Differentiable Pallas kernels for the packed TRAIN path. Round-3
    # design: ConvBN routes stride-1 convs through the stats-decoupled
    # train_conv_stats (ops/pallas_train.py — conv + BN batch moments
    # emitted by ONE kernel, custom VJP over Pallas dx/dW), so neither
    # forward nor backward has XLA convolutions or BN-stat reductions
    # inside the packed zone; the remaining XLA between kernels is
    # elementwise-only (layout-agnostic). Earlier per-leg attempts
    # (round 2: conv-ad only, 139 ms vs 102 XLA at b16; round 3a:
    # complete AD family, 218 ms vs 108) lost to boundary copies —
    # see docs/roofline.md before touching this.
    fused_train: bool = False
    # Deconv2x via pallas_deconv2x_ad when training. Kept SEPARATE
    # from fused_train: the deconv backward (s2k4-dx + deconv-dW) is
    # a measured 6x regression at decoder shapes (257.6 vs 42.5 ms,
    # docs/roofline.md round-3 table) — enabling it erases the
    # stats-path win. Grad-verified; off until re-tiled.
    fused_train_deconv: bool = False
    # int8 post-training quantization (ops/quant.py). quant_calib makes
    # every ConvBN record its input abs-max into the 'quant' collection
    # (run a few eval batches with mutable=['quant']); quant_eval then
    # runs packed stride-1/2 convs as s8×s8→s32 MXU ops — double the
    # native bf16 MXU rate — dequantizing into the BN fold. Weights are
    # quantized per-output-channel in-graph from the f32 params, so
    # checkpoints are unchanged and only activation scales are stored.
    # Eval-only; the reference has no analog (its engine is f32 CUDA).
    quant_eval: bool = False
    quant_calib: bool = False
    # Calibration statistic: 0.0 records the running abs-max (exact
    # range, outlier-sensitive); a value like 99.9 records the running
    # max of the per-batch percentile of NONZERO |x| instead, trading
    # saturation of the largest activations (quantize_act clips) for a
    # finer grid on the bulk. The documented first lever if a
    # real-weight model shows int8 accuracy loss (ops/quant.py,
    # docs/roofline.md). Zeros are excluded because ADC inputs and
    # post-ReLU features are mostly zero — an all-pixel percentile
    # would collapse the scale to 0.
    quant_percentile: float = 0.0
    # QAT: fake-quantize every packed ConvBN / Deconv2x input and
    # kernel (ops/quant.fake_quant_act/_weight, straight-through
    # estimators, dynamic per-batch act scales — no state), so
    # finetuned weights anticipate int8 rounding. Applies to train AND
    # eval passes while set, so validation during the finetune tracks
    # quantized accuracy; deploy then runs the normal PTQ calibrate +
    # Policy.tpu_int8(). The finishing lever when PTQ (+percentile)
    # accuracy loss is still too high. Scope mirrors quant_eval (the
    # packed zone), so requires pack_width > 0.
    quant_train: bool = False
    # Gradient rematerialization of every encoder/decoder stage
    # (flax nn.remat = lifted jax.checkpoint): the backward pass
    # recomputes each stage's internal activations from its input
    # instead of holding them in HBM across the whole forward. Only
    # the stage-boundary tensors (the U-Net skips, which the decoder
    # needs anyway) stay resident, so train-step activation memory
    # drops roughly by the stage's internal depth (~4 conv
    # activations per DoubleResNet) at the cost of one extra forward
    # FLOP per stage. The TPU lever for batch sizes past the HBM
    # cliff; off by default because small batches are compute-bound.
    remat: bool = False

    @staticmethod
    def tpu() -> "Policy":
        import jax

        return Policy(pack_width=8,
                      fused_eval=jax.default_backend() == "tpu")

    @staticmethod
    def tpu_int8() -> "Policy":
        """Packed int8 PTQ inference: the MXU's s8×s8→s32 mode is 2x
        the bf16 rate; whether that beats the Pallas bf16 fused-eval
        zone end-to-end is a chip A/B (bench.py int8 section,
        docs/roofline.md decision rules). With fused_eval also set
        (TPU backend), stride-1 convs AND whole BasicBlocks ride the
        int8 variants of the Pallas halo-matmul kernels — dequant
        folded into the BN-affine epilogue, block intermediates
        requantized in VMEM — instead of the XLA packed path."""
        import jax

        return Policy(pack_width=8, quant_eval=True,
                      fused_eval=jax.default_backend() == "tpu")

    @staticmethod
    def f32() -> "Policy":
        """Full float32 — used for numerical parity vs the reference."""
        return Policy(compute_dtype=jnp.float32)

    @staticmethod
    def bf16() -> "Policy":
        return Policy(compute_dtype=jnp.bfloat16)


def cast_floating(tree, dtype):
    """Cast all floating-point leaves of a pytree to `dtype`."""
    import jax

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
