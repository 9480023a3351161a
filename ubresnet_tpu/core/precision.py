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
    # Pallas fused conv / whole-BasicBlock kernels on packed eval paths
    # (ops/pallas_conv.py): fewer MXU passes (halo matmul) + fused
    # epilogues. Isolated blocks run 1.4-1.7x faster than the XLA
    # path, but model-wide XLA inserts full-tensor layout-conversion
    # copies at every XLA-conv <-> pallas boundary (~4.5 GB per
    # batch-64 forward, measured in the compiled HLO), erasing the
    # gain until the remaining packed-zone ops (deconv, concat, pool)
    # are also pallas. Off by default; an opt-in experimental path.
    fused_eval: bool = False

    @staticmethod
    def tpu() -> "Policy":
        return Policy(pack_width=8)

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
