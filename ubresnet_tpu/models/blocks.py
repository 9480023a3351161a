"""Building blocks for the U-ResNet family, NHWC, TPU-first.

Semantics match the reference blocks (so imported reference checkpoints
reproduce outputs bit-for-bit in eval mode) but the implementation is
idiomatic JAX/flax:

  * NHWC layout — the fast conv layout on TPU (reference is NCHW torch,
    /root/reference/models/common_layers.py:13-58).
  * BatchNorm keeps float32 stats; conv compute in the policy dtype so
    the MXU runs bfloat16.
  * The transposed conv is expressed directly as an input-dilated
    ``lax.conv_general_dilated`` with torch-equivalent kernel flipping,
    and resolves the reference's dynamic
    ``ConvTranspose2d(output_size=skip.size())``
    (common_layers.py:122-132) into *static* per-axis padding derived
    from the skip shape at trace time — XLA needs static shapes.

Reference parity notes:
  * BasicBlock applies ReLU on the residual branch *before* the add and
    again after it (common_layers.py:39-58) — unusual, preserved.
  * PyTorch 0.4 BatchNorm2d defaults: eps=1e-5, momentum=0.1 where
    ``running = (1-m)*running + m*batch``; flax momentum is the decay of
    the running average, so flax momentum=0.9 is equivalent.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ubresnet_tpu.core.precision import Policy

BN_MOMENTUM = 0.9  # flax decay == 1 - torch momentum(0.1)
BN_EPS = 1e-5


def _repack(x, p_from: int, p_to: int):
    """Change the pack-factor VIEW of a packed tensor — pure reshapes
    (row-major packed layouts at different p are the same bytes), so
    fused kernels can renormalise to p_eff = 128/ci for full lanes and
    minimal MXU passes regardless of the stage's pack factor."""
    if p_from == p_to:
        return x
    from ubresnet_tpu.ops.packed import pack, unpack

    return pack(unpack(x, p_from), p_to)


def _p_eff(p: int, ci: int, wc_p: int) -> int:
    """Lane-filling pack factor for a fused kernel: 128/ci when the
    tensor can be re-viewed that way, else the stage factor. Works in
    both directions (enc1's 16-ch entry at stage p=4 re-views UP to
    p=8 for full lanes). Capped at 16 — very low channel counts (the
    1-ch stem) would need p=128, which Mosaic fails to compile."""
    pe = 128 // ci if ci <= 128 and 128 % ci == 0 else 0
    if pe and pe <= 16 and wc_p % pe == 0:
        return pe
    return p


def _train_conv_ok(pe: int, kernel: int, ci: int, co: int) -> bool:
    """Gate for the stats-decoupled Pallas train path (lazy import so
    blocks.py stays importable without the pallas module)."""
    if kernel % 2 == 0:
        return False
    from ubresnet_tpu.ops.pallas_train import train_conv_supported

    return train_conv_supported(pe, kernel, ci, co)


def fold_bn(scale, bias, mean, var, cbias=None, eps: float = BN_EPS):
    """Fold eval-mode BN (+ optional conv bias) into one affine:
    y = conv(x)*g + beta. The single definition of the fused paths'
    BN numerics — ConvBN, BasicBlock and the model wrappers all fold
    through here."""
    g = scale.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    beta = bias.astype(jnp.float32) - mean * g
    if cbias is not None:
        beta = beta + g * cbias.astype(jnp.float32)
    return g, beta


def msra_normal():
    """Reference init: normal(0, sqrt(2/n)), n = kh*kw*out_channels
    (ub_uresnet.py:72-79). Kernel layout here is HWIO."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, _, cout = shape
        n = kh * kw * cout
        return jax.random.normal(key, shape, dtype) * jnp.asarray(
            math.sqrt(2.0 / n), dtype
        )

    return init


class PackedConv(nn.Module):
    """Conv on a W-packed tensor (ops/packed.py). Params are stored in
    the UNPACKED layout under the same names as nn.Conv, so checkpoints
    are interchangeable between packed and unpacked execution."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False
    pack: int = 8
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, params_only: bool = False):
        from ubresnet_tpu.ops.packed import packed_conv

        ci = x.shape[-1] // self.pack
        kernel = self.param(
            "kernel",
            msra_normal(),
            (self.kernel, self.kernel, ci, self.features),
            self.policy.param_dtype,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.policy.param_dtype,
            )
            if self.use_bias
            else None
        )
        if self.policy.quant_train and not self.is_initializing():
            # QAT (ops/quant.py): per-output-channel int8 rounding of
            # the kernel with a straight-through gradient — the
            # optimizer steps against the deploy-time quantized
            # weights. Before params_only so fused consumers get it.
            from ubresnet_tpu.ops.quant import fake_quant_weight

            kernel = fake_quant_weight(kernel)
        if params_only:  # fused eval path reads the params directly
            return kernel, bias
        cdt = self.policy.compute_dtype
        p = self.pack
        pe = _p_eff(p, ci, x.shape[2] * p)
        if (
            self.policy.fused_train
            and self.stride == 1
            and not self.is_initializing()
            and pe * ci >= 128
        ):
            from ubresnet_tpu.ops.pallas_conv import (
                conv_ad_supported,
                pallas_conv_ad,
            )

            if conv_ad_supported(pe, self.kernel, ci, self.features):
                y = _repack(
                    pallas_conv_ad(
                        _repack(x.astype(cdt), p, pe),
                        kernel.astype(cdt),
                        pe,
                        jax.default_backend() != "tpu",
                    ),
                    pe,
                    p,
                )
                if bias is not None:
                    from ubresnet_tpu.ops.packed import tile_channel_vector

                    y = y + tile_channel_vector(bias.astype(y.dtype), p)
                return y
        return packed_conv(
            x.astype(cdt),
            kernel.astype(cdt),
            p,
            self.stride,
            bias=bias.astype(cdt) if bias is not None else None,
        )


class PackedBN(nn.Module):
    """BatchNorm over a W-packed tensor with flax-compatible naming
    (params scale/bias, batch_stats mean/var, all per REAL channel).

    Train-mode statistics are exact: per-packed-channel moments are
    averaged over the pack offsets, reproducing the unpacked batch
    statistics (equal pixel counts per offset)."""

    pack: int = 8
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, *, train: bool, params_only: bool = False,
                 stats=None):
        """``stats``: optional (sum, sumsq, count) per REAL channel —
        batch moments precomputed by a fused conv kernel
        (ops/pallas_train.py), so no XLA reduction over ``x`` runs
        here. Train-mode only; numerics identical to the in-line
        computation (same E[x²]−E[x]² form, f32)."""
        from ubresnet_tpu.ops.packed import tile_channel_vector

        p = self.pack
        c = x.shape[-1] // p
        scale = self.param(
            "scale", nn.initializers.ones, (c,), self.policy.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (c,), self.policy.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if params_only:  # fused eval path folds the affine itself
            return scale, bias, ra_mean.value, ra_var.value
        if train:
            if stats is not None:
                s1, s2, n = stats
                mean = s1.astype(jnp.float32) / n
                var = s2.astype(jnp.float32) / n - jnp.square(mean)
            else:
                xf = x.astype(jnp.float32)
                b, h, wc, _ = xf.shape
                x5 = xf.reshape(b, h, wc, p, c)
                mean = jnp.mean(x5, axis=(0, 1, 2, 3))
                var = jnp.mean(jnp.square(x5), axis=(0, 1, 2, 3)) - jnp.square(
                    mean
                )
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        cdt = self.policy.compute_dtype
        g, bterm = fold_bn(scale, bias, mean, var, eps=self.epsilon)
        return (
            x.astype(cdt) * tile_channel_vector(g, p).astype(cdt)
            + tile_channel_vector(bterm, p).astype(cdt)
        )


class ConvBN(nn.Module):
    """Conv → BatchNorm, optional ReLU — the universal reference motif.

    ``packed > 0`` runs on W-packed tensors (lane-efficient path for
    low-channel stages) with identical parameters and math.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    act: bool = True
    packed: int = 0
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, *, train: bool, residual=None,
                 params_only: bool = False):
        """``residual``: optional same-shape tensor implementing the
        BasicBlock tail — [act after BN is the pre-add ReLU], + residual,
        final ReLU (common_layers.py:39-58). Fused into the Pallas conv
        epilogue on the packed eval path. ``params_only`` returns the
        conv/BN parameters for the whole-block fused kernel."""
        if self.policy.quant_calib and not self.is_initializing():
            # int8 PTQ calibration (ops/quant.py): running range of
            # this conv's input into the 'quant' collection (abs-max,
            # or the policy's quant_percentile of nonzero |x|). x is
            # the same set of values packed or not (a reshape).
            from ubresnet_tpu.ops.quant import calib_batch_range

            qs = self.variable(
                "quant", "act_scale", lambda: jnp.zeros((), jnp.float32)
            )
            qs.value = jnp.maximum(
                qs.value,
                calib_batch_range(x, self.policy.quant_percentile)
                / 127.0,
            )
        if (
            self.policy.quant_train
            and self.packed
            and not params_only
            and not self.is_initializing()
        ):
            # QAT (ops/quant.py): round this conv's input to the int8
            # grid the PTQ eval path will use (straight-through
            # gradient, dynamic per-batch scale). Scope mirrors
            # quant_eval — the packed zone; the kernel quantizes
            # inside PackedConv so every dispatch path below sees it.
            from ubresnet_tpu.ops.quant import fake_quant_act

            x = fake_quant_act(x, self.policy.quant_percentile)
        if self.packed:
            if self.dilation != 1:
                raise NotImplementedError("packed conv with dilation")
            conv = PackedConv(
                self.features,
                self.kernel,
                self.stride,
                self.use_bias,
                self.packed,
                self.policy,
                name="conv",
            )
            bn = PackedBN(self.packed, policy=self.policy, name="bn")
            p = self.packed
            ci = x.shape[-1] // p
            cdt = self.policy.compute_dtype
            if params_only:
                # fused block kernel reads the raw params + BN stats
                # (+ the calibrated input scale on the int8 path)
                kernel, cbias = conv(x, params_only=True)
                dummy = jnp.zeros((1, 1, 1, p * self.features), cdt)
                scale, bbias, mean, var = bn(
                    dummy, train=train, params_only=True
                )
                sx = None
                if self.policy.quant_eval and not self.is_initializing():
                    if not self.has_variable("quant", "act_scale"):
                        raise ValueError(
                            "quant_eval=True but no calibrated 'quant' "
                            "collection — run ubresnet_tpu.ops.quant."
                            "calibrate() first"
                        )
                    sx = self.get_variable("quant", "act_scale")
                return kernel, cbias, scale, bbias, mean, var, sx
            pe = _p_eff(p, ci, x.shape[2] * p)
            if (
                self.policy.quant_eval
                and not train
                and not self.is_initializing()
            ):
                # int8 PTQ eval (ops/quant.py): s8×s8→s32 packed conv,
                # dequantized into the BN fold. Weights quantize
                # in-graph from the f32 params; only the calibrated
                # activation scale is read from the 'quant' collection.
                if not self.has_variable("quant", "act_scale"):
                    raise ValueError(
                        "quant_eval=True but no calibrated 'quant' "
                        "collection — run ubresnet_tpu.ops.quant."
                        "calibrate() first"
                    )
                from ubresnet_tpu.ops.packed import packed_conv
                from ubresnet_tpu.ops.quant import (
                    quantize_act,
                    quantize_weight,
                    weight_scales,
                )

                sx = self.get_variable("quant", "act_scale")
                kernel, cbias = conv(x, params_only=True)
                sw = weight_scales(kernel)
                use_fused_q = (
                    self.policy.fused_eval
                    and self.stride == 1
                    and ci * pe >= 128
                    and 2 * (self.kernel // 2) * ci <= 128
                )
                if use_fused_q:
                    # int8 Pallas fused conv: same halo-matmul kernel
                    # as the bf16 zone with s8×s8→s32 MXU passes (2x
                    # the bf16 rate); dequant (sx·sw) folds into the
                    # BN gain so the epilogue is unchanged.
                    from ubresnet_tpu.ops.packed import (
                        tile_channel_vector,
                    )
                    from ubresnet_tpu.ops.pallas_conv import (
                        fused_packed_conv,
                    )

                    dummy = jnp.zeros((1, 1, 1, p * self.features), cdt)
                    scale, bbias, mean, var = bn(
                        dummy, train=False, params_only=True
                    )
                    g, beta = fold_bn(scale, bbias, mean, var, cbias,
                                      eps=bn.epsilon)
                    y = fused_packed_conv(
                        _repack(quantize_act(x, sx), p, pe),
                        quantize_weight(kernel, sw),
                        tile_channel_vector(g * sw * sx, pe),
                        tile_channel_vector(beta, pe),
                        p=pe,
                        residual=(
                            _repack(residual.astype(cdt), p, pe)
                            if residual is not None
                            else None
                        ),
                        pre_act=self.act if residual is not None else False,
                        act=True if residual is not None else self.act,
                        out_dtype=cdt,
                        interpret=jax.default_backend() != "tpu",
                    )
                    return _repack(y, pe, p)
                y = packed_conv(
                    quantize_act(x, sx),
                    quantize_weight(kernel, sw),
                    p,
                    self.stride,
                    preferred=jnp.int32,
                )
                y = y.astype(jnp.float32) * (sx * jnp.tile(sw, p))
                if cbias is not None:
                    y = y + jnp.tile(cbias.astype(jnp.float32), p)
                y = bn(y.astype(cdt), train=False)
                if self.act:
                    y = nn.relu(y)
                if residual is not None:
                    y = nn.relu(y + residual)
                return y
            use_fused_train = (
                self.policy.fused_train
                and train
                and not self.is_initializing()
                and self.stride == 1
                and _train_conv_ok(pe, self.kernel, ci, self.features)
            )
            if use_fused_train:
                # Stats-decoupled Pallas train path: the conv kernel
                # emits Σy/Σy² alongside y (ops/pallas_train.py), BN
                # normalises from those vectors, and the remaining
                # tail (affine, ReLU, residual join) is elementwise
                # XLA — no XLA conv or reduction touches the packed
                # zone's activations in forward or backward.
                from ubresnet_tpu.ops.pallas_train import train_conv_stats

                kernel, cbias = conv(x, params_only=True)
                y, s1, s2 = train_conv_stats(
                    _repack(x.astype(cdt), p, pe),
                    kernel.astype(cdt),
                    cbias.astype(jnp.float32) if cbias is not None else None,
                    pe,
                    jax.default_backend() != "tpu",
                )
                y = _repack(y, pe, p)
                co = self.features
                n = y.shape[0] * y.shape[1] * y.shape[2] * p
                y = bn(
                    y,
                    train=True,
                    stats=(
                        s1.reshape(pe, co).sum(0),
                        s2.reshape(pe, co).sum(0),
                        n,
                    ),
                )
                if self.act:
                    y = nn.relu(y)
                if residual is not None:
                    y = nn.relu(y + residual)
                return y
            use_fused = (
                self.policy.fused_eval
                and not train
                and not self.is_initializing()
                and self.stride == 1
                and ci * pe >= 128
                and 2 * (self.kernel // 2) * ci <= 128
            )
            if use_fused:
                from ubresnet_tpu.ops.packed import tile_channel_vector
                from ubresnet_tpu.ops.pallas_conv import fused_packed_conv

                kernel, cbias = conv(x, params_only=True)
                dummy = jnp.zeros((1, 1, 1, p * self.features), cdt)
                scale, bbias, mean, var = bn(
                    dummy, train=train, params_only=True
                )
                g, beta = fold_bn(scale, bbias, mean, var, cbias,
                                  eps=bn.epsilon)
                y = fused_packed_conv(
                    _repack(x.astype(cdt), p, pe),
                    kernel.astype(cdt),
                    tile_channel_vector(g, pe),
                    tile_channel_vector(beta, pe),
                    p=pe,
                    residual=(
                        _repack(residual.astype(cdt), p, pe)
                        if residual is not None
                        else None
                    ),
                    pre_act=self.act if residual is not None else False,
                    act=True if residual is not None else self.act,
                    interpret=jax.default_backend() != "tpu",
                )
                return _repack(y, pe, p)
            y = conv(x)
            y = bn(y, train=train)
            if self.act:
                y = nn.relu(y)
            if residual is not None:
                y = nn.relu(y + residual)
            return y
        if residual is not None:
            y = self._unpacked(x, train)
            return nn.relu(y + residual)
        return self._unpacked(x, train)

    def _unpacked(self, x, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.dilation * (self.kernel // 2),) * 2] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=msra_normal(),
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="bn",
        )(x)
        if self.act:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """Two 3x3 conv-BN-ReLU + projection bypass.

    Matches /root/reference/models/common_layers.py:18-58 including the
    pre-add ReLU on the residual branch. The 1x1 projection (+BN) is
    instantiated only when channels or stride change.
    """

    features: int
    stride: int = 1
    packed: int = 0
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, *, train: bool, dual=None):
        """``dual``: optional second input stream — the block then acts
        on the implicit channel-concat [x, dual] (the decoder skip
        join). On the fused eval path the concat never materialises
        (ops/pallas_conv.py:fused_dual_block); otherwise it falls back
        to an explicit concat. Parameter shapes are identical either
        way (conv kernels carry the concat width)."""
        p = self.packed
        pol = self.policy
        c_x = x.shape[-1] // (p or 1)
        c_d = dual.shape[-1] // (p or 1) if dual is not None else 0
        inp = c_x + c_d
        has_bypass = inp != self.features or self.stride > 1
        cb1 = ConvBN(self.features, 3, self.stride, packed=p,
                     policy=pol, name="cb1")
        bypass = (
            ConvBN(self.features, 1, self.stride, act=False, packed=p,
                   policy=pol, name="bypass")
            if has_bypass
            else None
        )
        cb2 = ConvBN(self.features, 3, 1, packed=p, policy=pol, name="cb2")

        fused_ok = (
            p > 0
            and pol.fused_eval
            and not train
            and not self.is_initializing()
            and self.stride == 1
            and 2 * self.features <= 128
            # QAT eval stays on the per-ConvBN path: the whole-block
            # kernel keeps its intermediate in VMEM, which would skip
            # the mid-block fake-quant that quant_train models.
            and not pol.quant_train
        )
        pe = _p_eff(p, c_x, x.shape[2] * p) if p else p

        def _block_fits(pcia, pcib):
            # whole-plane spatial inputs (wholeview --spatial) can
            # exceed scoped VMEM even at the minimum row tile — the
            # block kernels tile over rows only. Such shapes stay on
            # the per-ConvBN path (ops/pallas_conv.block_kernel_fits).
            from ubresnet_tpu.ops.pallas_conv import block_kernel_fits

            nbo = jnp.dtype(pol.compute_dtype).itemsize
            nb = 1 if pol.quant_eval else nbo
            return block_kernel_fits(
                x.shape[1], x.shape[2] * p // pe, pcia, pcib,
                pe * self.features, nb, nbo,
            )

        # Whole-block Pallas kernel (eval): conv1+BN+ReLU, conv2+BN+
        # pre-ReLU, bypass projection, residual add, ReLU — one HBM
        # read + one write for the entire block (ops/pallas_conv.py).
        use_dual = (
            fused_ok
            and dual is not None
            and has_bypass  # fused_dual_block hardcodes the 1x1 projection
            and c_x == c_d
            and c_x * pe >= 128
            and 2 * c_x <= 128
            and self.features * pe >= 128
            and _block_fits(pe * c_x, pe * c_d)
        )
        use_block = (
            fused_ok
            and dual is None
            and inp * pe >= 128
            and 2 * inp <= 128
            and self.features * pe >= 128
            and _block_fits(pe * inp, 0)
        )
        if use_dual or use_block:
            from ubresnet_tpu.ops.packed import tile_channel_vector
            from ubresnet_tpu.ops.pallas_conv import (
                fused_basic_block,
                fused_dual_block,
            )

            def fold(parts):
                kernel, cbias, scale, bbias, mean, var, _ = parts
                g, beta = fold_bn(scale, bbias, mean, var, cbias)
                return (
                    kernel,
                    tile_channel_vector(g, pe),
                    tile_channel_vector(beta, pe),
                )

            cdt = pol.compute_dtype
            interp = jax.default_backend() != "tpu"
            dummy_in = jnp.zeros((1, 1, 1, p * inp), cdt)
            dummy_mid = jnp.zeros((1, 1, 1, p * self.features), cdt)
            parts1 = cb1(dummy_in, train=train, params_only=True)
            parts2 = cb2(dummy_mid, train=train, params_only=True)
            partsb = (
                bypass(dummy_in, train=train, params_only=True)
                if has_bypass
                else None
            )
            if pol.quant_eval:
                # int8 whole-block: same fused kernels with s8×s8→s32
                # MXU passes; the intermediate requantizes in VMEM on
                # conv2's calibrated grid (s_mid), so the caller folds
                # the dequant chain into the affines — see
                # ops/pallas_conv.py:_block_kernel int8 docstring.
                from ubresnet_tpu.ops.quant import (
                    quantize_act,
                    quantize_weight,
                    weight_scales,
                )

                sx1, s_mid = parts1[-1], parts2[-1]

                def fold_q(parts, s_in, s_out=None):
                    kernel, cbias, scale, bbias, mean, var, _ = parts
                    g, beta = fold_bn(scale, bbias, mean, var, cbias)
                    g = g * (s_in * weight_scales(kernel))
                    if s_out is not None:
                        g, beta = g / s_out, beta / s_out
                    return (
                        quantize_weight(kernel, weight_scales(kernel)),
                        tile_channel_vector(g, pe),
                        tile_channel_vector(beta, pe),
                    )

                k1, g1, b1 = fold_q(parts1, sx1, s_mid)
                k2, g2, b2 = fold_q(parts2, s_mid)
                if has_bypass:
                    kb, gb, bb = fold_q(partsb, sx1)
                else:
                    # identity bypass: the kernel still dequants the
                    # quantized input via the affine (sx1·xq + 0)
                    kb = None
                    gb = tile_channel_vector(
                        sx1 * jnp.ones((self.features,), jnp.float32), pe
                    )
                    bb = tile_channel_vector(
                        jnp.zeros((self.features,), jnp.float32), pe
                    )
                xq = _repack(quantize_act(x, sx1), p, pe)
                if use_dual:
                    # calibration saw the explicit concat, so ONE
                    # scale (sx1) covers both streams
                    return _repack(
                        fused_dual_block(
                            xq,
                            _repack(quantize_act(dual, sx1), p, pe),
                            k1, g1, b1, k2, g2, b2, kb, gb, bb,
                            p=pe, out_dtype=cdt, interpret=interp,
                        ),
                        pe,
                        p,
                    )
                return _repack(
                    fused_basic_block(
                        xq, k1, g1, b1, k2, g2, b2, kb, gb, bb,
                        p=pe, out_dtype=cdt, interpret=interp,
                    ),
                    pe,
                    p,
                )
            k1, g1, b1 = fold(parts1)
            k2, g2, b2 = fold(parts2)
            if use_dual:
                kb, gb, bb = fold(partsb)
                return _repack(
                    fused_dual_block(
                        _repack(x.astype(cdt), p, pe),
                        _repack(dual.astype(cdt), p, pe),
                        k1.astype(cdt), g1, b1,
                        k2.astype(cdt), g2, b2,
                        kb.astype(cdt), gb, bb,
                        p=pe,
                        interpret=interp,
                    ),
                    pe,
                    p,
                )
            kb = gb = bb = None
            if has_bypass:
                kb, gb, bb = fold(partsb)
            return _repack(
                fused_basic_block(
                    _repack(x.astype(cdt), p, pe),
                    k1.astype(cdt), g1, b1,
                    k2.astype(cdt), g2, b2,
                    kb.astype(cdt) if kb is not None else None, gb, bb,
                    p=pe,
                    interpret=interp,
                ),
                pe,
                p,
            )

        if dual is not None:  # explicit concat fallback
            if p:
                from ubresnet_tpu.ops.packed import packed_concat

                x = packed_concat(x, dual.astype(x.dtype), p)
            else:
                x = jnp.concatenate([x, dual.astype(x.dtype)], axis=-1)
        y = cb1(x, train=train)
        if has_bypass:
            x = bypass(x, train=train)
        # cb2 carries the block tail (pre-add ReLU, +bypass, ReLU) so
        # the packed eval path fuses it into the conv epilogue.
        return cb2(y, train=train, residual=x)


class DoubleResNet(nn.Module):
    """Two stacked BasicBlocks (common_layers.py:109-120)."""

    features: int
    stride: int = 1
    packed: int = 0
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, *, train: bool, dual=None):
        x = BasicBlock(self.features, self.stride, packed=self.packed,
                       policy=self.policy, name="res1")(
            x, train=train, dual=dual)
        x = BasicBlock(self.features, 1, packed=self.packed,
                       policy=self.policy, name="res2")(x, train=train)
        return x


class Deconv2x(nn.Module):
    """Torch-equivalent ConvTranspose2d(k=4, s=2, p=1, bias=False).

    Implemented as an input-dilated convolution: dilate the input by the
    stride, convolve with the spatially-flipped kernel. Per-axis padding
    is derived statically from ``target_hw`` so any output size torch
    could reach via ``output_size=skip.size()`` (common_layers.py:128)
    compiles to a fixed-shape XLA op.

    Kernel param layout is (kh, kw, cin, cout) — a torch ConvTranspose2d
    weight (cin, cout, kh, kw) imports via transpose(2, 3, 0, 1).
    """

    features: int
    packed: int = 0
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, target_hw: Optional[Tuple[int, int]] = None,
                 *, train: bool = False):
        if self.policy.quant_calib and not self.is_initializing():
            # int8 PTQ calibration (ops/quant.py): like ConvBN, record
            # the running input range of this deconv so eval can ride
            # the MXU's s8×s8→s32 mode across the decoder too.
            from ubresnet_tpu.ops.quant import calib_batch_range

            qs = self.variable(
                "quant", "act_scale", lambda: jnp.zeros((), jnp.float32)
            )
            qs.value = jnp.maximum(
                qs.value,
                calib_batch_range(x, self.policy.quant_percentile)
                / 127.0,
            )
        if self.packed:
            from ubresnet_tpu.ops.packed import packed_deconv2x

            p = self.packed
            cin = x.shape[-1] // p
            kernel = self.param(
                "kernel", msra_normal(), (4, 4, cin, self.features),
                self.policy.param_dtype,
            )
            if self.policy.quant_train and not self.is_initializing():
                # QAT: mirror the deconv quant_eval path — fake-quant
                # both the input and the kernel (ops/quant.py STEs).
                from ubresnet_tpu.ops.quant import (
                    fake_quant_act,
                    fake_quant_weight,
                )

                x = fake_quant_act(x, self.policy.quant_percentile)
                kernel = fake_quant_weight(kernel)
            th = target_hw[0] if target_hw is not None else 2 * x.shape[1]
            if target_hw is not None and target_hw[1] != 2 * x.shape[2] * p:
                raise ValueError("packed deconv requires exact 2x width")
            cdt = self.policy.compute_dtype
            pe = _p_eff(p, cin, x.shape[2] * p)
            if (
                self.policy.quant_eval
                and not train
                and not self.is_initializing()
            ):
                # int8 PTQ eval: quantize input + kernel (bias-free, no
                # BN → the epilogue is a pure dequant multiply sx·sw).
                from ubresnet_tpu.ops.packed import tile_channel_vector
                from ubresnet_tpu.ops.quant import (
                    quantize_act,
                    quantize_weight,
                    weight_scales,
                )

                if not self.has_variable("quant", "act_scale"):
                    raise ValueError(
                        "quant_eval=True but no calibrated 'quant' "
                        "collection — run ubresnet_tpu.ops.quant."
                        "calibrate() first"
                    )
                sx = self.get_variable("quant", "act_scale")
                sw = weight_scales(kernel)
                xq = quantize_act(x, sx)
                wq = quantize_weight(kernel, sw)
                if (
                    self.policy.fused_eval
                    and th == 2 * x.shape[1]
                    and cin * pe >= 128
                    and 2 * cin <= 128
                ):
                    from ubresnet_tpu.ops.pallas_conv import (
                        fused_packed_deconv2x,
                    )

                    y = fused_packed_deconv2x(
                        _repack(xq, p, pe),
                        wq,
                        tile_channel_vector(sw * sx, 2 * pe),
                        p=pe,
                        out_dtype=cdt,
                        interpret=jax.default_backend() != "tpu",
                    )
                    return _repack(y, pe, p)
                y = packed_deconv2x(
                    xq, wq, p, target_h=th, preferred=jnp.int32
                )
                return (
                    y.astype(jnp.float32)
                    * tile_channel_vector(sw * sx, p)
                ).astype(cdt)
            # Pallas deconv (no BN/bias → train/eval math identical):
            # eval uses the forward-only kernel; training uses the
            # custom-VJP variant (Pallas on all three legs) when the
            # shape fits, keeping the packed train zone XLA-conv-free.
            if (
                not self.is_initializing()
                and th == 2 * x.shape[1]
                and cin * pe >= 128
                and 2 * cin <= 128
            ):
                from ubresnet_tpu.ops.pallas_conv import (
                    deconv_ad_supported,
                    fused_packed_deconv2x,
                    pallas_deconv2x_ad,
                )

                interp = jax.default_backend() != "tpu"
                if self.policy.fused_eval and not train:
                    y = fused_packed_deconv2x(
                        _repack(x.astype(cdt), p, pe),
                        kernel.astype(cdt),
                        p=pe,
                        interpret=interp,
                    )
                    return _repack(y, pe, p)
                if (
                    self.policy.fused_train_deconv
                    and train
                    and deconv_ad_supported(pe, cin, self.features)
                ):
                    y = pallas_deconv2x_ad(
                        _repack(x.astype(cdt), p, pe),
                        kernel.astype(cdt),
                        pe,
                        interp,
                    )
                    return _repack(y, pe, p)
            return packed_deconv2x(
                x.astype(cdt), kernel.astype(cdt), p, target_h=th
            )
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", msra_normal(), (4, 4, cin, self.features), self.policy.param_dtype
        )
        h, w = x.shape[1], x.shape[2]
        th, tw = target_hw if target_hw is not None else (2 * h, 2 * w)
        # dilated length L = 2*d - 1; out = L + plo + phi - 4 + 1.
        # torch effective padding is k-1-p = 2 per side; deviations from
        # out == 2*in are absorbed in the high-side pad (torch
        # output_padding semantics).
        pads = []
        for d, t in ((h, th), (w, tw)):
            phi = t - (2 * d - 1) + 4 - 1 - 2
            if not (0 <= phi <= 3):
                raise ValueError(
                    f"deconv target size {t} unreachable from input {d} "
                    f"(torch output_padding would be {phi - 2})"
                )
            pads.append((2, phi))
        k = jnp.flip(kernel, (0, 1)).astype(self.policy.compute_dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.policy.compute_dtype),
            k,
            window_strides=(1, 1),
            padding=pads,
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class DecoderBlock(nn.Module):
    """Deconv ×2 upsample → concat skip → DoubleResNet.

    Reference: ConvTransposeLayer (common_layers.py:122-132). Skips are
    concatenated on the channel axis (last axis in NHWC).
    """

    deconv_features: int
    res_features: int
    packed: int = 0
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, skip, *, train: bool):
        if self.packed:
            up = Deconv2x(self.deconv_features, self.packed, self.policy,
                          name="deconv")(
                x, target_hw=(skip.shape[1], skip.shape[2] * self.packed),
                train=train,
            )
            # skip join rides the dual-stream path: BasicBlock res1
            # consumes (up, skip) as an implicit concat — fused eval
            # never materialises it; the fallback concats explicitly.
            return DoubleResNet(self.res_features, 1, packed=self.packed,
                                policy=self.policy, name="res")(
                up, train=train, dual=skip.astype(up.dtype))
        up = Deconv2x(self.deconv_features, policy=self.policy,
                      name="deconv")(
            x, target_hw=(skip.shape[1], skip.shape[2])
        )
        y = jnp.concatenate([up, skip.astype(up.dtype)], axis=-1)
        return DoubleResNet(self.res_features, 1, packed=self.packed,
                            policy=self.policy, name="res")(y, train=train)


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling (ASPP_ResNet.py:188-263).

    Four conv-BN-ReLU branches (1x1 d1, 3x3 d1, 3x3 d3, 3x3 d5 — each
    ``branch_features`` wide, biased convs) plus a 3x3 stride-1 maxpool
    branch that passes the input channels through; concatenated on the
    channel axis. All branches read the same input: XLA fuses the
    elementwise tails and the branches execute as independent MXU convs.
    """

    branch_features: int = 16
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, *, train: bool):
        outs = []
        for name, kernel, dil in (
            ("b1", 1, 1),
            ("b2", 3, 1),
            ("b3", 3, 3),
            ("b4", 3, 5),
        ):
            outs.append(
                ConvBN(
                    self.branch_features,
                    kernel,
                    1,
                    dilation=dil,
                    use_bias=True,
                    policy=self.policy,
                    name=name,
                )(x, train=train)
            )
        # 3x3 stride-1 maxpool branch, channels preserved.
        pooled = nn.max_pool(
            x, window_shape=(3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)]
        )
        outs.append(pooled.astype(outs[0].dtype))
        return jnp.concatenate(outs, axis=-1)


class ASPPCombine(nn.Module):
    """1x1 conv-BN-ReLU recompression after ASPP (ASPP_ResNet.py:266-286)."""

    features: int
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, *, train: bool):
        return ConvBN(
            self.features, 1, 1, use_bias=True, policy=self.policy, name="post"
        )(x, train=train)


def stem_pool(x, ad: bool = False):
    """3x3 stride-2 maxpool with pad 1 (torch MaxPool2d(3, 2, 1)).

    Torch pads with -inf conceptually (ignores padding in the max);
    ``nn.max_pool`` with explicit padding uses -inf identity, matching.
    ``ad`` swaps in the dense-backward custom VJP (ops/pool_ad.py) —
    bit-identical forward and tie routing, no SelectAndScatterAdd in
    the training graph."""
    if ad and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        from ubresnet_tpu.ops.pool_ad import maxpool3x3s2_ad

        return maxpool3x3s2_ad(x)
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def stem_pool_packed(x0, p_stem: int, p_out: int, pol: Policy,
                     *, fused: bool):
    """Stem 3x3/s2 maxpool on a W-packed tensor, re-viewed to the next
    stage's pack factor. ``fused`` (caller decides: eval mode, not
    initializing) routes through the Pallas pool kernel when the stem
    runs exactly one lane tile; otherwise unpack → XLA pool → pack.
    Shared by UResNet and ASPP_ResNet."""
    from ubresnet_tpu.ops.packed import pack, unpack

    if (
        fused
        and x0.shape[-1] == 128
        and x0.shape[1] % 2 == 0
        and x0.shape[2] % 2 == 0
    ):
        from ubresnet_tpu.ops.pallas_conv import fused_pool3x3s2

        y = fused_pool3x3s2(
            x0, p=p_stem, interpret=jax.default_backend() != "tpu"
        )
        return _repack(y, p_stem, p_out)
    if (
        pol.fused_train
        and x0.shape[-1] == 128
        and x0.shape[1] % 2 == 0
        and x0.shape[2] % 2 == 0
    ):
        # train: Pallas pool forward (the unpacked XLA pool runs C=16
        # tensors at 1/8 lane occupancy) + dense parity-grid backward
        # on unpacked reshape views (ops/pool_ad.py)
        from ubresnet_tpu.ops.pool_ad import packed_pool_ad

        y = packed_pool_ad(x0, p_stem, jax.default_backend() != "tpu")
        return _repack(y, p_stem, p_out)
    return pack(stem_pool(unpack(x0, p_stem), ad=pol.fused_train), p_out)


def classifier_apply(clf, y, num_classes: int, p: int, pol: Policy,
                     *, fused: bool):
    """Apply a packed 7x7 classifier conv (a PackedConv module the
    caller owns, so checkpoint param names are unchanged), fusing into
    the Pallas conv kernel when ``fused``. A fused log-softmax epilogue
    was measured and REJECTED: the 3-lane roll reduction serialises the
    epilogue (529 vs 688 crops/s model-wide on the real chip).
    Shared by UResNet and ASPP_ResNet."""
    ci_head = y.shape[-1] // p
    if fused and y.shape[-1] >= 128 and 2 * 3 * ci_head <= 128:
        from ubresnet_tpu.ops.packed import tile_channel_vector
        from ubresnet_tpu.ops.pallas_conv import fused_packed_conv

        kernel, cbias = clf(y, params_only=True)
        cdt = pol.compute_dtype
        return fused_packed_conv(
            y.astype(cdt),
            kernel.astype(cdt),
            jnp.ones((p * num_classes,), jnp.float32),
            tile_channel_vector(cbias.astype(jnp.float32), p),
            p=p,
            act=False,
            interpret=jax.default_backend() != "tpu",
        )
    return clf(y)
