"""U-ResNet — the flagship MicroBooNE SSNet model, TPU-native.

Capability-parity rebuild of /root/reference/models/ub_uresnet.py:29-147
(U-Net with ResNet BasicBlocks):

  stem:    7x7 conv(bias) → BN → ReLU → 3x3 maxpool s2
  encoder: 5 × DoubleResNet, channels ×2 per stage, strides 1,2,2,2,2
           (inplanes → 32·inplanes)
  decoder: 5 × (deconv k4 s2 → concat skip → DoubleResNet)
  head:    7x7 conv → BN → ReLU → 7x7 conv → log-softmax over classes

Differences from the reference implementation (not behavior):
NHWC layout, bfloat16 MXU compute with float32 params/stats, static
deconv padding in place of torch's dynamic ``output_size``, and a
``logits`` escape hatch so the fused loss kernel can consume raw logits
(the reference always materialises LogSoftmax, ub_uresnet.py:70,143).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models.blocks import ConvBN, DecoderBlock, DoubleResNet, stem_pool


@dataclasses.dataclass(frozen=True)
class UResNetConfig:
    num_classes: int = 3
    input_channels: int = 1
    inplanes: int = 16
    final_conv_kernels: int = 16
    depth: int = 5  # encoder/decoder stages


class UResNet(nn.Module):
    """NHWC U-ResNet. Input (b, h, w, c); output (b, h, w, num_classes)."""

    config: UResNetConfig = UResNetConfig()
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, *, train: bool = False, logits: bool = False):
        cfg = self.config
        pol = self.policy

        # W-packed execution of the low-channel high-res stages (stem,
        # enc1, dec2, dec1, head): see ops/packed.py. Exact same math
        # and parameters; tensors carry the stage's pack-factor columns
        # folded into channels so TPU tiles stay lane-full. The pack
        # factor is PER STAGE: p = 128 // channels (capped by the
        # policy), so 16-channel stages run p=8 and 32-channel stages
        # p=4 — both fill the 128 lanes, but the dense packed kernel's
        # FLOP inflation is p, so halving p on the 32-channel stages
        # halves their MXU work. Transitions between pack factors are
        # pure reshapes in row-major layout.
        pmax = pol.pack_width

        def p_for(c):
            return max(1, min(pmax, 128 // c))

        p_stem = p_for(cfg.inplanes)
        p_enc1 = p_for(2 * cfg.inplanes)
        use_pack = (
            pmax > 1 and x.shape[2] % (2 * p_stem) == 0 and cfg.depth == 5
        )
        if use_pack:
            from ubresnet_tpu.ops.packed import pack, unpack

        xin = x.astype(pol.compute_dtype)
        if use_pack:
            from ubresnet_tpu.models.blocks import stem_pool_packed

            x0 = ConvBN(cfg.inplanes, 7, 1, use_bias=True, packed=p_stem,
                        policy=pol, name="stem")(pack(xin, p_stem),
                                                 train=train)
            y = stem_pool_packed(
                x0, p_stem, p_enc1, pol,
                fused=(pol.fused_eval and not train
                       and not self.is_initializing()),
            )
        else:
            # Stem (ub_uresnet.py:41-44): 7x7 conv + BN + ReLU, pool.
            x0 = ConvBN(cfg.inplanes, 7, 1, use_bias=True, policy=pol,
                        name="stem")(xin, train=train)
            y = stem_pool(x0, ad=pol.fused_train)

        # Stage rematerialization (Policy.remat): each encoder/decoder
        # stage recomputes its internals on the backward pass; only
        # the stage-boundary tensors (the skips — live anyway) are
        # saved. nn.remat on a (module, *tensors) function keeps the
        # parameter tree identical to the un-rematted model, so
        # checkpoints are interchangeable. `train` is closed over
        # (a static Python bool, never traced).
        use_remat = pol.remat and train

        def _stage(mdl, *xs):
            return mdl(*xs, train=train)

        stage_call = nn.remat(_stage) if use_remat else _stage

        # Encoder: stage i has inplanes * 2^i channels; stride 1 then 2s.
        skips = [x0]
        for i in range(cfg.depth):
            feats = cfg.inplanes * (2 ** (i + 1))
            stride = 1 if i == 0 else 2
            stage_packed = p_enc1 if (use_pack and i == 0) else 0
            y = stage_call(
                DoubleResNet(feats, stride, packed=stage_packed, policy=pol,
                             name=f"enc{i + 1}"), y)
            skips.append(y)
            if use_pack and i == 0:
                y = unpack(y, p_enc1)  # deeper stages run unpacked

        # Decoder: mirror stages; deconv halves channels, concat skip,
        # DoubleResNet back to the skip's width (ub_uresnet.py:52-56).
        for i in range(cfg.depth, 0, -1):
            feats = cfg.inplanes * (2 ** (i - 1))
            p_stage = p_for(feats) if (use_pack and i <= 2) else 0
            if use_pack and i == 2:
                y = pack(y, p_stage)  # re-enter the packed zone (dec2)
            elif use_pack and i == 1 and p_stage != p_for(2 * feats):
                # repack between dec2 and dec1 (pure reshape)
                y = pack(unpack(y, p_for(2 * feats)), p_stage)
            y = stage_call(
                DecoderBlock(feats, feats, packed=p_stage, policy=pol,
                             name=f"dec{i}"), y, skips[i - 1])

        # Head (ub_uresnet.py:58-66): conv10+BN+ReLU, conv11, log-softmax.
        p_head = p_for(cfg.final_conv_kernels) if use_pack else 0
        if use_pack and p_head != p_for(cfg.inplanes):
            y = pack(unpack(y, p_for(cfg.inplanes)), p_head)
        y = ConvBN(cfg.final_conv_kernels, 7, 1, use_bias=True,
                   packed=p_head, policy=pol, name="head")(
            y, train=train)
        if use_pack:
            from ubresnet_tpu.models.blocks import (
                PackedConv,
                classifier_apply,
            )

            clf = PackedConv(cfg.num_classes, 7, 1, True, p_head, pol,
                             name="classifier")
            y = classifier_apply(
                clf, y, cfg.num_classes, p_head, pol,
                fused=(pol.fused_eval and not train
                       and not self.is_initializing()),
            )
            y = unpack(y, p_head)
        else:
            y = nn.Conv(
                cfg.num_classes,
                (7, 7),
                padding=[(3, 3), (3, 3)],
                use_bias=True,
                kernel_init=_head_init(),
                dtype=pol.compute_dtype,
                param_dtype=pol.param_dtype,
                name="classifier",
            )(y)
        y = y.astype(pol.output_dtype)
        if logits:
            return y
        return nn.log_softmax(y, axis=-1)


def _head_init():
    from ubresnet_tpu.models.blocks import msra_normal

    return msra_normal()


def example_input(
    batch: int = 1, hw: Tuple[int, int] = (512, 512), channels: int = 1
):
    """Canonical inference shape: 512x512 single-channel ADC crops
    (models/dllee_ssnet2018.prototxt:3-7)."""
    return jnp.zeros((batch, hw[0], hw[1], channels), jnp.float32)
