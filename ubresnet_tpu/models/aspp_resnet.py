"""ASPP-ResNet — U-ResNet with Atrous Spatial Pyramid Pooling skips.

Capability-parity rebuild of /root/reference/models/ASPP_ResNet.py:289-523.
Shares the U-ResNet skeleton; at encoder stages 3/4/5 an ASPP module
(4 atrous conv branches + maxpool pass-through, ASPP_ResNet.py:188-263)
followed by a 1x1 recompression (ln 266-286) is concatenated with the
raw encoder feature to form widened skips:

  e3_skip = cat(combine(ASPP(e3)) -> 8p,  e3)  = 16p channels
  e4_skip = cat(combine(ASPP(e4)) -> 16p, e4)  = 32p channels
  e5_skip = cat(combine(ASPP(e5)) -> 32p, e5)  = 64p channels

Decoder channel plan (ASPP_ResNet.py:361-375):

  dec5: 64p -> deconv 16p, cat e4_skip(32p), res -> 32p
  dec4: 32p -> deconv 8p,  cat e3_skip(16p), res -> 16p
  dec3: 16p -> deconv 4p,  cat e2(4p),       res -> 4p
  dec2: 4p  -> deconv 2p,  cat e1(2p),       res -> 2p
  dec1: 2p  -> deconv p,   cat x0(p),        res -> p

(The reference's conv11 in-channel bug at ASPP_ResNet.py:386 — inplanes
vs nkernels — cannot occur here: flax infers input channels.)
"""
from __future__ import annotations

import dataclasses

from flax import linen as nn
import jax.numpy as jnp

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models.blocks import (
    ASPP,
    ASPPCombine,
    ConvBN,
    DecoderBlock,
    DoubleResNet,
    stem_pool,
)


@dataclasses.dataclass(frozen=True)
class ASPPResNetConfig:
    num_classes: int = 3
    input_channels: int = 1
    inplanes: int = 16
    final_conv_kernels: int = 16
    aspp_branch_features: int = 16


class ASPPResNet(nn.Module):
    """NHWC ASPP-ResNet. Input (b, h, w, c); output (b, h, w, classes)."""

    config: ASPPResNetConfig = ASPPResNetConfig()
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, *, train: bool = False, logits: bool = False):
        cfg = self.config
        pol = self.policy
        p = cfg.inplanes

        # W-packed low-channel stages (stem/enc1/dec2/dec1/head), as in
        # UResNet — the ASPP stages are wide and stay unpacked.
        pw = pol.pack_width
        use_pack = pw > 1 and x.shape[2] % (2 * pw) == 0
        if use_pack:
            from ubresnet_tpu.ops.packed import pack, unpack

        xin = x.astype(pol.compute_dtype)
        if use_pack:
            from ubresnet_tpu.models.blocks import stem_pool_packed

            x0 = ConvBN(p, 7, 1, use_bias=True, packed=pw, policy=pol,
                        name="stem")(pack(xin, pw), train=train)
            y = stem_pool_packed(
                x0, pw, pw, pol,
                fused=(pol.fused_eval and not train
                       and not self.is_initializing()),
            )
        else:
            x0 = ConvBN(p, 7, 1, use_bias=True, policy=pol, name="stem")(
                xin, train=train
            )
            y = stem_pool(x0, ad=pol.fused_train)

        # Stage rematerialization (Policy.remat), as in UResNet: the
        # (module, *tensors) closure keeps parameter paths unchanged.
        use_remat = pol.remat and train

        def _stage(mdl, *xs):
            return mdl(*xs, train=train)

        stage_call = nn.remat(_stage) if use_remat else _stage

        encs = []
        for i in range(5):
            feats = p * (2 ** (i + 1))
            stride = 1 if i == 0 else 2
            stage_packed = pw if (use_pack and i == 0) else 0
            y = stage_call(
                DoubleResNet(feats, stride, packed=stage_packed, policy=pol,
                             name=f"enc{i + 1}"), y)
            encs.append(y)
            if use_pack and i == 0:
                y = unpack(y, pw)
        e1, e2, e3, e4, e5 = encs

        def widen(e, feats, name):
            # the ASPP pyramid's four dilated branches are the widest
            # activations at these stages — prime remat targets
            a = stage_call(
                ASPP(cfg.aspp_branch_features, policy=pol,
                     name=f"aspp{name}"), e)
            a = stage_call(
                ASPPCombine(feats, policy=pol, name=f"aspp{name}_post"), a)
            return jnp.concatenate([a, e.astype(a.dtype)], axis=-1)

        e3_skip = widen(e3, p * 8, "3")
        e4_skip = widen(e4, p * 16, "4")
        e5_skip = widen(e5, p * 32, "5")

        y = stage_call(
            DecoderBlock(p * 16, p * 32, policy=pol, name="dec5"),
            e5_skip, e4_skip)
        y = stage_call(
            DecoderBlock(p * 8, p * 16, policy=pol, name="dec4"),
            y, e3_skip)
        y = stage_call(
            DecoderBlock(p * 4, p * 4, policy=pol, name="dec3"), y, e2)
        if use_pack:
            y = pack(y, pw)
        dp = pw if use_pack else 0
        y = stage_call(
            DecoderBlock(p * 2, p * 2, packed=dp, policy=pol, name="dec2"),
            y, e1)
        y = stage_call(
            DecoderBlock(p, p, packed=dp, policy=pol, name="dec1"),
            y, x0)

        y = ConvBN(
            cfg.final_conv_kernels, 7, 1, use_bias=True, packed=dp,
            policy=pol, name="head"
        )(y, train=train)
        if use_pack:
            from ubresnet_tpu.models.blocks import (
                PackedConv,
                classifier_apply,
            )

            clf = PackedConv(cfg.num_classes, 7, 1, True, pw, pol,
                             name="classifier")
            y = classifier_apply(
                clf, y, cfg.num_classes, pw, pol,
                fused=(pol.fused_eval and not train
                       and not self.is_initializing()),
            )
            y = unpack(y, pw)
        else:
            y = nn.Conv(
                cfg.num_classes,
                (7, 7),
                padding=[(3, 3), (3, 3)],
                use_bias=True,
                dtype=pol.compute_dtype,
                param_dtype=pol.param_dtype,
                name="classifier",
            )(y)
        y = y.astype(pol.output_dtype)
        if logits:
            return y
        return nn.log_softmax(y, axis=-1)
