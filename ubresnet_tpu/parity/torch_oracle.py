"""Torch-functional oracle of the reference UResNet.

A functional (state_dict-driven) evaluation of the reference
architecture (ub_uresnet.py / common_layers.py semantics) used two
ways: as the numerical oracle for checkpoint-import parity tests, and
as the PyTorch baseline engine for bench.py. It is NOT reference code —
it consumes the reference's *checkpoint format* and reproduces its
eval-mode math via torch.nn.functional.
"""
from __future__ import annotations

import numpy as np


def make_state_dict(rng, inplanes=16, in_ch=1, classes=3, final_kernels=None):
    """Random weights under the reference's state_dict key naming."""
    import torch

    fk = final_kernels if final_kernels is not None else inplanes

    def _t(*shape, scale=0.1):
        return torch.from_numpy(rng.randn(*shape).astype(np.float32) * scale)

    sd = {}

    def add_conv(key, cout, cin, k, bias=False):
        sd[f"{key}.weight"] = _t(cout, cin, k, k)
        if bias:
            sd[f"{key}.bias"] = _t(cout)

    def add_bn(key, c):
        import torch

        sd[f"{key}.weight"] = torch.from_numpy(
            (rng.rand(c) * 0.5 + 0.75).astype(np.float32)
        )
        sd[f"{key}.bias"] = _t(c)
        sd[f"{key}.running_mean"] = _t(c)
        sd[f"{key}.running_var"] = torch.from_numpy(
            (rng.rand(c) * 0.5 + 0.5).astype(np.float32)
        )

    def add_block(pref, cin, cout, stride):
        add_conv(f"{pref}.conv1", cout, cin, 3)
        add_bn(f"{pref}.bn1", cout)
        add_conv(f"{pref}.conv2", cout, cout, 3)
        add_bn(f"{pref}.bn2", cout)
        if cin != cout or stride > 1:
            add_conv(f"{pref}.bypass", cout, cin, 1)
            add_bn(f"{pref}.bnpass", cout)

    p = inplanes
    add_conv("conv1", p, in_ch, 7, bias=True)
    add_bn("bn1", p)
    chans = [p * 2**i for i in range(6)]
    for i in range(1, 6):
        stride = 1 if i == 1 else 2
        add_block(f"enc_layer{i}.res1", chans[i - 1], chans[i], stride)
        add_block(f"enc_layer{i}.res2", chans[i], chans[i], 1)
    for i in range(5, 0, -1):
        cin, cout = chans[i], chans[i - 1]
        sd[f"dec_layer{i}.deconv.weight"] = _t(cin, cout, 4, 4)  # IOHW
        add_block(f"dec_layer{i}.res.res1", 2 * cout, cout, 1)
        add_block(f"dec_layer{i}.res.res2", cout, cout, 1)
    add_conv("conv10", fk, p, 7, bias=True)
    add_bn("bn10", fk)
    add_conv("conv11", classes, fk, 7, bias=True)
    return sd


def torch_uresnet_eval(sd, x):
    """Eval-mode (running-stats BN) forward. x: torch (b, c, h, w)."""
    import torch
    import torch.nn.functional as F

    def bn(t, key):
        return F.batch_norm(
            t,
            sd[f"{key}.running_mean"],
            sd[f"{key}.running_var"],
            sd[f"{key}.weight"],
            sd[f"{key}.bias"],
            training=False,
            eps=1e-5,
        )

    def block(t, pref, stride):
        y = F.conv2d(t, sd[f"{pref}.conv1.weight"], stride=stride, padding=1)
        y = F.relu(bn(y, f"{pref}.bn1"))
        y = F.conv2d(y, sd[f"{pref}.conv2.weight"], padding=1)
        y = F.relu(bn(y, f"{pref}.bn2"))
        if f"{pref}.bypass.weight" in sd:
            t = bn(
                F.conv2d(t, sd[f"{pref}.bypass.weight"], stride=stride),
                f"{pref}.bnpass",
            )
        return F.relu(y + t)

    def double(t, pref, stride):
        return block(block(t, f"{pref}.res1", stride), f"{pref}.res2", 1)

    x = F.conv2d(x, sd["conv1.weight"], sd["conv1.bias"], padding=3)
    x0 = F.relu(bn(x, "bn1"))
    y = F.max_pool2d(x0, 3, 2, 1)
    skips = [x0]
    for i in range(1, 6):
        y = double(y, f"enc_layer{i}", 1 if i == 1 else 2)
        skips.append(y)
    for i in range(5, 0, -1):
        up = F.conv_transpose2d(
            y, sd[f"dec_layer{i}.deconv.weight"], stride=2, padding=1
        )
        y = double(torch.cat([up, skips[i - 1]], 1), f"dec_layer{i}.res", 1)
    y = F.relu(
        bn(F.conv2d(y, sd["conv10.weight"], sd["conv10.bias"], padding=3), "bn10")
    )
    y = F.conv2d(y, sd["conv11.weight"], sd["conv11.bias"], padding=3)
    return F.log_softmax(y, dim=1)
