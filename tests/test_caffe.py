"""Caffe executor tests: prototxt/caffemodel parsing, op semantics vs
torch, and the generated ssnet2018 graph."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ubresnet_tpu.models.ssnet2018 import ssnet2018_prototxt
from ubresnet_tpu.parity.caffe import (
    CaffeNet,
    bilinear_kernel,
    parse_caffemodel,
    parse_prototxt,
    write_caffemodel,
)


def test_parse_prototxt_basics():
    txt = """
    name: "tiny"
    input: "data"
    input_dim: 1
    input_dim: 2
    layer { name: "c" type: "Convolution" bottom: "data" top: "c"
      convolution_param { num_output: 4 kernel_size: 3 pad: 1 bias_term: false
        weight_filler { type: "msra" } } }
    layer { name: "r" type: "ReLU" bottom: "c" top: "c" }
    """
    net = parse_prototxt(txt)
    assert net["name"] == "tiny"
    assert net["input_dim"] == [1, 2]
    assert net["layer"][0]["convolution_param"]["num_output"] == 4
    assert net["layer"][0]["convolution_param"]["bias_term"] is False
    assert net["layer"][1]["type"] == "ReLU"


def test_caffemodel_roundtrip(tmp_path, rng):
    layers = {
        "conv0": [rng.randn(4, 1, 3, 3).astype(np.float32),
                  rng.randn(4).astype(np.float32)],
        "bn0": [rng.randn(4).astype(np.float32),
                np.abs(rng.randn(4)).astype(np.float32),
                np.ones(1, np.float32)],
    }
    path = str(tmp_path / "w.caffemodel")
    write_caffemodel(path, layers)
    back = parse_caffemodel(path)
    assert set(back) == set(layers)
    for name in layers:
        for a, b in zip(layers[name], back[name]):
            np.testing.assert_array_equal(a, b)


TINY = """
name: "tiny"
input: "data"
input_dim: 1
input_dim: 2
input_dim: 16
input_dim: 16
layer { name: "conv" type: "Convolution" bottom: "data" top: "conv"
  convolution_param { num_output: 6 kernel_size: 3 pad: 1 stride: 2
    weight_filler { type: "msra" } } }
layer { name: "bn" type: "BatchNorm" bottom: "conv" top: "conv" }
layer { name: "sc" type: "Scale" bottom: "conv" top: "conv"
  scale_param { bias_term: true } }
layer { name: "relu" type: "ReLU" bottom: "conv" top: "conv" }
layer { name: "pool" type: "Pooling" bottom: "conv" top: "pool"
  pooling_param { kernel_size: 3 stride: 2 pool: MAX } }
layer { name: "dec" type: "Deconvolution" bottom: "pool" top: "dec"
  convolution_param { num_output: 6 pad: 1 kernel_size: 4 group: 6 stride: 2
    weight_filler { type: "bilinear" } bias_filler { type: "constant" value: 0.0 } } }
layer { name: "cat" type: "Concat" bottom: "conv" bottom: "dec" top: "cat" }
layer { name: "elt" type: "Eltwise" bottom: "dec" bottom: "dec" top: "elt" }
layer { name: "softmax" type: "Softmax" bottom: "cat" top: "softmax" }
"""


def test_caffenet_executes_all_ops(rng):
    net = CaffeNet(TINY, seed=0)
    x = jnp.asarray(rng.rand(1, 16, 16, 2).astype(np.float32))
    out = net.forward(net.params, x)
    assert out["conv"].shape == (1, 8, 8, 6)
    assert out["pool"].shape == (1, 4, 4, 6)   # caffe ceil: (8-3)/2+1 -> 4
    assert out["dec"].shape == (1, 8, 8, 6)
    assert out["cat"].shape == (1, 8, 8, 12)
    np.testing.assert_allclose(
        np.asarray(out["elt"]), 2 * np.asarray(out["dec"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["softmax"]).sum(-1), 1.0, atol=1e-5
    )


def test_caffe_conv_and_bnscale_match_torch(rng):
    net = CaffeNet(TINY, seed=1)
    x = rng.rand(1, 2, 16, 16).astype(np.float32)
    w = net.params["conv"][0]  # (6, 2, 3, 3)
    bias = net.params["conv"][1]
    mean, var, sf = net.params["bn"]
    gamma, beta = net.params["sc"]

    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                   torch.from_numpy(bias), stride=2, padding=1)
    ref = F.batch_norm(ref, torch.from_numpy(mean / sf[0]),
                       torch.from_numpy(var / sf[0]),
                       torch.from_numpy(gamma), torch.from_numpy(beta),
                       training=False, eps=1e-5)
    ref = F.relu(ref).numpy()

    out = net.forward(net.params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(out["conv"]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_caffe_grouped_deconv_matches_torch(rng):
    """Grouped (per-channel bilinear) deconv: feed grouped weights in
    via the importer path, compare against torch grouped
    conv_transpose2d."""
    w_grouped = rng.randn(6, 1, 4, 4).astype(np.float32)
    bias = rng.randn(6).astype(np.float32)
    net = CaffeNet(TINY, weights={"dec": [w_grouped, bias]}, seed=2)
    assert net.params["dec"][0].shape == (6, 6, 4, 4)  # expanded dense

    pool = rng.rand(1, 6, 4, 4).astype(np.float32)
    ref = F.conv_transpose2d(torch.from_numpy(pool),
                             torch.from_numpy(w_grouped),
                             torch.from_numpy(bias),
                             stride=2, padding=1, groups=6).numpy()
    layer = dict(net._plan)["dec"]
    got = np.asarray(
        net._deconv(net.params["dec"], layer,
                    jnp.asarray(pool.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_caffe_ceil_pooling():
    """caffe pads/ceils differently from torch: 7->4 with k3 s2 p0
    (torch floor gives 3)."""
    txt = TINY.replace("input_dim: 16\ninput_dim: 16",
                       "input_dim: 15\ninput_dim: 15")
    net = CaffeNet(txt, seed=0)
    x = jnp.zeros((1, 15, 15, 2))
    out = net.forward(net.params, x)
    # conv s2 p1 k3: floor((15+2-3)/2)+1 = 8; pool ceil((8-3)/2)+1 = 4
    assert out["conv"].shape[1] == 8
    assert out["pool"].shape[1] == 4


def test_bilinear_kernel_values():
    k = bilinear_kernel(4)
    assert k.shape == (4, 4)
    np.testing.assert_allclose(k[1, 1], 0.5625)  # (0.75)^2 center
    np.testing.assert_allclose(k, k[::-1, ::-1])  # symmetric


def test_ssnet2018_generated_graph():
    net = CaffeNet(ssnet2018_prototxt(inplanes=4), seed=0)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 1), jnp.float32)
    out = net.forward(net.params, x)
    assert out["softmax"].shape == (1, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(out["softmax"]).sum(-1), 1.0,
                               atol=1e-5)
    # geometry: encoder bottom at /32, first deconv doubles
    assert out["res5b"].shape[1] == 2
    assert out["deconv0_deconv"].shape[1] == 4
    # res9 uses 5x5 branch convs (reference quirk)
    assert net.params["res9a_branch2a"][0].shape[-1] == 5


def test_ssnet2018_with_imported_weights(tmp_path):
    """write → parse → execute with real weight plumbing."""
    net0 = CaffeNet(ssnet2018_prototxt(inplanes=4), seed=7)
    path = str(tmp_path / "ssnet.caffemodel")
    write_caffemodel(path, net0.params)
    weights = parse_caffemodel(path)
    net1 = CaffeNet(ssnet2018_prototxt(inplanes=4), weights=weights, seed=0)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 1), jnp.float32)
    a = np.asarray(net0.forward(net0.params, x)["softmax"])
    b = np.asarray(net1.forward(net1.params, x)["softmax"])
    np.testing.assert_array_equal(a, b)
