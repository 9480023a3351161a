"""Numerical parity of primitive blocks vs torch functional ops.

These pin our NHWC/XLA formulations to the exact PyTorch semantics the
reference relies on (conv padding, transposed-conv output_size
resolution, BatchNorm eval statistics), using torch.nn.functional
directly as the oracle — no reference code involved.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models.blocks import BasicBlock, Deconv2x, stem_pool

F32 = Policy.f32()


def to_nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def test_deconv2x_matches_torch_convtranspose(rng):
    """Deconv2x == ConvTranspose2d(k=4, s=2, p=1, bias=False)."""
    cin, cout = 8, 4
    x = rng.randn(2, cin, 16, 16).astype(np.float32)
    w = rng.randn(cin, cout, 4, 4).astype(np.float32)

    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1)

    mod = Deconv2x(features=cout, policy=F32)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1))}}
    out = mod.apply(params, jnp.asarray(to_nhwc(x)))

    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref.numpy(), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("in_h,target_h", [(16, 32), (16, 31), (16, 33)])
def test_deconv2x_output_size_semantics(rng, in_h, target_h):
    """Static padding reproduces torch output_size= resolution."""
    cin, cout = 4, 4
    x = rng.randn(1, cin, in_h, in_h).astype(np.float32)
    w = rng.randn(cin, cout, 4, 4).astype(np.float32)

    ref = F.conv_transpose2d(
        torch.from_numpy(x),
        torch.from_numpy(w),
        stride=2,
        padding=1,
        output_padding=target_h - 2 * in_h + (0 if target_h >= 2 * in_h else 2),
    )
    if target_h < 2 * in_h:
        pytest.skip("torch cannot shrink below 2*in with output_padding")

    mod = Deconv2x(features=cout, policy=F32)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1))}}
    out = mod.apply(params, jnp.asarray(to_nhwc(x)), target_hw=(target_h, target_h))
    assert out.shape[1] == target_h
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref.numpy(), rtol=1e-4, atol=1e-4
    )


def test_stem_pool_matches_torch_maxpool(rng):
    x = rng.randn(2, 3, 17, 17).astype(np.float32) * 10
    ref = F.max_pool2d(torch.from_numpy(x), kernel_size=3, stride=2, padding=1)
    out = stem_pool(jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref.numpy(), rtol=1e-5, atol=1e-5
    )


def _torch_basic_block(x, p, stride, project):
    """Reference BasicBlock semantics via torch functional ops:
    two conv3x3-BN-ReLU, optional 1x1+BN projection, ReLU before AND
    after the residual add (common_layers.py:39-58)."""

    def bn(t, g, b):
        return F.batch_norm(t, None, None, g, b, training=True, eps=1e-5)

    y = F.conv2d(x, p["w1"], stride=stride, padding=1)
    y = F.relu(bn(y, p["g1"], p["b1"]))
    y = F.conv2d(y, p["w2"], padding=1)
    y = F.relu(bn(y, p["g2"], p["b2"]))
    if project:
        x = bn(F.conv2d(x, p["wp"], stride=stride), p["gp"], p["bp"])
    return F.relu(y + x)


@pytest.mark.parametrize("stride,cin,cout", [(1, 8, 8), (2, 8, 16), (1, 8, 16)])
def test_basic_block_matches_torch(rng, stride, cin, cout):
    x = rng.randn(2, cin, 16, 16).astype(np.float32)
    project = cin != cout or stride > 1

    tp = {
        "w1": torch.from_numpy(rng.randn(cout, cin, 3, 3).astype(np.float32) * 0.1),
        "g1": torch.from_numpy(rng.rand(cout).astype(np.float32) + 0.5),
        "b1": torch.from_numpy(rng.randn(cout).astype(np.float32) * 0.1),
        "w2": torch.from_numpy(rng.randn(cout, cout, 3, 3).astype(np.float32) * 0.1),
        "g2": torch.from_numpy(rng.rand(cout).astype(np.float32) + 0.5),
        "b2": torch.from_numpy(rng.randn(cout).astype(np.float32) * 0.1),
    }
    if project:
        tp["wp"] = torch.from_numpy(rng.randn(cout, cin, 1, 1).astype(np.float32) * 0.1)
        tp["gp"] = torch.from_numpy(rng.rand(cout).astype(np.float32) + 0.5)
        tp["bp"] = torch.from_numpy(rng.randn(cout).astype(np.float32) * 0.1)

    ref = _torch_basic_block(torch.from_numpy(x), tp, stride, project)

    def cb(w, g, b):
        return {
            "conv": {"kernel": jnp.asarray(w.numpy().transpose(2, 3, 1, 0))},
            "bn": {"scale": jnp.asarray(g.numpy()), "bias": jnp.asarray(b.numpy())},
        }

    params = {
        "cb1": cb(tp["w1"], tp["g1"], tp["b1"]),
        "cb2": cb(tp["w2"], tp["g2"], tp["b2"]),
    }
    if project:
        params["bypass"] = cb(tp["wp"], tp["gp"], tp["bp"])

    mod = BasicBlock(features=cout, stride=stride, policy=F32)
    init = mod.init(jax.random.PRNGKey(0), jnp.asarray(to_nhwc(x)), train=True)
    out, _ = mod.apply(
        {"params": params, "batch_stats": init["batch_stats"]},
        jnp.asarray(to_nhwc(x)),
        train=True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)),
        ref.numpy(),
        rtol=2e-3,
        atol=2e-3,
    )
