"""Pallas fused packed-conv kernels (ops/pallas_conv.py) — equivalence
vs the XLA packed path on the virtual CPU backend (interpret mode).

The fused kernels are an eval-time performance path; their contract is
bf16-level agreement with the XLA packed path, which itself is
bit-equivalent to the unpacked reference math (tests/test_packed*.py).
Here we pin exact structural agreement in f32 interpret mode (MXU
truncation doesn't apply in the interpreter)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models.blocks import BasicBlock, ConvBN, DoubleResNet
from ubresnet_tpu.ops.packed import pack, unpack
from ubresnet_tpu.ops.pallas_conv import fused_packed_conv

POL_F = dataclasses.replace(Policy.f32(), pack_width=8, fused_eval=True)
POL_U = dataclasses.replace(POL_F, fused_eval=False)


def _ref_conv(x, w, g, b, act, pre_act, res=None):
    kh, kw, ci, co = w.shape
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(kh // 2,) * 2, (kw // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)
    y = y * g + b
    if pre_act:
        y = jnp.maximum(y, 0.0)
    if res is not None:
        y = y + res.astype(jnp.float32)
    if act:
        y = jnp.maximum(y, 0.0)
    return y


@pytest.mark.parametrize(
    "p,ci,co,k,res,wc",
    [
        (8, 16, 16, 3, False, 16),
        (8, 32, 16, 3, False, 16),  # pci=256 input
        (4, 32, 32, 3, True, 16),
        (8, 16, 16, 7, False, 16),  # head-style 7x7
        (8, 16, 3, 7, False, 16),  # classifier-style
        (8, 16, 16, 3, True, 52),  # wholeview-pool cell count (52=4*13)
        (16, 16, 16, 3, False, 16),  # pe=16 / N=256 multi-MXU probe
    ],
)
def test_fused_conv_matches_reference(rng, p, ci, co, k, res, wc):
    B, H, W = 2, 16, wc * p
    x = jnp.asarray(rng.randn(B, H, W, ci), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, ci, co) * 0.1, jnp.float32)
    g = jnp.asarray(rng.rand(co) + 0.5, jnp.float32)
    b = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
    r = jnp.asarray(rng.randn(B, H, W, co), jnp.float32) if res else None
    want = _ref_conv(x, w, g, b, act=True, pre_act=res, res=r)
    got = fused_packed_conv(
        pack(x, p),
        w,
        jnp.tile(g, p),
        jnp.tile(b, p),
        p=p,
        residual=pack(r, p) if res else None,
        act=True,
        pre_act=res,
        th=4,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(unpack(got, p)), np.asarray(want), atol=2e-5
    )


@pytest.mark.parametrize(
    "mk,shape,packed",
    [
        (lambda pol: ConvBN(16, 3, packed=8, policy=pol), (1, 8, 16, 128), 8),
        (lambda pol: ConvBN(16, 7, use_bias=True, packed=8, policy=pol),
         (1, 8, 16, 128), 8),
        (lambda pol: BasicBlock(16, 1, packed=8, policy=pol),
         (1, 8, 16, 256), 8),
        (lambda pol: DoubleResNet(32, 1, packed=4, policy=pol),
         (1, 8, 32, 128), 4),
    ],
)
def test_fused_modules_match_xla_path(rng, mk, shape, packed):
    """ConvBN/BasicBlock/DoubleResNet produce the same eval outputs on
    the fused (pallas, interpret) and XLA packed paths."""
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    m_f, m_u = mk(POL_F), mk(POL_U)
    v = m_u.init(jax.random.PRNGKey(0), x, train=False)
    a = m_f.apply(v, x, train=False)
    b = m_u.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


# ---------------------------------------------------- round-2 kernels


@pytest.mark.parametrize(
    "p,ci,co,H,W",
    [(4, 64, 32, 8, 64), (8, 32, 16, 16, 128), (8, 16, 16, 8, 64)],
)
def test_fused_deconv_matches_packed(rng, p, ci, co, H, W):
    """Pallas deconv2x ≡ XLA packed_deconv2x (torch ConvTranspose2d
    k4/s2/p1 semantics, common_layers.py:122-132)."""
    from ubresnet_tpu.ops.packed import packed_deconv2x
    from ubresnet_tpu.ops.pallas_conv import fused_packed_deconv2x

    x = pack(jnp.asarray(rng.randn(2, H, W, ci), jnp.float32), p)
    w = jnp.asarray(rng.randn(4, 4, ci, co) * 0.1, jnp.float32)
    want = packed_deconv2x(x, w, p)
    got = fused_packed_deconv2x(x, w, p=p, th=4, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize(
    "p,ci,co,H,W", [(4, 32, 32, 8, 64), (8, 16, 16, 16, 128),
                    # wholeview crop width: 104 packed cells (512x832
                    # at dec2) — non-power-of-2 cell count + VMEM-fit
                    (8, 16, 16, 8, 104 * 8)]
)
def test_fused_dual_block_matches_concat_block(rng, p, ci, co, H, W):
    """BasicBlock over an implicit concat of two streams ≡ the
    reference concat + BasicBlock math (common_layers.py:18-58)."""
    from ubresnet_tpu.ops.packed import tile_channel_vector as tcv
    from ubresnet_tpu.ops.pallas_conv import fused_dual_block

    def conv(x, w):
        kh = w.shape[0]
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(kh // 2,) * 2] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    A = jnp.asarray(rng.randn(2, H, W, ci), jnp.float32)
    B = jnp.asarray(rng.randn(2, H, W, ci), jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, 2 * ci, co) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, co, co) * 0.1, jnp.float32)
    wb = jnp.asarray(rng.randn(1, 1, 2 * ci, co) * 0.1, jnp.float32)
    g1, g2, gb = (jnp.asarray(rng.rand(co) + 0.5, jnp.float32) for _ in range(3))
    b1, b2, bb = (jnp.asarray(rng.randn(co) * 0.1, jnp.float32) for _ in range(3))
    cat = jnp.concatenate([A, B], -1)
    y1 = jax.nn.relu(conv(cat, w1) * g1 + b1)
    y2 = jax.nn.relu(conv(y1, w2) * g2 + b2)  # pre-add ReLU
    want = jax.nn.relu(y2 + conv(cat, wb) * gb + bb)
    got = fused_dual_block(
        pack(A, p), pack(B, p),
        w1, tcv(g1, p), tcv(b1, p),
        w2, tcv(g2, p), tcv(b2, p),
        wb, tcv(gb, p), tcv(bb, p),
        p=p, th=4, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(unpack(got, p)), np.asarray(want), atol=2e-4
    )


@pytest.mark.parametrize(
    "p,ci,H,W", [(8, 16, 16, 128), (8, 16, 64, 256), (4, 32, 16, 64)]
)
def test_fused_pool_matches_maxpool(rng, p, ci, H, W):
    """Pallas 3x3/s2 maxpool ≡ torch MaxPool2d(3,2,1) (stem pool,
    ub_uresnet.py:44) on non-negative input — bit-exact."""
    from flax import linen as nn

    from ubresnet_tpu.ops.pallas_conv import fused_pool3x3s2

    x = jnp.asarray(np.abs(rng.randn(2, H, W, ci)), jnp.float32)
    want = nn.max_pool(x, (3, 3), (2, 2), [(1, 1), (1, 1)])
    got = unpack(fused_pool3x3s2(pack(x, p), p=p, th=4, interpret=True), p)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_full_model_fused_eval_matches_xla(rng):
    """Whole UResNet, fused_eval vs XLA packed path, eval mode: the
    Pallas-complete packed zone (stem pool, blocks, deconvs, dual skip
    joins, head, classifier) reproduces the XLA path to f32 reordering
    noise, with identical parameters."""
    from ubresnet_tpu.models import get_model

    polF = dataclasses.replace(Policy.f32(), pack_width=8, fused_eval=True)
    polU = dataclasses.replace(polF, fused_eval=False)
    x = jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)
    mF = get_model("uresnet", policy=polF, input_channels=1, inplanes=16)
    mU = get_model("uresnet", policy=polU, input_channels=1, inplanes=16)
    v = mU.init(jax.random.PRNGKey(0), x, train=False)
    a = mU.apply(v, x, train=False, logits=True)
    b = mF.apply(v, x, train=False, logits=True)
    # random-init logits are O(100); compare relative to their scale
    scale = float(jnp.abs(a).max())
    assert float(jnp.abs(a - b).max()) < 1e-5 * scale
    assert float(
        (jnp.argmax(a, -1) == jnp.argmax(b, -1)).mean()
    ) == 1.0


@pytest.mark.parametrize("k,ci,co,p", [(3, 16, 16, 8), (3, 32, 16, 4),
                                       (7, 16, 16, 8), (1, 32, 32, 4),
                                       (7, 16, 3, 8)])
def test_conv_ad_grads_match_xla(rng, k, ci, co, p):
    """pallas_conv_ad fwd + custom-VJP grads == XLA packed conv's."""
    from ubresnet_tpu.ops.pallas_conv import conv_ad_supported, pallas_conv_ad
    from ubresnet_tpu.ops.packed import packed_conv

    assert conv_ad_supported(p, k, ci, co)
    H, WC = 16, 32
    x = jnp.asarray(rng.randn(2, H, WC, p * ci), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, ci, co) * 0.1, jnp.float32)
    r = jnp.asarray(rng.randn(2, H, WC, p * co), jnp.float32)

    def loss_pal(x, w):
        return jnp.sum(pallas_conv_ad(x, w, p, True) * r)

    def loss_xla(x, w):
        return jnp.sum(packed_conv(x, w, p) * r)

    fp, (dxp, dwp) = jax.value_and_grad(loss_pal, (0, 1))(x, w)
    fx, (dxx, dwx) = jax.value_and_grad(loss_xla, (0, 1))(x, w)
    np.testing.assert_allclose(fp, fx, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(dxp), np.asarray(dxx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dwp), np.asarray(dwx),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("deconv_ad", [False, True])
def test_fused_train_model_grads_match_xla(rng, deconv_ad):
    """Whole UResNet with fused_train: loss + grads match the XLA
    packed path (identical params; f32, interpret mode on CPU).
    Covers both deconv modes: XLA packed deconv (shipping config) and
    pallas_deconv2x_ad (gated off by default — mis-tiled backward)."""
    from ubresnet_tpu.models import get_model

    polT = dataclasses.replace(Policy.f32(), pack_width=8, fused_train=True,
                               fused_train_deconv=deconv_ad)
    polU = dataclasses.replace(polT, fused_train=False)
    x = jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)
    mT = get_model("uresnet", policy=polT, input_channels=1, inplanes=16)
    mU = get_model("uresnet", policy=polU, input_channels=1, inplanes=16)
    v = mU.init(jax.random.PRNGKey(0), x, train=False)

    def loss(m, params):
        out, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, logits=True, mutable=["batch_stats"],
        )
        return jnp.mean(out ** 2)

    lT, gT = jax.value_and_grad(lambda p: loss(mT, p))(v["params"])
    lU, gU = jax.value_and_grad(lambda p: loss(mU, p))(v["params"])
    np.testing.assert_allclose(float(lT), float(lU), rtol=1e-5)
    flatT = jax.tree_util.tree_flatten_with_path(gT)[0]
    flatU = jax.tree_util.tree_flatten_with_path(gU)[0]
    # f32 reduction-order noise through a deep backward chain scales
    # with the GLOBAL grad magnitude (near-zero grads like biases
    # upstream of BN carry the chain's noise, not their own); a wrong
    # VJP produces O(global-scale) errors, so this still catches bugs
    gsc = max(float(jnp.abs(b).max()) for _, b in flatU)
    # Threshold calibration (measured, round 3): with the stats-
    # decoupled train path BN batch statistics are computed from
    # kernel-emitted sums, so their f32 rounding differs from XLA's —
    # and f32 BN *training* grads are inherently ~1e-2*gsc from an
    # f64 oracle through this depth (catastrophic cancellation in
    # E[x^2]-E[x]^2 amplified by the backward chain; measured
    # 1.1e-2 unfused / 1.3e-2 fused vs f64 at the stem). A wrong VJP
    # (e.g. dropped stat cotangents) produces O(gsc) errors at many
    # params; tight per-leg parity lives in
    # test_train_conv_stats_matches_xla / test_convbn_fused_train_*.
    for (pa, a), (pb, b) in zip(flatT, flatU):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        assert float(jnp.abs(a - b).max()) < 5e-2 * gsc, (
            jax.tree_util.keystr(pa)
        )


@pytest.mark.parametrize("k,ci,co,p", [(3, 16, 16, 8), (3, 32, 16, 4),
                                       (7, 16, 16, 8), (1, 32, 32, 4),
                                       (7, 16, 3, 8),
                                       # pad branch where COMBO//p < co
                                       # (regression: negative pad)
                                       (3, 8, 12, 16)])
def test_conv_dw_matches_xla(rng, k, ci, co, p):
    """pallas_conv_dw (all-Pallas grad-weights accumulator) == XLA's
    grad of the packed conv w.r.t. the unpacked kernel."""
    from ubresnet_tpu.ops.packed import packed_conv
    from ubresnet_tpu.ops.pallas_conv import pallas_conv_dw

    H, WC = 16, 32
    x = jnp.asarray(rng.randn(2, H, WC, p * ci), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, ci, co) * 0.1, jnp.float32)
    dy = jnp.asarray(rng.randn(2, H, WC, p * co), jnp.float32)
    _, pullback = jax.vjp(lambda wk: packed_conv(x, wk, p), w)
    (want,) = pullback(dy)
    got = pallas_conv_dw(x, dy, p=p, kw=k, th=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-3
    )


@pytest.mark.parametrize("p,ci,co,H,W", [(4, 32, 32, 8, 64),
                                         (8, 16, 16, 16, 128),
                                         # nh>=3: middle-tile parity-
                                         # plane DMA branch
                                         (8, 16, 16, 48, 128)])
def test_conv_s2k4_matches_xla(rng, p, ci, co, H, W):
    """fused_conv_s2k4 == stride-2 k4 pad-1 cross-correlation (the
    deconv2x input-gradient) computed by XLA on unpacked tensors."""
    from ubresnet_tpu.ops.pallas_conv import fused_conv_s2k4

    y = jnp.asarray(rng.randn(2, H, W, ci), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, ci, co) * 0.1, jnp.float32)
    want = jax.lax.conv_general_dilated(
        y, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = fused_conv_s2k4(pack(y, 2 * p), w, p=p, th=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(unpack(got, p)), np.asarray(want), atol=2e-5
    )


@pytest.mark.parametrize("p,ci,co,H,W", [(4, 32, 32, 8, 64),
                                         (8, 16, 16, 16, 128)])
def test_deconv2x_ad_grads_match_packed(rng, p, ci, co, H, W):
    """pallas_deconv2x_ad fwd + custom-VJP (s2k4 dx, deconv_dw dW) ==
    XLA packed_deconv2x grads."""
    from ubresnet_tpu.ops.packed import packed_deconv2x
    from ubresnet_tpu.ops.pallas_conv import (
        deconv_ad_supported,
        pallas_deconv2x_ad,
    )

    assert deconv_ad_supported(p, ci, co)
    x = jnp.asarray(rng.randn(2, H, W // p, p * ci), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, ci, co) * 0.1, jnp.float32)
    r = jnp.asarray(rng.randn(2, 2 * H, 2 * W // p, p * co), jnp.float32)

    def loss_pal(x, w):
        return jnp.sum(pallas_deconv2x_ad(x, w, p, True) * r)

    def loss_xla(x, w):
        return jnp.sum(packed_deconv2x(x, w, p) * r)

    fp, (dxp, dwp) = jax.value_and_grad(loss_pal, (0, 1))(x, w)
    fx, (dxx, dwx) = jax.value_and_grad(loss_xla, (0, 1))(x, w)
    np.testing.assert_allclose(fp, fx, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(dxp), np.asarray(dxx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dwp), np.asarray(dwx),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("k,ci,co,p,bias", [(3, 16, 16, 8, False),
                                            (3, 32, 16, 4, True),
                                            (7, 16, 16, 8, True),
                                            (1, 32, 32, 4, False)])
def test_train_conv_stats_matches_xla(rng, k, ci, co, p, bias):
    """train_conv_stats (ops/pallas_train.py): y == XLA packed conv,
    s1/s2 == per-packed-channel sums, and grads (x, w, bias) through a
    loss touching BOTH y and the stats match XLA."""
    from ubresnet_tpu.ops.packed import packed_conv
    from ubresnet_tpu.ops.pallas_train import (
        train_conv_stats,
        train_conv_supported,
    )

    assert train_conv_supported(p, k, ci, co)
    H, WC = 16, 32
    x = jnp.asarray(rng.randn(2, H, WC, p * ci), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, ci, co) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(co), jnp.float32) if bias else None
    r = jnp.asarray(rng.randn(2, H, WC, p * co), jnp.float32)
    c1 = jnp.asarray(rng.randn(p * co), jnp.float32)
    c2 = jnp.asarray(rng.randn(p * co) * 0.01, jnp.float32)

    def loss_pal(x, w, b):
        y, s1, s2 = train_conv_stats(x, w, b, p, True)
        return jnp.sum(y * r) + jnp.sum(s1 * c1) + jnp.sum(s2 * c2)

    def loss_xla(x, w, b):
        y = packed_conv(x, w, p, bias=b)
        s1 = jnp.sum(y, axis=(0, 1, 2))
        s2 = jnp.sum(jnp.square(y), axis=(0, 1, 2))
        return jnp.sum(y * r) + jnp.sum(s1 * c1) + jnp.sum(s2 * c2)

    args = (x, w, b)
    argnums = (0, 1, 2) if bias else (0, 1)
    fp, gp = jax.value_and_grad(loss_pal, argnums)(*args)
    fx, gx = jax.value_and_grad(loss_xla, argnums)(*args)
    np.testing.assert_allclose(fp, fx, rtol=2e-4)
    for a, b_, tol in zip(gp, gx, (1e-4, 1e-3, 1e-3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=tol)


def test_convbn_fused_train_stats_path(rng):
    """ConvBN with fused_train: output, running-stat updates and grads
    match the unfused packed path (f32, interpret on CPU)."""
    polT = dataclasses.replace(Policy.f32(), pack_width=8,
                               fused_train=True)
    polU = dataclasses.replace(polT, fused_train=False)
    x = jnp.asarray(rng.rand(2, 16, 4, 8 * 16), jnp.float32)
    res = jnp.asarray(rng.rand(2, 16, 4, 8 * 16), jnp.float32)
    mT = ConvBN(16, 3, packed=8, policy=polT)
    mU = ConvBN(16, 3, packed=8, policy=polU)
    v = mU.init(jax.random.PRNGKey(1), x, train=False)

    def run(m, params):
        y, upd = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, residual=res, mutable=["batch_stats"],
        )
        return y, upd["batch_stats"]

    yT, bsT = run(mT, v["params"])
    yU, bsU = run(mU, v["params"])
    np.testing.assert_allclose(np.asarray(yT), np.asarray(yU),
                               rtol=1e-4, atol=1e-5)
    for k2 in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(bsT["bn"][k2]), np.asarray(bsU["bn"][k2]),
            rtol=1e-5, atol=1e-7)

    def loss(m, params):
        return jnp.mean(run(m, params)[0] ** 2)

    gT = jax.grad(lambda p2: loss(mT, p2))(v["params"])
    gU = jax.grad(lambda p2: loss(mU, p2))(v["params"])
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(gT)[0],
        jax.tree_util.tree_flatten_with_path(gU)[0],
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pa))


def test_fused_train_bf16_smoke(rng):
    """fused_train with the TPU bf16 compute policy (interpret mode):
    loss finite and near the unfused bf16 path, grads finite. Pins the
    dtype plumbing of the stats kernels (bf16 y, f32 moment sums)."""
    from ubresnet_tpu.models import get_model

    polT = dataclasses.replace(Policy.bf16(), pack_width=8,
                               fused_train=True)
    polU = dataclasses.replace(polT, fused_train=False)
    x = jnp.asarray(rng.rand(1, 32, 32, 1), jnp.float32)
    mT = get_model("uresnet", policy=polT, input_channels=1, inplanes=16)
    mU = get_model("uresnet", policy=polU, input_channels=1, inplanes=16)
    v = mU.init(jax.random.PRNGKey(0), x, train=False)

    def loss(m, params):
        out, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, logits=True, mutable=["batch_stats"],
        )
        return jnp.mean(out ** 2)

    lT, gT = jax.value_and_grad(lambda p: loss(mT, p))(v["params"])
    lU = loss(mU, v["params"])
    assert np.isfinite(float(lT)) and np.isfinite(float(lU))
    np.testing.assert_allclose(float(lT), float(lU), rtol=0.15)
    assert all(
        bool(jnp.all(jnp.isfinite(a)))
        for a in jax.tree_util.tree_leaves(gT)
    )
