"""Packed-domain conv/deconv equivalence vs unpacked lax ops."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubresnet_tpu.ops.packed import (
    pack,
    packed_concat,
    packed_conv,
    packed_deconv2x,
    tile_channel_vector,
    unpack,
)


def ref_conv(x, w, stride=1, q=None):
    k = w.shape[0]
    if q is None:
        q = k // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(q, q), (q, q)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def ref_deconv(x, w, target_hw=None):
    h, wd = x.shape[1], x.shape[2]
    th, tw = target_hw or (2 * h, 2 * wd)
    pads = [(2, t - 2 * d + 2) for d, t in ((h, th), (wd, tw))]
    return jax.lax.conv_general_dilated(
        x, jnp.flip(w, (0, 1)), (1, 1), pads, lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_pack_unpack_roundtrip(rng):
    x = jnp.asarray(rng.rand(2, 8, 32, 3).astype(np.float32))
    assert jnp.all(unpack(pack(x, 8), 8) == x)


@pytest.mark.parametrize("k,stride,ci,co", [
    (3, 1, 4, 4), (3, 2, 4, 8), (7, 1, 1, 4), (1, 1, 4, 8), (1, 2, 4, 8),
    (5, 1, 4, 4),
])
def test_packed_conv_matches_unpacked(rng, k, stride, ci, co):
    p = 8
    x = jnp.asarray(rng.rand(2, 16, 64, ci).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.2)
    ref = ref_conv(x, w, stride)
    got = unpack(packed_conv(pack(x, p), w, p, stride), p)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_packed_conv_bias(rng):
    p = 8
    x = jnp.asarray(rng.rand(1, 8, 32, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(4).astype(np.float32))
    ref = ref_conv(x, w) + b
    got = unpack(packed_conv(pack(x, p), w, p, bias=b), p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("ci,co,h,w", [(4, 2, 8, 32), (2, 4, 16, 64)])
def test_packed_deconv_matches_unpacked(rng, ci, co, h, w):
    p = 8
    x = jnp.asarray(rng.rand(2, h, w, ci).astype(np.float32))
    wt = jnp.asarray(rng.randn(4, 4, ci, co).astype(np.float32) * 0.2)
    ref = ref_deconv(x, wt)
    got = unpack(packed_deconv2x(pack(x, p), wt, p), p)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_packed_concat(rng):
    p = 4
    a = jnp.asarray(rng.rand(1, 4, 16, 2).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 4, 16, 3).astype(np.float32))
    ref = jnp.concatenate([a, b], axis=-1)
    got = unpack(packed_concat(pack(a, p), pack(b, p), p), p)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_tile_channel_vector():
    v = jnp.asarray([1.0, 2.0])
    np.testing.assert_array_equal(
        np.asarray(tile_channel_vector(v, 3)), [1, 2, 1, 2, 1, 2]
    )
    # packed channel layout is offset-major: scaling a packed tensor by
    # the tiled vector == scaling the unpacked tensor by the original
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 2, 8, 2).astype(np.float32))
    got = unpack(pack(x, 4) * tile_channel_vector(v, 4), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x * v), rtol=1e-6)
