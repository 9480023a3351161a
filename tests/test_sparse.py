"""Sparse H2D path tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from ubresnet_tpu.ops.sparse import densify, round_capacity, sparsify


def test_sparsify_densify_roundtrip(rng):
    imgs = np.zeros((3, 32, 64), np.float32)
    for i in range(3):
        n = rng.randint(5, 50)
        ys, xs = rng.randint(0, 32, n), rng.randint(0, 64, n)
        imgs[i, ys, xs] = rng.rand(n) * 100
    sp = sparsify(imgs, bucket=64)
    assert sp["indices"].shape == sp["values"].shape
    assert sp["indices"].shape[1] % 64 == 0
    out = np.asarray(densify(jnp.asarray(sp["indices"]), jnp.asarray(sp["values"]),
                             (32, 64)))
    np.testing.assert_allclose(out[..., 0], imgs, rtol=1e-6)


def test_sparsify_truncates_smallest(rng):
    img = np.zeros((1, 8, 8), np.float32)
    img[0].flat[:10] = np.arange(1, 11)
    sp = sparsify(img, capacity=4)
    assert sp["values"].shape[1] == 4
    # keeps the largest-|value| pixels
    assert set(np.abs(sp["values"][0])) == {7, 8, 9, 10}


def test_round_capacity():
    assert round_capacity(0) == 4096
    assert round_capacity(1, bucket=64) == 64
    assert round_capacity(65, bucket=64) == 128


def test_empty_image_roundtrip():
    imgs = np.zeros((2, 16, 16), np.float32)
    sp = sparsify(imgs, bucket=16)
    out = np.asarray(densify(jnp.asarray(sp["indices"]), jnp.asarray(sp["values"]),
                             (16, 16)))
    np.testing.assert_array_equal(out, 0)
