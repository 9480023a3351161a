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


def test_dilate_mask_square_halo():
    from ubresnet_tpu.ops.sparse import dilate_mask

    m = np.zeros((1, 9, 9), bool)
    m[0, 4, 4] = True
    d = dilate_mask(m, 2)
    # exactly the 5x5 square around the seed
    want = np.zeros((9, 9), bool)
    want[2:7, 2:7] = True
    np.testing.assert_array_equal(d[0], want)
    # r=0 is the identity VALUE but never an alias: mutating the
    # result must not corrupt the source mask
    d0 = dilate_mask(m, 0)
    np.testing.assert_array_equal(d0, m)
    assert d0 is not m
    d0[0, 0, 0] = True
    assert not m[0, 0, 0]
    assert m.sum() == 1


def test_dilate_mask_clips_at_edges():
    from ubresnet_tpu.ops.sparse import dilate_mask

    m = np.zeros((2, 5, 5), bool)
    m[0, 0, 0] = True
    m[1, 4, 4] = True
    d = dilate_mask(m, 3)
    assert d[0, :4, :4].all() and d[0].sum() == 16
    assert d[1, 1:, 1:].all() and d[1].sum() == 16


def test_mask_indices_padding_and_truncation():
    from ubresnet_tpu.ops.sparse import mask_indices

    m = np.zeros((2, 4, 4), bool)
    m[0, 0, 1] = m[0, 2, 3] = True
    m[1].flat[:5] = True
    idx = mask_indices(m, bucket=4)
    assert idx.shape == (2, 8)  # max nnz 5 rounded to bucket grid
    # pad slots carry the -1 sentinel, never a real pixel index
    # (0-padding aliased flat pixel (0,0): round-4 readback bug)
    assert list(idx[0, :2]) == [1, 11] and set(idx[0, 2:]) == {-1}
    assert list(idx[1, :5]) == [0, 1, 2, 3, 4]
    assert set(idx[1, 5:]) == {-1}
    # externally-fixed smaller capacity truncates overflow rows
    idx2 = mask_indices(m, capacity=3)
    assert idx2.shape == (2, 3) and list(idx2[1]) == [0, 1, 2]


def test_sparse_gather_forward_matches_dense(rng):
    """The gather-forward returns exactly the dense forward's u8
    compact scores at the requested pixels."""
    import jax

    from ubresnet_tpu.core.precision import Policy
    from ubresnet_tpu.models import UResNet, UResNetConfig
    from ubresnet_tpu.ops.sparse import (
        dilate_mask, mask_indices, sparse_gather_forward_fn, sparsify,
    )

    model = UResNet(
        config=UResNetConfig(num_classes=3, input_channels=1, inplanes=4,
                             final_conv_kernels=4),
        policy=Policy.f32(),
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1))
    )
    imgs = np.zeros((2, 64, 64), np.float32)
    occ = rng.rand(2, 64, 64) < 0.02
    imgs[occ] = rng.rand(int(occ.sum())).astype(np.float32) * 50 + 10

    sp = sparsify(imgs, bucket=256)
    out_idx = mask_indices(dilate_mask(imgs != 0, 4), bucket=256)
    fwd = sparse_gather_forward_fn(model)
    g = np.asarray(fwd(variables, sp["indices"], sp["values"],
                       out_idx, (64, 64)))
    assert g.dtype == np.uint8 and g.shape[:2] == (2, out_idx.shape[1])

    dense = np.asarray(
        jnp.exp(model.apply(variables, jnp.asarray(imgs[..., None])))
    )
    want = np.round(
        dense.reshape(2, -1, 3)[np.arange(2)[:, None], out_idx][..., :2]
        * 255.0
    ).astype(np.uint8)
    # pad slots carry the -1 sentinel: the device clamps them to pixel
    # 0 while numpy's fancy index wraps to the last pixel — both are
    # garbage by contract (consumers drop slots < 0), so compare only
    # the real slots
    real = out_idx >= 0
    np.testing.assert_array_equal(g[real], want[real])
