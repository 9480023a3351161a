"""Sparse training-batch transfer: roundtrip + trainer e2e."""
import jax.numpy as jnp
import numpy as np
import pytest

from ubresnet_tpu.ops.sparse import densify_batch, sparsify_batch


def make_batch(rng, b=3, hw=32):
    img = np.zeros((b, hw, hw, 1), np.float32)
    lab = np.zeros((b, hw, hw), np.int32)
    wgt = np.full((b, hw, hw), 0.35, np.float32)
    for i in range(b):
        n = rng.randint(10, 60)
        ys, xs = rng.randint(0, hw, n), rng.randint(0, hw, n)
        img[i, ys, xs, 0] = rng.rand(n) * 100
        lab[i, ys, xs] = rng.randint(1, 3, n)
        wgt[i, ys, xs] = rng.rand(n) * 5
    return {"image": img, "label": lab, "weight": wgt}


def test_sparse_batch_roundtrip(rng):
    batch = make_batch(rng)
    sp = sparsify_batch(batch, bucket=64)
    hw = sp.pop("hw")
    dense = densify_batch({k: jnp.asarray(v) for k, v in sp.items()}, hw)
    np.testing.assert_allclose(np.asarray(dense["image"]), batch["image"],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(dense["label"]), batch["label"])
    np.testing.assert_allclose(np.asarray(dense["weight"]), batch["weight"],
                               rtol=1e-5, atol=1e-6)


def test_sparse_bytes_much_smaller(rng):
    batch = make_batch(rng, b=4, hw=128)
    sp = sparsify_batch(batch, bucket=256)
    sp.pop("hw")
    sparse_bytes = sum(v.nbytes for v in sp.values())
    dense_bytes = sum(v.nbytes for v in batch.values())
    assert sparse_bytes < dense_bytes / 10


@pytest.mark.slow
def test_trainer_sparse_transfer(tmp_path):
    from ubresnet_tpu.core.config import TrainConfig
    from ubresnet_tpu.data import make_synthetic_file
    from ubresnet_tpu.train.trainer import train

    data = make_synthetic_file(str(tmp_path / "d.uevt"), n_events=8, hw=(64, 64))
    cfg = TrainConfig.from_dict(
        {
            "model": {"inplanes": 4, "precision": "f32"},
            "optim": {"lr": 1e-3},
            "train_data": {"files": [data], "batch_size": 2,
                           "sparse_bucket": 512},
            "num_iters": 4,
            "checkpoint_every": 4,
            "print_every": 2,
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "model_axis": 1,
        }
    )
    summary = train(cfg)
    assert "error" not in summary, summary.get("error")
    assert summary["final_iter"] == 4
    assert summary["meters"]["loss"] > 0
