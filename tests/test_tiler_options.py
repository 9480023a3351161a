"""UBSplitDetector-option parity: random crops + occupancy filter,
and NaN-recovery in the trainer."""
import json

import numpy as np
import pytest

from ubresnet_tpu.ops.tiling import filter_occupied, random_grid


def test_random_grid_bounds():
    rng = np.random.RandomState(0)
    grid = random_grid(1008, 3456, 512, 832, n_tiles=50, rng=rng)
    assert len(grid) == 50
    for r, c in grid:
        assert 0 <= r <= 1008 - 512
        assert 0 <= c <= 3456 - 832


def test_random_grid_max_tiles():
    grid = random_grid(600, 900, 512, 832, n_tiles=2000, max_tiles=1000,
                       rng=np.random.RandomState(1))
    assert len(grid) == 1000


def test_filter_occupied():
    img = np.zeros((64, 64), np.float32)
    img[:32, :32] = 100.0  # only the top-left quadrant has charge
    grid = ((0, 0), (0, 32), (32, 0), (32, 32))
    kept = filter_occupied(img, grid, 32, 32, min_frac_pixels=0.5)
    assert kept == ((0, 0),)
    # threshold respected
    kept2 = filter_occupied(img, grid, 32, 32, min_frac_pixels=0.5,
                            threshold=200.0)
    assert kept2 == ()
    # disabled filter keeps everything
    assert filter_occupied(img, grid, 32, 32, 0.0) == grid


@pytest.mark.slow
def test_trainer_nan_recovery(tmp_path):
    """A poisoned batch at a NON-print iteration is skipped on-device:
    params stay clean, the subsequent checkpoint is finite, training
    completes. print_every=3 > checkpoint_every=2 is the exact ordering
    that raced the old host-side rollback (a NaN at iter 4 was saved at
    checkpoint 4 before the print-boundary check at iter 6 noticed)."""
    import jax
    import numpy as np

    from ubresnet_tpu.core.config import TrainConfig
    from ubresnet_tpu.data import make_synthetic_file
    from ubresnet_tpu.train.checkpoint import restore_checkpoint
    from ubresnet_tpu.train.trainer import Trainer

    data = make_synthetic_file(str(tmp_path / "d.uevt"), n_events=4, hw=(32, 32))
    cfg = TrainConfig.from_dict(
        {
            "model": {"inplanes": 2, "precision": "f32"},
            "optim": {"lr": 1e-3},
            "train_data": {"files": [data], "batch_size": 2},
            "num_iters": 6,
            "checkpoint_every": 2,
            "print_every": 3,
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "model_axis": 1,
        }
    )
    trainer = Trainer(cfg, mesh=None)
    # poison iteration 4's batch with NaN images (iter 4: not a print
    # boundary, immediately followed by a periodic checkpoint)
    calls = {"n": 0}

    def wrap(real_step):
        def wrapped(state, batch):
            calls["n"] += 1
            if calls["n"] == 4:
                key = "img_val" if "img_val" in batch else "image"
                batch = dict(batch, **{key: batch[key] * float("nan")})
            return real_step(state, batch)

        return wrapped

    trainer.step_wrapper = wrap
    summary = trainer.run()
    assert "error" not in summary, summary.get("error")
    assert summary["final_iter"] >= 6
    assert summary["nan_steps_skipped"] == 1
    # the checkpoint written right after the poisoned step must be clean
    restored = restore_checkpoint(cfg.checkpoint_dir, trainer._init_state(
        jax.numpy.zeros((1, 32, 32, 1))), step=4)
    for leaf in jax.tree_util.tree_leaves(restored.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.slow
def test_trainer_nan_abort(tmp_path):
    """Persistent non-finite batches exceed max_nan_recoveries → abort
    (contained as summary['error'], with a final clean checkpoint)."""
    from ubresnet_tpu.core.config import TrainConfig
    from ubresnet_tpu.data import make_synthetic_file
    from ubresnet_tpu.train.trainer import Trainer

    data = make_synthetic_file(str(tmp_path / "d.uevt"), n_events=4, hw=(32, 32))
    cfg = TrainConfig.from_dict(
        {
            "model": {"inplanes": 2, "precision": "f32"},
            "optim": {"lr": 1e-3},
            "train_data": {"files": [data], "batch_size": 2},
            "num_iters": 8,
            "checkpoint_every": 100,
            "print_every": 1,
            "max_nan_recoveries": 2,
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "model_axis": 1,
        }
    )
    trainer = Trainer(cfg, mesh=None)
    def wrap(real_step):
        def wrapped(state, batch):
            key = "img_val" if "img_val" in batch else "image"
            batch = dict(batch, **{key: batch[key] * float("nan")})
            return real_step(state, batch)

        return wrapped

    trainer.step_wrapper = wrap
    summary = trainer.run()
    assert "error" in summary
    assert "non-finite" in summary["error"]


def test_trainer_dense_with_step_wrapper(tmp_path):
    """Regression (round-2 seam bug): step_wrapper installed AND the
    dense input path (sparse_bucket=0) — the wrapper check used to
    steal the else-branch that assigned the dense `example`, raising
    NameError at _init_state. Also asserts the early shape-probe batch
    is consumed as iteration 0 (wrapper sees exactly num_iters calls).
    """
    from ubresnet_tpu.core.config import TrainConfig
    from ubresnet_tpu.data import make_synthetic_file
    from ubresnet_tpu.train.trainer import Trainer

    data = make_synthetic_file(str(tmp_path / "d.uevt"), n_events=4, hw=(32, 32))
    cfg = TrainConfig.from_dict(
        {
            "model": {"inplanes": 2, "precision": "f32"},
            "optim": {"lr": 1e-3},
            "train_data": {"files": [data], "batch_size": 2,
                           "sparse_bucket": 0},
            "num_iters": 3,
            "checkpoint_every": 100,
            "print_every": 1,
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "model_axis": 1,
        }
    )
    trainer = Trainer(cfg, mesh=None)
    calls = {"n": 0}

    def wrap(real_step):
        def wrapped(state, batch):
            calls["n"] += 1
            return real_step(state, batch)

        return wrapped

    trainer.step_wrapper = wrap
    summary = trainer.run()
    assert "error" not in summary, summary.get("error")
    assert summary["final_iter"] == 3
    assert calls["n"] == 3


@pytest.mark.slow
def test_trainer_sparse_no_wrapper_example_shape(tmp_path):
    """Regression twin: sparse path with NO wrapper must init from the
    sparse-bucketed example (round 2 silently overwrote it with the
    dense shape and worked only by coincidence)."""
    from ubresnet_tpu.core.config import TrainConfig
    from ubresnet_tpu.data import make_synthetic_file
    from ubresnet_tpu.train.trainer import Trainer

    data = make_synthetic_file(str(tmp_path / "d.uevt"), n_events=4, hw=(32, 32))
    cfg = TrainConfig.from_dict(
        {
            "model": {"inplanes": 2, "precision": "f32"},
            "optim": {"lr": 1e-3},
            "train_data": {"files": [data], "batch_size": 2,
                           "sparse_bucket": 64},
            "num_iters": 2,
            "checkpoint_every": 100,
            "print_every": 1,
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "model_axis": 1,
        }
    )
    summary = Trainer(cfg, mesh=None).run()
    assert "error" not in summary, summary.get("error")
    assert summary["final_iter"] == 2
