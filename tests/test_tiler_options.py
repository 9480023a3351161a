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


def test_trainer_nan_recovery(tmp_path):
    """A poisoned batch triggers rollback to the last checkpoint."""
    import jax

    from ubresnet_tpu.core.config import TrainConfig
    from ubresnet_tpu.data import make_synthetic_file
    from ubresnet_tpu.train.trainer import Trainer

    data = make_synthetic_file(str(tmp_path / "d.uevt"), n_events=4, hw=(32, 32))
    cfg = TrainConfig.from_dict(
        {
            "model": {"inplanes": 2, "precision": "f32"},
            "optim": {"lr": 1e-3},
            "train_data": {"files": [data], "batch_size": 2},
            "num_iters": 6,
            "checkpoint_every": 2,
            "print_every": 1,
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "model_axis": 1,
        }
    )
    trainer = Trainer(cfg, mesh=None)
    # poison iteration 4's batch with NaN images
    real_step = trainer.train_step
    calls = {"n": 0}

    def wrapped(state, batch):
        calls["n"] += 1
        if calls["n"] == 4:
            batch = dict(batch, image=batch["image"] * float("nan"))
        return real_step(state, batch)

    trainer.train_step = wrapped
    summary = trainer.run()
    assert "error" not in summary, summary.get("error")
    assert summary["final_iter"] >= 6
