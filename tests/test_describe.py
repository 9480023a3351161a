"""Model introspection (showsizes equivalent) + ASPP-through-Trainer."""
import pytest
import jax
import jax.numpy as jnp

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models import UResNet, UResNetConfig
from ubresnet_tpu.utils.describe import (
    activation_shapes,
    count_params,
    describe_model,
)


def test_describe_and_shapes():
    m = UResNet(
        config=UResNetConfig(inplanes=4, input_channels=1), policy=Policy.f32()
    )
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    assert count_params(v) > 1e6
    sh = activation_shapes(m, v, (1, 64, 64, 1))
    assert sh["<output>"] == (1, 64, 64, 3)
    assert len(sh) > 50
    table = describe_model(m, (1, 64, 64, 1))
    assert "UResNet" in table and "stem" in table


@pytest.mark.slow
def test_trainer_builds_aspp(tmp_path):
    from ubresnet_tpu.core.config import TrainConfig
    from ubresnet_tpu.data import make_synthetic_file
    from ubresnet_tpu.train.trainer import train

    data = make_synthetic_file(str(tmp_path / "d.uevt"), n_events=4, hw=(64, 64))
    cfg = TrainConfig.from_dict(
        {
            "model": {"name": "aspp_resnet", "inplanes": 4, "precision": "f32"},
            "optim": {"lr": 1e-3},
            "train_data": {"files": [data], "batch_size": 2},
            "num_iters": 2,
            "checkpoint_every": 2,
            "print_every": 1,
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "model_axis": 1,
        }
    )
    summary = train(cfg)
    assert "error" not in summary, summary.get("error")
    assert summary["final_iter"] == 2
