"""Checkpoint-import parity: reference-format torch state_dicts must
reproduce outputs through our flax models (the ≥0.999 per-pixel label
agreement bar, BASELINE.md north star).

The oracle is a torch-functional evaluation of the reference
architecture (eval-mode BN with running stats), driven directly by the
state_dict — generated here with reference key naming
(ub_uresnet.py / common_layers.py structure), not loaded from files.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.deploy.importers import (
    import_torch_checkpoint,
    import_uresnet_state_dict,
    strip_module_prefix,
)
from ubresnet_tpu.models import UResNet, UResNetConfig
from ubresnet_tpu.parity.torch_oracle import make_state_dict, torch_uresnet_eval


# ----------------------------------------------------------------- tests


def test_full_model_import_parity(rng):
    sd = make_state_dict(rng, inplanes=4)
    x = rng.rand(2, 1, 64, 64).astype(np.float32) * 10

    ref = torch_uresnet_eval(sd, torch.from_numpy(x)).numpy()

    variables = import_uresnet_state_dict(sd)
    model = UResNet(
        config=UResNetConfig(num_classes=3, input_channels=1, inplanes=4, final_conv_kernels=4),
        policy=Policy.f32(),
    )
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    got = np.asarray(out).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=1e-4)
    # the north-star metric: per-pixel label agreement
    agree = (got.argmax(1) == ref.argmax(1)).mean()
    assert agree >= 0.999, agree


def test_import_structure_matches_init(rng):
    """Imported tree must be structurally identical to model.init's."""
    import jax

    sd = make_state_dict(rng, inplanes=4)
    variables = import_uresnet_state_dict(sd)
    model = UResNet(
        config=UResNetConfig(num_classes=3, input_channels=1, inplanes=4, final_conv_kernels=4),
        policy=Policy.f32(),
    )
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))

    def paths(tree):
        return {
            jax.tree_util.keystr(p): tuple(x.shape)
            for p, x in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(init["params"]) == paths(variables["params"])
    assert paths(init["batch_stats"]) == paths(variables["batch_stats"])


def test_module_prefix_strip(rng):
    sd = make_state_dict(rng, inplanes=4)
    wrapped = {f"module.{k}": v for k, v in sd.items()}
    out = strip_module_prefix(wrapped)
    assert set(out) == set(sd)


def test_tar_checkpoint_roundtrip(tmp_path, rng):
    """Full .tar payload as the reference writes it (wlarcv2:474-479)."""
    sd = make_state_dict(rng, inplanes=4)
    payload = {
        "iter": 1234,
        "epoch": 1.5,
        "state_dict": {f"module.{k}": v for k, v in sd.items()},
        "best_prec1": 0.97,
        "optimizer": {},
    }
    path = str(tmp_path / "checkpoint.1234th.tar")
    torch.save(payload, path)

    variables, info = import_torch_checkpoint(path)
    assert info["inplanes"] == 4
    assert info["num_classes"] == 3
    assert info["iter"] == 1234
    x = rng.rand(1, 1, 32, 32).astype(np.float32)
    ref = torch_uresnet_eval(sd, torch.from_numpy(x)).numpy()
    model = UResNet(
        config=UResNetConfig(num_classes=3, input_channels=1, inplanes=4, final_conv_kernels=4),
        policy=Policy.f32(),
    )
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-4
    )
