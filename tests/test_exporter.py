"""Checkpoint EXPORT parity: flax variables → reference-format torch
state_dict / .tar (deploy/exporters.py), the inverse of the importer —
models trained here must load and evaluate in the reference stack
(train_ubresnet2018_wlarcv2.py:474-479 envelope,
deploy/ubresnet_funcs.py:41-68 loader semantics)."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.deploy.exporters import (
    export_uresnet_state_dict,
    save_reference_checkpoint,
)
from ubresnet_tpu.deploy.importers import (
    import_torch_checkpoint,
    import_uresnet_state_dict,
)
from ubresnet_tpu.models import UResNet, UResNetConfig
from ubresnet_tpu.parity.torch_oracle import torch_uresnet_eval


def _model(inplanes=4):
    return UResNet(
        config=UResNetConfig(num_classes=3, input_channels=1,
                             inplanes=inplanes,
                             final_conv_kernels=inplanes),
        policy=Policy.f32(),
    )


def _init_vars(inplanes=4):
    model = _model(inplanes)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(3), x, train=False
    )
    return model, v


def test_export_import_roundtrip_bitexact():
    _, v = _init_vars()
    sd = export_uresnet_state_dict(v)
    back = import_uresnet_state_dict(sd)
    flat_a = jax.tree_util.tree_flatten_with_path(
        {"params": v["params"], "batch_stats": v["batch_stats"]})[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))


def test_exported_state_dict_runs_in_reference_semantics(rng):
    """The exported dict drives the torch-functional reference oracle
    and agrees with our eval output — an exported checkpoint is a
    working reference checkpoint, not just a key-compatible one."""
    model, v = _init_vars()
    x = rng.rand(2, 1, 64, 64).astype(np.float32) * 10

    out = model.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    got = np.asarray(out).transpose(0, 3, 1, 2)

    sd = export_uresnet_state_dict(v)
    ref = torch_uresnet_eval(sd, torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=1e-4)
    agree = (got.argmax(1) == ref.argmax(1)).mean()
    assert agree >= 0.999, agree


def test_export_torch_cli(tmp_path):
    """orbax checkpoint dir → ubtpu-export-torch → reference .tar
    with the trained step/metric carried into the envelope."""
    import jax.numpy as jnp2  # noqa: F401

    from ubresnet_tpu.cli.export_torch import main as export_main
    from ubresnet_tpu.train import create_train_state, make_optimizer
    from ubresnet_tpu.train.checkpoint import save_checkpoint

    model, v = _init_vars()
    tx = make_optimizer("adam", learning_rate=1e-4)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 1)), tx)
    state = state.replace(step=7)
    ckdir = str(tmp_path / "ckpt")
    save_checkpoint(ckdir, state)
    out = str(tmp_path / "exported.tar")
    assert export_main(["--checkpoint-dir", ckdir, "--out", out]) == 0
    raw = torch.load(out, weights_only=False)
    assert raw["iter"] == 7
    back, info = import_torch_checkpoint(out)
    np.testing.assert_array_equal(
        np.asarray(back["params"]["stem"]["conv"]["kernel"]),
        np.asarray(state.params["stem"]["conv"]["kernel"]),
    )


def test_aspp_export_roundtrip(rng):
    """ASPP: reference sd → import → export reproduces every key and
    value (num_batches_tracked is synthesised, excluded)."""
    from test_aspp_importer import make_aspp_state_dict

    from ubresnet_tpu.deploy.exporters import export_aspp_state_dict
    from ubresnet_tpu.deploy.importers import import_aspp_state_dict

    sd = make_aspp_state_dict(rng, inplanes=4)
    v = import_aspp_state_dict(sd)
    back = export_aspp_state_dict(v)
    want = {k for k in sd if "num_batches_tracked" not in k}
    got = {k for k in back if "num_batches_tracked" not in k}
    assert want == got, (sorted(want - got)[:5], sorted(got - want)[:5])
    for k in want:
        np.testing.assert_array_equal(
            back[k].numpy(),
            sd[k].numpy() if hasattr(sd[k], "numpy") else np.asarray(sd[k]),
            err_msg=k,
        )


def test_reference_tar_envelope_roundtrip(tmp_path):
    """save_reference_checkpoint → torch.load envelope fields →
    import_torch_checkpoint, incl. the DataParallel module. prefix
    path (ubresnet_funcs.py:52-64)."""
    _, v = _init_vars()
    path = str(tmp_path / "checkpoint.800th.tar")
    save_reference_checkpoint(v, path, iteration=800, epoch=1.5,
                              best_prec1=0.97, data_parallel=True)
    raw = torch.load(path, weights_only=False)
    assert raw["iter"] == 800 and raw["best_prec1"] == 0.97
    assert all(k.startswith("module.") for k in raw["state_dict"])
    back, info = import_torch_checkpoint(path)
    assert info["inplanes"] == 4
    np.testing.assert_array_equal(
        np.asarray(back["params"]["stem"]["conv"]["kernel"]),
        np.asarray(v["params"]["stem"]["conv"]["kernel"]),
    )
