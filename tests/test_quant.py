"""int8 PTQ path (ops/quant.py + ConvBN quant_eval branch).

The reference engine is f32 CUDA end-to-end — this capability is
TPU-native extra; tests pin (a) the integer conv math exactly, (b)
model-level accuracy of the quantized forward vs f32, (c) the
must-calibrate guard.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.ops.packed import pack, packed_conv, unpack
from ubresnet_tpu.ops.quant import (
    calibrate,
    quantize_act,
    quantize_weight,
    weight_scales,
)


def test_packed_int8_conv_exact():
    """s8×s8→s32 packed conv == the same conv in f32 (exact for small
    integers), for stride 1 and 2 and kernels 1/3/7."""
    rng = np.random.RandomState(0)
    p, ci, co = 4, 3, 5
    x = rng.randint(-7, 8, (2, 6, 16, ci)).astype(np.int8)
    for k in (1, 3, 7):
        for stride in (1, 2):
            w = rng.randint(-7, 8, (k, k, ci, co)).astype(np.int8)
            xp = pack(jnp.asarray(x), p)
            yq = packed_conv(
                xp, jnp.asarray(w), p, stride, preferred=jnp.int32
            )
            yf = packed_conv(
                xp.astype(jnp.float32),
                jnp.asarray(w, jnp.float32),
                p,
                stride,
            )
            assert yq.dtype == jnp.int32
            np.testing.assert_array_equal(
                np.asarray(yq), np.asarray(yf).astype(np.int32)
            )


def test_weight_quant_roundtrip():
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    sw = weight_scales(w)
    wq = quantize_weight(w, sw)
    assert wq.dtype == jnp.int8
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(sw) - np.asarray(w))
    # symmetric per-channel rounding: error <= s/2 per element
    assert (err <= np.asarray(sw) / 2 + 1e-7).all()
    # activations: clipping engages beyond the scale
    x = jnp.asarray([[-300.0, -1.0, 0.0, 2.5, 300.0]])
    xq = quantize_act(x, jnp.float32(1.0))
    np.testing.assert_array_equal(
        np.asarray(xq), np.array([[-127, -1, 0, 2, 127]], np.int8)
    )


def _uresnet(policy):
    from ubresnet_tpu.models import get_model

    return get_model("uresnet", policy=policy, input_channels=1, inplanes=8)


def _calib_batches(hw=32, batch=2, n=2):
    from ubresnet_tpu.data.synthetic import synth_event

    rng = np.random.RandomState(7)
    return [
        np.stack(
            [synth_event(rng, (hw, hw))["wire"] for _ in range(batch)]
        )[..., None]
        for _ in range(n)
    ]


def test_quant_model_close_to_f32():
    """Calibrate on synthetic events, then quantized eval ≈ f32 eval:
    probability error small, argmax mostly identical."""
    from ubresnet_tpu.train import init_model

    pol = Policy(pack_width=8, compute_dtype=jnp.float32)
    model = _uresnet(pol)
    batches = _calib_batches()
    variables = init_model(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1))
    )
    qvars = calibrate(model, variables, batches)
    assert "quant" in qvars
    scales = jax.tree_util.tree_leaves(qvars["quant"])
    assert len(scales) >= 10  # every ConvBN in the net calibrated
    assert all(float(s) > 0 for s in scales)

    x = jnp.asarray(batches[0])
    ref = np.asarray(jnp.exp(model.apply(variables, x, train=False)))
    qmodel = model.clone(policy=dataclasses.replace(pol, quant_eval=True))
    got = np.asarray(jnp.exp(qmodel.apply(qvars, x, train=False)))
    assert np.abs(got - ref).mean() < 0.02
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.95, f"argmax agreement {agree}"


def test_quant_eval_requires_calibration():
    from ubresnet_tpu.train import init_model

    model = _uresnet(Policy(pack_width=8, quant_eval=True))
    variables = init_model(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1))
    )
    with pytest.raises(ValueError, match="calibrate"):
        model.apply(variables, jnp.zeros((1, 32, 32, 1)), train=False)
