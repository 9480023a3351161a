"""ASPP-ResNet checkpoint import: structure parity with model.init."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.deploy.importers import import_aspp_state_dict
from ubresnet_tpu.models import ASPPResNet, ASPPResNetConfig
from ubresnet_tpu.parity.torch_oracle import make_state_dict


def make_aspp_state_dict(rng, inplanes=4):
    """Reference ASPP_ResNet naming: UResNet keys + ASPP_layer_encN /
    ASPP_combine_encN (ASPP_ResNet.py:342-352)."""
    sd = make_state_dict(rng, inplanes=inplanes, in_ch=1, classes=3)
    p = inplanes

    def t(*shape):
        return torch.from_numpy(rng.randn(*shape).astype(np.float32) * 0.1)

    def add_bn(key, c):
        sd[f"{key}.weight"] = t(c).abs() + 0.5
        sd[f"{key}.bias"] = t(c)
        sd[f"{key}.running_mean"] = t(c)
        sd[f"{key}.running_var"] = t(c).abs() + 0.5

    branch_k = {1: 1, 2: 3, 3: 3, 4: 3}
    for i, mult in ((3, 8), (4, 16), (5, 32)):
        cin = p * mult
        for b in (1, 2, 3, 4):
            k = branch_k[b]
            sd[f"ASPP_layer_enc{i}.B{b}_conv.weight"] = t(p, cin, k, k)
            sd[f"ASPP_layer_enc{i}.B{b}_conv.bias"] = t(p)
            add_bn(f"ASPP_layer_enc{i}.B{b}_bn", p)
        post_in = 4 * p + cin
        sd[f"ASPP_combine_enc{i}.ASPP_conv.weight"] = t(cin, post_in, 1, 1)
        sd[f"ASPP_combine_enc{i}.ASPP_conv.bias"] = t(cin)
        add_bn(f"ASPP_combine_enc{i}.ASPP_bn", cin)
    # ASPP decoder plan differs from UResNet's: deconv5/4 widths
    # (ASPP_ResNet.py:361-375)
    del_keys = [k for k in sd if k.startswith(("dec_layer5.", "dec_layer4."))]
    for k in del_keys:
        del sd[k]

    def add_block(pref, cin, cout):
        sd[f"{pref}.conv1.weight"] = t(cout, cin, 3, 3)
        add_bn(f"{pref}.bn1", cout)
        sd[f"{pref}.conv2.weight"] = t(cout, cout, 3, 3)
        add_bn(f"{pref}.bn2", cout)
        if cin != cout:
            sd[f"{pref}.bypass.weight"] = t(cout, cin, 1, 1)
            add_bn(f"{pref}.bnpass", cout)

    # dec5: deconv 64p->16p, res over 16p+32p -> 32p
    sd["dec_layer5.deconv.weight"] = t(64 * p, 16 * p, 4, 4)
    add_block("dec_layer5.res.res1", 48 * p, 32 * p)
    add_block("dec_layer5.res.res2", 32 * p, 32 * p)
    # dec4: deconv 32p->8p, res over 8p+16p -> 16p
    sd["dec_layer4.deconv.weight"] = t(32 * p, 8 * p, 4, 4)
    add_block("dec_layer4.res.res1", 24 * p, 16 * p)
    add_block("dec_layer4.res.res2", 16 * p, 16 * p)
    # dec3 differs too: deconv 16p->4p, res over 4p+4p -> 4p
    del_keys = [k for k in sd if k.startswith("dec_layer3.")]
    for k in del_keys:
        del sd[k]
    sd["dec_layer3.deconv.weight"] = t(16 * p, 4 * p, 4, 4)
    add_block("dec_layer3.res.res1", 8 * p, 4 * p)
    add_block("dec_layer3.res.res2", 4 * p, 4 * p)
    return sd


def test_aspp_import_structure_matches_init(rng):
    p = 4
    sd = make_aspp_state_dict(rng, inplanes=p)
    variables = import_aspp_state_dict(sd)
    model = ASPPResNet(
        config=ASPPResNetConfig(num_classes=3, input_channels=1, inplanes=p,
                                final_conv_kernels=p, aspp_branch_features=p),
        policy=Policy.f32(),
    )
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))

    def paths(tree):
        return {
            jax.tree_util.keystr(pth): tuple(x.shape)
            for pth, x in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(init["params"]) == paths(variables["params"])
    assert paths(init["batch_stats"]) == paths(variables["batch_stats"])

    # imported weights run
    out = model.apply(variables, jnp.zeros((1, 64, 64, 1)), train=False)
    assert out.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(jnp.exp(out)).sum(-1), 1.0, atol=1e-5)
