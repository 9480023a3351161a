"""Train-step tests: overfit, optimizer parity vs torch, checkpoint."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.models import UResNet, UResNetConfig
from ubresnet_tpu.train import (
    build_eval_step,
    build_train_step,
    create_train_state,
    make_optimizer,
    make_schedule,
    restore_checkpoint,
    save_checkpoint,
)
from ubresnet_tpu.train.metrics import AverageMeter, pixel_accuracy


def small_state(lr=1e-3, inplanes=4):
    model = UResNet(
        config=UResNetConfig(inplanes=inplanes, input_channels=1), policy=Policy.f32()
    )
    tx = make_optimizer("adam", learning_rate=lr, weight_decay=1e-4)
    x = jnp.zeros((2, 32, 32, 1))
    return create_train_state(model, jax.random.PRNGKey(0), x, tx)


def synth_batch(rng, b=2, hw=32):
    img = rng.rand(b, hw, hw, 1).astype(np.float32) * 10
    label = (img[..., 0] > 6).astype(np.int32) + (img[..., 0] > 8).astype(np.int32)
    return {
        "image": jnp.asarray(img),
        "label": jnp.asarray(label),
        "weight": jnp.ones((b, hw, hw), jnp.float32),
    }


def test_overfit_synthetic(rng):
    state = small_state(lr=3e-3)
    step = build_train_step(num_classes=3)
    batch = synth_batch(rng)
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses
    assert int(state.step) == 30


def test_eval_step_runs(rng):
    state = small_state()
    ev = build_eval_step(num_classes=3)
    metrics = ev(state, synth_batch(rng))
    assert set(metrics) >= {"loss", "acc_total", "acc_class0", "acc_nonzero"}


def test_pixel_accuracy_exact():
    logits = jnp.asarray(
        np.stack(
            [
                np.array([[5.0, 0, 0], [0, 5.0, 0]]),  # preds: 0, 1
                np.array([[0, 0, 5.0], [5.0, 0, 0]]),  # preds: 2, 0
            ]
        )
    ).reshape(1, 2, 2, 3)
    labels = jnp.asarray(np.array([[0, 1], [2, 2]]).reshape(1, 2, 2))
    m = pixel_accuracy(logits, labels)
    assert float(m["acc_total"]) == pytest.approx(0.75)
    assert float(m["acc_class0"]) == pytest.approx(1.0)
    assert float(m["acc_class2"]) == pytest.approx(0.5)
    assert float(m["acc_nonzero"]) == pytest.approx(2 / 3)


@pytest.mark.parametrize("name,kw", [
    ("adam", dict(learning_rate=1e-2, weight_decay=1e-2)),
    ("sgd", dict(learning_rate=1e-2, weight_decay=1e-2, momentum=0.9)),
])
def test_optimizer_matches_torch(rng, name, kw):
    """Our optax chains reproduce torch.optim.{Adam,SGD} trajectories."""
    w0 = rng.randn(5).astype(np.float32)
    g_seq = [rng.randn(5).astype(np.float32) for _ in range(5)]

    tw = torch.from_numpy(w0.copy()).requires_grad_(True)
    topt = (
        torch.optim.Adam([tw], lr=kw["learning_rate"], weight_decay=kw["weight_decay"])
        if name == "adam"
        else torch.optim.SGD(
            [tw], lr=kw["learning_rate"], momentum=kw["momentum"],
            weight_decay=kw["weight_decay"],
        )
    )
    for g in g_seq:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    tx = make_optimizer(name, **kw)
    w = jnp.asarray(w0)
    opt_state = tx.init(w)
    for g in g_seq:
        upd, opt_state = tx.update(jnp.asarray(g), opt_state, w)
        w = w + upd

    np.testing.assert_allclose(np.asarray(w), tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_step_schedule():
    s = make_schedule("step", base_lr=1e-4, decay_factor=0.1, decay_every=10)
    assert s(0) == pytest.approx(1e-4)
    assert s(9) == pytest.approx(1e-4)
    assert s(10) == pytest.approx(1e-5)
    assert s(25) == pytest.approx(1e-6)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, rng):
    state = small_state()
    step = build_train_step()
    batch = synth_batch(rng)
    for _ in range(3):
        state, _ = step(state, batch)
    path = save_checkpoint(str(tmp_path), state, best=True)
    assert "step_00000003" in path

    fresh = small_state()
    restored = restore_checkpoint(str(tmp_path), fresh)
    assert int(restored.step) == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # best alias restores too
    best = restore_checkpoint(str(tmp_path), fresh, best=True)
    assert int(best.step) == 3
    # resumed training continues bit-identically
    s1, m1 = step(state, batch)
    s2, m2 = step(restored, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


@pytest.mark.slow
def test_async_checkpoint_commits_and_restores(tmp_path, rng):
    """Async saves (the periodic-save path in the trainer) commit in
    the background and restore identically after the wait; a restore
    issued immediately after the save must itself wait, not read a
    half-written directory."""
    from ubresnet_tpu.train.checkpoint import wait_for_checkpoints

    state = small_state()
    step = build_train_step()
    batch = synth_batch(rng)
    for _ in range(2):
        state, _ = step(state, batch)
    save_checkpoint(str(tmp_path), state, async_=True)
    # no explicit wait: restore_checkpoint must block on the in-flight
    # write itself
    restored = restore_checkpoint(str(tmp_path), small_state())
    assert int(restored.step) == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # mutate-after-save: the snapshot, not the live state, is on disk
    state2, _ = step(state, batch)
    save_checkpoint(str(tmp_path), state2, async_=True)
    state3, _ = step(state2, batch)  # keeps devices busy post-dispatch
    wait_for_checkpoints()
    r2 = restore_checkpoint(str(tmp_path), small_state())
    assert int(r2.step) == 3


def test_grad_accumulation_matches_manual(rng):
    """accum_steps=2 over batch 4 == mean of the two micro grads fed
    to ONE optimizer update, with BN running stats updated
    sequentially (micro forwards normalize by their own moments —
    same semantics as hand-splitting the batch, equal to within f32
    reduction-order noise). SGD so the
    update is linear in the gradient — Adam's g/(|g|+eps) at step 1
    amplifies f32 reassociation noise on near-zero grad elements."""
    import optax

    model = UResNet(
        config=UResNetConfig(inplanes=4, input_channels=1),
        policy=Policy.f32(),
    )
    tx = make_optimizer("sgd", learning_rate=1e-3, momentum=0.9,
                        weight_decay=1e-3)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 1)), tx
    )
    batch = synth_batch(rng, b=4)
    accum = build_train_step(num_classes=3, accum_steps=2, donate=False)
    new_state, metrics = accum(state, batch)

    # manual: two micro value_and_grads at FIXED params, stats chained
    half = jax.tree_util.tree_map(lambda x: x.reshape((2, 2) + x.shape[1:]),
                                  batch)
    from ubresnet_tpu.losses import pixelwise_weighted_nll_from_logits

    def micro(stats, mb):
        def loss_fn(p):
            logits, upd = state.apply_fn(
                {"params": p, "batch_stats": stats}, mb["image"],
                train=True, logits=True, mutable=["batch_stats"],
            )
            return pixelwise_weighted_nll_from_logits(
                logits, mb["label"], mb["weight"]
            ), upd["batch_stats"]

        (loss, stats2), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return loss, stats2, g

    mb0 = jax.tree_util.tree_map(lambda x: x[0], half)
    mb1 = jax.tree_util.tree_map(lambda x: x[1], half)
    l0, s1, g0 = micro(state.batch_stats, mb0)
    l1, s2, g1 = micro(s1, mb1)
    gmean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g0, g1)
    upd, _ = state.tx.update(gmean, state.opt_state, state.params)
    want_params = optax.apply_updates(state.params, upd)

    np.testing.assert_allclose(
        float(metrics["loss"]), (float(l0) + float(l1)) / 2, rtol=1e-6
    )
    # f32 BN-train grads carry ~1e-2*global-scale reduction-order
    # noise (calibration note at tests/test_pallas_conv.py:254), and a
    # one-SGD-step param delta is lr x grad — threshold accordingly
    gsc = max(float(jnp.abs(g).max())
              for g in jax.tree_util.tree_leaves(gmean))
    atol = max(1e-3 * 3e-2 * gsc, 1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(want_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=atol)
    ssc = max(float(jnp.abs(v).max())
              for v in jax.tree_util.tree_leaves(s2))
    for a, b in zip(jax.tree_util.tree_leaves(new_state.batch_stats),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5 * ssc)


def test_grad_accumulation_trains(rng):
    state = small_state(lr=3e-3)
    step = build_train_step(num_classes=3, accum_steps=2)
    batch = synth_batch(rng, b=4)
    losses = []
    for _ in range(20):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.6, losses
    assert "acc_total" in metrics and "nan_skipped" in metrics


def test_prune_checkpoints(tmp_path):
    from ubresnet_tpu.train.checkpoint import latest_step, prune_checkpoints

    for s in (1, 2, 3, 4):
        (tmp_path / f"step_{s:08d}").mkdir()
    (tmp_path / "best").mkdir()
    prune_checkpoints(str(tmp_path), keep=2)
    left = sorted(p.name for p in tmp_path.iterdir())
    assert left == ["best", "step_00000003", "step_00000004"]
    assert latest_step(str(tmp_path)) == 4
    prune_checkpoints(str(tmp_path), keep=0)  # 0 = keep everything
    assert latest_step(str(tmp_path)) == 4


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == pytest.approx(2.0)
    assert m.val == 3.0
