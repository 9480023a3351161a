"""Train/eval step builders — pure functions, jitted once, GSPMD-sharded.

The reference's training iteration (train_ubresnet2018_wlarcv2.py:319-396:
forward → PixelWiseNLLLoss → backward → Adam step → accuracy meters)
becomes a single fused XLA program: loss+grad+optimizer+metrics compile
into one executable, batch sharded over the mesh 'data' axis, gradient
all-reduce inserted by GSPMD over ICI. BatchNorm statistics are computed
by global-mean reductions, so under pjit they are cross-replica
automatically — stronger than the reference's per-GPU DataParallel BN.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ubresnet_tpu.losses import pixelwise_weighted_nll_from_logits
from ubresnet_tpu.train.metrics import pixel_accuracy


class TrainState(struct.PyTreeNode):
    """Carried training state: a single pytree for checkpointing.

    Mirrors the reference checkpoint payload
    {iter, epoch, state_dict, best_prec1, optimizer}
    (train_ubresnet2018_wlarcv2.py:474-479) as
    {step, params, batch_stats, opt_state, best_metric}.
    """

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    best_metric: jax.Array
    # cumulative count of update steps skipped by the on-device
    # non-finite guard (not part of the checkpoint payload)
    nan_count: jax.Array

    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def init_model(model, rng, example_batch):
    """Jitted model init.

    Eager init dispatches hundreds of tiny ops to the device (≈160 s
    through the TPU tunnel); jitting collapses it to one executable.
    """
    return jax.jit(functools.partial(model.init, train=False))(rng, example_batch)


def create_train_state(
    model, rng, example_input, tx: optax.GradientTransformation
) -> TrainState:
    variables = init_model(model, rng, example_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        best_metric=jnp.zeros((), jnp.float32),
        nan_count=jnp.zeros((), jnp.int32),
        apply_fn=model.apply,
        tx=tx,
    )


def build_train_step(
    num_classes: int = 3,
    class_weights: Optional[jax.Array] = None,
    donate: bool = True,
    use_pallas_loss: bool = False,
    sparse_hw: Optional[tuple] = None,
    remat: bool = False,
    accum_steps: int = 1,
):
    """Returns jitted train_step(state, batch) -> (state, metrics).

    batch: dict with
      image  (b, h, w, c) float  — ADC values
      label  (b, h, w)    int    — class ids
      weight (b, h, w)    float  — per-pixel loss weights
    metrics: loss, total/per-class/nonzero pixel accuracy (the
    reference's accuracy() set, train_ubresnet2018_wlarcv2.py:509-566
    plus the larcv1 'nonzero' combined metric, wlarcv1:584).

    accum_steps > 1 splits the batch into that many microbatches and
    lax.scan's the forward+backward over them, accumulating the mean
    gradient before ONE optimizer update — activation memory of a
    microbatch at the optimizer behavior of the full batch (composes
    with remat for the deepest memory cuts). BN caveat: each micro
    forward normalizes by its own microbatch moments (exactly as if
    the micros were separate steps), and running stats update
    sequentially; per-class accuracies are means of per-micro values.
    """

    if use_pallas_loss and class_weights is not None:
        raise NotImplementedError("pallas loss does not take class_weights yet")

    def loss_impl(logits, labels, weights):
        if use_pallas_loss:
            from ubresnet_tpu.ops.pallas_loss import pallas_weighted_nll

            return pallas_weighted_nll(logits, labels, weights, False)
        return pixelwise_weighted_nll_from_logits(
            logits, labels, weights, class_weights
        )

    def step(state: TrainState, batch):
        if sparse_hw is not None:
            # batch arrived in sparse COO transfer form; densify on
            # device inside the compiled step (ops/sparse.py)
            from ubresnet_tpu.ops.sparse import densify_batch

            batch = densify_batch(batch, tuple(sparse_hw))

        def micro_step(stats, mb):
            def fwd(params, image):
                return state.apply_fn(
                    {"params": params, "batch_stats": stats},
                    image,
                    train=True,
                    logits=True,
                    mutable=["batch_stats"],
                )

            if remat:
                # rematerialize the forward on the backward pass —
                # trades ~1/3 more FLOPs for activation memory
                # (jax.checkpoint), enabling large batches at 512x512
                # (the reference filled a 16 GB P100 at batch 4,
                # SURVEY.md §6)
                fwd = jax.checkpoint(fwd)

            def loss_fn(params):
                logits, updates = fwd(params, mb["image"])
                loss = loss_impl(logits, mb["label"], mb["weight"])
                return loss, (logits, updates["batch_stats"])

            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            m = {"loss": loss}
            m.update(pixel_accuracy(logits, mb["label"], num_classes))
            return m, new_stats, grads

        if accum_steps > 1:
            b = batch["image"].shape[0]
            assert b % accum_steps == 0, (
                f"batch {b} not divisible by accum_steps {accum_steps}"
            )

            def split(x):
                return x.reshape((accum_steps, b // accum_steps) + x.shape[1:])

            micros = jax.tree_util.tree_map(split, batch)

            def body(carry, mb):
                stats, gsum = carry
                m, new_stats, grads = micro_step(stats, mb)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                return (new_stats, gsum), m

            (new_stats, gsum), ms = jax.lax.scan(
                body,
                (state.batch_stats,
                 jax.tree_util.tree_map(jnp.zeros_like, state.params)),
                micros,
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, gsum)
            metrics_mean = {k: jnp.mean(v) for k, v in ms.items()}
            loss = metrics_mean["loss"]
        else:
            metrics_mean, new_stats, grads = micro_step(
                state.batch_stats, batch
            )
            loss = metrics_mean["loss"]
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # On-device non-finite guard: a NaN/inf loss or gradient skips
        # the whole update (params/opt_state/batch_stats keep their old
        # values) so poisoned state can never be checkpointed — checked
        # EVERY iteration, unlike the reference which only notices at
        # print boundaries (train_ubresnet2018_wlarcv2.py:353-376).
        ok = jax.tree_util.tree_reduce(
            lambda a, g: jnp.logical_and(a, jnp.all(jnp.isfinite(g))),
            grads,
            jnp.isfinite(loss),
        )

        def guard(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, old
            )

        metrics = dict(metrics_mean)
        new_nan_count = state.nan_count + jnp.where(ok, 0, 1).astype(jnp.int32)
        metrics["nan_skipped"] = new_nan_count
        new_state = state.replace(
            step=state.step + 1,
            params=guard(new_params, state.params),
            batch_stats=guard(new_stats, state.batch_stats),
            opt_state=guard(new_opt, state.opt_state),
            nan_count=new_nan_count,
        )
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def build_eval_step(num_classes: int = 3, class_weights: Optional[jax.Array] = None):
    """Jitted eval step: running-stats BN, loss + accuracies, no update."""

    def step(state: TrainState, batch):
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"],
            train=False,
            logits=True,
        )
        loss = pixelwise_weighted_nll_from_logits(
            logits, batch["label"], batch["weight"], class_weights
        )
        metrics = {"loss": loss}
        metrics.update(pixel_accuracy(logits, batch["label"], num_classes))
        return metrics

    return jax.jit(step)
