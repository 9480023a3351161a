"""Model introspection — the reference's ``showsizes`` equivalent.

The reference models print every activation shape when constructed
with showsizes=True (ub_uresnet.py:35,90-145; ASPP_ResNet.py:418-521).
Here ``describe_model`` returns flax's tabulated layer/shape/param
report, and ``activation_shapes`` captures per-module output shapes
for a given input size.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def describe_model(model, input_shape: Tuple[int, ...] = (1, 512, 512, 1)) -> str:
    """Layer table with parameter counts and shapes."""
    return model.tabulate(
        jax.random.PRNGKey(0),
        jnp.zeros(input_shape, jnp.float32),
        console_kwargs={"width": 120},
        depth=2,
    )


def activation_shapes(
    model, variables, input_shape: Tuple[int, ...] = (1, 512, 512, 1)
) -> Dict[str, Tuple[int, ...]]:
    """Output shape of every submodule (eval_shape — no FLOPs spent)."""
    shapes: Dict[str, Tuple[int, ...]] = {}
    out, state = model.apply(
        variables,
        jnp.zeros(input_shape, jnp.float32),
        capture_intermediates=True,
        mutable=["intermediates"],
    )
    flat = jax.tree_util.tree_flatten_with_path(state["intermediates"])[0]
    for path, leaf in flat:
        if hasattr(leaf, "shape"):
            shapes[jax.tree_util.keystr(path)] = tuple(leaf.shape)
    shapes["<output>"] = tuple(out.shape)
    return shapes


def count_params(variables) -> int:
    return sum(
        x.size for x in jax.tree_util.tree_leaves(variables.get("params", variables))
    )
