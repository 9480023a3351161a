"""Differentiable 3x3/s2/p1 maxpool with a dense XLA backward.

jax's native VJP for max-pooling lowers to XLA SelectAndScatterAdd —
a sequential window-scan op with a notoriously weak TPU lowering.
This module replaces it with a closed-form dense backward: for each of
the 9 window taps, compare the tap's input against the pooled maximum
(first-match semantics in row-major window order, identical to
SelectAndScatter's GE-select scan order and torch MaxPool2d's argmax
tie-breaking), mask the output cotangent, and assemble the input
cotangent by interleaving the four (row, col) parity grids — pads,
compares, selects and one interleave, no scatter anywhere.

Reference motif: the UResNet stem pool (ub_uresnet.py:44,
MaxPool2d(3, stride=2, padding=1)) inside the training hot loop
(train_ubresnet2018_wlarcv2.py:342-344).

Requires even H and W (all stem shapes here; torch's floor semantics
give H/2 x W/2 exactly).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _pool_fwd(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


@jax.custom_vjp
def maxpool3x3s2_ad(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(3, stride=2, padding=1) on NHWC, even H/W.
    Forward == jax's reduce_window max; backward is the dense
    parity-grid form (no SelectAndScatterAdd)."""
    return _pool_fwd(x)


def _fwd(x):
    y = _pool_fwd(x)
    return y, (x, y)


def pool_backward(x: jax.Array, y: jax.Array, dy: jax.Array) -> jax.Array:
    """The dense parity-grid backward as a standalone function:
    dx given the pool's primal input, output and output cotangent
    (all NHWC, even H/W). Used by both the unpacked custom VJP here
    and the packed-forward variant below."""
    return _bwd((x, y), dy)[0]


def _bwd(saved, dy):
    x, y = saved
    b, h, w, c = x.shape
    ho, wo = y.shape[1], y.shape[2]
    ninf = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=ninf)

    # Per-tap first-match masks, row-major over (kr, kc) — the same
    # scan order XLA's GE-select uses, so tie routing is identical.
    found = jnp.zeros(y.shape, jnp.bool_)
    contrib = {}
    zero = jnp.zeros((), dy.dtype)
    for kr in range(3):
        for kc in range(3):
            xk = jax.lax.slice(
                xp,
                (0, kr, kc, 0),
                (b, kr + 2 * ho - 1, kc + 2 * wo - 1, c),
                (1, 2, 2, 1),
            )
            eq = jnp.logical_and(xk == y, jnp.logical_not(found))
            found = jnp.logical_or(found, eq)
            contrib[(kr, kc)] = jnp.where(eq, dy, zero)

    def pad_after(a, axis):
        cfg = [(0, 0, 0)] * 4
        cfg[axis] = (0, 1, 0)
        return jax.lax.pad(a, zero, cfg)

    def pad_before(a, axis):
        cfg = [(0, 0, 0)] * 4
        cfg[axis] = (1, 0, 0)
        return jax.lax.pad(a, zero, cfg)

    # Rows: padded row kr + 2r has parity kr%2. Even plane r' ∈
    # [0, ho] collects kr=0 @ r' and kr=2 @ r'-1; odd plane is kr=1.
    def row_planes(kc):
        e = pad_after(contrib[(0, kc)], 1) + pad_before(contrib[(2, kc)], 1)
        return e, contrib[(1, kc)]  # (b, ho+1, wo, c), (b, ho, wo, c)

    e0, o0 = row_planes(0)
    e1, o1 = row_planes(1)
    e2, o2 = row_planes(2)
    # Columns, same structure per row-parity plane.
    ee = pad_after(e0, 2) + pad_before(e2, 2)   # (b, ho+1, wo+1, c)
    eo = e1                                      # (b, ho+1, wo, c)
    oe = pad_after(o0, 2) + pad_before(o2, 2)   # (b, ho,   wo+1, c)
    oo = o1                                      # (b, ho,   wo,   c)

    # Interleave parities into the padded (h+2, w+2) grid, then strip
    # the pad ring. Odd padded row/col 2*ho+1 / 2*wo+1 receives no
    # tap — pad the odd planes by one zero to align shapes.
    def cols(e, o):  # -> (b, rows, 2*wo+2, c)
        o = pad_after(o, 2)
        return jnp.stack([e, o], axis=3).reshape(
            e.shape[0], e.shape[1], 2 * (wo + 1), c
        )

    er = cols(ee, eo)                            # (b, ho+1, w+2, c)
    orow = cols(oe, oo)                          # (b, ho,   w+2, c)
    orow = pad_after(orow, 1)                    # (b, ho+1, w+2, c)
    full = jnp.stack([er, orow], axis=2).reshape(
        b, 2 * (ho + 1), 2 * (wo + 1), c
    )
    return (full[:, 1 : h + 1, 1 : w + 1, :],)


maxpool3x3s2_ad.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def packed_pool_ad(x: jax.Array, p: int, interpret: bool = False):
    """3x3/s2/p1 maxpool on a W-packed NON-NEGATIVE tensor with the
    Pallas pool forward (ops/pallas_conv.py:fused_pool3x3s2 — the
    unpacked XLA pool runs C=16 tensors at 1/8 lane occupancy) and the
    dense parity-grid backward on unpacked VIEWS (pack/unpack are pure
    reshapes in this layout, so no transpose materialises).

    x: (b, h, wc, p*ci) with p*ci == 128, even h and wc*p.
    Returns (b, h/2, wc/2, p*ci)."""
    from ubresnet_tpu.ops.pallas_conv import fused_pool3x3s2

    return fused_pool3x3s2(x, p=p, interpret=interpret)


def _pp_fwd(x, p, interpret):
    y = packed_pool_ad(x, p, interpret)
    return y, (x, y)


def _pp_bwd(p, interpret, saved, dy):
    from ubresnet_tpu.ops.packed import pack, unpack

    x, y = saved
    dx = pool_backward(unpack(x, p), unpack(y, p), unpack(dy, p))
    return (pack(dx, p),)


packed_pool_ad.defvjp(_pp_fwd, _pp_bwd)


def _selftest():  # pragma: no cover - dev helper
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 3, (2, 8, 8, 3)), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(maxpool3x3s2_ad(x) ** 2))(x)
    gr = jax.grad(lambda x: jnp.sum(_pool_fwd(x) ** 2))(x)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(gr))


if __name__ == "__main__":  # pragma: no cover
    _selftest()
    print("ok")
