"""W-packed execution: lane-efficient convs for low-channel stages.

TPU arrays tile (8, 128) on the last two dims. The U-ResNet's hottest
stages run 16-32 channels at 512²/256² resolution, so every memory op
and MXU pass wastes 7/8 of each tile (measured: 54 GB/s elementwise at
C=16 vs 337 GB/s at C=128; 3x3 conv at ~2% MXU efficiency). The fix:
fold ``p`` adjacent columns into channels —

    (b, h, w, c)  →  (b, h, w/p, p·c)

which is a *free reshape* in row-major layout (packed channel index =
offset·c + channel), and run an exactly-equivalent convolution in the
packed domain. The packed kernel is a static rearrangement of the
original: output col w_o = p·m + oo reads input col w_i = s·w_o + t − q,
which lives in packed cell s·m + ⌊(s·oo+t−q)/p⌋ at offset
(s·oo+t−q) mod p; scattering the original taps over (offset_in,
offset_out) blocks yields a dense (kh, D, p·ci, p·co) kernel. FLOPs
grow ×p but per-FLOP throughput grows far more at these widths.

Same math for the k4/s2 transposed conv with cell-level lhs_dilation:
even/odd output cells consume disjoint kernel taps, all encoded in one
dense kernel.

Parameters stay in the *unpacked* layout (imported reference
checkpoints work untouched); the rearrangement is traced per step and
is negligible next to the conv.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp


def pack(x: jax.Array, p: int) -> jax.Array:
    """(b, h, w, c) → (b, h, w/p, p·c) — pure reshape."""
    b, h, w, c = x.shape
    if w % p:
        raise ValueError(f"width {w} not divisible by pack {p}")
    return x.reshape(b, h, w // p, p * c)


def unpack(x: jax.Array, p: int) -> jax.Array:
    """(b, h, wc, p·c) → (b, h, wc·p, c) — pure reshape."""
    b, h, wc, pc = x.shape
    return x.reshape(b, h, wc * p, pc // p)


def packed_concat(a: jax.Array, b: jax.Array, p: int) -> jax.Array:
    """Channel-concat of two same-layout packed tensors: per-offset
    interleave via a 5-D view (pure reshapes around one concat)."""
    bb, h, wc, pca = a.shape
    ca, cb = pca // p, b.shape[-1] // p
    a5 = a.reshape(bb, h, wc, p, ca)
    b5 = b.reshape(bb, h, wc, p, cb)
    return jnp.concatenate([a5, b5], axis=-1).reshape(bb, h, wc, p * (ca + cb))


def _conv_plan(kw: int, p: int, stride: int, q: int):
    """Tap layout for the packed kernel: for each (out-offset, tap) the
    (cell-delta, in-offset); returns entries + cell span."""
    entries = []
    ds = []
    for oo in range(p):
        for t in range(kw):
            u = stride * oo + t - q
            d, oi = u // p, u % p
            entries.append((oo, t, d, oi))
            ds.append(d)
    dmin, dmax = min(ds), max(ds)
    return entries, dmin, dmax


def pack_conv_kernel(
    w: jax.Array, p: int, stride: int = 1, q: Optional[int] = None
) -> Tuple[jax.Array, Tuple[int, int]]:
    """(kh, kw, ci, co) → packed (kh, D, p·ci, p·co) + W cell padding.

    q is the real-domain left pad (default k//2, 'same')."""
    kh, kw, ci, co = w.shape
    if q is None:
        q = kw // 2
    entries, dmin, dmax = _conv_plan(kw, p, stride, q)
    D = dmax - dmin + 1
    wp = jnp.zeros((kh, D, p * ci, p * co), w.dtype)
    for oo, t, d, oi in entries:
        wp = wp.at[
            :, d - dmin, oi * ci : (oi + 1) * ci, oo * co : (oo + 1) * co
        ].add(w[:, t])
    return wp, (-dmin, dmax)


def packed_conv(
    x: jax.Array,
    w: jax.Array,
    p: int,
    stride: int = 1,
    q: Optional[int] = None,
    bias: Optional[jax.Array] = None,
    preferred: Optional[Any] = None,
) -> jax.Array:
    """'Same'-padded (stride 1) or strided conv on a packed tensor.

    x: (b, h, wc, p·ci) packed; w: unpacked (kh, kw, ci, co).
    Output: (b, h', wc', p·co) packed.

    ``preferred``: accumulation dtype (``preferred_element_type``) —
    the int8 PTQ path passes ``jnp.int32`` so the MXU runs its native
    s8×s8→s32 mode (ops/quant.py).
    """
    kh, kw, ci, co = w.shape
    if q is None:
        q = kw // 2
    wp, (plo, phi) = pack_conv_kernel(w, p, stride, q)
    y = jax.lax.conv_general_dilated(
        x,
        wp,
        window_strides=(stride, stride),
        padding=[(kh // 2, kh // 2), (plo, phi)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), p)
    return y


def pack_deconv_kernel(
    w: jax.Array, p: int
) -> Tuple[jax.Array, Tuple[int, int]]:
    """k4/s2/p1 transposed-conv kernel (kh=4, kw=4, ci, co, torch
    semantics, pre-flipped HWIO forward form) → packed kernel for a
    cell-dilated conv.

    Derivation: out col w_o = p·m + oo sums flipped taps τ=0..3 at
    dilated position w_o + τ − 2; only even positions hold data, at
    real in col (w_o+τ−2)/2 = cell j, offset oi. With lhs cell-dilation
    2, the tap's kernel position is P + (2j − m); even/odd m select
    disjoint taps of one dense kernel.
    """
    kh, kw, ci, co = w.shape
    assert kw == 4, "packed deconv derived for k=4 s=2 p=1"
    wf = jnp.flip(w, (0, 1))  # forward-conv form (torch flips)
    entries = []
    ds = []
    for m_par in (0, 1):  # output cell parity
        for oo in range(p):
            w_o = m_par * p + oo  # representative out col (m = m_par)
            for tau in range(4):
                u = w_o + tau - 2
                if u % 2:
                    continue
                w_i = u // 2
                j, oi = w_i // p, w_i % p
                # dilated-cell tap index relative to out cell m = m_par
                dd = 2 * j - m_par
                entries.append((oo, tau, dd, oi))
                ds.append(dd)
    dmin, dmax = min(ds), max(ds)
    D = dmax - dmin + 1
    wp = jnp.zeros((kh, D, p * ci, p * co), w.dtype)
    seen = set()
    for oo, tau, dd, oi in entries:
        key = (oo, tau, dd, oi)
        if key in seen:  # same tap can appear for both parities
            continue
        seen.add(key)
        wp = wp.at[
            :, dd - dmin, oi * ci : (oi + 1) * ci, oo * co : (oo + 1) * co
        ].add(wf[:, tau])
    return wp, (-dmin, dmax)


def packed_deconv2x(
    x: jax.Array, w: jax.Array, p: int, target_h: Optional[int] = None,
    preferred=None,
) -> jax.Array:
    """torch ConvTranspose2d(k=4, s=2, p=1) on a packed tensor.

    x: (b, h, wc, p·ci); w: unpacked transposed-conv natural layout
    (kh, kw, ci, co) (our Deconv2x param layout). Output doubles h and
    the packed cell count: (b, 2h, 2wc, p·co). ``preferred``: pass
    jnp.int32 for int8 operands (the MXU's exact s8×s8→s32 mode).
    """
    b, h, wc, pci = x.shape
    wp, (plo, _) = pack_deconv_kernel(w, p)
    th = target_h if target_h is not None else 2 * h
    h_phi = th - (2 * h - 1) + 4 - 1 - 2  # same math as Deconv2x
    # W: dilated cell length L = 2wc-1; out cells must be exactly 2wc:
    # phi = out - 1 + (D-1) - plo - (L-1) = D - plo
    w_phi = wp.shape[1] - plo
    y = jax.lax.conv_general_dilated(
        x,
        wp,
        window_strides=(1, 1),
        padding=[(2, h_phi), (plo, w_phi)],
        lhs_dilation=(2, 2),  # H real dilation; W cell dilation
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )
    return y


def tile_channel_vector(v: jax.Array, p: int) -> jax.Array:
    """Per-channel vector (c,) → packed (p·c,) (BN scale/bias/stats)."""
    return jnp.tile(v, p)
