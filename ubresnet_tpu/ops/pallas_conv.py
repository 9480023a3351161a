"""Pallas fused conv for W-packed tensors (eval path).

The XLA packed conv (ops/packed.py) contracts over kw dense cell
blocks: K = kw * p * ci per kh tap — a p-fold FLOP inflation. This
kernel contracts over [cell | halo-combo] instead:

    acc = sum_kh  x_kh @ Wmain[kh]  +  combo_kh @ Whalo[kh]

where combo packs the kw//2 neighbor columns from the previous and
next cells into ONE 128-lane block, built once per tile in VMEM with
sublane/lane rolls + masks (DMA cannot place sub-128-aligned channel
slices, and materializing the halo in HBM via XLA loses to the concat —
both measured). MXU passes per kh drop from kw*p*ci/128 to
p*ci/128 + 1: 2 vs 3 at p=8,c=16,k=3; 3 vs 6 at 32-ch inputs (p=8);
2 vs 7 at k=7.

Everything is flattened to (rows, channels) 2D — (h, wc) fuse into one
sublane axis — so per-tap row slices are direct VMEM views (no
per-tap reshape copies) and the combo is computed ONCE for all kh taps.
The BatchNorm affine, conv bias, pre-add ReLU, residual add, and final
ReLU fuse into the epilogue, saving the elementwise HBM round-trips
between conv, BN, and the residual join (reference motif:
common_layers.py:39-58).

Eval-mode only (running BN stats, no autodiff); the training step keeps
the XLA path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

COMBO = 128  # lanes in the halo-combo block

# Scoped VMEM is 16 MB; Mosaic needs headroom for its own temporaries,
# so kernels size their row tiles against this budget.
VMEM_BUDGET = 11 * 2 ** 20


def _fit_th(h: int, th: int, est) -> int:
    """Largest row tile <= th that divides h and fits est(th) bytes in
    the VMEM budget. est() should count the kernel's major buffers
    (input slots, f32 temps, output block); tiles below 8 rows are not
    shrunk further (the estimate is conservative)."""
    while h % th:
        th //= 2
    while th > 8 and est(th) > VMEM_BUDGET:
        th //= 2
        while h % th:
            th //= 2
    return th


def _basic_block_est(wc, pci, pco, nb, nbo):
    """VMEM byte estimate for fused_basic_block at row tile t."""
    return lambda t: wc * (
        2 * (t + 4) * pci * nb                # xs double buffer
        + 2 * (t + 4) * COMBO * 4             # combo + c2nd f32 temps
        + (t + 2) * pco * (4 + nb)            # acc1 + y1
        + t * pco * (4 + nbo)                 # acc2 + out block
    )


def _dual_block_est(wc, pcia, pcib, pco, nb, nbo):
    """VMEM byte estimate for fused_dual_block at row tile t."""
    return lambda t: wc * (
        2 * (t + 4) * (pcia + pcib) * nb      # two stream double buffers
        + 3 * (t + 4) * COMBO * 4             # ca/cb/c2nd f32 temps
        + (t + 2) * pco * (4 + nb)            # acc1 + y1
        + t * pco * (4 + nbo)                 # acc2 + out block
    )


def block_kernel_fits(h: int, wc: int, pcia: int, pcib: int, pco: int,
                      nb: int, nbo: int) -> bool:
    """Whether the whole-block eval kernel (basic when pcib == 0, dual
    otherwise) has ANY row tile inside the VMEM budget at this shape.

    The block kernels tile over rows only — each tile spans the full
    packed width wc — so whole-plane spatial inputs (wholeview
    --spatial pads the reference 1008x3456 plane and runs ONE forward)
    can overflow scoped VMEM even at the 8-row minimum tile (measured:
    16.04M vs the 16M hardware limit at dec2 of the padded plane).
    Callers must route such shapes to the per-conv path instead."""
    est = (_basic_block_est(wc, pcia, pco, nb, nbo) if pcib == 0
           else _dual_block_est(wc, pcia, pcib, pco, nb, nbo))
    th = _fit_th(h, 32, est)
    return est(th) <= VMEM_BUDGET


def halo_weights(w: jax.Array, p: int):
    """(kh, kw, ci, co) unpacked conv kernel → (Wmain, Whalo):

    Wmain (kh, p*ci, p*co): in-cell taps — row u*ci+c is cell column u.
    Whalo (kh, 128, p*co): halo taps — rows [m*ci, ...) are the
      previous cell's column p - hw + m; rows [hw*ci + n*ci, ...) the
      next cell's column n (matching _combo's lane layout).
    """
    kh, kw, ci, co = w.shape
    hw = kw // 2
    pci, pco = p * ci, p * co
    wmain = jnp.zeros((kh, pci, pco), w.dtype)
    whalo = jnp.zeros((kh, COMBO, pco), w.dtype)
    for oo in range(p):
        for t in range(kw):
            u = oo + t - hw
            col = slice(oo * co, (oo + 1) * co)
            if 0 <= u < p:
                wmain = wmain.at[:, u * ci : (u + 1) * ci, col].set(w[:, t])
            elif u < 0:
                row = (u + hw) * ci
                whalo = whalo.at[:, row : row + ci, col].set(w[:, t])
            else:  # u >= p
                row = hw * ci + (u - p) * ci
                whalo = whalo.at[:, row : row + ci, col].set(w[:, t])
    return wmain, whalo


def _combo2(prev_src: jax.Array, nxt_src: jax.Array, hwci: int,
            wc: int) -> jax.Array:
    """Two-source halo block: (M, 128) with
    lanes [0, hwci)      = last hwci channels of prev_src's PREVIOUS row
    lanes [hwci, 2*hwci) = first hwci channels of nxt_src's NEXT row
    zeroed at image edges / row boundaries (cell 0 / cell wc-1, where
    cell = flat row index mod wc). prev_src == nxt_src gives the
    stride-1 neighbour-cell halo; the stride-2 kernels pass the odd /
    even cell-parity streams.

    Built with vector rolls in VMEM: DMA cannot place sub-128-aligned
    channel slices, and materializing the halo in HBM via an XLA
    pad+concat costs a full ~5 ms memory pass at model shapes — both
    measured and rejected."""
    m = prev_src.shape[0]
    # Mosaic's rotate requires 32-bit data; round-trip bf16 via f32.
    f32 = jnp.float32
    prev = pltpu.roll(prev_src[:, -COMBO:].astype(f32), shift=1, axis=0)
    nxt = pltpu.roll(nxt_src[:, :COMBO].astype(f32), shift=m - 1, axis=0)
    a = pltpu.roll(prev, shift=hwci, axis=1)  # ch 128-hwci+j -> lane j
    b = pltpu.roll(nxt, shift=hwci, axis=1)  # ch j -> lane hwci+j
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, COMBO), 1)
    cell = jax.lax.broadcasted_iota(jnp.int32, (m, COMBO), 0) % wc
    zero = jnp.zeros((), f32)
    left = jnp.where(cell > 0, a, zero)
    right = jnp.where(cell < wc - 1, b, zero)
    return jnp.where(
        lane < hwci, left, jnp.where(lane < 2 * hwci, right, zero)
    ).astype(prev_src.dtype)


def _combo(x2d: jax.Array, hwci: int, wc: int) -> jax.Array:
    """Single-source neighbour-cell halo block (see _combo2)."""
    return _combo2(x2d, x2d, hwci, wc)


def _halo_stream(x_hbm, xs, sems, *, nh, th, wc, hb, sem_idx=None):
    """Double-buffered halo-row streaming shared by the conv-family
    kernels. Flat layout: x_hbm (B, H*wc, C); xs scratch
    (2, (th + 2*hb)*wc, C) — program j starts the DMA for program j+1
    before computing, so the next tile streams in behind the current
    tile's matmuls. Starts this program's tile (at idx 0), prefetches
    the next program's tile, waits on this slot, zeroes the
    out-of-image halo rows. Returns the slot index.

    The wait descriptors MUST mirror the start descriptors exactly —
    that invariant lives only here now."""
    idx = pl.program_id(0)
    nprog = pl.num_programs(0)
    hrows = hb * wc

    def _dma(j, slot, op):
        bj = j // nh
        hj = j % nh

        def fill(src_row, dst_row, nrows):
            off = src_row * wc
            if (th * wc) % 8 == 0 and (hb * wc) % 8 == 0:
                # Mosaic must PROVE dynamic slice offsets hit sublane-
                # tile (8-row) boundaries. Every offset here is
                # hj*(th*wc) - {0, hb*wc}, divisible by 8 whenever both
                # terms are — true at non-power-of-2 cell counts (the
                # wholeview width gives wc = 104 or 52) where the
                # prover can't derive it; assert it explicitly.
                off = pl.multiple_of(off, 8)
            sem = sems.at[slot] if sem_idx is None else sems.at[slot, sem_idx]
            dma = pltpu.make_async_copy(
                x_hbm.at[bj, pl.ds(off, nrows * wc)],
                xs.at[slot, pl.ds(dst_row * wc, nrows * wc)],
                sem,
            )
            dma.start() if op == "start" else dma.wait()

        if hb == 0:
            fill(hj * th, 0, th)
        elif nh == 1:
            fill(0, hb, th)
        else:

            @pl.when(jnp.logical_and(hj > 0, hj < nh - 1))
            def _():
                fill(hj * th - hb, 0, th + 2 * hb)

            @pl.when(hj == 0)
            def _():
                fill(0, hb, th + hb)

            @pl.when(hj == nh - 1)
            def _():
                fill(hj * th - hb, 0, th + hb)

    slot = jax.lax.rem(idx, 2)

    @pl.when(idx == 0)  # warm-up: own tile
    def _():
        _dma(idx, slot, "start")

    @pl.when(idx + 1 < nprog)  # prefetch the next tile
    def _():
        _dma(idx + 1, jax.lax.rem(idx + 1, 2), "start")

    _dma(idx, slot, "wait")  # block until our slot's data landed
    hj = idx % nh

    def zero_rows(row0):
        xs[slot, pl.ds(row0, hrows)] = jnp.zeros(
            (hrows, xs.shape[2]), xs.dtype
        )

    if hb and nh > 1:
        # zero the out-of-image halo rows (after the DMA completes)
        @pl.when(hj == 0)
        def _():
            zero_rows(0)

        @pl.when(hj == nh - 1)
        def _():
            zero_rows((hb + th) * wc)

    elif hb and nh == 1:
        zero_rows(0)
        zero_rows((hb + th) * wc)

    return slot


def _conv_kernel(
    x_hbm,
    wm_ref,
    wh_ref,
    g_ref,
    b_ref,
    res_ref,
    out_ref,
    xs,
    sems,
    *,
    kh: int,
    hwci: int,
    th: int,
    wc: int,
    nh: int,
    act: bool,
    pre_act: bool,
    has_res: bool,
    quantized: bool = False,
):
    """Flat grid (B * H/th); halo-row streaming via _halo_stream."""
    m = th * wc
    slot = _halo_stream(x_hbm, xs, sems, nh=nh, th=th, wc=wc, hb=kh // 2)
    pco = out_ref.shape[-1]
    xall = xs[slot]
    call = _combo(xall, hwci, wc) if hwci else None
    # NOTE: the MXU ingests f32 operands at bf16 input precision here
    # (Precision.HIGHEST mis-lowers in this Mosaic version — produces
    # wrong results, measured); the fused path is therefore gated to
    # the bf16 compute policy where this is the native precision.
    # ``quantized``: s8 operands accumulate exactly in s32 (the MXU's
    # int8 mode, 2x its bf16 rate); the dequant scale rides g_ref.
    adt = jnp.int32 if quantized else jnp.float32
    acc = jnp.zeros((m, pco), adt)
    for k in range(kh):
        row0 = k * wc  # static python int: plain slices
        acc = acc + jnp.dot(
            xall[row0 : row0 + m],
            wm_ref[k],
            preferred_element_type=adt,
        )
        if hwci:
            acc = acc + jnp.dot(
                call[row0 : row0 + m],
                wh_ref[k],
                preferred_element_type=adt,
            )
    y = acc.astype(jnp.float32) * g_ref[0] + b_ref[0] \
        if quantized else acc * g_ref[0] + b_ref[0]
    if pre_act:
        y = jnp.maximum(y, 0.0)
    if has_res:
        y = y + res_ref[0].astype(jnp.float32)
    if act:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("p", "act", "pre_act", "th", "interpret",
                     "out_dtype"),
)
def fused_packed_conv(
    x: jax.Array,
    w: jax.Array,
    g: jax.Array,
    b: jax.Array,
    *,
    p: int,
    residual: Optional[jax.Array] = None,
    act: bool = True,
    pre_act: bool = False,
    th: int = 64,  # isolated convs at b16 prefer 32 (1.72 vs 2.10 ms)
    # but model-wide at the bench batch 64, th=64 wins (690 vs 678
    # crops/s) — more grid programs amortise worse at small tiles
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """Fused (packed conv k x k, stride 1) → affine → [pre-ReLU] →
    [+ residual] → [ReLU].

    x: (B, H, WC, p*ci) packed bf16/f32 — or int8 (with an int8 w):
       the conv then runs s8×s8→s32 on the MXU (2x its bf16 rate)
       and ``g`` must carry the dequant scale (sx·sw) folded into the
       BN gain (ops/quant.py). int8 callers must set ``out_dtype``.
    w: (kh, kw, ci, co) UNPACKED conv kernel (checkpoint layout)
    g, b: (p*co,) folded BN affine (fold the conv bias into b)
    residual: optional (B, H, WC, p*co), added after the pre-ReLU
    """
    bsz, h, wc, pci = x.shape
    kh, kw, ci, co = w.shape
    assert pci == p * ci, (pci, p, ci)
    assert kh % 2 == 1 and kw % 2 == 1, "odd kernels only ('same' conv)"
    quantized = x.dtype == jnp.int8
    if quantized:
        assert w.dtype == jnp.int8, "int8 x needs an int8 kernel"
        assert out_dtype is not None, "int8 callers must set out_dtype"
    out_dtype = x.dtype if out_dtype is None else out_dtype
    pco = p * co
    hwci = (kw // 2) * ci
    assert 2 * hwci <= COMBO, "halo wider than one combo tile"
    assert pci >= COMBO, "packed channels below one lane tile"
    # shrink the row tile until the kernel's VMEM footprint fits: two
    # x slots + f32 combo/acc intermediates + the out block (seen to
    # exceed the 16 MB scoped limit at 64-lane outputs with th=64)
    hb0 = kh // 2
    nb = x.dtype.itemsize
    nbo = jnp.dtype(out_dtype).itemsize
    th = _fit_th(h, th, lambda t: (
        2 * (t + 2 * hb0) * wc * pci * nb     # xs double buffer
        + 2 * (t + 2 * hb0) * wc * COMBO * 4  # combo + roll temps (f32)
        + t * wc * pco * 4                    # f32/s32 accumulator
        + t * wc * pco * nbo                  # out block
    ))
    wmain, whalo = halo_weights(w, p)
    wmain = wmain.astype(x.dtype)
    whalo = whalo.astype(x.dtype)
    gt = g.reshape(1, pco).astype(jnp.float32)
    bt = b.reshape(1, pco).astype(jnp.float32)
    hb = kh // 2
    nh = h // th
    grid = (bsz * nh,)
    has_res = residual is not None
    kernel = functools.partial(
        _conv_kernel,
        kh=kh,
        hwci=hwci,
        th=th,
        wc=wc,
        nh=nh,
        act=act,
        pre_act=pre_act,
        has_res=has_res,
        quantized=quantized,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # x DMA'd by the kernel
        pl.BlockSpec(memory_space=pltpu.VMEM),  # main weights
        pl.BlockSpec(memory_space=pltpu.VMEM),  # halo weights
        pl.BlockSpec(memory_space=pltpu.VMEM),  # g
        pl.BlockSpec(memory_space=pltpu.VMEM),  # b
    ]
    args = [x.reshape(bsz, h * wc, pci), wmain, whalo, gt, bt]
    if has_res:
        in_specs.append(
            pl.BlockSpec(
                (1, th * wc, pco),
                lambda i: (i // nh, i % nh, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(residual.reshape(bsz, h * wc, pco))
    else:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.zeros((1,), jnp.float32))
    flops = 2 * bsz * h * wc * kh * (pci + COMBO) * pco
    nbytes = x.dtype.itemsize
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th * wc, pco),
            lambda i: (i // nh, i % nh, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h * wc, pco), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, (th + 2 * hb) * wc, pci), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=bsz * h * wc * (pci * nbytes + pco * nbo),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(bsz, h, wc, pco)


# -------------------------------------------------- 3x3/s2 maxpool


def _pool_kernel(
    x_hbm, s1_ref, s2_ref, out_ref, xs, sems, *, ci: int, th: int,
    wc: int, nh: int,
):
    """3x3 stride-2 pad-1 maxpool on a packed tensor (the UResNet stem
    pool, ub_uresnet.py:44). Grid over OUTPUT row tiles of th rows;
    each program DMAs the 2*th+1 input rows it needs. Row taps are
    stride-2 sublane views; column taps are lane rolls with _combo
    cross-cell fill; the final 2-cells→1-cell lane decimation is two
    0/1 selection matmuls (exact: one term per output lane)."""
    idx = pl.program_id(0)
    nprog = pl.num_programs(0)
    m = th * wc

    def _dma(j, slot, op):
        bj = j // nh
        hj = j % nh

        def fill(src_row, dst_row, nrows):
            off = src_row * wc
            if wc % 8 == 0:
                # see _halo_stream: assert 8-row divisibility Mosaic's
                # prover can't derive for non-power-of-2 wc
                off = pl.multiple_of(off, 8)
            dma = pltpu.make_async_copy(
                x_hbm.at[bj, pl.ds(off, nrows * wc)],
                xs.at[slot, pl.ds(dst_row * wc, nrows * wc)],
                sems.at[slot],
            )
            dma.start() if op == "start" else dma.wait()

        if nh == 1:
            fill(0, 1, 2 * th)
        else:

            @pl.when(hj == 0)
            def _():
                fill(0, 1, 2 * th)

            @pl.when(hj > 0)
            def _():
                fill(2 * hj * th - 1, 0, 2 * th + 1)

    slot = jax.lax.rem(idx, 2)

    @pl.when(idx == 0)
    def _():
        _dma(idx, slot, "start")

    @pl.when(idx + 1 < nprog)
    def _():
        _dma(idx + 1, jax.lax.rem(idx + 1, 2), "start")

    _dma(idx, slot, "wait")
    hj = idx % nh

    @pl.when(hj == 0)  # pad row -1 (zero: pool input is post-ReLU >= 0)
    def _():
        xs[slot, pl.ds(0, wc)] = jnp.zeros((wc, xs.shape[2]), xs.dtype)

    xall = xs[slot]
    f32 = jnp.float32

    def zrow(k):  # input rows 2j + k for j in [0, th)
        v = xall[k * wc : k * wc + 2 * m]
        return v.reshape(th, 2 * wc, v.shape[-1])[:, :wc].reshape(
            m, v.shape[-1]
        )

    M = jnp.maximum(jnp.maximum(zrow(0), zrow(1)), zrow(2)).astype(f32)
    combo = _combo(M, ci, wc).astype(f32)
    lane = jax.lax.broadcasted_iota(jnp.int32, M.shape, 1)
    right = jnp.where(
        lane < ci, combo, pltpu.roll(M, shift=ci, axis=1)
    )  # col c-1
    cl = pltpu.roll(combo, shift=COMBO - 2 * ci, axis=1)
    left = jnp.where(
        lane >= COMBO - ci, cl, pltpu.roll(M, shift=COMBO - ci, axis=1)
    )  # col c+1
    N = jnp.maximum(jnp.maximum(M, right), left)
    pair = N.reshape(m // 2, 2, N.shape[-1])
    out = jnp.dot(
        pair[:, 0], s1_ref[...], preferred_element_type=f32
    ) + jnp.dot(pair[:, 1], s2_ref[...], preferred_element_type=f32)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("p", "th", "interpret"))
def fused_pool3x3s2(
    x: jax.Array, *, p: int, th: int = 32, interpret: bool = False
) -> jax.Array:
    """torch MaxPool2d(3, stride=2, padding=1) on a packed tensor with
    NON-NEGATIVE values (the stem pool follows a ReLU; zero padding is
    then identical to torch's -inf padding).

    x: (b, h, wc, p*ci) with p*ci == 128 and even h, wc. Returns
    (b, h/2, wc/2, p*ci) — the same pack view, half the cells."""
    bsz, h, wc, pci = x.shape
    ci = pci // p
    assert pci == COMBO, "pool kernel expects exactly one lane tile"
    assert h % 2 == 0 and wc % 2 == 0 and p % 2 == 0
    ho = h // 2
    nb = x.dtype.itemsize
    th = _fit_th(ho, th, lambda t: wc * (
        2 * (2 * t + 2) * pci * nb            # xs double buffer
        + 6 * t * COMBO * 4                   # M/combo/left/right f32
        + t * pci * (4 + nb) // 2             # out accum + block
    ))
    # selection matrices: out offset v (half-cell A) <- in offset 2v;
    # out offset v + p/2 (half-cell B) <- in offset 2v.
    s1 = np.zeros((COMBO, COMBO), np.float32)
    s2 = np.zeros((COMBO, COMBO), np.float32)
    for v in range(p // 2):
        for c in range(ci):
            s1[2 * v * ci + c, v * ci + c] = 1.0
            s2[2 * v * ci + c, (v + p // 2) * ci + c] = 1.0
    nh = ho // th
    grid = (bsz * nh,)
    kernel = functools.partial(_pool_kernel, ci=ci, th=th, wc=wc, nh=nh)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th * wc // 2, pci),
            lambda i: (i // nh, i % nh, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, ho * wc // 2, pci), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, (2 * th + 2) * wc, pci), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * ho * wc // 2 * 2 * COMBO * COMBO,
            bytes_accessed=bsz * h * wc * pci * x.dtype.itemsize * 5 // 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.reshape(bsz, h * wc, pci), jnp.asarray(s1), jnp.asarray(s2))
    return out.reshape(bsz, ho, wc // 2, pci)


# ------------------------------------------------ dual-input block


def _dual_block_kernel(
    a_hbm,
    b_hbm,
    wm1a_ref,
    wh1a_ref,
    wm1b_ref,
    wh1b_ref,
    g1_ref,
    b1_ref,
    wm2_ref,
    wh2_ref,
    g2_ref,
    b2_ref,
    wba_ref,
    wbb_ref,
    gb_ref,
    bb_ref,
    out_ref,
    xsa,
    xsb,
    sems,
    *,
    cia: int,
    cib: int,
    co: int,
    th: int,
    wc: int,
    nh: int,
    quantized: bool = False,
):
    """BasicBlock over an implicit channel-concat of two streams —
    conv(concat[a, b]) ≡ conv_a(a) + conv_b(b), so the decoder's
    skip join (DecoderBlock: deconv → concat → DoubleResNet,
    common_layers.py:122-132) never materialises the packed concat.
    Everything else matches _block_kernel (two 3x3 convs, pre-add
    ReLU, 1x1 bypass projection over both streams, residual add,
    final ReLU) with both inputs double-buffered from HBM.

    ``quantized``: int8 streams (ONE shared scale — calibration sees
    the concat), s32 accumulation, VMEM requant of the intermediate;
    scale folding as in _block_kernel."""
    hb = 2
    m = th * wc
    m1 = (th + 2) * wc
    slot = _halo_stream(a_hbm, xsa, sems, nh=nh, th=th, wc=wc, hb=hb,
                        sem_idx=0)
    _halo_stream(b_hbm, xsb, sems, nh=nh, th=th, wc=wc, hb=hb,
                 sem_idx=1)
    hj = pl.program_id(0) % nh
    hrows = hb * wc
    pco = out_ref.shape[-1]
    xa = xsa[slot]
    xb = xsb[slot]
    dt = xa.dtype
    adt = jnp.int32 if quantized else jnp.float32

    ca = _combo(xa, cia, wc)
    cb = _combo(xb, cib, wc)
    acc1 = jnp.zeros((m1, pco), adt)
    for k in range(3):
        r0 = k * wc
        for x2, c2, wm, wh in (
            (xa, ca, wm1a_ref, wh1a_ref),
            (xb, cb, wm1b_ref, wh1b_ref),
        ):
            acc1 = acc1 + jnp.dot(
                x2[r0 : r0 + m1], wm[k], preferred_element_type=adt
            )
            acc1 = acc1 + jnp.dot(
                c2[r0 : r0 + m1], wh[k], preferred_element_type=adt
            )
    y1 = jnp.maximum(
        acc1.astype(jnp.float32) * g1_ref[0] + b1_ref[0], 0.0
    )
    if quantized:  # requantize the intermediate on the int8 grid
        y1 = jnp.round(jnp.minimum(y1, 127.0))
    ridx = jax.lax.broadcasted_iota(jnp.int32, (m1, 1), 0)
    y1 = jnp.where(jnp.logical_and(hj == 0, ridx < wc), 0.0, y1)
    y1 = jnp.where(
        jnp.logical_and(hj == nh - 1, ridx >= m1 - wc), 0.0, y1
    ).astype(dt)

    c2nd = _combo(y1, co, wc)
    acc2 = jnp.zeros((m, pco), adt)
    for k in range(3):
        r0 = k * wc
        acc2 = acc2 + jnp.dot(
            y1[r0 : r0 + m], wm2_ref[k], preferred_element_type=adt
        )
        acc2 = acc2 + jnp.dot(
            c2nd[r0 : r0 + m], wh2_ref[k], preferred_element_type=adt
        )
    y2 = jnp.maximum(  # pre-add ReLU
        acc2.astype(jnp.float32) * g2_ref[0] + b2_ref[0], 0.0
    )

    res = (
        jnp.dot(
            xa[hrows : hrows + m], wba_ref[0],
            preferred_element_type=adt,
        )
        + jnp.dot(
            xb[hrows : hrows + m], wbb_ref[0],
            preferred_element_type=adt,
        )
    ).astype(jnp.float32) * gb_ref[0] + bb_ref[0]
    out_ref[0] = jnp.maximum(y2 + res, 0.0).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("p", "th", "interpret", "out_dtype")
)
def fused_dual_block(
    a: jax.Array,
    b: jax.Array,
    w1: jax.Array,
    g1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    g2: jax.Array,
    b2: jax.Array,
    wb: jax.Array,
    gb: jax.Array,
    bb: jax.Array,
    *,
    p: int,
    th: int = 32,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """BasicBlock over concat([a, b], channels), eval mode, without
    materialising the concat. a: (B, H, WC, p*cia), b: same spatial,
    p*cib channels; w1 (3, 3, cia+cib, co), w2 (3, 3, co, co),
    wb (1, 1, cia+cib, co) — checkpoint layouts; the kernels split by
    input stream here. g*/b* folded (p*co,) affines.

    int8 mode (a/b/w* int8, ``out_dtype`` required): both streams must
    share ONE activation scale (calibration sees the concat); dots run
    s8×s8→s32 and the intermediate requantizes in VMEM — scale folding
    as in fused_basic_block (_block_kernel int8 docstring)."""
    bsz, h, wc, pcia = a.shape
    _, _, _, pcib = b.shape
    _, _, cin, co = w1.shape
    cia, cib = pcia // p, pcib // p
    assert cin == cia + cib, (cin, cia, cib)
    pco = p * co
    assert w1.shape[:2] == (3, 3) and w2.shape[:2] == (3, 3), (
        "dual block kernel hardcodes 3x3 taps"
    )
    assert pcia >= COMBO and pcib >= COMBO and pco >= COMBO
    assert 2 * cia <= COMBO and 2 * cib <= COMBO and 2 * co <= COMBO
    quantized = a.dtype == jnp.int8
    if quantized:
        assert b.dtype == jnp.int8
        assert w1.dtype == jnp.int8 and w2.dtype == jnp.int8
        assert wb.dtype == jnp.int8
        assert out_dtype is not None, "int8 callers must set out_dtype"
    out_dtype = a.dtype if out_dtype is None else out_dtype
    nb = a.dtype.itemsize
    nbo = jnp.dtype(out_dtype).itemsize
    th = _fit_th(h, th, _dual_block_est(wc, pcia, pcib, pco, nb, nbo))
    wm1a, wh1a = halo_weights(w1[:, :, :cia], p)
    wm1b, wh1b = halo_weights(w1[:, :, cia:], p)
    wm2, wh2 = halo_weights(w2, p)
    wba, _ = halo_weights(wb[:, :, :cia], p)
    wbb, _ = halo_weights(wb[:, :, cia:], p)
    nh = h // th
    grid = (bsz * nh,)
    kernel = functools.partial(
        _dual_block_kernel,
        cia=cia, cib=cib, co=co, th=th, wc=wc, nh=nh,
        quantized=quantized,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    dt = a.dtype
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 2 + [vmem] * 14,
        out_specs=pl.BlockSpec(
            (1, th * wc, pco),
            lambda i: (i // nh, i % nh, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h * wc, pco), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, (th + 4) * wc, pcia), dt),
            pltpu.VMEM((2, (th + 4) * wc, pcib), dt),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wc
            * (3 * (pcia + pcib + 2 * COMBO) * pco
               + 3 * (pco + COMBO) * pco
               + (pcia + pcib) * pco),
            bytes_accessed=bsz * h * wc
            * ((pcia + pcib) * nb + pco * nbo),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        a.reshape(bsz, h * wc, pcia),
        b.reshape(bsz, h * wc, pcib),
        wm1a.astype(dt), wh1a.astype(dt),
        wm1b.astype(dt), wh1b.astype(dt),
        g1.reshape(1, pco).astype(jnp.float32),
        b1.reshape(1, pco).astype(jnp.float32),
        wm2.astype(dt), wh2.astype(dt),
        g2.reshape(1, pco).astype(jnp.float32),
        b2.reshape(1, pco).astype(jnp.float32),
        wba.astype(dt), wbb.astype(dt),
        gb.reshape(1, pco).astype(jnp.float32),
        bb.reshape(1, pco).astype(jnp.float32),
    )
    return out.reshape(bsz, h, wc, pco)


# ---------------------------------------------------- deconv2x kernel


def deconv_weights(w: jax.Array, p: int):
    """(4,4,ci,co) ConvTranspose2d natural-layout kernel → per-(parity,
    row-tap) matmul weights for the packed deconv kernel:

    Wmain (2, 2, p*ci, 2p*co), Whalo (2, 2, COMBO, 2p*co), indexed
    [a, s] with a = output row parity and s the row tap:
      a=0: s=0 reads input row r (k_h=1), s=1 row r-1 (k_h=3)
      a=1: s=0 reads input row r (k_h=2), s=1 row r+1 (k_h=0)
    (torch semantics: out[o] += w[k] x[i] where o = 2i + k - 1).

    Output offsets oo ∈ [0, 2p) live at absolute column 2p·m + oo; the
    two column taps per offset are k_w ≡ oo+1 (mod 2) at input offset
    u = (oo+1-k_w)/2. u = -1 hits the previous cell's last column and
    u = p the next cell's first — both inside one COMBO block."""
    kh, kw, ci, co = w.shape
    assert kh == 4 and kw == 4, "deconv kernel derived for k=4 s=2 p=1"
    pci, pco2 = p * ci, 2 * p * co
    wm = jnp.zeros((2, 2, pci, pco2), w.dtype)
    wh = jnp.zeros((2, 2, COMBO, pco2), w.dtype)
    krow = {(0, 0): 1, (0, 1): 3, (1, 0): 2, (1, 1): 0}
    for a in (0, 1):
        for s in (0, 1):
            kr = krow[(a, s)]
            for oo in range(2 * p):
                for kc in range(4):
                    if (oo + 1 - kc) % 2:
                        continue
                    u = (oo + 1 - kc) // 2
                    col = slice(oo * co, (oo + 1) * co)
                    if 0 <= u < p:
                        wm = wm.at[a, s, u * ci : (u + 1) * ci, col].add(
                            w[kr, kc]
                        )
                    elif u == -1:
                        wh = wh.at[a, s, 0:ci, col].add(w[kr, kc])
                    else:  # u == p
                        wh = wh.at[a, s, ci : 2 * ci, col].add(w[kr, kc])
    return wm, wh


def _deconv_kernel(
    x_hbm, wm_ref, wh_ref, *rest, ci: int, th: int,
    wc: int, nh: int, quantized: bool = False,
):
    """Grid (B * H/th) over INPUT row tiles; each program emits 2*th
    output rows (both parities, interleaved). Same flat layout and
    double-buffered DMA as _conv_kernel with a 1-row halo.

    ``quantized``: int8 x/weights, s32 accumulation (the MXU's 2x-rate
    mode); an extra g_ref input carries the (2p·co,) dequant vector
    (sx·sw on the output-offset layout) applied in the epilogue."""
    if quantized:
        g_ref, out_ref, xs, sems = rest
    else:
        out_ref, xs, sems = rest
    m = th * wc
    slot = _halo_stream(x_hbm, xs, sems, nh=nh, th=th, wc=wc, hb=1)
    pco2 = out_ref.shape[-1]
    xall = xs[slot]
    call = _combo(xall, ci, wc)
    adt = jnp.int32 if quantized else jnp.float32

    def parity(a):
        acc = jnp.dot(
            xall[wc : wc + m], wm_ref[a, 0],
            preferred_element_type=adt,
        ) + jnp.dot(
            call[wc : wc + m], wh_ref[a, 0],
            preferred_element_type=adt,
        )
        off = 0 if a == 0 else 2 * wc  # row r-1 / r+1
        acc = acc + jnp.dot(
            xall[off : off + m], wm_ref[a, 1],
            preferred_element_type=adt,
        ) + jnp.dot(
            call[off : off + m], wh_ref[a, 1],
            preferred_element_type=adt,
        )
        if quantized:
            return acc.astype(jnp.float32) * g_ref[0]
        return acc

    y0 = parity(0).reshape(th, wc, pco2)
    y1 = parity(1).reshape(th, wc, pco2)
    out = jnp.stack([y0, y1], axis=1).reshape(2 * m, pco2)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("p", "th", "interpret", "out_dtype")
)
def fused_packed_deconv2x(
    x: jax.Array,
    w: jax.Array,
    g: jax.Array = None,
    *,
    p: int,
    th: int = 32,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """ConvTranspose2d(k=4, s=2, p=1, bias=False) on a packed tensor —
    Pallas form of ops/packed.py:packed_deconv2x (reference motif:
    common_layers.py:122-132). Exact 2x upsample only (every decoder
    stage in the packed zone is exact-2x at 512-class shapes).

    x: (b, h, wc, p*ci); w: (4, 4, ci, co) natural ConvTranspose
    layout. Returns (b, 2h, 2wc, p*co) — bit-identical layout to the
    XLA packed path (out offsets 2p·m+oo ≡ packed cells 2m + oo//p).

    int8 mode (x/w int8): dots run s8×s8→s32 and ``g`` must carry the
    (2p·co,) dequant vector (tile sx·sw over the 2p output offsets);
    ``out_dtype`` required."""
    bsz, h, wc, pci = x.shape
    kh, kw, ci, co = w.shape
    assert pci == p * ci, (pci, p, ci)
    assert pci >= COMBO and 2 * ci <= COMBO
    quantized = x.dtype == jnp.int8
    if quantized:
        assert w.dtype == jnp.int8, "int8 x needs an int8 kernel"
        assert g is not None, "int8 callers must pass the dequant g"
        assert out_dtype is not None, "int8 callers must set out_dtype"
    out_dtype = x.dtype if out_dtype is None else out_dtype
    nb = x.dtype.itemsize
    nbo = jnp.dtype(out_dtype).itemsize
    th = _fit_th(h, th, lambda t: wc * (
        2 * (t + 2) * pci * nb                # xs double buffer
        + (t + 2) * COMBO * 4                 # combo f32 temps
        + 2 * t * 2 * p * co * (4 + nbo)      # acc + out (2x rows, pco2)
    ))
    wm, wh = deconv_weights(w, p)
    nh = h // th
    grid = (bsz * nh,)
    pco2 = 2 * p * co
    kernel = functools.partial(
        _deconv_kernel, ci=ci, th=th, wc=wc, nh=nh, quantized=quantized
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    ins = [
        x.reshape(bsz, h * wc, pci),
        wm.astype(x.dtype),
        wh.astype(x.dtype),
    ]
    if quantized:
        ins.append(g.reshape(1, pco2).astype(jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        + [vmem] * (len(ins) - 1),
        out_specs=pl.BlockSpec(
            (1, 2 * th * wc, pco2),
            lambda i: (i // nh, i % nh, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, 2 * h * wc, pco2), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, (th + 2) * wc, pci), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wc * 4 * (pci + COMBO) * pco2,
            bytes_accessed=bsz * h * wc * (pci * nb + 2 * pco2 * nbo),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*ins)
    return out.reshape(bsz, 2 * h, 2 * wc, p * co)


# ----------------------------------------- deconv2x backward (dx, dW)
#
# Both legs view the deconv's output-side tensor at pack factor 2p — a
# pure reshape of the (b, 2h, 2wc, p*co) forward layout to
# (b, 2h, wc, 2p*co) — which aligns output cells 1:1 with input cells:
# input col w_i = p*m + oi maps to output cols 2*w_i + k - 1, all inside
# output cell m (of 2p columns) except k=0 at oi=0 (previous cell's last
# column) and k=3 at oi=p-1 (next cell's first) — one COMBO halo block.
# Row taps pair input row r with output rows 2r-1..2r+2, streamed as
# two parity planes (_split_planes/_s2_planes) so each tap is a
# contiguous (th*wc)-row slice — per-tap strided sublane selection was
# the measured 6x VPU bottleneck of the first implementation.


def _split_planes(y: jax.Array, bsz: int, h2: int, wc: int) -> jax.Array:
    """(b, h2*wc, c) flat stride-2-side rows → (b, 2, h*wc, c): plane 0
    the even image rows (0, 2, …), plane 1 the odd (1, 3, …). One XLA
    transpose; lets the kernels DMA contiguous per-parity row windows
    instead of doing per-tap strided sublane selection in VMEM (the
    round-3-measured 6x VPU bottleneck of the old _rowsel2 form)."""
    c = y.shape[-1]
    h = h2 // 2
    return (
        y.reshape(bsz, h, 2, wc, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(bsz, 2, h * wc, c)
    )


def _s2_planes(y2_hbm, ys, sems, *, nh, th, wc, sem_base=0):
    """Double-buffered streaming of the stride-2-side rows in parity
    planes. For an output tile of th rows starting at r0 = hj*th:

      even plane local i ↔ image row 2*(r0+i), i ∈ [0, th]
      odd  plane local i ↔ image row 2*(r0+i)−1

    so every row tap of the s2 kernels is a CONTIGUOUS slice:
      kr=0 → odd[0:m], kr=1 → even[0:m],
      kr=2 → odd[wc:wc+m], kr=3 → even[wc:wc+m]   (m = th*wc).

    ys: (2, 2, (th+1)*wc, c) scratch indexed [slot, plane]; sems:
    DMA semaphores indexed [slot, sem_base + plane]. Out-of-image rows
    (odd local 0 at the top edge, even local th at the bottom) are
    zeroed after the wait."""
    idx = pl.program_id(0)
    nprog = pl.num_programs(0)

    def _dma(j, slot, op):
        bj = j // nh
        hj = j % nh

        def fill(plane, src_row, dst_row, nrows):
            off = src_row * wc
            if (th * wc) % 8 == 0 and wc % 8 == 0:
                # offsets are hj*(th*wc) - {0, wc}: assert the 8-row
                # divisibility Mosaic's prover can't always derive
                off = pl.multiple_of(off, 8)
            dma = pltpu.make_async_copy(
                y2_hbm.at[bj, plane, pl.ds(off, nrows * wc)],
                ys.at[slot, plane, pl.ds(dst_row * wc, nrows * wc)],
                sems.at[slot, sem_base + plane],
            )
            dma.start() if op == "start" else dma.wait()

        if nh == 1:
            # static single-tile case: both branches of a pl.when are
            # traced, so (th+1)-row reads must not appear at all here
            fill(0, 0, 0, th)
            fill(1, 0, 1, th)
            return

        @pl.when(hj < nh - 1)
        def _():
            fill(0, hj * th, 0, th + 1)

        @pl.when(hj == nh - 1)
        def _():
            fill(0, hj * th, 0, th)

        @pl.when(hj > 0)
        def _():
            fill(1, hj * th - 1, 0, th + 1)

        @pl.when(hj == 0)
        def _():
            fill(1, 0, 1, th)

    slot = jax.lax.rem(idx, 2)

    @pl.when(idx == 0)
    def _():
        _dma(idx, slot, "start")

    @pl.when(idx + 1 < nprog)
    def _():
        _dma(idx + 1, jax.lax.rem(idx + 1, 2), "start")

    _dma(idx, slot, "wait")
    hj = idx % nh

    def zero_rows(plane, row0):
        ys[slot, plane, pl.ds(row0, wc)] = jnp.zeros(
            (wc, ys.shape[3]), ys.dtype
        )

    @pl.when(hj == 0)
    def _():
        zero_rows(1, 0)

    @pl.when(hj == nh - 1)
    def _():
        zero_rows(0, th * wc)

    return slot


# tap kr of the s2 kernels → (parity plane, local row offset in cells)
_S2_TAPS = {0: (1, 0), 1: (0, 0), 2: (1, 1), 3: (0, 1)}


def s2k4_weights(w: jax.Array, p: int):
    """(4, 4, cin, cout) cross-correlation taps of the stride-2 k4
    pad-1 conv (the deconv2x input-gradient: dx[i] = sum_k w[k]
    dy[2i+k-1]) → per-row-tap matmul weights against the 2p-packed
    stride-2 side:

    Wmain (4, 2p*cin, p*cout): row u*cin+c is output-side column u of
      the cell; Whalo (4, COMBO, p*cout): rows [0,cin) the previous
      cell's last column, rows [cin,2cin) the next cell's first."""
    kh, kw, cin, cout = w.shape
    assert kh == 4 and kw == 4, "s2k4 weights derived for k=4 s=2 p=1"
    wm = jnp.zeros((4, 2 * p * cin, p * cout), w.dtype)
    wh = jnp.zeros((4, COMBO, p * cout), w.dtype)
    for oo in range(p):
        for kc in range(4):
            u = 2 * oo + kc - 1
            col = slice(oo * cout, (oo + 1) * cout)
            if 0 <= u < 2 * p:
                wm = wm.at[:, u * cin : (u + 1) * cin, col].add(w[:, kc])
            elif u < 0:
                wh = wh.at[:, 0:cin, col].add(w[:, kc])
            else:  # u == 2p
                wh = wh.at[:, cin : 2 * cin, col].add(w[:, kc])
    return wm, wh


def _s2k4_kernel(
    y_hbm, wm_ref, wh_ref, out_ref, ys, sems, *, cin: int, th: int,
    wc: int, nh: int,
):
    m = th * wc
    slot = _s2_planes(y_hbm, ys, sems, nh=nh, th=th, wc=wc)
    planes = (ys[slot, 0], ys[slot, 1])
    combos = (_combo(planes[0], cin, wc), _combo(planes[1], cin, wc))
    pco = out_ref.shape[-1]
    acc = jnp.zeros((m, pco), jnp.float32)
    for kr in range(4):
        par, roff = _S2_TAPS[kr]
        off = roff * wc
        acc = acc + jnp.dot(
            planes[par][off : off + m], wm_ref[kr],
            preferred_element_type=jnp.float32,
        )
        acc = acc + jnp.dot(
            combos[par][off : off + m], wh_ref[kr],
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("p", "th", "interpret"))
def fused_conv_s2k4(
    y: jax.Array,
    w: jax.Array,
    *,
    p: int,
    th: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Stride-2 k4 pad-1 cross-correlation on the 2p-packed stride-2
    side: out[r, i] = sum_{kr,kc} w[kr,kc] y[2r+kr-1, 2i+kc-1] — the
    input-gradient of ConvTranspose2d(k=4, s=2, p=1) (and a standalone
    strided conv). y: (b, 2h, wc, 2p*cin); w: (4, 4, cin, cout).
    Returns (b, h, wc, p*cout)."""
    bsz, h2, wc, pci2 = y.shape
    _, _, cin, cout = w.shape
    assert pci2 == 2 * p * cin, (pci2, p, cin)
    assert pci2 >= COMBO and 2 * cin <= COMBO
    h = h2 // 2
    pco = p * cout
    nb = y.dtype.itemsize
    th = _fit_th(h, th, lambda t: wc * (
        4 * (t + 1) * pci2 * nb               # parity-plane double buffer
        + 2 * (t + 1) * (pci2 + 2 * COMBO) * 4  # per-plane combo temps
        + t * pco * (4 + nb)                  # acc + out block
    ))
    wm, wh = s2k4_weights(w, p)
    nh = h // th
    grid = (bsz * nh,)
    kernel = functools.partial(
        _s2k4_kernel, cin=cin, th=th, wc=wc, nh=nh
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th * wc, pco),
            lambda i: (i // nh, i % nh, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h * wc, pco), y.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, (th + 1) * wc, pci2), y.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wc * 4 * (pci2 + COMBO) * pco,
            bytes_accessed=bsz * h * wc * (2 * pci2 + pco) * nb,
            transcendentals=0,
        ),
        interpret=interpret,
    )(_split_planes(y.reshape(bsz, h2 * wc, pci2), bsz, h2, wc),
      wm.astype(y.dtype), wh.astype(y.dtype))
    return out.reshape(bsz, h, wc, pco)


def _deconv_dw_kernel(
    x_hbm, dy_hbm, dwm_ref, dwh_ref, xs, dys, sems, *, co: int, th: int,
    wc: int, nh: int,
):
    """Grad-weights of deconv2x: dwm[kr] += x_tile^T @ dy_rows(kr),
    dwh[kr] += x_tile^T @ combo(dy_rows(kr)) — accumulated across the
    sequential grid like _dw_kernel."""
    idx = pl.program_id(0)
    m = th * wc
    slot = _halo_stream(x_hbm, xs, sems, nh=nh, th=th, wc=wc, hb=0,
                        sem_idx=0)
    _s2_planes(dy_hbm, dys, sems, nh=nh, th=th, wc=wc, sem_base=1)

    @pl.when(idx == 0)
    def _():
        dwm_ref[...] = jnp.zeros(dwm_ref.shape, dwm_ref.dtype)
        dwh_ref[...] = jnp.zeros(dwh_ref.shape, dwh_ref.dtype)

    xt = xs[slot]
    planes = (dys[slot, 0], dys[slot, 1])
    combos = (_combo(planes[0], co, wc), _combo(planes[1], co, wc))
    contract_rows = (((0,), (0,)), ((), ()))
    for kr in range(4):
        par, roff = _S2_TAPS[kr]
        off = roff * wc
        dwm_ref[kr] += jax.lax.dot_general(
            xt[0:m], planes[par][off : off + m], contract_rows,
            preferred_element_type=jnp.float32,
        )
        dwh_ref[kr] += jax.lax.dot_general(
            xt[0:m], combos[par][off : off + m], contract_rows,
            preferred_element_type=jnp.float32,
        )


def deconv_dw_adjoint(dwm: jax.Array, dwh: jax.Array, p: int, ci: int,
                      co: int) -> jax.Array:
    """Fold the packed-domain deconv grad-weight blocks back onto the
    unpacked (4, 4, ci, co) ConvTranspose kernel: input offset oi / tap
    kc reached output-side column u = 2*oi + kc - 1 (cell-local at 2p),
    with u = -1 / 2p in the halo block's two lane groups."""
    dw = jnp.zeros((4, 4, ci, co), dwm.dtype)
    for oi in range(p):
        rows = slice(oi * ci, (oi + 1) * ci)
        for kc in range(4):
            u = 2 * oi + kc - 1
            if 0 <= u < 2 * p:
                blk = dwm[:, rows, u * co : (u + 1) * co]
            elif u < 0:
                blk = dwh[:, rows, 0:co]
            else:  # u == 2p
                blk = dwh[:, rows, co : 2 * co]
            dw = dw.at[:, kc].add(blk)
    return dw


@functools.partial(jax.jit, static_argnames=("p", "th", "interpret"))
def pallas_deconv_dw(
    x: jax.Array,
    dy: jax.Array,
    *,
    p: int,
    th: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Grad-weights of ConvTranspose2d(k=4, s=2, p=1) on packed
    tensors, entirely in Pallas: x (b, h, wc, p*ci) is the deconv's
    primal input, dy (b, 2h, wc, 2p*co) the output cotangent in the
    2p-packed view. Returns the unpacked (4, 4, ci, co) gradient."""
    bsz, h, wc, pci = x.shape
    pco2 = dy.shape[-1]
    ci = pci // p
    co = pco2 // (2 * p)
    assert pci >= COMBO and pco2 >= COMBO and 2 * co <= COMBO
    nb = x.dtype.itemsize
    th = _fit_th(h, th, lambda t: wc * (
        2 * t * pci * nb                      # x double buffer
        + 4 * (t + 1) * pco2 * nb             # dy parity-plane buffers
        + 2 * (t + 1) * (pco2 + 2 * COMBO) * 4  # per-plane combo temps
    ) + 4 * pci * (pco2 + COMBO) * 4)         # accumulators
    nh = h // th
    grid = (bsz * nh,)
    kernel = functools.partial(
        _deconv_dw_kernel, co=co, th=th, wc=wc, nh=nh
    )
    dwm, dwh = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec(
                (4, pci, pco2), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, pci, COMBO), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, pci, pco2), jnp.float32),
            jax.ShapeDtypeStruct((4, pci, COMBO), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, th * wc, pci), x.dtype),
            pltpu.VMEM((2, 2, (th + 1) * wc, pco2), dy.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wc * 4 * pci * (pco2 + COMBO),
            bytes_accessed=bsz * h * wc * (pci + 2 * pco2) * nb,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.reshape(bsz, h * wc, pci),
      _split_planes(dy.reshape(bsz, 2 * h * wc, pco2), bsz, 2 * h, wc))
    return deconv_dw_adjoint(dwm, dwh, p, ci, co)


def deconv_ad_supported(p: int, ci: int, co: int) -> bool:
    """All three legs of the deconv2x VJP must fit their kernels."""
    return (
        p * ci >= COMBO      # fwd input lanes
        and 2 * ci <= COMBO  # fwd halo
        and 2 * p * co >= COMBO  # dy lanes in the 2p view (dx, dW)
        and 2 * co <= COMBO      # dy halo
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_deconv2x_ad(x, w, p, interpret=False):
    """Differentiable ConvTranspose2d(k=4, s=2, p=1) on packed tensors
    — Pallas on all three legs (fwd: fused_packed_deconv2x; dx: the
    stride-2 k4 kernel; dW: the deconv grad-weights accumulator), so
    the training graph keeps no XLA conv at the decoder upsamples.
    x: (b, h, wc, p*ci); w: (4, 4, ci, co) natural ConvTranspose
    layout. Returns (b, 2h, 2wc, p*co)."""
    return fused_packed_deconv2x(x, w, p=p, interpret=interpret)


def _deconv_ad_fwd(x, w, p, interpret):
    return fused_packed_deconv2x(x, w, p=p, interpret=interpret), (x, w)


def _deconv_ad_bwd(p, interpret, saved, dy):
    x, w = saved
    bsz, h2, wc2, pco = dy.shape
    dy2p = dy.reshape(bsz, h2, wc2 // 2, 2 * pco)  # the 2p-packed view
    wt = w.transpose(0, 1, 3, 2)  # (4, 4, co, ci): dx contracts co
    dx = fused_conv_s2k4(dy2p, wt.astype(dy.dtype), p=p,
                         interpret=interpret)
    dw = pallas_deconv_dw(x, dy2p, p=p, interpret=interpret)
    return dx.astype(x.dtype), dw.astype(w.dtype)


pallas_deconv2x_ad.defvjp(_deconv_ad_fwd, _deconv_ad_bwd)


# ------------------------------------------------- whole-block kernel


def _block_kernel(
    x_hbm,
    wm1_ref,
    wh1_ref,
    g1_ref,
    b1_ref,
    wm2_ref,
    wh2_ref,
    g2_ref,
    b2_ref,
    wb_ref,
    gb_ref,
    bb_ref,
    out_ref,
    xs,
    sems,
    *,
    hwci1: int,
    hwci2: int,
    th: int,
    wc: int,
    nh: int,
    has_bypass: bool,
    quantized: bool = False,
):
    """Whole BasicBlock (two 3x3 conv+BN stages, pre-add ReLU, bypass
    projection, residual add, final ReLU — common_layers.py:18-58) in
    ONE kernel: the intermediate activation lives only in VMEM, so the
    block's HBM traffic is read-x + write-out instead of the XLA
    path's six tensor round-trips. The model is HBM-bound (measured:
    ~43 GB accessed ≈ the whole forward's runtime), so this is where
    the packed stages' time actually goes.

    ``quantized``: x/weights are int8, dots accumulate in s32 (the
    MXU's 2x-rate mode) and the intermediate REQUANTIZES in VMEM —
    the caller pre-folds dequant (sx·sw1) AND the next conv's 1/s_mid
    into g1/b1, so the conv1 epilogue lands directly on the int8 grid
    (round + clip 127); g2 carries s_mid·sw2, gb carries sx·swb (or
    the plain sx dequant when the bypass is identity)."""
    hb = 2  # two chained 3x3 convs
    m = th * wc
    m1 = (th + 2) * wc
    slot = _halo_stream(x_hbm, xs, sems, nh=nh, th=th, wc=wc, hb=hb)
    hj = pl.program_id(0) % nh
    hrows = hb * wc
    pco = out_ref.shape[-1]
    xall = xs[slot]
    dt = xall.dtype
    adt = jnp.int32 if quantized else jnp.float32

    # conv1 over th+2 rows (conv2 needs one halo row each side)
    c1 = _combo(xall, hwci1, wc)
    acc1 = jnp.zeros((m1, pco), adt)
    for k in range(3):
        r0 = k * wc
        acc1 = acc1 + jnp.dot(
            xall[r0 : r0 + m1], wm1_ref[k],
            preferred_element_type=adt,
        )
        acc1 = acc1 + jnp.dot(
            c1[r0 : r0 + m1], wh1_ref[k],
            preferred_element_type=adt,
        )
    y1 = jnp.maximum(
        acc1.astype(jnp.float32) * g1_ref[0] + b1_ref[0], 0.0
    )
    if quantized:  # requantize the intermediate on the int8 grid
        y1 = jnp.round(jnp.minimum(y1, 127.0))
    # conv2's 'same' padding: conv1 rows beyond the image are ZERO
    # (they hold conv-over-garbage-halo values otherwise)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (m1, 1), 0)
    y1 = jnp.where(jnp.logical_and(hj == 0, ridx < wc), 0.0, y1)
    y1 = jnp.where(
        jnp.logical_and(hj == nh - 1, ridx >= m1 - wc), 0.0, y1
    ).astype(dt)

    # conv2 over th rows
    c2 = _combo(y1, hwci2, wc)
    acc2 = jnp.zeros((m, pco), adt)
    for k in range(3):
        r0 = k * wc
        acc2 = acc2 + jnp.dot(
            y1[r0 : r0 + m], wm2_ref[k],
            preferred_element_type=adt,
        )
        acc2 = acc2 + jnp.dot(
            c2[r0 : r0 + m], wh2_ref[k],
            preferred_element_type=adt,
        )
    y2 = jnp.maximum(  # pre-add ReLU
        acc2.astype(jnp.float32) * g2_ref[0] + b2_ref[0], 0.0
    )

    xmid = xall[hb * wc : hb * wc + m]
    if has_bypass:
        res = (
            jnp.dot(xmid, wb_ref[0], preferred_element_type=adt)
            .astype(jnp.float32)
            * gb_ref[0]
            + bb_ref[0]
        )
    elif quantized:  # identity bypass still needs the sx dequant
        res = xmid.astype(jnp.float32) * gb_ref[0] + bb_ref[0]
    else:
        res = xmid.astype(jnp.float32)
    out_ref[0] = jnp.maximum(y2 + res, 0.0).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("p", "th", "interpret", "out_dtype")
)
def fused_basic_block(
    x: jax.Array,
    w1: jax.Array,
    g1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    g2: jax.Array,
    b2: jax.Array,
    wb: Optional[jax.Array] = None,
    gb: Optional[jax.Array] = None,
    bb: Optional[jax.Array] = None,
    *,
    p: int,
    th: int = 32,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """Whole BasicBlock, stride 1, eval mode:
    relu( prerelu(bn2(conv2(relu(bn1(conv1(x)))))) + bypass(x) ).

    x: (B, H, WC, p*ci) packed; w1 (3,3,ci,co), w2 (3,3,co,co)
    unpacked checkpoint-layout kernels; g*/b* folded (p*co,) affines;
    wb (1,1,ci,co) optional projection (+gb/bb affine) — identity
    bypass when absent (requires ci == co).

    int8 mode (x/w* int8, ``out_dtype`` required): dots run s8×s8→s32
    and the intermediate requantizes in VMEM; the caller pre-folds the
    scale chain into g1/b1/g2/gb (see _block_kernel docstring). With
    an identity bypass, pass gb = sx·ones(p·co) / bb = zeros for the
    residual dequant."""
    bsz, h, wc, pci = x.shape
    _, _, ci, co = w1.shape
    assert pci == p * ci
    pco = p * co
    assert w1.shape[:2] == (3, 3) and w2.shape[:2] == (3, 3), (
        "block kernel hardcodes 3x3 taps"
    )
    assert 2 * ci <= COMBO and 2 * co <= COMBO
    assert pci >= COMBO and pco >= COMBO
    quantized = x.dtype == jnp.int8
    if quantized:
        assert w1.dtype == jnp.int8 and w2.dtype == jnp.int8
        assert out_dtype is not None, "int8 callers must set out_dtype"
        assert wb is None or wb.dtype == jnp.int8
        assert gb is not None and bb is not None, (
            "int8 identity bypass still needs the sx dequant affine"
        )
    out_dtype = x.dtype if out_dtype is None else out_dtype
    nb = x.dtype.itemsize
    nbo = jnp.dtype(out_dtype).itemsize
    th = _fit_th(h, th, _basic_block_est(wc, pci, pco, nb, nbo))
    wm1, wh1 = halo_weights(w1, p)
    wm2, wh2 = halo_weights(w2, p)
    has_bypass = wb is not None
    if has_bypass:
        wbm, _ = halo_weights(wb, p)
        gbt = gb.reshape(1, pco).astype(jnp.float32)
        bbt = bb.reshape(1, pco).astype(jnp.float32)
    else:
        assert ci == co, "identity bypass needs matching channels"
        wbm = jnp.zeros((1, pci, pco), x.dtype)
        gbt = (gb.reshape(1, pco).astype(jnp.float32) if quantized
               else jnp.zeros((1, pco), jnp.float32))
        bbt = (bb.reshape(1, pco).astype(jnp.float32) if quantized
               else jnp.zeros((1, pco), jnp.float32))
    nh = h // th
    grid = (bsz * nh,)
    kernel = functools.partial(
        _block_kernel,
        hwci1=ci,
        hwci2=co,
        th=th,
        wc=wc,
        nh=nh,
        has_bypass=has_bypass,
        quantized=quantized,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] + [vmem] * 11,
        out_specs=pl.BlockSpec(
            (1, th * wc, pco),
            lambda i: (i // nh, i % nh, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h * wc, pco), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, (th + 4) * wc, pci), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wc
            * (6 * (pci + COMBO) * pco // 2 + pci * pco),
            bytes_accessed=bsz * h * wc * (pci * nb + pco * nbo),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x.reshape(bsz, h * wc, pci),
        wm1.astype(x.dtype),
        wh1.astype(x.dtype),
        g1.reshape(1, pco).astype(jnp.float32),
        b1.reshape(1, pco).astype(jnp.float32),
        wm2.astype(x.dtype),
        wh2.astype(x.dtype),
        g2.reshape(1, pco).astype(jnp.float32),
        b2.reshape(1, pco).astype(jnp.float32),
        wbm.astype(x.dtype),
        gbt,
        bbt,
    )
    return out.reshape(bsz, h, wc, pco)


# --------------------------------------------------- dW (grad-weights)


def halo_weights_adjoint(dwm: jax.Array, dwh: jax.Array, p: int,
                         kw: int, ci: int, co: int) -> jax.Array:
    """Adjoint of halo_weights: gather the per-(offset, tap) gradient
    blocks back onto the unpacked (kh, kw, ci, co) kernel. Each
    unpacked tap was scattered to p (offset, position) slots by
    halo_weights; its gradient is the sum over those slots. Tiny
    tensors — runs as traced XLA adds."""
    kh = dwm.shape[0]
    hw = kw // 2
    dw = jnp.zeros((kh, kw, ci, co), dwm.dtype)
    for oo in range(p):
        for t in range(kw):
            u = oo + t - hw
            col = slice(oo * co, (oo + 1) * co)
            if 0 <= u < p:
                blk = dwm[:, u * ci : (u + 1) * ci, col]
            elif u < 0:
                row = (u + hw) * ci
                blk = dwh[:, row : row + ci, col]
            else:
                row = hw * ci + (u - p) * ci
                blk = dwh[:, row : row + ci, col]
            dw = dw.at[:, t].add(blk)
    return dw


def _dw_kernel(
    x_hbm,
    dy_hbm,
    dwm_ref,
    dwh_ref,
    xs,
    dys,
    sems,
    *,
    kh: int,
    hwci: int,
    th: int,
    wc: int,
    nh: int,
):
    """Grad-weights for the stride-1 packed conv, halo-matmul form:
    dWmain[k] = sum_tiles x_rows(k)^T @ dy, dWhalo[k] = combo(k)^T @ dy.
    TPU grid steps are sequential, so both outputs accumulate in VMEM
    (constant out index maps) and only the final program's state lands
    in HBM."""
    idx = pl.program_id(0)
    m = th * wc
    slot = _halo_stream(x_hbm, xs, sems, nh=nh, th=th, wc=wc, hb=kh // 2,
                        sem_idx=0)
    _halo_stream(dy_hbm, dys, sems, nh=nh, th=th, wc=wc, hb=0, sem_idx=1)

    @pl.when(idx == 0)
    def _():
        dwm_ref[...] = jnp.zeros(dwm_ref.shape, dwm_ref.dtype)
        dwh_ref[...] = jnp.zeros(dwh_ref.shape, dwh_ref.dtype)

    xall = xs[slot]
    dyt = dys[slot]
    call = _combo(xall, hwci, wc) if hwci else None
    contract_rows = (((0,), (0,)), ((), ()))
    for k in range(kh):
        row0 = k * wc
        dwm_ref[k] += jax.lax.dot_general(
            xall[row0 : row0 + m], dyt, contract_rows,
            preferred_element_type=jnp.float32,
        )
        if hwci:
            dwh_ref[k] += jax.lax.dot_general(
                call[row0 : row0 + m], dyt, contract_rows,
                preferred_element_type=jnp.float32,
            )


@functools.partial(jax.jit, static_argnames=("p", "kw", "th", "interpret"))
def pallas_conv_dw(
    x: jax.Array,
    dy: jax.Array,
    *,
    p: int,
    kw: int,
    th: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Grad-weights of the stride-1 'same' packed conv, entirely in
    Pallas: returns the UNPACKED (kh, kw, ci, co) kernel gradient.

    x: (B, H, WC, p*ci) packed input (the conv's primal input);
    dy: (B, H, WC, p*co) cotangent of the conv output. The kernel
    accumulates the packed-domain dW blocks (same layout halo_weights
    emits) over row tiles; halo_weights_adjoint folds them back to the
    checkpoint layout. Replaces the XLA grad-weights conv so the train
    zone has no XLA<->Pallas layout boundaries."""
    bsz, h, wc, pci = x.shape
    pco = dy.shape[-1]
    ci = pci // p
    co = pco // p
    if pco % COMBO:
        # Mosaic HBM slices must be lane-tile (128) aligned: a dy whose
        # packed width doesn't divide 128 (the num_classes=3 classifier
        # head) is channel-padded to the smallest co2 >= co with
        # p*co2 % 128 == 0, and the padded dW columns sliced off.
        # co2 must be a multiple of 128/gcd(p, 128) — COMBO//p alone is
        # wrong whenever it lands below co (negative pad) or p doesn't
        # divide 128 (never aligns).
        import math

        unit = COMBO // math.gcd(p, COMBO)
        co2 = unit * -(-co // unit)
        dy2 = jnp.pad(
            dy.reshape(bsz, h, wc, p, co),
            ((0, 0),) * 4 + ((0, co2 - co),),
        ).reshape(bsz, h, wc, p * co2)
        dw = pallas_conv_dw(x, dy2, p=p, kw=kw, th=th, interpret=interpret)
        return dw[..., :co]
    kh = kw
    hwci = (kw // 2) * ci
    assert 2 * hwci <= COMBO and pci >= COMBO
    nb = x.dtype.itemsize
    hb0 = kh // 2
    th = _fit_th(h, th, lambda t: (
        2 * (t + 2 * hb0) * wc * pci * nb     # xs double buffer
        + 2 * t * wc * pco * nb               # dy double buffer
        + 2 * (t + 2 * hb0) * wc * COMBO * 4  # combo + roll temps (f32)
        + kh * (pci + COMBO) * pco * 4        # accumulators
    ))
    nh = h // th
    grid = (bsz * nh,)
    kernel = functools.partial(
        _dw_kernel, kh=kh, hwci=hwci, th=th, wc=wc, nh=nh
    )
    dwm, dwh = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec(
                (kh, pci, pco), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (kh, COMBO, pco), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kh, pci, pco), jnp.float32),
            jax.ShapeDtypeStruct((kh, COMBO, pco), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, (th + 2 * hb0) * wc, pci), x.dtype),
            pltpu.VMEM((2, th * wc, pco), dy.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wc * kh * (pci + COMBO) * pco,
            bytes_accessed=bsz * h * wc * (pci + pco) * nb,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.reshape(bsz, h * wc, pci), dy.reshape(bsz, h * wc, pco))
    return halo_weights_adjoint(dwm, dwh, p, kw, ci, co)


# ------------------------------------------ differentiable packed conv


def _pad_channels(co: int) -> int:
    """Smallest 128-divisor channel count >= co (powers of two divide
    128): the dx leg zero-pads dy/kernel channels up to this so a
    lane-filling pack factor exists even when co doesn't divide 128
    (the num_classes=3 classifier head)."""
    return co if COMBO % co == 0 else 1 << (co - 1).bit_length()


def conv_ad_supported(p: int, kw: int, ci: int, co: int) -> bool:
    """All three VJP legs must fit their kernels: the forward contracts
    p*ci lanes (halo width (kw//2)*ci); the dx pass runs the same
    kernel on dy with the flipped/transposed kernel, contracting
    co-channel lanes — dy is re-viewed at its own lane-filling pack
    factor (a free reshape), channel-padded to a 128-divisor when
    needed; the dW pass shares the forward's lane constraints."""
    cod = _pad_channels(co)
    return (
        p * ci >= COMBO
        and 2 * (kw // 2) * ci <= COMBO
        and 2 * (kw // 2) * co <= COMBO
        and (p * co >= COMBO
             or (cod <= COMBO and 2 * (kw // 2) * cod <= COMBO))
    )


def _conv_noepi(x, w, p, interpret):
    pco = p * w.shape[-1]
    return fused_packed_conv(
        x,
        w,
        jnp.ones((pco,), jnp.float32),
        jnp.zeros((pco,), jnp.float32),
        p=p,
        act=False,
        interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_conv_ad(x, w, p, interpret=False):
    """Differentiable stride-1 'same' packed conv — the training-path
    counterpart of the eval-only fused kernels.

    Forward: the halo-matmul Pallas kernel (no epilogue — BN batch
    statistics need the raw conv output, so BN/ReLU stay XLA ops the
    compiler fuses elementwise).

    Backward:
      dx — gradient of a stride-1 'same' odd conv is the same conv of
        dy with the spatially-flipped, in/out-transposed kernel; it
        reuses the SAME Pallas kernel, so the dx leg gets the identical
        pass-count win over the XLA packed conv.
      dW — computed in the UNPACKED domain: pack/unpack are pure
        reshapes, so unpacking x and dy is free, and XLA's
        grad-weights conv there costs the TRUE conv FLOPs. The XLA
        packed path instead differentiates through the p-fold densified
        kernel, paying the full p-fold inflation on this leg.

    x: (B, H, WC, p*ci) packed; w: (kh, kw, ci, co) unpacked
    (checkpoint layout). Requires conv_ad_supported(p, kw, ci, co).
    """
    return _conv_noepi(x, w, p, interpret)


def _conv_ad_fwd(x, w, p, interpret):
    return _conv_noepi(x, w, p, interpret), (x, w)


def _conv_ad_bwd(p, interpret, saved, dy):
    from ubresnet_tpu.ops.packed import pack, packed_conv, unpack

    x, w = saved
    kh, kw, ci, co = w.shape
    wt = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
    # dy's lane-filling pack factor (free re-view); dx comes back with
    # ci channels at pb and is re-viewed to the caller's p.
    cod = _pad_channels(co)
    pb = p if p * co >= COMBO else COMBO // cod
    if pb != p and (dy.shape[2] * p) % pb:
        pb = p  # width not divisible by the lane-filling factor
    if pb * co >= COMBO:
        dyb = pack(unpack(dy, p), pb) if pb != p else dy
        dx = _conv_noepi(dyb, wt, pb, interpret)
        if pb != p:
            dx = pack(unpack(dx, pb), p)
    elif pb != p and pb * cod >= COMBO:
        # co doesn't divide 128 (the num_classes=3 classifier): zero-pad
        # dy/kernel channels to cod so a lane-filling view exists — one
        # pad materialisation on a co-channel tensor, still Pallas
        dyu = jnp.pad(unpack(dy, p), ((0, 0),) * 3 + ((0, cod - co),))
        wtp = jnp.pad(wt, ((0, 0), (0, 0), (0, cod - co), (0, 0)))
        dx = pack(
            unpack(_conv_noepi(pack(dyu, pb), wtp, pb, interpret), pb), p
        )
    else:
        # no usable full-lane view (width not divisible): XLA packed
        # conv for the dx leg rather than tripping the kernel's
        # pci >= 128 assert
        dx = packed_conv(dy.astype(x.dtype), wt.astype(x.dtype), p)

    # dW entirely in Pallas (grad-weights accumulator kernel): the
    # halo-matmul form costs the same inflated FLOPs as XLA's
    # packed-domain grad-weights conv but keeps the train zone free of
    # XLA<->Pallas layout boundaries. (Measured and rejected: dW via
    # XLA grad-weights in the UNPACKED domain — true FLOPs but 20x
    # slower (44.7 vs 2.3 ms/layer); low-channel grad-weights is the
    # same ~2%-MXU problem packing exists to solve.)
    dw = pallas_conv_dw(
        x, dy.astype(x.dtype), p=p, kw=kw, interpret=interpret
    )
    return dx.astype(x.dtype), dw.astype(w.dtype)


pallas_conv_ad.defvjp(_conv_ad_fwd, _conv_ad_bwd)
