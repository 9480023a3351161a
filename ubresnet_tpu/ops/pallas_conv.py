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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

COMBO = 128  # lanes in the halo-combo block


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


def _combo(x2d: jax.Array, hwci: int, wc: int) -> jax.Array:
    """(M, pci) flat rows → (M, 128) halo block:
    lanes [0, hwci)      = last hwci channels of the PREVIOUS cell
    lanes [hwci, 2*hwci) = first hwci channels of the NEXT cell
    zeroed at image edges / row boundaries (cell 0 / cell wc-1).

    Built with vector rolls in VMEM: DMA cannot place sub-128-aligned
    channel slices, and materializing the halo in HBM via an XLA
    pad+concat costs a full ~5 ms memory pass at model shapes — both
    measured and rejected."""
    m = x2d.shape[0]
    # Mosaic's rotate requires 32-bit data; round-trip bf16 via f32.
    f32 = jnp.float32
    prev = pltpu.roll(x2d[:, -COMBO:].astype(f32), shift=1, axis=0)
    nxt = pltpu.roll(x2d[:, :COMBO].astype(f32), shift=m - 1, axis=0)
    a = pltpu.roll(prev, shift=hwci, axis=1)  # ch 128-hwci+j -> lane j
    b = pltpu.roll(nxt, shift=hwci, axis=1)  # ch j -> lane hwci+j
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, COMBO), 1)
    cell = jax.lax.broadcasted_iota(jnp.int32, (m, COMBO), 0) % wc
    zero = jnp.zeros((), f32)
    left = jnp.where(cell > 0, a, zero)
    right = jnp.where(cell < wc - 1, b, zero)
    return jnp.where(
        lane < hwci, left, jnp.where(lane < 2 * hwci, right, zero)
    ).astype(x2d.dtype)


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
):
    """Flat grid (B * H/th). Flat layout: x_hbm (B, H*wc, pci);
    xs scratch (2, (th + 2*hb)*wc, pci) — two slots, double-buffered:
    program j starts the DMA for program j+1 before computing, so the
    next tile streams in behind the current tile's matmuls."""
    hb = kh // 2
    idx = pl.program_id(0)
    nprog = pl.num_programs(0)
    m = th * wc
    hrows = hb * wc

    def _dma(j, slot, op):
        """Build the x DMA for program j into xs[slot] and start or
        wait it — waits must mirror the start descriptors."""
        bj = j // nh
        hj = j % nh

        def fill(src_row, dst_row, nrows):
            dma = pltpu.make_async_copy(
                x_hbm.at[bj, pl.ds(src_row * wc, nrows * wc)],
                xs.at[slot, pl.ds(dst_row * wc, nrows * wc)],
                sems.at[slot],
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

    pco = out_ref.shape[-1]
    xall = xs[slot]
    call = _combo(xall, hwci, wc) if hwci else None
    # NOTE: the MXU ingests f32 operands at bf16 input precision here
    # (Precision.HIGHEST mis-lowers in this Mosaic version — produces
    # wrong results, measured); the fused path is therefore gated to
    # the bf16 compute policy where this is the native precision.
    acc = jnp.zeros((m, pco), jnp.float32)
    for k in range(kh):
        row0 = k * wc  # static python int: plain slices
        acc = acc + jnp.dot(
            xall[row0 : row0 + m],
            wm_ref[k],
            preferred_element_type=jnp.float32,
        )
        if hwci:
            acc = acc + jnp.dot(
                call[row0 : row0 + m],
                wh_ref[k],
                preferred_element_type=jnp.float32,
            )
    y = acc * g_ref[0] + b_ref[0]
    if pre_act:
        y = jnp.maximum(y, 0.0)
    if has_res:
        y = y + res_ref[0].astype(jnp.float32)
    if act:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("p", "act", "pre_act", "th", "interpret"),
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
    th: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Fused (packed conv k x k, stride 1) → affine → [pre-ReLU] →
    [+ residual] → [ReLU].

    x: (B, H, WC, p*ci) packed bf16/f32
    w: (kh, kw, ci, co) UNPACKED conv kernel (checkpoint layout)
    g, b: (p*co,) folded BN affine (fold the conv bias into b)
    residual: optional (B, H, WC, p*co), added after the pre-ReLU
    """
    bsz, h, wc, pci = x.shape
    kh, kw, ci, co = w.shape
    assert pci == p * ci, (pci, p, ci)
    assert kh % 2 == 1 and kw % 2 == 1, "odd kernels only ('same' conv)"
    pco = p * co
    hwci = (kw // 2) * ci
    assert 2 * hwci <= COMBO, "halo wider than one combo tile"
    assert pci >= COMBO, "packed channels below one lane tile"
    while h % th:
        th //= 2
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
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM; DMA'd
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
        out_shape=jax.ShapeDtypeStruct((bsz, h * wc, pco), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, (th + 2 * hb) * wc, pci), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(bsz * h * wc * (pci + pco)) * nbytes,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(bsz, h, wc, pco)


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
):
    """Whole BasicBlock (two 3x3 conv+BN stages, pre-add ReLU, bypass
    projection, residual add, final ReLU — common_layers.py:18-58) in
    ONE kernel: the intermediate activation lives only in VMEM, so the
    block's HBM traffic is read-x + write-out instead of the XLA
    path's six tensor round-trips. The model is HBM-bound (measured:
    ~43 GB accessed ≈ the whole forward's runtime), so this is where
    the packed stages' time actually goes."""
    idx = pl.program_id(0)
    nprog = pl.num_programs(0)
    hb = 2  # two chained 3x3 convs
    m = th * wc
    m1 = (th + 2) * wc

    def _dma(j, slot, op):
        bj = j // nh
        hj = j % nh

        def fill(src_row, dst_row, nrows):
            dma = pltpu.make_async_copy(
                x_hbm.at[bj, pl.ds(src_row * wc, nrows * wc)],
                xs.at[slot, pl.ds(dst_row * wc, nrows * wc)],
                sems.at[slot],
            )
            dma.start() if op == "start" else dma.wait()

        if nh == 1:
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

    @pl.when(idx == 0)
    def _():
        _dma(idx, slot, "start")

    @pl.when(idx + 1 < nprog)
    def _():
        _dma(idx + 1, jax.lax.rem(idx + 1, 2), "start")

    _dma(idx, slot, "wait")
    hj = idx % nh
    hrows = hb * wc

    def zero_rows(row0):
        xs[slot, pl.ds(row0, hrows)] = jnp.zeros(
            (hrows, xs.shape[2]), xs.dtype
        )

    if nh > 1:

        @pl.when(hj == 0)
        def _():
            zero_rows(0)

        @pl.when(hj == nh - 1)
        def _():
            zero_rows((hb + th) * wc)

    else:
        zero_rows(0)
        zero_rows((hb + th) * wc)

    pco = out_ref.shape[-1]
    xall = xs[slot]
    dt = xall.dtype

    # conv1 over th+2 rows (conv2 needs one halo row each side)
    c1 = _combo(xall, hwci1, wc)
    acc1 = jnp.zeros((m1, pco), jnp.float32)
    for k in range(3):
        r0 = k * wc
        acc1 = acc1 + jnp.dot(
            xall[r0 : r0 + m1], wm1_ref[k],
            preferred_element_type=jnp.float32,
        )
        acc1 = acc1 + jnp.dot(
            c1[r0 : r0 + m1], wh1_ref[k],
            preferred_element_type=jnp.float32,
        )
    y1 = jnp.maximum(acc1 * g1_ref[0] + b1_ref[0], 0.0)
    # conv2's 'same' padding: conv1 rows beyond the image are ZERO
    # (they hold conv-over-garbage-halo values otherwise)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (m1, 1), 0)
    y1 = jnp.where(jnp.logical_and(hj == 0, ridx < wc), 0.0, y1)
    y1 = jnp.where(
        jnp.logical_and(hj == nh - 1, ridx >= m1 - wc), 0.0, y1
    ).astype(dt)

    # conv2 over th rows
    c2 = _combo(y1, hwci2, wc)
    acc2 = jnp.zeros((m, pco), jnp.float32)
    for k in range(3):
        r0 = k * wc
        acc2 = acc2 + jnp.dot(
            y1[r0 : r0 + m], wm2_ref[k],
            preferred_element_type=jnp.float32,
        )
        acc2 = acc2 + jnp.dot(
            c2[r0 : r0 + m], wh2_ref[k],
            preferred_element_type=jnp.float32,
        )
    y2 = jnp.maximum(acc2 * g2_ref[0] + b2_ref[0], 0.0)  # pre-add ReLU

    xmid = xall[hb * wc : hb * wc + m]
    if has_bypass:
        res = (
            jnp.dot(xmid, wb_ref[0], preferred_element_type=jnp.float32)
            * gb_ref[0]
            + bb_ref[0]
        )
    else:
        res = xmid.astype(jnp.float32)
    out_ref[0] = jnp.maximum(y2 + res, 0.0).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("p", "th", "interpret")
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
) -> jax.Array:
    """Whole BasicBlock, stride 1, eval mode:
    relu( prerelu(bn2(conv2(relu(bn1(conv1(x)))))) + bypass(x) ).

    x: (B, H, WC, p*ci) packed; w1 (3,3,ci,co), w2 (3,3,co,co)
    unpacked checkpoint-layout kernels; g*/b* folded (p*co,) affines;
    wb (1,1,ci,co) optional projection (+gb/bb affine) — identity
    bypass when absent (requires ci == co)."""
    bsz, h, wc, pci = x.shape
    _, _, ci, co = w1.shape
    assert pci == p * ci
    pco = p * co
    assert 2 * ci <= COMBO and 2 * co <= COMBO
    assert pci >= COMBO and pco >= COMBO
    while h % th:
        th //= 2
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
        gbt = jnp.zeros((1, pco), jnp.float32)
        bbt = jnp.zeros((1, pco), jnp.float32)
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
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + [vmem] * 11,
        out_specs=pl.BlockSpec(
            (1, th * wc, pco),
            lambda i: (i // nh, i % nh, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h * wc, pco), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, (th + 4) * wc, pci), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wc
            * (6 * (pci + COMBO) * pco // 2 + pci * pco),
            bytes_accessed=bsz * h * wc * (pci + pco) * x.dtype.itemsize,
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
