"""Leg-level timing of the re-tiled stride-2 backward kernels vs their
XLA equivalents at decoder shapes. Baseline to beat (round-3a,
docs/roofline.md): Pallas dx+dW 257.6 ms vs XLA 42.5 ms at the
128-cell decoder shape. Run on the real chip.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import time
import numpy as np
from ubresnet_tpu.utils.platform import apply_platform_env
apply_platform_env()  # persistent compile cache + rbg PRNG
import jax, jax.numpy as jnp

from ubresnet_tpu.ops.packed import packed_deconv2x
from ubresnet_tpu.ops.pallas_conv import fused_conv_s2k4, pallas_deconv_dw


def bench(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def run_shape(tag, b, h, wcells, p, ci, co, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, wcells, p * ci), dtype)
    w = jnp.asarray(rng.randn(4, 4, ci, co) * 0.1, dtype)
    dy2p = jnp.asarray(rng.randn(b, 2 * h, wcells, 2 * p * co), dtype)

    dx_pal = jax.jit(lambda d, w: fused_conv_s2k4(d, w, p=p))
    dw_pal = jax.jit(lambda x, d: pallas_deconv_dw(x, d, p=p))

    def xla_legs(x, w, d4):
        _, pull = jax.vjp(lambda xx, ww: packed_deconv2x(xx, ww, p), x, w)
        return pull(d4)

    d4 = dy2p.reshape(b, 2 * h, 2 * wcells, p * co)
    xla = jax.jit(xla_legs)

    t_dx = bench(dx_pal, dy2p, w)
    t_dw = bench(dw_pal, x, dy2p)
    t_xla = bench(xla, x, w, d4)
    print(f"{tag}: pallas dx {t_dx:.2f} + dW {t_dw:.2f} = "
          f"{t_dx + t_dw:.2f} ms vs XLA(dx+dW) {t_xla:.2f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    # dec1-equivalent at b64 eval scale (the round-3a shape class):
    # 16ch p8, 128 cells, input-side 128 rows
    run_shape("dec1-128cell b64", 64, 128, 128, 8, 16, 16)
    # dec2-equivalent: 32ch p4
    run_shape("dec2-64cell b64", 64, 64, 64, 4, 32, 32)
    # train-bench scale b16
    run_shape("dec1 b16", 16, 128, 128, 8, 16, 16)
