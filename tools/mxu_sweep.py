"""Eval-kernel per-FLOP efficiency sweep (VERDICT item 9): fused conv
vs XLA packed conv at model shapes, varying th; plus a pe=16 (N=256)
variant of the 16-ch stage to probe multi-MXU width scaling. Run on
the real chip."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import time
import numpy as np
from ubresnet_tpu.utils.platform import apply_platform_env
apply_platform_env()  # persistent compile cache + rbg PRNG
import jax, jax.numpy as jnp

from ubresnet_tpu.ops.packed import packed_conv, pack, unpack
from ubresnet_tpu.ops.pallas_conv import fused_packed_conv


def bench(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def sweep(tag, b, h, wc, p, ci, co, k=3, ths=(32, 64, 128)):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, wc, p * ci), jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, k, ci, co) * 0.1, jnp.bfloat16)
    g = jnp.asarray(np.tile(rng.rand(co) + 0.5, p), jnp.float32)
    bb = jnp.asarray(np.tile(rng.randn(co) * 0.1, p), jnp.float32)
    t_x = bench(jax.jit(lambda x, w: packed_conv(x, w, p)), x, w)
    line = f"{tag}: XLA {t_x:6.2f} ms"
    for th in ths:
        try:
            t = bench(jax.jit(
                lambda x, w, g, bb, th=th: fused_packed_conv(
                    x, w, g, bb, p=p, th=th)), x, w, g, bb)
            line += f" | pallas th{th} {t:6.2f}"
        except Exception as e:
            line += f" | th{th} FAIL({type(e).__name__})"
    print(line, flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    B = 64
    # enc1 shape class at 512^2: h=128, wc=32, p8 ci16 (pe=8, N=128)
    sweep("enc1 p8 N128 ", B, 128, 32, 8, 16, 16)
    # same tensor re-viewed at pe=16 (N=256, 2x FLOP inflation): does
    # wider N unlock enough MXU width to beat the inflation?
    sweep("enc1 p16 N256", B, 128, 16, 16, 16, 16)
    # dec2 class: p4 ci32 (N=128)
    sweep("dec2 p4 N128 ", B, 128, 64, 4, 32, 32)
    # head 7x7
    sweep("head k7 p8   ", B, 128, 32, 8, 16, 16, k=7)
