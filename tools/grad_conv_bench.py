"""Microbench: XLA-autodiff vs custom (blocked dx + phase-dot dw) conv backwards on
the real TPU, over the flagship SEGAN+ layer shapes. Usage:
    python tools/grad_conv_bench.py [--batch 300] [--n 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # force completion via D2H fetch of a reduced scalar (see bench.py note)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=300)
    p.add_argument("--n", type=int, default=20)
    args = p.parse_args()

    from segan_pytorch_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from segan_pytorch_tpu.ops import conv as C

    B = args.batch
    rng = np.random.RandomState(0)

    # (name, T_in_padded, Ci, Co, K, s) — G/D encoders pad to s*(Tout-1)+K exactly
    conv_layers = []
    T = 16384
    fm = [64, 128, 256, 512, 1024]
    ci = 1
    for i, co in enumerate(fm):
        conv_layers.append((f"Genc{i}", (T // 4) * 4 - 4 + 31, ci, co, 31, 4))
        ci, T = co, T // 4
    T = 16384
    ci = 2
    for i, co in enumerate(fm):
        conv_layers.append((f"Denc{i}", (T // 4) * 4 - 4 + 31, ci, co, 31, 4))
        ci, T = co, T // 4

    deconv_layers = []
    L = 16
    dec_in = [1024 + 32]  # z concat
    dec_fm = [512, 256, 128, 64, 1]
    ci = 1024 + 32
    for i, co in enumerate(dec_fm):
        deconv_layers.append((f"Gdec{i}", L, ci, co, 31, 4, 13))
        ci = co * 2 if i < len(dec_fm) - 1 else co  # skip concat doubles channels
        L *= 4

    print(f"batch {B}; ms per fwd+bwd (value_and_grad wrt x and w), xla vs custom")
    for name, T_in, Ci, Co, K, s in conv_layers:
        x = jnp.asarray(rng.randn(B, T_in, Ci).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.randn(K, Ci, Co).astype(np.float32) * 0.02).astype(jnp.bfloat16)
        res = {}
        for mode in ("xla", "custom"):
            os.environ["SEGAN_TPU_CONV_GRAD"] = mode

            @jax.jit
            def fb(x, w):
                def loss(x, w):
                    y = C.conv1d(x, w, stride=s)
                    return jnp.sum(y.astype(jnp.float32) ** 2), y
                (l, y), g = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(x, w)
                return l, g
            res[mode] = timeit(fb, x, w, n=args.n)
        flops = 3 * 2 * B * ((T_in - K) // s + 1) * K * Ci * Co
        print(f"{name:7s} Ci{Ci:5d} Co{Co:5d} T{T_in:6d}: "
              f"xla {res['xla']:7.2f}  custom {res['custom']:7.2f}  "
              f"({res['xla'] / res['custom']:.2f}x, ideal {flops / 197e12 * 1e3:.2f})")

    for name, L_in, Ci, Co, K, s, pad in deconv_layers:
        x = jnp.asarray(rng.randn(B, L_in, Ci).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.randn(K, Ci, Co).astype(np.float32) * 0.02).astype(jnp.bfloat16)
        res = {}
        for mode in ("xla", "custom"):
            os.environ["SEGAN_TPU_CONV_GRAD"] = mode

            @jax.jit
            def fb(x, w):
                def loss(x, w):
                    y = C.conv_transpose1d_auto(x, w, stride=s, padding=pad)
                    return jnp.sum(y.astype(jnp.float32) ** 2), y
                (l, y), g = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(x, w)
                return l, g
            res[mode] = timeit(fb, x, w, n=args.n)
        flops = 3 * 2 * B * L_in * K * Ci * Co
        print(f"{name:7s} Ci{Ci:5d} Co{Co:5d} L{L_in:6d}: "
              f"xla {res['xla']:7.2f}  custom {res['custom']:7.2f}  "
              f"({res['xla'] / res['custom']:.2f}x, ideal {flops / 197e12 * 1e3:.2f})")


if __name__ == "__main__":
    main()
