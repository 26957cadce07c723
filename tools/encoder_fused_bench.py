"""Measure the multi-layer fused encoder kernel vs XLA and per-layer Pallas on
the real TPU (VERDICT r3: the 'streamed-weight multi-layer Pallas' attempt).

Compares, at the SEGAN+ enc2+enc3 shapes (batch 300 canonical, bf16):
  xla        : reflect-pad -> conv -> PReLU twice via XLA (the production path)
  pallas x2  : the r2 per-layer fused kernels chained through HBM
  fused 2+3  : the new chained kernel (enc2 activations never leave VMEM)

Usage: python tools/encoder_fused_bench.py [--batch 300] [--bt 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _force_scalar(out):
    """Force completion of the whole dependent chain with a 4-BYTE D2H fetch:
    np.asarray on a full output would drag MBs over the ~33 MB/s dev tunnel and
    dominate the measured time (axon caveat, BENCH.md)."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _force_scalar(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _force_scalar(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=300)
    ap.add_argument("--bt", type=int, default=4)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    args = ap.parse_args()

    from segan_pytorch_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from segan_pytorch_tpu.ops.conv import conv1d, reflect_pad_1d
    from segan_pytorch_tpu.ops.pallas import conv1d as plconv
    from segan_pytorch_tpu.ops.pallas import encoder_fused as ef

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    B, T1, C1, C2, C3 = args.batch, 4096, 64, 128, 256
    rng = np.random.RandomState(0)
    h1 = jnp.asarray(rng.randn(B, T1, C1).astype(np.float32) * 0.1, dt)
    w2 = jnp.asarray(rng.randn(31, C1, C2).astype(np.float32) * 0.05, dt)
    b2 = jnp.asarray(rng.randn(C2).astype(np.float32) * 0.05, dt)
    a2 = jnp.asarray(rng.randn(C2).astype(np.float32) * 0.05, dt)
    w3 = jnp.asarray(rng.randn(31, C2, C3).astype(np.float32) * 0.05, dt)
    b3 = jnp.asarray(rng.randn(C3).astype(np.float32) * 0.05, dt)
    a3 = jnp.asarray(rng.randn(C3).astype(np.float32) * 0.05, dt)

    @jax.jit
    def xla_chain(h1):
        xp = reflect_pad_1d(h1, 14, 15)
        pre2 = conv1d(xp, w2, b2, stride=4)
        y2 = jnp.maximum(pre2, 0) + a2 * jnp.minimum(pre2, 0)
        yp = reflect_pad_1d(y2, 14, 15)
        pre3 = conv1d(yp, w3, b3, stride=4)
        y3 = jnp.maximum(pre3, 0) + a3 * jnp.minimum(pre3, 0)
        return pre2, pre3, y3

    @jax.jit
    def pallas_per_layer(h1):
        xp = reflect_pad_1d(h1, 14, 15)
        y2, pre2 = plconv.fused_conv1d_prelu(xp, w2, b2, a2, 4)
        yp = reflect_pad_1d(y2, 14, 15)
        y3, pre3 = plconv.fused_conv1d_prelu(yp, w3, b3, a3, 4)
        return pre2, pre3, y3

    fused = jax.jit(lambda h1: ef.fused_enc23_fwd(
        h1, w2, b2, a2, w3, b3, a3, batch_tile=args.bt))

    r_x = xla_chain(h1)
    print(f"xla chain    : {timeit(xla_chain, h1):8.2f} ms", flush=True)
    r_p = pallas_per_layer(h1)
    print(f"pallas x2    : {timeit(pallas_per_layer, h1):8.2f} ms", flush=True)
    r_f = fused(h1)
    print(f"fused 2+3 bt{args.bt}: {timeit(fused, h1):8.2f} ms", flush=True)
    for name, a, b in (("pre2", r_x[0], r_f[0]), ("pre3", r_x[1], r_f[1]),
                       ("post3", r_x[2], r_f[2])):
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
        print(f"  max|xla - fused| {name}: {d:.3e}")


if __name__ == "__main__":
    main()
