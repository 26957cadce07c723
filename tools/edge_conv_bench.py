"""Micro-bench + correctness check for block-form (space-to-depth) edge convs.

The depth sweep showed the channel-1 edge layers (G enc1 1->64, D conv1 2->64, G dec5
128->1) run at ~1-2% MXU because a 1-2 channel operand wastes the 128-lane minor dim.
Block-form rewrites fold time into channels so the same math runs as a dense stride-1
conv; reshapes at the edges are row-major byte-compatible.

Usage: python tools/edge_conv_bench.py [--batch 300]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from segan_pytorch_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from segan_pytorch_tpu.ops.conv import conv1d, conv_transpose1d, reflect_pad_1d


def _force(out):
    # scalar-sum completion fetch: block_until_ready can return early on the
    # remote 'axon' platform (BENCH.md r3 honest re-measure note)
    return float(jnp.sum(out.astype(jnp.float32)))


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / n


def blocked_strided_kernel(w, stride: int, block: int):
    """W' for the s2d form: (K_b, block*Cin, phases*Cout), W'[j, i*Cin+ci, r*Cout+co] =
    w[block*j + i - stride*r, ci, co] where valid, else 0."""
    K, Cin, Cout = w.shape
    phases = block // stride
    K_b = (K - 1 + block - stride) // block + 1
    j = np.arange(K_b)[:, None, None]
    i = np.arange(block)[None, :, None]
    r = np.arange(phases)[None, None, :]
    kidx = block * j + i - stride * r  # (K_b, block, phases)
    valid = (kidx >= 0) & (kidx < K)
    kc = jnp.asarray(np.clip(kidx, 0, K - 1))
    wp = jnp.take(w, kc.reshape(-1), axis=0).reshape(K_b, block, phases, Cin, Cout)
    wp = jnp.where(jnp.asarray(valid)[..., None, None], wp, 0)
    # -> (K_b, block, Cin, phases, Cout) -> (K_b, block*Cin, phases*Cout)
    wp = wp.transpose(0, 1, 3, 2, 4).reshape(K_b, block * Cin, phases * Cout)
    return wp


def conv1d_strided_blocked(xp, w, stride: int, block: int):
    """Strided VALID conv of pre-padded xp (B, Lp, Cin) via the s2d block form."""
    B, Lp, Cin = xp.shape
    K, _, Cout = w.shape
    phases = block // stride
    T_out = (Lp - K) // stride + 1
    U = -(-T_out // phases)  # ceil: u blocks of `phases` outputs
    K_b = (K - 1 + block - stride) // block + 1
    need = (U - 1 + K_b) * block  # last sample index touched + 1
    if need > Lp:
        xp = jnp.pad(xp, ((0, 0), (0, need - Lp), (0, 0)))
    elif Lp % block:
        xp = jnp.pad(xp, ((0, 0), (0, block - Lp % block), (0, 0)))
    xb = xp.reshape(B, -1, block * Cin)
    wp = blocked_strided_kernel(w, stride, block)
    yb = conv1d(xb[:, : U - 1 + K_b, :], wp, stride=1)  # (B, U, phases*Cout)
    y = yb.reshape(B, U * phases, Cout)
    return y[:, :T_out, :]


def blocked_transpose_kernel(w, stride: int, oblock: int, padding: int):
    """W' for the output-blocked transposed conv: out[t]=sum_n x[n] w[t+padding-s*n].
    Output blocks of `oblock` samples; input blocks of ib = oblock//stride samples.
    W'[j, p*Cin+ci, s*Cout+co] = w[k], k = oblock + s + padding - oblock*j - stride*p."""
    K, Cin, Cout = w.shape
    ib = oblock // stride
    K_b = 3  # input blocks v-1..v+1 per output block
    # coverage: every k in [0,K) must land on some j in [0, K_b)
    j_min = -(-(padding + oblock - K + 1) // oblock)
    j_max = (oblock - 1 + padding + oblock) // oblock
    assert j_min >= 0 and j_max <= K_b - 1, (j_min, j_max, K, stride, oblock, padding)
    j = np.arange(K_b)[:, None, None]
    p = np.arange(ib)[None, :, None]
    s = np.arange(oblock)[None, None, :]
    # n = ib*(v - 1 + j) + p  (input blocks v-1..v+1);  k = t + padding - stride*n
    # t = oblock*v + s  ->  k = oblock*v + s + padding - stride*(ib*(v-1+j)+p)
    #                        = s + padding + oblock - oblock*j - stride*p
    kidx = s + padding + oblock - oblock * j - stride * p
    valid = (kidx >= 0) & (kidx < K)
    kc = jnp.asarray(np.clip(kidx, 0, K - 1))
    wp = jnp.take(w, kc.reshape(-1), axis=0).reshape(K_b, ib, oblock, Cin, Cout)
    wp = jnp.where(jnp.asarray(valid)[..., None, None], wp, 0)
    wp = wp.transpose(0, 1, 3, 2, 4).reshape(K_b, ib * Cin, oblock * Cout)
    return wp


def conv_transpose1d_blocked(x, w, stride: int, padding: int, oblock: int):
    """Transposed conv via output blocking. Output length cropped to stride*L
    (i.e. torch length (L-1)*s + K - 2p, then odd-K trim, when those equal s*L)."""
    B, L, Cin = x.shape
    K, _, Cout = w.shape
    ib = oblock // stride
    # pad one input block on each side (kernel built for input blocks v-1..v+1)
    xp = jnp.pad(x, ((0, 0), (ib, ib), (0, 0)))
    if (L + 2 * ib) % ib:
        raise ValueError("L must be divisible by ib")
    xb = xp.reshape(B, -1, ib * Cin)  # (B, L/ib + 2, ib*Cin)
    wp = blocked_transpose_kernel(w, stride, oblock, padding)
    yb = conv1d(xb, wp, stride=1)  # VALID K_b=3 -> (B, L/ib, oblock*Cout)
    return yb.reshape(B, L * stride, Cout)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=300)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    args = ap.parse_args()
    B = args.batch
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    KW = 31

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # ---- correctness on CPU-sized fp32 first ----
    xs = jax.random.normal(k1, (2, 512, 1), jnp.float32)
    ws = jax.random.normal(k2, (KW, 1, 8), jnp.float32) * 0.1
    xp = reflect_pad_1d(xs, KW // 2 - 1, KW // 2)
    ref = conv1d(xp, ws, stride=4)
    got = conv1d_strided_blocked(xp, ws, stride=4, block=16)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"strided blocked max err: {err:.2e}  shapes {ref.shape} {got.shape}")
    assert err < 1e-4

    xd = jax.random.normal(k3, (2, 128, 8), jnp.float32)
    wd = jax.random.normal(k4, (KW, 8, 1), jnp.float32) * 0.1
    pad = max(0, (4 - KW) // -2)
    refd = conv_transpose1d(xd, wd, stride=4, padding=pad)[:, :-1, :]
    gotd = conv_transpose1d_blocked(xd, wd, stride=4, padding=pad, oblock=16)
    errd = float(jnp.max(jnp.abs(refd - gotd)))
    print(f"transpose blocked max err: {errd:.2e}  shapes {refd.shape} {gotd.shape}")
    assert errd < 1e-4

    # ---- perf on the real config ----
    T0 = 16384
    x = (jax.random.normal(k1, (B, T0, 1)) * 0.1).astype(dtype)
    w1 = (jax.random.normal(k2, (KW, 1, 64)) * 0.02).astype(dtype)
    w2 = (jax.random.normal(k3, (KW, 64, 128)) * 0.02).astype(dtype)
    jax.block_until_ready(x)

    def enc_a(x):  # current path, with enc2 as consumer
        h = reflect_pad_1d(x, 14, 15)
        h = conv1d(h, w1, stride=4)
        h = jnp.where(h >= 0, h, 0.2 * h)
        h = reflect_pad_1d(h, 14, 15)
        return conv1d(h, w2, stride=4)

    def enc_b(x, block):
        h = reflect_pad_1d(x, 14, 15)
        h = conv1d_strided_blocked(h, w1, stride=4, block=block)
        h = jnp.where(h >= 0, h, 0.2 * h)
        h = reflect_pad_1d(h, 14, 15)
        return conv1d(h, w2, stride=4)

    print(f"\nenc1+enc2 current : {timeit(jax.jit(enc_a), x)*1e3:7.2f} ms")
    for blk in (16, 32, 64):
        f = jax.jit(lambda a, b=blk: enc_b(a, b))
        err = float(jnp.max(jnp.abs(enc_a(x).astype(jnp.float32) - f(x).astype(jnp.float32))))
        print(f"enc1+enc2 s2d b{blk:<3}: {timeit(f, x)*1e3:7.2f} ms   err {err:.2e}")

    # D conv1 (Cin=2)
    pair = jnp.concatenate([x, x], -1)
    wd1 = (jax.random.normal(k4, (KW, 2, 64)) * 0.02).astype(dtype)

    def d_a(x):
        h = reflect_pad_1d(x, 14, 15)
        h = conv1d(h, wd1, stride=4)
        h = jnp.where(h >= 0, h, 0.2 * h)
        h = reflect_pad_1d(h, 14, 15)
        return conv1d(h, w2, stride=4)

    def d_b(x, block):
        h = reflect_pad_1d(x, 14, 15)
        h = conv1d_strided_blocked(h, wd1, stride=4, block=block)
        h = jnp.where(h >= 0, h, 0.2 * h)
        h = reflect_pad_1d(h, 14, 15)
        return conv1d(h, w2, stride=4)

    print(f"\nDconv1+2 current : {timeit(jax.jit(d_a), pair)*1e3:7.2f} ms")
    for blk in (16, 32):
        f = jax.jit(lambda a, b=blk: d_b(a, b))
        print(f"Dconv1+2 s2d b{blk:<3}: {timeit(f, pair)*1e3:7.2f} ms")

    # dec5 (128 -> 1) with a producer (dec4-out-like input)
    xin = (jax.random.normal(k1, (B, 4096, 128)) * 0.1).astype(dtype)
    w5 = (jax.random.normal(k2, (KW, 128, 1)) * 0.02).astype(dtype)
    jax.block_until_ready(xin)

    def dec5_a(h):
        h = conv_transpose1d(h, w5, stride=4, padding=pad)[:, :-1, :]
        return jnp.tanh(h)

    def dec5_b(h, ob):
        h = conv_transpose1d_blocked(h, w5, stride=4, padding=pad, oblock=ob)
        return jnp.tanh(h)

    err = float(jnp.max(jnp.abs(dec5_a(xin).astype(jnp.float32) - dec5_b(xin, 16).astype(jnp.float32))))
    print(f"\ndec5 current : {timeit(jax.jit(dec5_a), xin)*1e3:7.2f} ms")
    for ob in (16, 32, 64):
        f = jax.jit(lambda a, b=ob: dec5_b(a, b))
        print(f"dec5 blocked b{ob:<3}: {timeit(f, xin)*1e3:7.2f} ms   (err@16 {err:.2e})")


if __name__ == "__main__":
    main()
