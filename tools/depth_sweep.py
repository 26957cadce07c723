"""In-graph cost attribution for the SEGAN+ step on real hardware.

Standalone per-op timings are polluted by the remote-tunnel dispatch latency (~ms), so
this tool times *cumulative jitted prefixes* of the network (enc1, enc1-2, ..., full G,
G+dec_k, D variants, full step) and differences consecutive rows to attribute in-graph
time per segment. Each row also reports achieved TFLOP/s for the segment's conv FLOPs.

Usage: python tools/depth_sweep.py [--batch 300] [--dtype bfloat16] [--csv out.csv]
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

# default SEGAN+ topology (ref train.opts)
FMAPS = [64, 128, 256, 512, 1024]
POOL = 4
KW = 31
T0 = 16384
ZDIM = 1024
# dec: input channels after z-concat 2048; concat skip doubles layers 2..5
DEC = [  # (Cin, Cout)
    (2048, 512),
    (1024, 256),
    (512, 128),
    (256, 64),
    (128, 1),
]

V5E_BF16_PEAK = 197e12


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def prelu(x, a=0.2):
    return jnp.where(x >= 0, x, a * x)


def enc_params(key, dtype, upto=5):
    ps = []
    cin = 1
    for i in range(upto):
        key, k = jax.random.split(key)
        w = (jax.random.normal(k, (KW, cin, FMAPS[i])) * 0.02).astype(dtype)
        ps.append(w)
        cin = FMAPS[i]
    return ps


def dec_params(key, dtype, upto=5):
    ps = []
    for i in range(upto):
        cin, cout = DEC[i]
        key, k = jax.random.split(key)
        w = (jax.random.normal(k, (KW, cin, cout)) * 0.02).astype(dtype)
        ps.append(w)
    return ps


def enc_chain(ws, x):
    h = x
    for w in ws:
        h = reflect_pad_1d(h, KW // 2 - 1, KW // 2)
        h = conv1d(h, w, stride=POOL)
        h = prelu(h)
    return h


def enc_flops(B, upto):
    f = 0
    t = T0
    cin = 1
    for i in range(upto):
        t //= POOL
        f += 2 * B * t * KW * cin * FMAPS[i]
        cin = FMAPS[i]
    return f


def dec_flops(B, upto):
    f = 0
    t = 16
    for i in range(upto):
        cin, cout = DEC[i]
        t *= POOL
        f += 2 * B * t * KW * cin * cout
    return f


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=300)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--section", type=str, default="all",
                   choices=["all", "enc", "dec", "d"])
    args = p.parse_args()
    B = args.batch
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (B, T0, 1)) * 0.1).astype(dtype)
    jax.block_until_ready(x)

    print(f"\nbatch={B} dtype={args.dtype} device={jax.devices()[0].device_kind}")
    print(f"{'segment':<18}{'cum ms':>9}{'seg ms':>9}{'seg GFLOP':>11}{'TF/s':>8}{'MXU%':>7}")
    state = {"t": None, "f": None, "name": ""}

    def row(name, tsec, fl):
        ms = tsec * 1e3
        seg_ms, seg_fl = ms, fl
        pname = state["name"]
        for pref in ("enc1..", "G:enc+z+dec"):
            if name.startswith(pref) and pname.startswith(pref):
                seg_ms, seg_fl = ms - state["t"], fl - state["f"]
        tf = (seg_fl / (seg_ms / 1e3)) / 1e12 if seg_ms > 0 else 0
        print(f"{name:<18}{ms:>9.2f}{seg_ms:>9.2f}{seg_fl/1e9:>11.1f}{tf:>8.1f}"
              f"{100*tf*1e12/V5E_BF16_PEAK:>6.1f}%", flush=True)
        state["t"], state["f"], state["name"] = ms, fl, name

    noop = jax.jit(lambda a: a * 1.0001)
    row("noop(dispatch)", timeit(noop, x), 0)

    ews = enc_params(key, dtype)
    if args.section in ("all", "enc"):
        for k in range(1, 6):
            f = jax.jit(lambda xx, ws=tuple(ews[:k]): enc_chain(ws, xx))
            row(f"enc1..{k}", timeit(f, x), enc_flops(B, k))

    # encoder + z concat + dec prefixes (alpha skips = cheap elementwise; use
    # concat-merge shapes which dominate FLOPs)
    dws = dec_params(key, dtype)
    kz = jax.random.PRNGKey(1)

    def g_like(xx, ndec):
        h = xx
        skips = []
        for i, w in enumerate(ews):
            h = reflect_pad_1d(h, KW // 2 - 1, KW // 2)
            h = conv1d(h, w, stride=POOL)
            if i < 4:
                skips.append(h)  # pre-act in real model; same cost shape
            h = prelu(h)
        z = jax.random.normal(kz, (h.shape[0], h.shape[1], ZDIM), jnp.float32).astype(h.dtype)
        h = jnp.concatenate([z, h], axis=-1)
        for i in range(ndec):
            if i > 0:
                h = jnp.concatenate([skips[4 - i], h], axis=-1)
            pad = max(0, (POOL - KW) // -2)
            h = conv_transpose1d(h, dws[i], stride=POOL, padding=pad)
            h = h[:, :-1, :]  # odd-kwidth trim
            h = prelu(h) if i < 4 else jnp.tanh(h)
        return h

    if args.section in ("all", "dec"):
        for k in range(0, 6):
            f = jax.jit(lambda xx, nd=k: g_like(xx, nd))
            row(f"G:enc+z+dec{k}", timeit(f, x), enc_flops(B, 5) + dec_flops(B, k))

    # D-like: 2-ch input, 5 conv stack + flatten FC (bnorm omitted -> pure conv cost,
    # then with bnorm-style masked stats to see its cost)
    pair = jnp.concatenate([x, x], -1)
    dws2 = []
    cin = 2
    kk = jax.random.PRNGKey(2)
    for i in range(5):
        kk, k2 = jax.random.split(kk)
        dws2.append((jax.random.normal(k2, (KW, cin, FMAPS[i])) * 0.02).astype(dtype))
        cin = FMAPS[i]

    def d_like(xx, roll, bn):
        h = xx
        for w in dws2:
            if roll:
                h = jnp.roll(h, 3, axis=1)
            h = reflect_pad_1d(h, KW // 2 - 1, KW // 2)
            h = conv1d(h, w, stride=POOL)
            if bn:
                m = jnp.mean(h.astype(jnp.float32), axis=(0, 1))
                v = jnp.var(h.astype(jnp.float32), axis=(0, 1))
                h = ((h.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5)).astype(h.dtype)
            h = prelu(h)
        return h.reshape(h.shape[0], -1).sum(-1)

    d_conv_flops = 0
    t = T0
    cin = 2
    for i in range(5):
        t //= POOL
        d_conv_flops += 2 * B * t * KW * cin * FMAPS[i]
        cin = FMAPS[i]
    if args.section in ("all", "d"):
        row("D:convs", timeit(jax.jit(lambda a: d_like(a, False, False)), pair), d_conv_flops)
        row("D:convs+roll", timeit(jax.jit(lambda a: d_like(a, True, False)), pair), d_conv_flops)
        row("D:convs+roll+bn", timeit(jax.jit(lambda a: d_like(a, True, True)), pair), d_conv_flops)



if __name__ == "__main__":
    main()
