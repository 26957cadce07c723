"""Perf breakdown on the real TPU: time the pieces of the fused SEGAN step to decide
where Pallas/layout work pays. Usage: python tools/perf_breakdown.py [--batch 100]"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax

from segan_pytorch_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


def _force(out):
    """Force completion with a device-side scalar sum + 4-byte fetch.

    block_until_ready can return early on the remote 'axon' platform, and
    fetching a full output leaf drags MBs over the ~33 MB/s dev tunnel into
    the timed window (both failure modes measured — BENCH.md r3); a scalar
    reduce runs after all queued work and costs one tiny D2H."""
    acc = jnp.zeros((), jnp.float32)
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "dtype"):
            acc = acc + jnp.sum(leaf.astype(jnp.float32))
    return float(acc)


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=100)
    p.add_argument("--dtype", type=str, default="float32")
    args = p.parse_args()

    from segan_pytorch_tpu.utils.config import SEGANConfig
    from segan_pytorch_tpu.models import SEGAN
    from segan_pytorch_tpu.models.generator import build_generator
    from segan_pytorch_tpu.models.discriminator import build_discriminator
    from segan_pytorch_tpu.models.segan import cast_tree

    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = SEGANConfig(batch_size=args.batch, save_path="/tmp/perf",
                      compute_dtype=args.dtype)
    B, T = args.batch, cfg.slice_size
    gen = build_generator(cfg)
    disc = build_discriminator(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, T, 1), jnp.float32)
    gv = gen.init({"params": key, "z": key}, x, train=False)
    dv = disc.init({"params": key, "phase": key}, jnp.zeros((1, T, 2)), train=False)
    gp = cast_tree(gv["params"], cdt)
    dp = cast_tree(dv["params"], cdt)
    d_stats = dv.get("batch_stats", {})

    noisy = jnp.asarray(np.random.randn(B, T, 1), cdt)
    clean = jnp.asarray(np.random.randn(B, T, 1), cdt)
    z = gen.sample_z(key, (B, T, 1)).astype(cdt)
    pair = jnp.concatenate([clean, noisy], -1)

    g_fwd = jax.jit(lambda gp, x, z: gen.apply({"params": gp}, x, z=z, train=False))
    print(f"G fwd      : {timeit(g_fwd, gp, noisy, z)*1e3:8.2f} ms")

    def g_loss(gp, x, z, tgt):
        y = gen.apply({"params": gp}, x, z=z, train=False)
        return jnp.mean(jnp.abs(y.astype(jnp.float32) - tgt.astype(jnp.float32)))

    g_bwd = jax.jit(jax.grad(g_loss))
    print(f"G fwd+bwd  : {timeit(g_bwd, gp, noisy, z, clean)*1e3:8.2f} ms")

    def d_fwd_fn(dp, xin, k):
        (y, _), _ = disc.apply({"params": dp, "batch_stats": d_stats}, xin,
                               train=True, mutable=["batch_stats"],
                               rngs={"phase": k})
        return y

    d_fwd = jax.jit(d_fwd_fn)
    print(f"D fwd      : {timeit(d_fwd, dp, pair, key)*1e3:8.2f} ms")

    def d_loss(dp, xin, k):
        return jnp.mean(d_fwd_fn(dp, xin, k).astype(jnp.float32) ** 2)

    d_bwd = jax.jit(jax.grad(d_loss))
    print(f"D fwd+bwd  : {timeit(d_bwd, dp, pair, key)*1e3:8.2f} ms")

    # full fused step
    segan = SEGAN(cfg)
    segan.init_state(batch_size=B)
    segan.prepare_train(B)
    # device-resident inputs, like the steady-state train loop (device_prefetch
    # hides H2D): feeding host numpy here would time the ~33 MB/s dev tunnel
    mask = jax.device_put(np.ones((B,), np.float32))
    cl = jax.device_put(jnp.asarray(clean, jnp.float32))
    no = jax.device_put(jnp.asarray(noisy, jnp.float32))

    def full(k):
        m, _, _ = segan.train_step(cl, no, mask, k, 100.0)
        return m["g_l1"]

    print(f"full step  : {timeit(full, key, n=5)*1e3:8.2f} ms")

    # per-layer conv costs (encoder shapes) at this batch
    from segan_pytorch_tpu.ops.conv import conv1d, conv_transpose1d, \
        conv_transpose1d_phased, reflect_pad_1d

    enc_shapes = [(16384, 1, 64), (4096, 64, 128), (1024, 128, 256),
                  (256, 256, 512), (64, 512, 1024)]
    for (L, cin, cout) in enc_shapes:
        xx = jnp.asarray(np.random.randn(B, L, cin), cdt)
        ww = jnp.asarray(np.random.randn(31, cin, cout), cdt)
        f = jax.jit(lambda x, w: conv1d(reflect_pad_1d(x, 14, 15), w, stride=4))
        dt = timeit(f, xx, ww)
        gflops = 2 * B * (L // 4) * 31 * cin * cout / 1e9
        print(f"enc conv L={L:6d} {cin:4d}->{cout:4d}: {dt*1e3:7.2f} ms "
              f"({gflops/dt:7.1f} GFLOP/s)")
    dec_shapes = [(16, 2048, 512), (64, 1024, 256), (256, 512, 128),
                  (1024, 256, 64), (4096, 128, 1)]
    for (L, cin, cout) in dec_shapes:
        xx = jnp.asarray(np.random.randn(B, L, cin), cdt)
        ww = jnp.asarray(np.random.randn(31, cin, cout), cdt)
        f1 = jax.jit(lambda x, w: conv_transpose1d(x, w, stride=4, padding=13))
        f2 = jax.jit(lambda x, w: conv_transpose1d_phased(x, w, stride=4, padding=13))
        dt1, dt2 = timeit(f1, xx, ww), timeit(f2, xx, ww)
        gflops = 2 * B * L * 31 * cin * cout / 1e9
        print(f"dec deconv L={L:5d} {cin:4d}->{cout:4d}: dilated {dt1*1e3:7.2f} ms "
              f"({gflops/dt1:7.1f} GF/s) | phased {dt2*1e3:7.2f} ms "
              f"({gflops/dt2:7.1f} GF/s)")


if __name__ == "__main__":
    main()
