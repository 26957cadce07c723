"""Per-component timing of the WSEGAN step at the canonical config (batch 150,
snorm G/D, adam, misalign) — where do the milliseconds go?

Components timed fwd+bwd in isolation on the real device:
  g_step      : G forward + backward (params grad)
  d_pair      : one D apply fwd + input/param grads (snorm)
  d_pair_none : same with norm_type=None (snorm overhead = difference)
  stft_loss   : the power-spectrum L1 loss fwd + grad wrt Genh
  stft_matmul : same loss with the rfft replaced by an MXU matmul DFT
  misalign    : the clean[perm] gather

Usage: python tools/wsegan_breakdown.py [--batch 150]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _force_scalar(out):
    """Force completion with a 4-byte D2H fetch (device-side sum): fetching a
    full output array would drag MBs over the ~33 MB/s dev tunnel and inflate
    the measurement (this bug inflated the first r3 table — e.g. stft_loss's
    9.8 MB dGenh leaf added ~30 ms/10-iter window)."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, n=10, warmup=2):
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
    ap.add_argument("--batch", type=int, default=150)
    ap.add_argument("--n_fft", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from segan_pytorch_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from segan_pytorch_tpu.utils.config import SEGANConfig
    from segan_pytorch_tpu.models import SEGAN
    from segan_pytorch_tpu.models.segan import cast_tree, MUTS
    from segan_pytorch_tpu.models.discriminator import build_discriminator
    from segan_pytorch_tpu.ops.stft import power_spectrum_db

    B, T = args.batch, 16384
    cfg = SEGANConfig(batch_size=B, compute_dtype="bfloat16",
                      gnorm_type="snorm", dnorm_type="snorm", opt="adam",
                      wsegan=True, misalign_pair=True,
                      save_path="/tmp/ws_breakdown")
    segan = SEGAN(cfg)
    segan.init_state(batch_size=B)
    st = segan.state
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, 1).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    pair = jnp.concatenate([x, x], -1)
    mask = jnp.ones((B,), jnp.float32)
    key = jax.random.PRNGKey(0)

    class _Res(dict):
        def __setitem__(self, k2, v):  # print incrementally: survives timeouts
            super().__setitem__(k2, v)
            print(f"{k2:14s} {v:8.2f} ms", flush=True)

    res = _Res()

    # --- G fwd+bwd ---
    z = segan.G.sample_z(key, (B, T, 1))
    z = z.astype(jnp.bfloat16) if z is not None else None

    @jax.jit
    def g_step(gp):
        def f(gp):
            out, _ = segan.G.apply({"params": cast_tree(gp, jnp.bfloat16),
                                    **st.g_vars}, x, z=z, train=True,
                                   mutable=list(MUTS), rngs={"dropout": key})
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(f)(gp)
    res["g_step"] = timeit(g_step, st.g_params)

    # --- same G without snorm (the SEGAN+ default G) ---
    cfg_n = SEGANConfig(batch_size=B, compute_dtype="bfloat16",
                        gnorm_type=None, save_path="/tmp/ws_breakdown3")
    segan_n = SEGAN(cfg_n)
    segan_n.init_state(batch_size=B)
    stn = segan_n.state

    @jax.jit
    def g_step_none(gp):
        def f(gp):
            out, _ = segan_n.G.apply({"params": cast_tree(gp, jnp.bfloat16),
                                      **stn.g_vars}, x, z=z, train=True,
                                     mutable=list(MUTS), rngs={"dropout": key})
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(f)(gp)
    res["g_step_none"] = timeit(g_step_none, stn.g_params)

    # --- D pair fwd+bwd, snorm vs none ---
    for tag, norm in (("d_pair", "snorm"), ("d_pair_none", None)):
        c2 = SEGANConfig(batch_size=B, dnorm_type=norm,
                         save_path="/tmp/ws_breakdown2")
        D = build_discriminator(c2)
        dv = D.init({"params": jax.random.PRNGKey(1),
                     "phase": jax.random.PRNGKey(2)}, pair, train=True)
        from flax.core import unfreeze
        dv = unfreeze(dv)
        dp = dv.pop("params")

        @jax.jit
        def d_step(dp, pair):
            def f(dp):
                (y, _), _ = D.apply({"params": cast_tree(dp, jnp.bfloat16), **dv},
                                    pair, train=True, mask=mask,
                                    mutable=list(MUTS), rngs={"phase": key})
                return jnp.sum(y.astype(jnp.float32))
            return jax.grad(f)(dp)
        res[tag] = timeit(d_step, dp, pair)

    # --- STFT power loss fwd + dGenh ---
    clean32 = x[..., 0].astype(jnp.float32)

    @jax.jit
    def stft_loss(genh):
        def f(g):
            gp = power_spectrum_db(g[..., 0].astype(jnp.float32), args.n_fft)
            cp = power_spectrum_db(clean32, args.n_fft)
            return jnp.mean(jnp.abs(gp - cp))
        return jax.grad(f)(genh)
    res["stft_loss"] = timeit(stft_loss, x)

    # --- same loss with an MXU matmul DFT ---
    n_fft, hop, win_len = args.n_fft, 160, 320
    win = jnp.hanning(win_len).astype(jnp.float32)
    k = np.arange(n_fft)
    freqs = np.arange(n_fft // 2 + 1)
    ang = -2 * np.pi * np.outer(k, freqs) / n_fft
    dft = jnp.asarray(np.concatenate([np.cos(ang), np.sin(ang)], axis=1)
                      .astype(np.float32))  # (n_fft, 2*(n_fft//2+1))

    def frames_of(sig):
        # center-padded frames as torch.stft(normalized=True)
        p = n_fft // 2
        sp = jnp.pad(sig, ((0, 0), (p, p)), mode="reflect")
        n_frames = 1 + (sp.shape[1] - n_fft) // hop
        idx = (np.arange(n_frames)[:, None] * hop + np.arange(win_len)[None, :]
               + (n_fft - win_len) // 2)
        fr = sp[:, idx] * win  # (B, F, win_len)
        pad_l = (n_fft - win_len) // 2
        return jnp.pad(fr, ((0, 0), (0, 0), (pad_l, n_fft - win_len - pad_l)))

    @jax.jit
    def stft_matmul(genh):
        def f(g):
            fr = frames_of(g[..., 0].astype(jnp.float32))
            Y = jnp.einsum("bfk,kc->bfc", fr, dft,
                           preferred_element_type=jnp.float32)
            nb = n_fft // 2 + 1
            mag2 = Y[..., :nb] ** 2 + Y[..., nb:] ** 2
            pw = 10 * jnp.log10(mag2 / n_fft + 1e-19)
            frc = frames_of(clean32)
            Yc = jnp.einsum("bfk,kc->bfc", frc, dft,
                            preferred_element_type=jnp.float32)
            mag2c = Yc[..., :nb] ** 2 + Yc[..., nb:] ** 2
            pwc = 10 * jnp.log10(mag2c / n_fft + 1e-19)
            return jnp.mean(jnp.abs(pw - pwc))
        return jax.grad(f)(genh)
    res["stft_matmul"] = timeit(stft_matmul, x)

    # --- misalign gather ---
    perm = jax.random.permutation(jax.random.PRNGKey(3), B)

    @jax.jit
    def gather(x):
        return x[perm]
    res["misalign"] = timeit(gather, x)

    print("done")


if __name__ == "__main__":
    main()
