"""Pallas TPU experiment: multi-layer fused encoder forward (VERDICT r2 item 1 —
"streamed-weight Pallas kernel at multi-layer granularity, by attempt").

Fuses GConv1DBlock layers enc2+enc3 of the SEGAN+ generator (stride-4, K=31,
64->128->256 channels) into ONE kernel: each grid program pulls a batch tile of
enc1 activations through BOTH layers entirely in VMEM — the enc2 activations
never round-trip HBM (the skip pre-activations still stream out, the decoder
needs them).

Why this granularity and not the whole encoder (the measured ceiling):
- VMEM is ~16 MB/core. The folded weights are w2' 0.5 MB + w3' 2 MB +
  w4' 8 MB + w5' 32 MB. Chaining through enc5 requires enc4/enc5 weights
  resident or streamed: with double-buffered tap streaming (2 x 4 MB for w5',
  2 x 1 MB for w4') plus the live activations of a batch tile, the budget only
  closes at batch-tile <= 2 — where the deep layers' MXU row counts collapse
  (enc5 emits 16 rows/example; 2 x 16 = 32 rows vs the 128-row MXU), exactly
  the regime where XLA already beats a Pallas kernel (BENCH.md r2: enc5 XLA
  1.83 ms vs Pallas 3.47 ms standalone).
- enc2+enc3 at batch-tile 4 fits: ~2 MB input tile + 2 x 2 MB enc2 pre/post +
  2 x 0.5 MB enc3 + 2.5 MB weights ~= 9.5 MB.

Layout trick for the in-VMEM handoff: layer L+1 consumes layer L's output in
space-to-depth form (s consecutive time rows folded into s*C channels). For a
contiguous block of output rows this fold is a plain (t, C) -> (t/s, s*C)
reshape, which Mosaic lowers as a sublane->lane relayout.

Semantics per GConv1DBlock (ref modules.py:92-98): reflect pad (kw//2-1, kw//2)
then stride-s conv + bias + PReLU. The reflect pads happen in-kernel on the
VMEM-resident activations (static slices + flips).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 31
S = 4
KP = (K + S - 1) // S  # 8 folded taps


def _fold_weights(w: jax.Array) -> jax.Array:
    """(K, Cin, Cout) stride-S kernel -> (KP, S*Cin, Cout) folded stride-1 taps."""
    Kk, Cin, Cout = w.shape
    w_pad = jnp.pad(w, ((0, KP * S - Kk), (0, 0), (0, 0)))
    return w_pad.reshape(KP, S * Cin, Cout)


def _reflect_pad_rows(x, pl_, pr):
    """Reflect-pad axis 0 of a (T, C) VMEM value.

    Mosaic has no `rev` lowering, so the mirrored edges are built from
    single-row static slices (pl_+pr tiny concats of (1, C) rows)."""
    T = x.shape[0]
    left = [jax.lax.slice_in_dim(x, i, i + 1, axis=0)
            for i in range(pl_, 0, -1)]
    right = [jax.lax.slice_in_dim(x, T - 2 - j, T - 1 - j, axis=0)
             for j in range(pr)]
    return jnp.concatenate(left + [x] + right, axis=0)


def _conv_block(xf, w_ref, b_ref, a_ref, t_out, acc_dtype=jnp.float32):
    """Folded stride-1 conv: xf (t_out + KP, S*Cin) -> (t_out, Cout), + bias,
    returns (pre, post) with PReLU post-activation."""
    cout = b_ref.shape[-1]
    acc = jnp.zeros((t_out, cout), acc_dtype)
    for q in range(KP):
        xq = jax.lax.slice_in_dim(xf, q, q + t_out, axis=0)
        acc += jnp.dot(xq, w_ref[q], preferred_element_type=acc_dtype)
    acc = acc + b_ref[0].astype(acc_dtype)
    slope = a_ref[0].astype(acc_dtype)
    post = jnp.maximum(acc, 0) + slope * jnp.minimum(acc, 0)
    return acc, post


def _kernel(x_ref, w2_ref, b2_ref, a2_ref, w3_ref, b3_ref, a3_ref,
            pre2_ref, pre3_ref, post3_ref, *, T1: int, bt: int):
    # x_ref: (bt, T1, C1) enc1 post-activations (un-padded); layer shapes below
    # are per batch row; the batch loop keeps every intermediate 2-D so the
    # reshape-folds stay simple relayouts.
    T2, T3 = T1 // S, T1 // (S * S)
    for bi in range(bt):  # static unroll over the batch tile
        x = x_ref[bi]  # (T1, C1)
        # --- enc2: reflect pad (14, 15) -> fold -> conv ---
        xp = _reflect_pad_rows(x, K // 2 - 1, K // 2)  # (T1+29, C1)
        # fold to stride-1: need rows t*S + k, k<32 -> (T2 + KP) folded rows
        need = (T2 + KP) * S
        xp = jax.lax.slice_in_dim(
            jnp.pad(xp, ((0, max(0, need - xp.shape[0])), (0, 0))), 0, need,
            axis=0)
        xf = xp.reshape(T2 + KP, S * x.shape[-1])
        pre2, post2 = _conv_block(xf, w2_ref, b2_ref, a2_ref, T2)
        pre2_ref[bi] = pre2.astype(pre2_ref.dtype)
        # --- enc3 consumes post2 straight from VMEM ---
        yp = _reflect_pad_rows(post2.astype(x_ref.dtype), K // 2 - 1,
                               K // 2)
        need3 = (T3 + KP) * S
        yp = jax.lax.slice_in_dim(
            jnp.pad(yp, ((0, max(0, need3 - yp.shape[0])), (0, 0))), 0, need3,
            axis=0)
        yf = yp.reshape(T3 + KP, S * post2.shape[-1])
        pre3, post3 = _conv_block(yf, w3_ref, b3_ref, a3_ref, T3)
        pre3_ref[bi] = pre3.astype(pre3_ref.dtype)
        post3_ref[bi] = post3.astype(post3_ref.dtype)


def fused_enc23_fwd(h1: jax.Array, w2, b2, a2, w3, b3, a3,
                    batch_tile: int = 4, interpret: bool = False
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Chained enc2+enc3 forward. h1: (B, T1, C1) enc1 POST-activations.
    Returns (pre2, pre3, post3) — pre-activations are the skip tensors
    (ref generator.py:185,191), post3 feeds enc4."""
    B, T1, C1 = h1.shape
    _, _, C2 = w2.shape
    _, _, C3 = w3.shape
    assert T1 % (S * S) == 0, T1
    bt = min(batch_tile, B)
    while B % bt:
        bt -= 1
    T2, T3 = T1 // S, T1 // (S * S)
    grid = (B // bt,)
    w2f, w3f = _fold_weights(w2), _fold_weights(w3)
    pre2, pre3, post3 = pl.pallas_call(
        functools.partial(_kernel, T1=T1, bt=bt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, T1, C1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP, S * C1, C2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KP, S * C2, C3), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, T2, C2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, T3, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, T3, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T2, C2), h1.dtype),
            jax.ShapeDtypeStruct((B, T3, C3), h1.dtype),
            jax.ShapeDtypeStruct((B, T3, C3), h1.dtype),
        ],
        interpret=interpret,
    )(h1, w2f, b2.reshape(1, -1), a2.reshape(1, -1),
      w3f, b3.reshape(1, -1), a3.reshape(1, -1))
    return pre2, pre3, post3
