"""Pallas TPU kernel: fused strided conv1d + bias + PReLU (the GConv1DBlock hot path,
norm-free configuration — the SEGAN+ generator default, gnorm_type=null).

Design (Mosaic-constraint-driven):
- A stride-s width-K conv is turned into a stride-1 width-ceil(K/s) conv by
  space-to-depth: the wrapper reshapes x (B, T, Cin) -> (B, T/s, s*Cin) and regroups the
  kernel to W' (K', s*Cin, Cout) with K' = ceil((K + s - 1)/s) (zero-padded taps). This
  both feeds the MXU a s×-fatter contraction dim and removes strided memory access.
- Mosaic requires dynamically-sliced sublane offsets to be tile-aligned, so each grid
  program loads ONE aligned window x[base : base + t_tile + K'] (base = ti*t_tile,
  t_tile % 8 == 0) and derives the K' shifted views with static slices.
- The kernel accumulates K' MXU matmuls (t_tile, s*Cin) @ (s*Cin, Cout_tile) in fp32 and
  applies bias + PReLU in the epilogue. It emits BOTH the activated output and the
  pre-activation (the generator's skips shuttle pre-activations, ref generator.py:185,191
  — and PReLU's backward needs it anyway, so memory matches the XLA path under grad).

Training support: `fused_conv1d_prelu` carries a custom VJP whose backward reuses jax's
exact conv transpose rules, so the op is a drop-in inside the jitted train step.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..conv import conv1d, conv_transpose1d


def _kernel(x_ref, w_ref, b_ref, a_ref, o_ref, pre_ref, *, Kp: int, t_tile: int,
            acc_dtype):
    # x_ref: (1, T_rows, Cg) space-to-depth input; w_ref: (Kp, Cg, Ct);
    # b_ref/a_ref: (1, Ct); o_ref/pre_ref: (1, t_tile, Ct)
    ti = pl.program_id(1)
    base = ti * t_tile  # t_tile % 8 == 0 -> aligned dynamic offset
    win = x_ref[0, pl.ds(base, t_tile + Kp), :]  # one aligned load per program
    ct = o_ref.shape[-1]
    acc = jnp.zeros((t_tile, ct), acc_dtype)
    for q in range(Kp):
        xq = jax.lax.slice_in_dim(win, q, q + t_tile, axis=0)  # static shift
        acc += jnp.dot(xq, w_ref[q], preferred_element_type=acc_dtype)
    acc = acc + b_ref[0].astype(acc_dtype)
    pre_ref[0] = acc.astype(pre_ref.dtype)
    slope = a_ref[0].astype(acc_dtype)
    y = jnp.maximum(acc, 0) + slope * jnp.minimum(acc, 0)
    o_ref[0] = y.astype(o_ref.dtype)


def _pallas_conv_prelu(x, w, b, a, stride: int, t_tile: int, interpret: bool):
    B, T_in, Cin = x.shape
    K, _, Cout = w.shape
    s = stride
    T_out = (T_in - K) // s + 1
    # ---- space-to-depth: stride-s width-K -> stride-1 width-Kp over s*Cin channels ----
    Kp = (K + s - 1) // s if s > 1 else K
    if s > 1:
        rows_needed = T_out + Kp  # kernel loads t_tile + Kp rows per tile
        pad_t = rows_needed * s - T_in
        if pad_t > 0:
            x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
        x = x[:, : rows_needed * s, :].reshape(B, rows_needed, s * Cin)
        w_pad = jnp.pad(w, ((0, Kp * s - K), (0, 0), (0, 0)))
        w_k = w_pad.reshape(Kp, s * Cin, Cout)
        Cg = s * Cin
        T_rows = rows_needed
    else:
        pad_t = (T_out + Kp) - T_in
        if pad_t > 0:
            x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
        w_k = w
        Cg = Cin
        T_rows = x.shape[1]

    t_tile = min(t_tile, T_out)
    while t_tile >= 8 and (T_out % t_tile or t_tile % 8):
        t_tile //= 2
    if t_tile < 8 or T_out % t_tile:
        raise ValueError(
            f"fused_conv1d_prelu needs T_out divisible by an 8-multiple tile, got "
            f"T_out={T_out} (gate with pallas_applicable())")
    n_t = T_out // t_tile
    c_tile = Cout
    while Kp * Cg * c_tile * x.dtype.itemsize > 4 * 1024 * 1024 and c_tile % 2 == 0:
        c_tile //= 2
    n_c = Cout // c_tile
    grid = (B, n_t, n_c)
    y, pre = pl.pallas_call(
        functools.partial(_kernel, Kp=Kp, t_tile=t_tile, acc_dtype=jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T_rows, Cg), lambda bi, ti, ci: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, Cg, c_tile), lambda bi, ti, ci: (0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_tile), lambda bi, ti, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_tile), lambda bi, ti, ci: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t_tile, c_tile), lambda bi, ti, ci: (bi, ti, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, c_tile), lambda bi, ti, ci: (bi, ti, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T_out, Cout), x.dtype),
            jax.ShapeDtypeStruct((B, T_out, Cout), x.dtype),
        ],
        interpret=interpret,
    )(x, w_k, b.reshape(1, -1), a.reshape(1, -1))
    return y, pre


def pallas_applicable(T_in: int, K: int, stride: int) -> bool:
    """The kernel needs a cleanly tileable output length, and only wins when the
    time-tile gives the MXU enough rows (measured on v5e: XLA is faster at T_out=16,
    the SEGAN bottleneck layer; Pallas wins the wide layers by 1.1-1.4x)."""
    T_out = (T_in - K) // stride + 1
    return T_out % 8 == 0 and T_out >= 64


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_conv1d_prelu(x, w, b, a, stride: int = 4, t_tile: int = 256,
                       interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """x: (B, T_in, Cin) already padded; w: (K, Cin, Cout); b/a: (Cout,).
    Returns (y, preact) with y = PReLU(conv(x, w) + b, a)."""
    return _pallas_conv_prelu(x, w, b, a, stride, t_tile, interpret)


def _fwd(x, w, b, a, stride, t_tile, interpret):
    y, pre = _pallas_conv_prelu(x, w, b, a, stride, t_tile, interpret)
    return (y, pre), (x, w, a, pre)


def _bwd(stride, t_tile, interpret, res, cots):
    x, w, a, pre = res
    gy, gpre_direct = cots
    # PReLU backward: dpre = gy * (pre>0 ? 1 : a); da = sum gy * min(pre, 0)
    af = a.astype(jnp.float32)
    gyf = gy.astype(jnp.float32)
    pref = pre.astype(jnp.float32)
    dpre = jnp.where(pref > 0, gyf, gyf * af)
    if gpre_direct is not None:
        dpre = dpre + gpre_direct.astype(jnp.float32)
    da = jnp.sum(gyf * jnp.minimum(pref, 0), axis=(0, 1)).astype(a.dtype)
    db = jnp.sum(dpre, axis=(0, 1)).astype(a.dtype)
    dpre = dpre.astype(x.dtype)
    # direct adjoints (NOT jax.vjp — vjp construction would re-execute the forward):
    # dx[u,ci] = Σ_{n,k: n·s+k=u} dpre[n,co]·w[k,ci,co]  == conv_transpose of dpre with
    # the in/out-swapped kernel
    dx = conv_transpose1d(dpre, jnp.transpose(w, (0, 2, 1)), stride=stride, padding=0)
    # when (T_in - K) % stride != 0, the last few x samples never touch any window:
    # their gradient is zero — pad dx back to x's length
    if dx.shape[1] < x.shape[1]:
        dx = jnp.pad(dx, ((0, 0), (0, x.shape[1] - dx.shape[1]), (0, 0)))
    # dw[k,ci,co] = Σ_{b,t} x[b, t·s+k, ci]·dpre[b,t,co]: a conv with batch as the
    # contraction dim — lhs (Ci, T_in, B), rhs (T_out, B, Co), rhs_dilation = stride
    from jax import lax

    lhs = jnp.transpose(x, (2, 1, 0))
    rhs = jnp.transpose(dpre, (1, 0, 2))
    dn = lax.conv_dimension_numbers(lhs.shape, rhs.shape, ("NWC", "WIO", "NWC"))
    dw = lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID", rhs_dilation=(stride,),
        dimension_numbers=dn)
    dw = jnp.transpose(dw, (1, 0, 2)).astype(w.dtype)[: w.shape[0]]  # (K, Ci, Co)
    return dx, dw, db, da


fused_conv1d_prelu.defvjp(_fwd, _bwd)
