"""STFT for the WSEGAN power loss, matching torch.stft as used by the reference
(segan/models/model.py:640-652): n_fft=min(T, 2048), hop_length=160, win_length=320,
window=None (rectangular), normalized=True, center=True (reflect pad), onesided.

The reference takes the complex modulus and 10*log10(|X|^2 + 1e-19)
(model.py:645-652; note the literal is written `10e-20` there).

TPU note: XLA's TPU FFT is slow — the in-step power loss measured 39 ms/step at
the canonical WSEGAN batch 150 (tools/wsegan_breakdown.py), ~40% of the whole
step. Since the torch-default window is a RECTANGULAR win_length-sample window
centered inside the n_fft frame, each frame has only win_length (320) nonzero
samples, and |X_k| is invariant to the window's absolute phase — so the
magnitude equals a (B*F, 320) @ (320, 2*(n_fft//2+1)) real DFT matmul, which
maps straight onto the MXU. `method='matmul'` (auto-selected on TPU) computes
exactly that; 'fft' keeps the rfft lowering (used on CPU, where fft is fine).
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _frame(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """(B, T) -> (B, n_frames, frame_length) via a strided gather (static shapes)."""
    B, T = x.shape
    n_frames = 1 + (T - frame_length) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_length)[None, :]
    return x[:, idx]


@lru_cache(maxsize=8)
def _dft_matrix_np(win_length: int, n_fft: int) -> np.ndarray:
    """(win_length, 2*(n_fft//2+1)) real DFT basis [cos | sin] for magnitude.

    The window sits at an arbitrary offset inside the n_fft frame; |X_k| is
    invariant to that constant phase factor, so the basis uses j in
    [0, win_length) directly.

    Returns NUMPY, never a jax array: the cache is shared across jit traces, so
    caching a device/traced array would leak a tracer out of the first trace
    that populated it (UnexpectedTracerError in every later trace). Callers
    jnp.asarray it at the use site (a constant fold under jit)."""
    k = np.arange(win_length)
    freqs = np.arange(n_fft // 2 + 1)
    ang = -2.0 * np.pi * np.outer(k, freqs) / n_fft
    return np.concatenate([np.cos(ang), np.sin(ang)], axis=1).astype(np.float32)


def _resolve_method(method: str | None) -> str:
    from . import knobs

    method = knobs.resolve("stft_method", override=method)
    if method == "auto":
        return "matmul" if jax.default_backend() == "tpu" else "fft"
    return method


def _stft_power(
    x: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 160,
    win_length: int = 320,
    normalized: bool = True,
    center: bool = True,
    method: str | None = None,
    precision: str | None = None,
) -> jax.Array:
    """|STFT|^2 of (B, T) -> (B, n_fft//2+1, n_frames), torch.stft layout.

    The power form (re^2 + im^2, no sqrt) is what the training loss consumes —
    and it is the gradient-safe form: sqrt's derivative at an exactly-zero
    frame is 0/0 = NaN, and bf16 generator outputs DO produce exact-zero
    frames (observed as a NaN blowup in a real WSEGAN hardware run).
    """
    B, T = x.shape
    n_fft = min(T, n_fft)
    win_length = min(win_length, n_fft)
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    if _resolve_method(method) == "matmul":
        # frame only the nonzero window samples and contract with the real DFT
        # basis on the MXU. fp32 at HIGHEST precision for fft parity (6-pass
        # MXU emulation); precision='default' (or SEGAN_TPU_STFT_PRECISION)
        # opts into the 1-pass bf16-input/fp32-accum contraction (~1e-3
        # relative error — fine for the pow_weight=0.001 training loss, not
        # for metric parity)
        left = (n_fft - win_length) // 2
        Tp = x.shape[1]
        n_frames = 1 + (Tp - n_fft) // hop_length
        idx = (jnp.arange(n_frames)[:, None] * hop_length + left
               + jnp.arange(win_length)[None, :])
        frames = x[:, idx].astype(jnp.float32)  # (B, F, win_length)
        basis = jnp.asarray(_dft_matrix_np(win_length, n_fft))
        from . import knobs

        prec_name = knobs.resolve("stft_precision", override=precision) or "highest"
        prec = (jax.lax.Precision.DEFAULT if prec_name == "default"
                else jax.lax.Precision.HIGHEST)
        Y = jax.lax.dot_general(
            frames, basis, (((2,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)  # (B, F, 2*(nb))
        nb = n_fft // 2 + 1
        power = Y[..., :nb] ** 2 + Y[..., nb:] ** 2
        power = power.astype(x.dtype)
    else:
        frames = _frame(x, n_fft, hop_length)  # (B, F, n_fft)
        if win_length < n_fft:
            # rectangular window of win_length centered in the frame
            left = (n_fft - win_length) // 2
            w = jnp.zeros((n_fft,), x.dtype).at[left : left + win_length].set(1.0)
            frames = frames * w
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (B, F, n_fft//2+1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if normalized:
        power = power / jnp.asarray(n_fft, power.dtype)
    return jnp.transpose(power, (0, 2, 1))  # (B, bins, frames)


def stft_mag(
    x: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 160,
    win_length: int = 320,
    normalized: bool = True,
    center: bool = True,
    method: str | None = None,
    precision: str | None = None,
) -> jax.Array:
    """Magnitude STFT of (B, T) -> (B, n_fft//2+1, n_frames), torch.stft layout.

    window=None in torch means a rectangular window of win_length centered inside the
    n_fft frame (zero-padded both sides). `method`: 'fft' | 'matmul' | None
    (auto: matmul on TPU — see module docstring; override with SEGAN_TPU_STFT).
    NB: the magnitude's gradient is undefined at exactly-zero frames; losses
    should go through power_spectrum_db (the sqrt-free power form).
    """
    return jnp.sqrt(_stft_power(x, n_fft=n_fft, hop_length=hop_length,
                                win_length=win_length, normalized=normalized,
                                center=center, method=method,
                                precision=precision))


def power_spectrum_db(x: jax.Array, n_fft: int = 2048,
                      precision: str | None = None,
                      method: str | None = None) -> jax.Array:
    """10*log10(|STFT|^2 + 1e-19) as in ref model.py:645-646,651-652.

    Computed through the sqrt-free power form: forward-identical to
    10*log10(mag^2 + eps), but with a finite gradient at exactly-zero frames
    (the sqrt-then-square chain NaNs there — see _stft_power)."""
    p = _stft_power(x, n_fft=n_fft, precision=precision, method=method)
    return 10.0 * jnp.log10(p + 10e-20)
