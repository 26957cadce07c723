"""STFT for the WSEGAN power loss, matching torch.stft as used by the reference
(segan/models/model.py:640-652): n_fft=min(T, 2048), hop_length=160, win_length=320,
window=None (rectangular), normalized=True, center=True (reflect pad), onesided.

The reference takes the complex modulus and 10*log10(|X|^2 + 1e-19)
(model.py:645-652; note the literal is written `10e-20` there).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _frame(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """(B, T) -> (B, n_frames, frame_length) via a strided gather (static shapes)."""
    B, T = x.shape
    n_frames = 1 + (T - frame_length) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_length)[None, :]
    return x[:, idx]


def stft_mag(
    x: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 160,
    win_length: int = 320,
    normalized: bool = True,
    center: bool = True,
) -> jax.Array:
    """Magnitude STFT of (B, T) -> (B, n_fft//2+1, n_frames), torch.stft layout.

    window=None in torch means a rectangular window of win_length centered inside the
    n_fft frame (zero-padded both sides).
    """
    B, T = x.shape
    n_fft = min(T, n_fft)
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    frames = _frame(x, n_fft, hop_length)  # (B, F, n_fft)
    if win_length < n_fft:
        # rectangular window of win_length centered in the frame
        left = (n_fft - win_length) // 2
        w = jnp.zeros((n_fft,), x.dtype).at[left : left + win_length].set(1.0)
        frames = frames * w
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (B, F, n_fft//2+1)
    mag = jnp.abs(spec)
    if normalized:
        mag = mag / jnp.sqrt(jnp.asarray(n_fft, x.dtype))
    return jnp.transpose(mag, (0, 2, 1))  # (B, bins, frames)


def power_spectrum_db(x: jax.Array, n_fft: int = 2048) -> jax.Array:
    """10*log10(|STFT|^2 + 1e-19) as in ref model.py:645-646,651-652."""
    mag = stft_mag(x, n_fft=n_fft)
    return 10.0 * jnp.log10(mag**2 + 10e-20)
