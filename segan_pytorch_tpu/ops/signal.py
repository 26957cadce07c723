"""Waveform signal ops (normalization, pre/de-emphasis, slicing, padding).

Reference semantics reproduced from segan/datasets/se_dataset.py:90-126 and
segan/utils.py:23-38.  Device versions are jit-friendly; the de-emphasis IIR — an
inherently sequential first-order recurrence in the reference
(se_dataset.py:119-126) — is implemented as a parallel first-order linear
recurrence via ``jax.lax.associative_scan`` (O(log T) depth on TPU).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# normalization (ref: se_dataset.py:90-109, utils.py:23-24)
# ---------------------------------------------------------------------------
def normalize_wave_minmax(x):
    """int16 PCM -> [-1, 1] float: (2/65535)*(x - 32767) + 1 (ref se_dataset.py:108-109)."""
    xp = jnp if isinstance(x, jax.Array) else np
    return (2.0 / 65535.0) * (x.astype(xp.float32) - 32767.0) + 1.0


def denormalize_wave_minmax(x):
    """Inverse of normalize_wave_minmax (ref utils.py:23-24)."""
    return (65535.0 * x / 2.0) - 1.0 + 32767.0


def abs_short_normalize_wave_minmax(x):
    return x / 32767.0  # ref se_dataset.py:96-99


def abs_normalize_wave_minmax(x):
    x = np.asarray(x).astype(np.int32)
    return x / np.max(np.abs(x))  # ref se_dataset.py:90-94


def dynamic_normalize_wave_minmax(x):
    x = np.asarray(x).astype(np.int32)
    imax, imin = np.max(x), np.min(x)
    return ((x - imin) / (float(imax) - float(imin))) * 2 - 1  # ref se_dataset.py:101-106


# ---------------------------------------------------------------------------
# pre / de emphasis
# ---------------------------------------------------------------------------
def pre_emphasize(x: jax.Array, coef: float = 0.95) -> jax.Array:
    """y[0]=x[0]; y[t]=x[t]-coef*x[t-1]  (ref se_dataset.py:111-117). Works on (..., T)."""
    if coef <= 0:
        return x
    return jnp.concatenate([x[..., :1], x[..., 1:] - coef * x[..., :-1]], axis=-1)


def pre_emphasize_np(x: np.ndarray, coef: float = 0.95) -> np.ndarray:
    if coef <= 0:
        return x
    x0 = np.reshape(x[0], (1,))
    return np.concatenate((x0, x[1:] - coef * x[:-1]), axis=0)


def de_emphasize(y: jax.Array, coef: float = 0.95) -> jax.Array:
    """Inverse IIR x[t] = coef*x[t-1] + y[t] (ref se_dataset.py:119-126), on (..., T).

    TPU-native: the recurrence x_t = a*x_{t-1} + b_t composes associatively as
    (a2, b2)∘(a1, b1) = (a1*a2, a2*b1 + b2), so we evaluate it with an associative scan in
    O(log T) parallel depth instead of the reference's per-sample Python loop.
    """
    if coef <= 0:
        return y
    a = jnp.full_like(y, coef)

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, a2 * b1 + b2

    # x_t for the recurrence starting from x_{-1}=0 is just the scan of (a, y)
    _, x = lax.associative_scan(combine, (a, y), axis=-1)
    return x


def de_emphasize_np(y: np.ndarray, coef: float = 0.95) -> np.ndarray:
    """Host-side exact sequential version (reference semantics, se_dataset.py:119-126),
    vectorized with scipy lfilter for speed."""
    if coef <= 0:
        return y
    from scipy.signal import lfilter

    return lfilter([1.0], [1.0, -coef], y, axis=-1).astype(np.float32)


# ---------------------------------------------------------------------------
# padding / slicing
# ---------------------------------------------------------------------------
def make_div_n(x: jax.Array, n: int) -> jax.Array:
    """Zero-pad the time axis (last axis) so its length becomes divisible by N.

    Matches ref utils.py:26-38 'zeros' mode exactly, including its quirk of adding a full
    extra N when the length is already divisible: pad = (T + N) - (T % N) - T.
    """
    T = x.shape[-1]
    pad = (T + n) - (T % n) - T
    pad_width = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, pad_width)


def slice_signal_indices(n_samples: int, window_size: int, stride: float):
    """(beg, end) windows of `window_size` at `stride` fraction (ref se_dataset.py:62-88)."""
    assert 0 < stride <= 1, stride
    offset = int(window_size * stride)
    return [(b, b + window_size) for b in range(0, n_samples - window_size + 1, offset)]
