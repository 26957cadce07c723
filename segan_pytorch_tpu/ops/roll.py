"""Phase-shift time rolls for the Discriminator (ref segan/models/discriminator.py:160-172).

The reference rolls the time axis circularly by a random ±shift before every D conv
layer (WaveGAN phase-shuffle trick).  Two TPU findings (profiled on v5e, BENCH.md r2):

- ``jnp.roll`` with a traced shift lowers to concatenate + dynamic-slice; its autodiff
  *transpose* is worse (broadcast + dynamic-update-slice + concat-add, ~2x the forward
  cost) — so we wrap the roll in a custom VJP whose backward is simply the inverse
  roll, same cost as the forward.
- Dispatching over the 2*max_shift static shifts with ``lax.switch`` is NOT a win:
  TPU conditionals materialize operands in/out of every branch and block fusion
  (measured 121 -> 181 ms on the full fused train step).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.dtypes import float0


# largest |shift| for which the halo-buffer roll is used; beyond it we fall back to
# jnp.roll's doubled-buffer lowering (the halo would approach the tensor size anyway)
_MAX_HALO = 64


def _roll_halo(x: jax.Array, amount: jax.Array, max_abs: int) -> jax.Array:
    """Roll axis 1 by ``amount`` (|amount| <= max_abs, traced) using a small circular
    halo + one dynamic slice: ~2 full memory passes vs jnp.roll's ~3 (concat of the
    doubled tensor + slice)."""
    T = x.shape[1]
    M = max_abs
    xh = jnp.concatenate([x[:, T - M :], x, x[:, :M]], axis=1)
    start = (M - amount).astype(jnp.int32)
    zeros = [jnp.zeros((), jnp.int32)] * x.ndim
    zeros[1] = start
    return lax.dynamic_slice(xh, tuple(zeros), x.shape)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _roll_time(x: jax.Array, amount: jax.Array, max_abs: int) -> jax.Array:
    from . import knobs

    if (knobs.resolve("roll_impl") == "halo"
            and 0 < max_abs <= min(_MAX_HALO, x.shape[1])):
        return _roll_halo(x, amount, max_abs)
    return jnp.roll(x, amount, axis=1)


def _roll_fwd(x, amount, max_abs):
    return _roll_time(x, amount, max_abs), amount


def _roll_bwd(max_abs, res, ct):
    amount = res
    return (_roll_time(ct, -amount, max_abs), np.zeros(jnp.shape(amount), float0))


_roll_time.defvjp(_roll_fwd, _roll_bwd)


def roll_time(x: jax.Array, amount: jax.Array, max_abs: int = 0) -> jax.Array:
    """``jnp.roll(x, amount, axis=1)`` with an inverse-roll backward pass.

    ``max_abs`` > 0 promises |amount| <= max_abs and enables the cheaper halo-buffer
    lowering."""
    return _roll_time(x, amount, max_abs)


def phase_shift_roll(x: jax.Array, shift: jax.Array, right: jax.Array,
                     max_shift: int) -> jax.Array:
    """Circular roll of the time axis (axis 1) by ``+shift`` when ``right`` else
    ``-shift``, with ``shift`` traced in [1, max_shift].

    Numerically identical to ``jnp.roll(x, where(right, shift, -shift), axis=1)``.
    """
    amount = jnp.where(right, shift, -shift)
    return roll_time(x, amount, max_abs=max_shift)
