"""Weight initializers matching the reference's init behavior.

The reference applies classname-matched initializers (ref segan/models/model.py:28-60):
- SEGAN `weights_init`: Conv1d weight ~ N(0, 0.02), bias 0; Linear weight Xavier-uniform
  (bias left at torch default); ConvTranspose1d is NOT matched (the substring 'Conv1d'
  does not occur in 'ConvTranspose1d') so deconvs keep torch's default kaiming-uniform.
- WSEGAN `wsegan_weights_init`: Xavier-uniform for Conv1d, ConvTranspose1d and Linear.
- PReLU slopes / BatchNorm keep their constructor defaults.

We reproduce torch's default inits where the reference relies on them:
torch Conv default = kaiming_uniform(a=sqrt(5)) on weight, bias ~ U(±1/sqrt(fan_in)).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def normal_002(key, shape, dtype=jnp.float32):
    """N(0, 0.02) — SEGAN conv weight init (ref model.py:35-37)."""
    return 0.02 * jax.random.normal(key, shape, dtype)


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def constant(val: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, val, dtype)

    return init


def _conv_fans(shape):
    """fan_in/fan_out for our kernel layouts.

    conv kernel (K, Cin, Cout): fan_in = Cin*K, fan_out = Cout*K.
    linear kernel (In, Out): fan_in = In, fan_out = Out.
    """
    if len(shape) == 3:
        K, cin, cout = shape
        return cin * K, cout * K
    if len(shape) == 2:
        return shape[0], shape[1]
    raise ValueError(f"unsupported shape {shape}")


def xavier_uniform(key, shape, dtype=jnp.float32):
    """torch nn.init.xavier_uniform_ (gain 1)."""
    fan_in, fan_out = _conv_fans(shape)
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def xavier_uniform_convT(key, shape, dtype=jnp.float32):
    """Xavier for transposed-conv kernels stored as (K, Cin, Cout).

    torch computes fans on the weight tensor (Cin, Cout, K) -> fan_in=Cout*K, fan_out=Cin*K
    (torch treats dim0 as out-features). Match that so WSEGAN init parity holds.
    """
    K, cin, cout = shape
    fan_in, fan_out = cout * K, cin * K
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def torch_default_conv_weight(key, shape, dtype=jnp.float32):
    """torch Conv/ConvTranspose default: kaiming_uniform(a=sqrt(5)) == U(±sqrt(1/fan_in)).

    NOTE fan_in for ConvTranspose in torch is computed on (Cin, Cout, K) as Cout*K? No —
    torch _calculate_fan_in_and_fan_out on ConvTranspose weight (Cin, Cout, K) gives
    fan_in = Cout*K (dim1 * receptive field). We expose both via shape convention:
    this function treats (K, Cin, Cout) as a forward conv (fan_in = Cin*K); use
    torch_default_convT_weight for transposed kernels.
    """
    fan_in, _ = _conv_fans(shape)
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_convT_weight(key, shape, dtype=jnp.float32):
    K, cin, cout = shape
    fan_in = cout * K
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_bias(fan_in: int):
    """torch Conv/Linear default bias: U(±1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
