"""1-D convolution ops with the reference's exact padding/trim semantics, TPU-first.

Layout decision: we use channels-last ``(B, T, C)`` everywhere (vs torch's (B, C, T)) so that
the channel dimension maps onto TPU lanes (last dim = 128 lanes) and XLA tiles the implied
matmuls onto the MXU without relayout.

Semantics reproduced from the reference:
- strided encoder conv pads asymmetrically with reflect: (kw//2-1, kw//2) when stride>1,
  else symmetric (kw//2, kw//2)            (ref: segan/models/modules.py:92-98)
- transposed conv uses torch ConvTranspose1d with padding = max(0,(stride-kwidth)//-2) and
  trims the last output sample when kwidth is odd   (ref: segan/models/modules.py:115,137-138)
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

# Global default precision for conv/matmul. jax's DEFAULT downcasts fp32 operands to
# bf16-class precision (on TPU *and* in the CPU lowering as of jax 0.9), which breaks
# numerical parity with the fp32 reference. Policy: fp32 inputs run at HIGHEST (true
# fp32); the *performance* path is explicit bfloat16 compute dtype (bf16 operands hit the
# MXU natively, with fp32 accumulation via preferred_element_type).
DEFAULT_PRECISION = lax.Precision.HIGHEST


def reflect_pad_1d(x: jax.Array, pad_left: int, pad_right: int) -> jax.Array:
    """Reflect-pad the time axis of a (B, T, C) array (torch F.pad mode='reflect')."""
    if pad_left == 0 and pad_right == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="reflect")


def zero_pad_1d(x: jax.Array, pad_left: int, pad_right: int) -> jax.Array:
    if pad_left == 0 and pad_right == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))


def conv1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    dilation: int = 1,
    precision=DEFAULT_PRECISION,
) -> jax.Array:
    """VALID 1-D convolution. x: (B, T, Cin); kernel: (K, Cin, Cout) -> (B, T', Cout).

    Numerically equivalent to torch.nn.functional.conv1d with weight (Cout, Cin, K)
    transposed to (K, Cin, Cout) and no padding.

    Output dtype = input dtype. For bf16 inputs the TPU MXU accumulates in fp32
    internally; we deliberately do NOT force preferred_element_type=f32 here because an
    f32-output conv gets an f32 cotangent whose transpose-conv against the bf16 operands
    fails type checking in jax's conv transpose rule.
    """
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NWC", "WIO", "NWC"))
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=dn,
        precision=precision,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 4,
    padding: int = 0,
    precision=DEFAULT_PRECISION,
) -> jax.Array:
    """torch.nn.ConvTranspose1d semantics on (B, T, Cin) input.

    kernel: (K, Cin, Cout), equal to the torch weight (Cin, Cout, K) moved to K-first.
    Output length (L-1)*stride + K - 2*padding (ref torch semantics used at
    segan/models/modules.py:115-119).

    Implemented as an input-dilated convolution with a spatially-flipped kernel — the
    mathematically exact adjoint — which XLA lowers to MXU matmuls.
    """
    K = kernel.shape[0]
    pad = K - 1 - padding
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NWC", "WIO", "NWC"))
    y = lax.conv_general_dilated(
        x,
        jnp.flip(kernel, axis=0),
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=dn,
        precision=precision,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose1d_auto(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 4,
    padding: int = 0,
    precision=DEFAULT_PRECISION,
) -> jax.Array:
    """Dispatch between the two mathematically-identical transposed-conv lowerings.

    'dilated' (default): single lhs-dilated conv — XLA's TPU lowering handles the
    zero-stuffing efficiently, and this measured FASTER in the full train step
    (2410 vs 1627 slices/s/chip, BENCH.md r2) than 'phased'
    (SEGAN_TPU_DECONV=phased): polyphase decomposition into `stride` dense VALID
    convs + interleave, whose stack/reshape relayouts dominate on TPU.
    """
    import os

    impl = os.environ.get("SEGAN_TPU_DECONV", "dilated")
    if impl == "dilated" or stride == 1:
        return conv_transpose1d(x, kernel, bias, stride=stride, padding=padding,
                                precision=precision)
    return conv_transpose1d_phased(x, kernel, bias, stride=stride, padding=padding,
                                   precision=precision)


def conv_transpose1d_phased(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 4,
    padding: int = 0,
    precision=DEFAULT_PRECISION,
) -> jax.Array:
    """Phase-decomposed transposed conv: computes the same result as conv_transpose1d by
    splitting the kernel into `stride` polyphase components, running `stride` dense VALID
    convolutions (no zero-stuffing → denser MXU work), and interleaving the outputs.

    out[b, n*s + r, o] = sum_{i,k: k%s==r'} ... ; we derive each phase r as a conv of x with
    the sub-kernel kernel[r::s] (suitably aligned), then stack+reshape to interleave.
    Requires (K - padding) % stride handling; used as the perf path for the decoder shapes.
    """
    K, Cin, Cout = kernel.shape
    s = stride
    # Full (no-crop) transposed conv has output index t = n*s + k, t in [0, (L-1)s + K).
    # Phase r of the full output: t = m*s + r -> contributions from k = m*s + r - n*s
    # => k ≡ r (mod s) with m - n = (k - r)/s >= 0.
    # y_full[m*s + r] = sum_n x[n] * W[(m-n)*s + r]  = causal conv of x with W_r = W[r::s]
    L = x.shape[1]
    # the full output reaches t = (L-1)*s + K - 1, i.e. phase index m up to L-1+ext
    ext = (K + s - 1) // s
    outs = []
    for r in range(s):
        Wr = kernel[r::s]  # (Kr, Cin, Cout)
        Kr = Wr.shape[0]
        # causal: y_r[m] = sum_{j=0..Kr-1} x[m-j] W_r[j] -> flip kernel, left-pad Kr-1;
        # right-pad ext so tail phases (m >= L) are produced too
        dn = lax.conv_dimension_numbers(x.shape, Wr.shape, ("NWC", "WIO", "NWC"))
        yr = lax.conv_general_dilated(
            x,
            jnp.flip(Wr, axis=0),
            window_strides=(1,),
            padding=[(Kr - 1, ext)],
            dimension_numbers=dn,
            precision=precision,
        )  # (B, L+ext, Cout) with y_full index m*s + r for m in [0, L+ext)
        outs.append(yr)
    # interleave phases: full[t] for t = m*s + r
    y_full = jnp.stack(outs, axis=2).reshape(x.shape[0], (L + ext) * s, Cout)
    # full length is (L-1)*s + K; our grid covers t in [0, L*s); crop to torch semantics:
    # torch output = full[padding : (L-1)*s + K - padding]
    end = (L - 1) * s + K - padding
    y = y_full[:, padding:end, :]
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
