"""1-D convolution ops with the reference's exact padding/trim semantics, TPU-first.

Layout decision: we use channels-last ``(B, T, C)`` everywhere (vs torch's (B, C, T)) so that
the channel dimension maps onto TPU lanes (last dim = 128 lanes) and XLA tiles the implied
matmuls onto the MXU without relayout.

Semantics reproduced from the reference:
- strided encoder conv pads asymmetrically with reflect: (kw//2-1, kw//2) when stride>1,
  else symmetric (kw//2, kw//2)            (ref: segan/models/modules.py:92-98)
- transposed conv uses torch ConvTranspose1d with padding = max(0,(stride-kwidth)//-2) and
  trims the last output sample when kwidth is odd   (ref: segan/models/modules.py:115,137-138)

AD support note: ``reflect_pad_1d`` (always on) and the opt-in ``SEGAN_TPU_CONV_GRAD``
lowerings are ``jax.custom_vjp`` functions, so they support reverse-mode AD only —
``jax.jvp``/``jacfwd``/``hessian`` through any conv block raises. This framework's
training and inference paths are exclusively reverse-mode (jax.grad/vjp); if you need
forward-mode through these ops, replace reflect_pad_1d with plain jnp.pad (its slower
autodiff transpose is forward-mode capable).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Global default precision for conv/matmul. jax's DEFAULT downcasts fp32 operands to
# bf16-class precision (on TPU *and* in the CPU lowering as of jax 0.9), which breaks
# numerical parity with the fp32 reference. Policy: fp32 inputs run at HIGHEST (true
# fp32); the *performance* path is explicit bfloat16 compute dtype (bf16 operands hit the
# MXU natively, with fp32 accumulation via preferred_element_type).
DEFAULT_PRECISION = lax.Precision.HIGHEST


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def reflect_pad_1d(x: jax.Array, pad_left: int, pad_right: int) -> jax.Array:
    """Reflect-pad the time axis of a (B, T, C) array (torch F.pad mode='reflect').

    Custom VJP: autodiff's transpose of a reflect pad is a full-tensor scatter-add
    (profiled at several ms/step on v5e); the true adjoint is the interior slice plus
    two edge-sized adds, which is what the backward below does.
    """
    if pad_left == 0 and pad_right == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="reflect")


def _reflect_pad_fwd(x, pad_left, pad_right):
    return reflect_pad_1d(x, pad_left, pad_right), x.shape[1]


def _reflect_pad_bwd(pad_left, pad_right, T, ct):
    g = ct[:, pad_left : pad_left + T, :]
    if pad_left:
        # xp[i] = x[pad_left - i] for i < pad_left  ->  x[1..pad_left] += ct[:pad_left][::-1]
        g = g.at[:, 1 : pad_left + 1, :].add(ct[:, :pad_left, :][:, ::-1, :])
    if pad_right:
        # xp[pl+T+i] = x[T-2-i]  ->  x[T-1-pr .. T-2] += ct[pl+T:][::-1]
        g = g.at[:, T - 1 - pad_right : T - 1, :].add(
            ct[:, pad_left + T :, :][:, ::-1, :])
    return (g,)


reflect_pad_1d.defvjp(_reflect_pad_fwd, _reflect_pad_bwd)


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
    from . import knobs

    mode = knobs.resolve("conv_grad")
    use_custom = stride > 1 and dilation == 1 and (
        mode == "custom"
        or (mode == "auto" and _custom_grad_wins(x.shape[2], kernel.shape[2], stride)))
    # edge_conv='s2d' (cfg field / SEGAN_TPU_EDGE_CONV): space-to-depth lowering
    # for the tiny-Cin edge layers (G enc1 Cin=1, D conv1 Cin=2), whose Cin*K
    # contraction starves the 128-lane MXU minor dim (measured 0.4% of roofline
    # at batch 300, docs/PROFILE_B300.md). Pure XLA (reshape + stride-1 conv), so
    # autodiff and producer/consumer fusion work natively — no custom-VJP barrier.
    use_s2d = (knobs.resolve("edge_conv") not in ("off", "0", False)
               and stride > 1 and dilation == 1
               and x.shape[2] * kernel.shape[0] <= 64)
    if use_s2d:
        y = conv1d_s2d(x, kernel, stride=stride, precision=precision)
    elif use_custom:
        # custom backward: blocked-transpose dx + phase-dot dw (see bottom of file)
        y = _conv1d_cg(x, kernel, stride, precision)
    else:
        dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NWC", "WIO", "NWC"))
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


def _s2d_strided_kernel(kernel: jax.Array, stride: int, block: int) -> jax.Array:
    """Fold a (K, Cin, Cout) strided-conv kernel into the space-to-depth form
    W' (K_b, block*Cin, phases*Cout): with inputs viewed as rows of `block`
    samples and outputs as rows of `phases = block/stride` samples,
    W'[j, i*Cin+ci, r*Cout+co] = kernel[block*j + i - stride*r, ci, co]
    (zero where the tap index falls outside [0, K))."""
    K, Cin, Cout = kernel.shape
    phases = block // stride
    K_b = (K - 1 + block - stride) // block + 1
    j = np.arange(K_b)[:, None, None]
    i = np.arange(block)[None, :, None]
    r = np.arange(phases)[None, None, :]
    kidx = block * j + i - stride * r  # (K_b, block, phases)
    valid = (kidx >= 0) & (kidx < K)
    kc = jnp.asarray(np.clip(kidx, 0, K - 1))
    wp = jnp.take(kernel, kc.reshape(-1), axis=0).reshape(
        K_b, block, phases, Cin, Cout)
    wp = jnp.where(jnp.asarray(valid)[..., None, None], wp, 0)
    # (K_b, block, Cin, phases, Cout) -> (K_b, block*Cin, phases*Cout)
    return wp.transpose(0, 1, 3, 2, 4).reshape(K_b, block * Cin, phases * Cout)


def conv1d_s2d(
    x: jax.Array,
    kernel: jax.Array,
    stride: int,
    block: Optional[int] = None,
    precision=DEFAULT_PRECISION,
) -> jax.Array:
    """Strided VALID conv of pre-padded x via space-to-depth time folding.

    Bit-for-bit the same math as conv1d(x, kernel, stride=stride) — `block`
    input samples fold into channels so the contraction runs over
    K_b x block*Cin instead of K x Cin, putting the tiny-Cin edge layers'
    work on MXU lanes. The trailing zero-pad added for row alignment is only
    ever multiplied by the zero entries of the folded kernel, so results are
    unaffected. Everything is reshape + stride-1 conv: gradients and XLA
    fusion behave exactly like the plain lowering (no custom VJP)."""
    B, Lp, Cin = x.shape
    K, _, Cout = kernel.shape
    if block is None:
        # aim the folded contraction (K_b * block * Cin) at the 128-lane dim
        block = max(stride, (64 // max(Cin, 1)) // stride * stride)
    phases = block // stride
    T_out = (Lp - K) // stride + 1
    U = -(-T_out // phases)  # ceil: U rows of `phases` outputs
    K_b = (K - 1 + block - stride) // block + 1
    need = (U - 1 + K_b) * block  # last input sample touched + 1
    if need > Lp:
        x = jnp.pad(x, ((0, 0), (0, need - Lp), (0, 0)))
    elif Lp % block:
        x = jnp.pad(x, ((0, 0), (0, block - Lp % block), (0, 0)))
    xb = x.reshape(B, -1, block * Cin)
    wp = _s2d_strided_kernel(kernel, stride, block).astype(kernel.dtype)
    dn = lax.conv_dimension_numbers(
        (B, U - 1 + K_b, block * Cin), wp.shape, ("NWC", "WIO", "NWC"))
    yb = lax.conv_general_dilated(
        xb[:, : U - 1 + K_b, :], wp, window_strides=(1,), padding="VALID",
        dimension_numbers=dn, precision=precision)
    y = yb.reshape(B, U * phases, Cout)
    return y[:, :T_out, :]


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


def _blocked_transpose_kernel(kernel: jax.Array, stride: int, oblock: int,
                              padding: int, d_min: int, K_b: int) -> jax.Array:
    """Rearrange a (K, Cin, Cout) transposed-conv kernel into the output-blocked form
    W' (K_b, ib*Cin, oblock*Cout): with t = oblock*v + s_o and n = ib*(v+d)+p, the tap
    index is k = s_o + padding - oblock*d - stride*p (d = d_min + j); invalid k -> 0.
    Output channel order is s_o-major so (B, U, oblock*Cout) -> (B, U*oblock, Cout) is a
    row-major-compatible reshape (phases land in consecutive time steps)."""
    import numpy as np

    K, Cin, Cout = kernel.shape
    ib = oblock // stride
    j = np.arange(K_b)[:, None, None]
    p = np.arange(ib)[None, :, None]
    s_o = np.arange(oblock)[None, None, :]
    kidx = s_o + padding - oblock * (d_min + j) - stride * p  # (K_b, ib, oblock)
    valid = (kidx >= 0) & (kidx < K)
    kc = jnp.asarray(np.clip(kidx, 0, K - 1).reshape(-1))
    wp = jnp.take(kernel, kc, axis=0).reshape(K_b, ib, oblock, Cin, Cout)
    wp = jnp.where(jnp.asarray(valid)[..., None, None], wp, 0)
    # (K_b, ib, Cin, oblock, Cout) -> (K_b, ib*Cin, oblock*Cout)
    return wp.transpose(0, 1, 3, 2, 4).reshape(K_b, ib * Cin, oblock * Cout)


def conv_transpose1d_blocked(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 4,
    padding: int = 0,
    oblock: Optional[int] = None,
    precision=DEFAULT_PRECISION,
) -> jax.Array:
    """conv_transpose1d computed as ONE dense stride-1 conv over time blocks.

    The `stride` output phases are concatenated along the channel dim (s_o-major), so
    the interleave back to time order is a row-major-compatible reshape — no
    stack/transpose relayout (that relayout is what made the earlier per-phase
    'phased' lowering lose, BENCH.md r2). With oblock == stride this is the classic
    polyphase decomposition (dense MXU work, ~K_b*ib/ (K/stride) FLOP overhead);
    larger oblock packs more output samples per matmul row — the win for tiny-Cout
    edge layers (e.g. the G dec output layer Cout=1) where lanes would sit idle.
    Exact same math as conv_transpose1d (torch semantics, untrimmed length)."""
    K, Cin, Cout = kernel.shape
    B, L, _ = x.shape
    if oblock is None:
        oblock = stride * 4 if Cout <= 2 else stride
    if oblock % stride:
        raise ValueError(f"oblock {oblock} must be a multiple of stride {stride}")
    ib = oblock // stride
    T_out = (L - 1) * stride + K - 2 * padding
    U = -(-T_out // oblock)
    d_max = (oblock - 1 + padding) // oblock
    d_min = -(-(padding - stride * (ib - 1) - K + 1) // oblock)
    K_b = d_max - d_min + 1
    # pad x to a whole number of ib-blocks, plus the block halo on each side
    pad_r_samples = (-L) % ib
    xb = jnp.pad(x, ((0, 0), (0, pad_r_samples), (0, 0))) if pad_r_samples else x
    n_blocks = (L + pad_r_samples) // ib
    pad_l = -d_min
    pad_r = (U - 1 + d_max) - (n_blocks - 1)
    xb = xb.reshape(B, n_blocks, ib * Cin)
    xb = jnp.pad(xb, ((0, 0), (max(pad_l, 0), max(pad_r, 0)), (0, 0)))
    if pad_l < 0:
        xb = xb[:, -pad_l:, :]
    if pad_r < 0:
        # heavy padding can make the valid output window END before the last input
        # block (U - 1 + d_max < n_blocks - 1): trim the surplus trailing blocks,
        # mirroring the pad_l < 0 case
        xb = xb[:, :pad_r, :]
    wp = _blocked_transpose_kernel(kernel, stride, oblock, padding, d_min, K_b)
    dn = lax.conv_dimension_numbers(xb.shape, wp.shape, ("NWC", "WIO", "NWC"))
    yb = lax.conv_general_dilated(
        xb, wp.astype(x.dtype), window_strides=(1,), padding="VALID",
        dimension_numbers=dn, precision=precision,
    )  # (B, U, oblock*Cout)
    y = yb.reshape(B, U * oblock, Cout)[:, :T_out, :]
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
    impl: Optional[str] = None,
) -> jax.Array:
    """Dispatch between the two mathematically-identical transposed-conv lowerings.

    'dilated' (default): single lhs-dilated conv — XLA's TPU lowering handles the
    zero-stuffing efficiently, and this measured FASTER in the full train step
    (2410 vs 1627 slices/s/chip, BENCH.md r2) than 'phased'
    (SEGAN_TPU_DECONV=phased): polyphase decomposition into `stride` dense VALID
    convs + interleave, whose stack/reshape relayouts dominate on TPU.

    `impl` is the caller-chosen default (cfg.deconv_impl, e.g. AEWSEGAN's
    'edge-blocked' — BENCH.md r4 matrix); the SEGAN_TPU_DECONV env var wins
    when set so experiments can still override any engine.
    """
    from . import knobs

    impl = knobs.resolve("deconv_impl", override=impl) or "dilated"
    mode = knobs.resolve("conv_grad")
    # the custom backward pairs with the DILATED forward lowering; under
    # 'edge-blocked' only the tiny-Cout (<=2) output layer takes the blocked
    # path, so layers falling through to dilated still get the custom grads
    takes_dilated = impl == "dilated" or (
        impl == "edge-blocked" and kernel.shape[2] > 2)
    if (stride > 1 and takes_dilated
            and (mode == "custom"
                 or (mode == "auto"
                     and _custom_grad_wins(kernel.shape[1], kernel.shape[2],
                                           stride)))):
        # same forward lowering, custom backward (blocked dx + phase-dot dw)
        y = _deconv1d_cg(x, kernel, stride, padding, precision)
        return y if bias is None else y + bias.astype(y.dtype)
    if impl == "blocked" and stride > 1:
        return conv_transpose1d_blocked(x, kernel, bias, stride=stride,
                                        padding=padding, precision=precision)
    if impl == "edge-blocked" and stride > 1 and kernel.shape[2] <= 2:
        # blocked lowering only for the tiny-Cout output layer; dilated elsewhere
        return conv_transpose1d_blocked(x, kernel, bias, stride=stride,
                                        padding=padding, precision=precision)
    if impl in ("dilated", "blocked", "edge-blocked") or stride == 1:
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


# ---------------------------------------------------------------------------
# custom-gradient lowerings for the strided conv / deconv backward passes
# ---------------------------------------------------------------------------
# Profiling the fused train step (BENCH.md r2) shows the transpose (backward) conv
# kernels running at roughly HALF the MXU efficiency of the forwards — XLA lowers
# grad-of-filter as a conv whose window length equals the (large) output time axis,
# which tiles poorly. The lowerings below replace the two backward operands of every
# stride>1 conv/deconv:
#   * grad wrt input  — the exact adjoint IS a transposed conv; we use the
#     output-blocked (polyphase) form above, which is dense stride-1 MXU work.
#   * grad wrt filter — phase-decomposed into ceil(K/stride) dense dot_generals
#     contracting over (batch, time): grad_w[s*q+r] = sum_{b,t} x_phase_r[b,t+q]*ct[b,t].
# Enabled with SEGAN_TPU_CONV_GRAD=custom (read at trace time).


def _custom_grad_wins(cin: int, cout: int, stride: int) -> bool:
    """Shape heuristic for SEGAN_TPU_CONV_GRAD=auto, from the v5e microbench
    (tools/grad_conv_bench.py, BENCH.md r2): the custom backward wins decisively for
    single-channel inputs (XLA's standalone grad lowering degenerates: 9231 -> 6 ms on
    the G input conv) and modestly for deep fat-channel layers where the phase-dot
    tiles well; XLA wins the mid channel range."""
    return cin == 1 or cin * stride >= 2048


def _grad_filter_dot(xp: jax.Array, ct: jax.Array, stride: int, K: int,
                     precision=DEFAULT_PRECISION) -> jax.Array:
    """Gradient of a VALID stride-`stride` conv wrt its (K, Ci, Co) filter.

    xp: (B, Tin, Ci) forward input (already padded), ct: (B, Tout, Co) cotangent,
    with Tin >= stride*(Tout-1) + K. Returns (K, Ci, Co).

    grad_w[k, ci, co] = sum_{b,t} xp[b, stride*t + k, ci] * ct[b, t, co].
    With k = stride*q + r this is, per tap-offset q, one dot_general contracting
    (b, t) between the phase-split input and ct — Q = ceil(K/stride) dense matmuls
    of shape (stride*Ci, B*Tout) x (B*Tout, Co) instead of one degenerate conv.
    """
    B, Tin, Ci = xp.shape
    _, Tout, Co = ct.shape
    s = stride
    Q = -(-K // s)
    need = s * (Tout - 1 + Q)  # phase u index goes up to Tout-1 + Q-1
    if Tin < need:
        xp = jnp.pad(xp, ((0, 0), (0, need - Tin), (0, 0)))
    elif Tin > need:
        xp = xp[:, :need, :]
    xs = xp.reshape(B, Tout - 1 + Q, s, Ci)  # [b, u, r, ci] = xp[b, s*u + r, ci]
    dn = (((0, 1), (0, 1)), ((), ()))  # contract (b, u-window) on both sides
    taps = []
    for q in range(Q):
        g = lax.dot_general(xs[:, q:q + Tout], ct, dn,
                            precision=precision)  # (s, Ci, Co)
        taps.append(g)
    gw = jnp.concatenate(taps, axis=0)[:K]  # (s*Q >= K taps, Ci, Co)
    return gw


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv1d_cg(x, kernel, stride, precision):
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NWC", "WIO", "NWC"))
    return lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding="VALID",
        dimension_numbers=dn, precision=precision)


def _conv1d_cg_fwd(x, kernel, stride, precision):
    return _conv1d_cg(x, kernel, stride, precision), (x, kernel)


def _conv1d_cg_bwd(stride, precision, res, ct):
    x, kernel = res
    K = kernel.shape[0]
    # dx: exact adjoint = transposed conv of ct with the (K, Co, Ci)-swapped kernel
    dx = conv_transpose1d_blocked(ct, jnp.swapaxes(kernel, 1, 2), stride=stride,
                                  padding=0, precision=precision)
    # the adjoint produces stride*(Tout-1)+K samples; trailing input samples the
    # VALID window never reached get zero gradient
    T = x.shape[1]
    dx = dx[:, :T, :]
    if dx.shape[1] < T:
        dx = jnp.pad(dx, ((0, 0), (0, T - dx.shape[1]), (0, 0)))
    dw = _grad_filter_dot(x, ct, stride, K, precision=precision)
    return dx.astype(x.dtype), dw.astype(kernel.dtype)


_conv1d_cg.defvjp(_conv1d_cg_fwd, _conv1d_cg_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _deconv1d_cg(x, kernel, stride, padding, precision):
    return conv_transpose1d(x, kernel, None, stride=stride, padding=padding,
                            precision=precision)


def _deconv1d_cg_fwd(x, kernel, stride, padding, precision):
    return _deconv1d_cg(x, kernel, stride, padding, precision), (x, kernel)


def _deconv1d_cg_bwd(stride, padding, precision, res, ct):
    x, kernel = res
    K = kernel.shape[0]
    # y[b, s*t + k - p, co] += x[b, t, ci] * w[k, ci, co]  =>
    # dx[b, t, ci] = sum_{k, co} ct_p[b, s*t + k, co] * w[k, ci, co]  (ct_p: ct
    # zero-padded by `padding` on both sides) — a VALID stride-s conv of ct_p with
    # the (K, Co, Ci)-swapped kernel; dw has the same phase-dot structure as the
    # strided-conv filter grad with the operand roles swapped.
    ct_p = zero_pad_1d(ct, padding, padding)
    dn = lax.conv_dimension_numbers(ct_p.shape, (K,) + kernel.shape[2:0:-1],
                                    ("NWC", "WIO", "NWC"))
    dx = lax.conv_general_dilated(
        ct_p, jnp.swapaxes(kernel, 1, 2), window_strides=(stride,),
        padding="VALID", dimension_numbers=dn, precision=precision)
    dw = _grad_filter_dot(ct_p, x, stride, K, precision=precision)  # (K, Co, Ci)
    return dx.astype(x.dtype), jnp.swapaxes(dw, 1, 2).astype(kernel.dtype)


_deconv1d_cg.defvjp(_deconv1d_cg_fwd, _deconv1d_cg_bwd)
