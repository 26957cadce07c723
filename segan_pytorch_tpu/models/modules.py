"""NN building blocks (layer L1) as flax modules, channels-last (B, T, C).

Parameter names intentionally mirror the reference's torch state-dict leaf names
('weight', 'bias', 'running_mean', ...) so that the torch→JAX checkpoint converter is a
mechanical layout transpose (see utils/checkpoint.py).

Reference blocks: GConv1DBlock (modules.py:73-105), GDeconv1DBlock (modules.py:107-141),
build_norm_layer (modules.py:9-18), SincConv (modules.py:227-293), ResBlock1D
(modules.py:20-71), ResARModule (modules.py:143-201), CombFilter/PostProcessingCombNet
(modules.py:295-330), Conv1DResBlock (core.py:228-304), LayerNorm (core.py:209-225),
pos_code (core.py:306-325).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import conv as conv_ops
from ..ops import initializers as init
from ..ops import knobs


# ---------------------------------------------------------------------------
# spectral norm (torch nn.utils.spectral_norm semantics)
# ---------------------------------------------------------------------------
def _l2normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


def declare_spectral(mdl: nn.Module, name: str, out_dim: int, cols: int):
    """Declare the 'spectral' power-iteration state; call from setup() or @compact."""
    u_var = mdl.variable("spectral", f"{name}_u", lambda: None)
    v_var = mdl.variable("spectral", f"{name}_v", lambda: None)
    if mdl.is_initializing() and u_var.value is None:
        key = mdl.make_rng("params")
        ku, kv = jax.random.split(key)
        u_var.value = _l2normalize(jax.random.normal(ku, (out_dim,)))
        v_var.value = _l2normalize(jax.random.normal(kv, (cols,)))
    return u_var, v_var


def spectral_normalize(
    mdl: nn.Module, name: str, w: jax.Array, matrix: jax.Array, train: bool,
    uv=None,
) -> jax.Array:
    """One-power-iteration spectral normalization of param `w`.

    `matrix` is w viewed as (out_dim, cols); sigma is invariant to column permutation so
    our (K, Cin, Cout)->(-1, Cout).T view matches torch's (Cout, Cin*K) view numerically.
    Power-iteration state lives in the 'spectral' collection as {name}_u / {name}_v and is
    only updated when `train` and the collection is mutable (torch: only in training mode).
    """
    out_dim, cols = matrix.shape
    if uv is None:
        u_var, v_var = declare_spectral(mdl, name, out_dim, cols)
    else:
        u_var, v_var = uv
    u, v = u_var.value, v_var.value
    if train and not mdl.is_initializing():
        m = jax.lax.stop_gradient(matrix).astype(jnp.float32)  # iterate in fp32
        v = _l2normalize(m.T @ u)
        u = _l2normalize(m @ v)
        u_var.value = u
        v_var.value = v
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ matrix.astype(jnp.float32) @ v
    return w / sigma.astype(w.dtype)


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------
class PReLU(nn.Module):
    """Per-channel PReLU, broadcasting the slope over the last axis (torch nn.PReLU)."""

    num_parameters: int
    init_val: float = 0.25
    snorm: bool = False  # the reference spectral-norms a PReLU in D's fc head (disc.py:121)

    def setup(self):
        self.weight = self.param(
            "weight", init.constant(self.init_val), (self.num_parameters,)
        )
        if self.snorm:
            self._uv = declare_spectral(self, "weight", self.num_parameters, 1)

    def get_slope(self, train: bool = False):
        a = self.weight
        if self.snorm:
            a = spectral_normalize(self, "weight", a, a[:, None], train, uv=self._uv)
        return a

    def __call__(self, x, train: bool = False):
        a = self.get_slope(train)
        return jnp.maximum(x, 0) + a.astype(x.dtype) * jnp.minimum(x, 0)


class BatchNorm1d(nn.Module):
    """torch nn.BatchNorm1d on (B, T, C): stats over (B, T) per channel.

    Under jit with a batch-sharded global array, the jnp.mean reductions are global —
    XLA inserts the cross-replica all-reduce — giving synchronized ('global') BN for free.
    """

    num_features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None, stats_groups: int = 1):
        """mask: optional (B,) validity weights — padded final-batch rows must not
        contaminate the batch statistics (they carry mask=0 from the loader), so the
        masked batch matches the reference's smaller final batch exactly.

        stats_groups > 1 treats the batch as G stacked sub-batches normalized with
        SEPARATE statistics (used to fuse the D real/fake passes into one apply while
        keeping each pass's BN math identical to two sequential applies); running
        stats are updated sequentially in group order, matching the reference's
        real-then-fake call order."""
        C = self.num_features
        G = stats_groups
        weight = self.param("weight", init.ones, (C,))
        bias = self.param("bias", init.zeros, (C,))
        r_mean = self.variable("batch_stats", "running_mean", lambda: jnp.zeros((C,)))
        r_var = self.variable("batch_stats", "running_var", lambda: jnp.ones((C,)))
        xf = x.astype(jnp.float32)  # stats in fp32 even under bf16 compute
        # one-pass (E[x^2]-E[x]^2) batch stats measured +3.3% step throughput vs the
        # two-pass form on v5e (BENCH.md r2); stats are fp32 so the cancellation risk
        # of the one-pass form is negligible at activation scale. bn_impl='twopass'
        # (cfg field / SEGAN_TPU_BN) reverts for A/B.
        onepass = knobs.resolve("bn_impl") == "onepass"
        if train and G > 1:
            assert x.shape[0] % G == 0, (x.shape, G)
            xg = xf.reshape((G, x.shape[0] // G) + x.shape[1:])
            red = tuple(range(1, xg.ndim - 1))
            if mask is not None:
                w = mask.astype(jnp.float32).reshape(
                    (G, -1) + (1,) * (x.ndim - 1))
                n = jnp.maximum(
                    jnp.sum(w, red) * math.prod(x.shape[1:-1]), 1.0)
                n = n.reshape(G, 1)
                mean = jnp.sum(xg * w, red) / n  # (G, C)
                if onepass:
                    var = jnp.sum((xg * xg) * w, red) / n - mean * mean
                else:
                    bshape0 = (G,) + (1,) * (xg.ndim - 2) + (C,)
                    var = jnp.sum(((xg - mean.reshape(bshape0)) ** 2) * w,
                                  red) / n
            else:
                n = x.shape[0] // G
                for d in red[1:]:
                    n *= xg.shape[d]
                n = jnp.full((G, 1), float(n), jnp.float32)
                mean = jnp.sum(xg, red) / n
                if onepass:
                    var = jnp.sum(xg * xg, red) / n - mean * mean
                else:
                    bshape0 = (G,) + (1,) * (xg.ndim - 2) + (C,)
                    var = jnp.sum((xg - mean.reshape(bshape0)) ** 2, red) / n
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1, 1))
                m = self.momentum
                rm, rv = r_mean.value, r_var.value
                for g in range(G):  # sequential composition, group order
                    rm = (1 - m) * rm + m * mean[g]
                    rv = (1 - m) * rv + m * unbiased[g]
                r_mean.value = rm
                r_var.value = rv
            bshape = (G,) + (1,) * (xg.ndim - 2) + (C,)
            y = (xg - mean.reshape(bshape)) * jax.lax.rsqrt(
                var.reshape(bshape) + self.eps)
            y = y.reshape(x.shape)
            return (y * weight + bias).astype(x.dtype)
        if train:
            red = tuple(range(x.ndim - 1))
            if mask is not None:
                w = mask.astype(jnp.float32).reshape(
                    (-1,) + (1,) * (x.ndim - 1))
                n = jnp.maximum(jnp.sum(w) * math.prod(x.shape[1:-1]), 1.0)
                mean = jnp.sum(xf * w, red) / n
                if onepass:
                    var = jnp.maximum(
                        jnp.sum((xf * xf) * w, red) / n - mean * mean, 0.0)
                else:
                    var = jnp.sum(((xf - mean) ** 2) * w, red) / n
            else:
                n = 1
                for d in red:
                    n *= x.shape[d]
                if onepass:
                    mean = jnp.sum(xf, red) / n
                    var = jnp.maximum(
                        jnp.sum(xf * xf, red) / n - mean * mean, 0.0)
                else:
                    mean = jnp.mean(xf, red)
                    var = jnp.var(xf, red)
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1, 1))
                m = self.momentum
                r_mean.value = (1 - m) * r_mean.value + m * mean
                r_var.value = (1 - m) * r_var.value + m * unbiased
        else:
            mean, var = r_mean.value, r_var.value
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * weight + bias).astype(x.dtype)


class Conv1d(nn.Module):
    """VALID conv1d; padding handled by callers (the reference pads explicitly)."""

    in_ch: int
    out_ch: int
    kwidth: int
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    snorm: bool = False
    w_init: Callable = init.normal_002  # SEGAN weights_init (ref model.py:35-37)
    b_init: Optional[Callable] = None  # None -> zeros (ref model.py:38-40)

    def setup(self):
        self.weight = self.param(
            "weight", self.w_init, (self.kwidth, self.in_ch, self.out_ch))
        if self.use_bias:
            b_init = self.b_init or init.zeros
            self.bias = self.param("bias", b_init, (self.out_ch,))
        if self.snorm:
            self._uv = declare_spectral(self, "weight", self.out_ch,
                                        self.kwidth * self.in_ch)

    def get_params(self, train: bool = False):
        w = self.weight
        if self.snorm:
            mat = w.reshape(-1, self.out_ch).T
            w = spectral_normalize(self, "weight", w, mat, train, uv=self._uv)
        return w, (self.bias if self.use_bias else None)

    def __call__(self, x, train: bool = False):
        w, b = self.get_params(train)
        return conv_ops.conv1d(x, w.astype(x.dtype), b, stride=self.stride,
                               dilation=self.dilation)


class ConvTranspose1d(nn.Module):
    """torch nn.ConvTranspose1d semantics (see ops/conv.py:conv_transpose1d)."""

    in_ch: int
    out_ch: int
    kwidth: int
    stride: int = 4
    padding: int = 0
    use_bias: bool = True
    snorm: bool = False
    # torch default init (the SEGAN weights_init does NOT match ConvTranspose1d,
    # ref model.py:28-43 — see ops/initializers.py)
    w_init: Callable = init.torch_default_convT_weight
    b_init: Optional[Callable] = None
    # lowering default for this layer (cfg.deconv_impl); SEGAN_TPU_DECONV wins
    deconv_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.param("weight", self.w_init, (self.kwidth, self.in_ch, self.out_ch))
        if self.snorm:
            # torch spectral_norm uses dim=1 for ConvTranspose*d: out-dim is Cout,
            # matrix view (Cout, Cin*K) — mirror it exactly so u/v state transfers
            mat = w.transpose(2, 1, 0).reshape(self.out_ch, -1)
            w = spectral_normalize(self, "weight", w, mat, train)
        b = None
        if self.use_bias:
            b_init = self.b_init or init.torch_default_bias(self.out_ch * self.kwidth)
            b = self.param("bias", b_init, (self.out_ch,))
        return conv_ops.conv_transpose1d_auto(
            x, w.astype(x.dtype), b, stride=self.stride, padding=self.padding,
            impl=self.deconv_impl,
        )


class Linear(nn.Module):
    in_features: int
    out_features: int
    use_bias: bool = True
    snorm: bool = False
    w_init: Callable = init.xavier_uniform  # SEGAN weights_init Linear (ref model.py:41-43)
    b_init: Optional[Callable] = None  # None -> torch default uniform

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.param("weight", self.w_init, (self.in_features, self.out_features))
        if self.snorm:
            w = spectral_normalize(self, "weight", w, w.T, train)
        y = jnp.dot(x, w.astype(x.dtype), precision=conv_ops.DEFAULT_PRECISION)
        if self.use_bias:
            b_init = self.b_init or init.torch_default_bias(self.in_features)
            y = y + self.param("bias", b_init, (self.out_features,)).astype(y.dtype)
        return y


class LayerNorm(nn.Module):
    """The reference's hand-rolled LayerNorm (core.py:209-225): for (B, T, C) input,
    normalize over the time axis per (batch, channel) with unbiased std."""

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=1, keepdims=True)
        std = jnp.std(x, axis=1, keepdims=True, ddof=1)
        return (x - mean) / std


def build_norm(norm_type: Optional[str], num_feats: int, name: str):
    """Dispatch like ref modules.py:9-18. snorm is handled inside conv layers."""
    if norm_type == "bnorm":
        return BatchNorm1d(num_feats, name=name)
    if norm_type in (None, "none", "snorm"):
        return None
    raise TypeError(f"Unrecognized norm type: {norm_type}")


# ---------------------------------------------------------------------------
# SEGAN blocks
# ---------------------------------------------------------------------------
class GConv1DBlock(nn.Module):
    """conv1d + optional bnorm/snorm + PReLU(init 0); asymmetric reflect pad when strided
    (ref modules.py:73-105)."""

    ninp: int
    fmaps: int
    kwidth: int
    stride: int = 1
    use_bias: bool = True
    norm_type: Optional[str] = None
    w_init: Callable = init.normal_002
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, ret_linear: bool = False, mask=None,
                 stats_groups: int = 1):
        kw = self.kwidth
        if self.stride > 1:
            P = (kw // 2 - 1, kw // 2)
        else:
            P = (kw // 2, kw // 2)
        x_p = conv_ops.reflect_pad_1d(x, *P)
        conv = Conv1d(
            self.ninp,
            self.fmaps,
            kw,
            stride=self.stride,
            use_bias=self.use_bias,
            snorm=(self.norm_type == "snorm"),
            w_init=self.w_init,
            name="conv",
        )
        act = PReLU(self.fmaps, init_val=0.0, name="act")
        from ..ops.pallas.conv1d import pallas_applicable

        if (self.use_pallas and not train and self.norm_type in (None, "none")
                and pallas_applicable(x_p.shape[1], kw, self.stride)):
            # fused pad→conv→bias→PReLU Pallas kernel (norm-free path only: with
            # bnorm the normalization sits between conv and act, ref modules.py:99-101).
            # Inference/standalone only: inside the fused jitted train step the
            # per-layer kernel is a fusion barrier and measured a net LOSS
            # (1589 vs 2372 slices/s, BENCH.md), while standalone/inference conv
            # stacks win 1.1-1.4x — so --use_pallas is never slower than default.
            from ..ops.pallas import fused_conv1d_prelu

            w, b = conv.get_params(train)
            slope = act.get_slope(train)
            h, a = fused_conv1d_prelu(
                x_p, w.astype(x_p.dtype),
                (b if b is not None else jnp.zeros((self.fmaps,), x_p.dtype)),
                slope, self.stride)
            if ret_linear:
                return h, a
            return h
        a = conv(x_p, train=train)
        norm = build_norm(self.norm_type, self.fmaps, "norm")
        if norm is not None:
            if self.norm_type == "bnorm":
                a = norm(a, train=train, mask=mask, stats_groups=stats_groups)
            else:
                a = norm(a, train=train)
        h = act(a)
        if ret_linear:
            return h, a
        return h


class GDeconv1DBlock(nn.Module):
    """ConvTranspose1d with pad=max(0,(stride-kwidth)//-2), odd-kwidth last-sample trim,
    then norm + PReLU(0)/Tanh (ref modules.py:107-141).

    Note: the reference accepts a ``bias`` argument but never forwards it to
    nn.ConvTranspose1d (ref modules.py:110-119), so reference decoder deconvs ALWAYS
    have bias — even under --no_bias.  We replicate that exactly (use_bias is accepted
    for API symmetry but intentionally ignored) so no_bias torch checkpoints transfer
    without dropping deconv.bias leaves."""

    ninp: int
    fmaps: int
    kwidth: int
    stride: int = 4
    use_bias: bool = True
    norm_type: Optional[str] = None
    act: Optional[str] = None
    w_init: Callable = init.torch_default_convT_weight
    deconv_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = max(0, (self.stride - self.kwidth) // -2)
        h = ConvTranspose1d(
            self.ninp,
            self.fmaps,
            self.kwidth,
            stride=self.stride,
            padding=pad,
            use_bias=True,  # ref bug: bias arg never reaches ConvTranspose1d
            snorm=(self.norm_type == "snorm"),
            w_init=self.w_init,
            deconv_impl=self.deconv_impl,
            name="deconv",
        )(x, train=train)
        if self.kwidth % 2 != 0:
            h = h[:, :-1, :]
        norm = build_norm(self.norm_type, self.fmaps, "norm")
        if norm is not None:
            h = norm(h, train=train)
        if self.act is not None:
            if self.act == "Tanh":
                h = jnp.tanh(h)
            elif self.act == "ReLU":
                h = jax.nn.relu(h)
            else:
                raise TypeError(f"Unsupported deconv act: {self.act}")
        else:
            h = PReLU(self.fmaps, init_val=0.0, name="act")(h)
        return h


class ResBlock1D(nn.Module):
    """Bottleneck residual block (ref modules.py:20-71)."""

    num_inputs: int
    hidden_size: int
    kwidth: int
    dilation: int = 1
    use_bias: bool = True
    norm_type: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def maybe_norm(h, feats, name):
            norm = build_norm(self.norm_type, feats, name)
            return norm(h, train=train) if norm is not None else h

        h = Conv1d(self.num_inputs, self.hidden_size, 1, use_bias=self.use_bias,
                   snorm=(self.norm_type == "snorm"),
                   w_init=init.torch_default_conv_weight,
                   b_init=init.torch_default_bias(self.num_inputs),
                   name="entry_conv")(x, train=train)
        h = maybe_norm(h, self.hidden_size, "entry_norm")
        h = jax.nn.relu(h)
        kw_2 = self.kwidth // 2
        P = kw_2 + kw_2 * (self.dilation - 1)
        h_p = conv_ops.reflect_pad_1d(h, P, P)
        h = Conv1d(self.hidden_size, self.hidden_size, self.kwidth,
                   dilation=self.dilation, use_bias=self.use_bias,
                   snorm=(self.norm_type == "snorm"),
                   w_init=init.torch_default_conv_weight,
                   b_init=init.torch_default_bias(self.hidden_size * self.kwidth),
                   name="mid_conv")(h_p, train=train)
        h = maybe_norm(h, self.hidden_size, "mid_norm")
        h = jax.nn.relu(h)
        h = Conv1d(self.hidden_size, self.num_inputs, 1, use_bias=self.use_bias,
                   snorm=(self.norm_type == "snorm"),
                   w_init=init.torch_default_conv_weight,
                   b_init=init.torch_default_bias(self.hidden_size),
                   name="exit_conv")(h, train=train)
        h = maybe_norm(h, self.num_inputs, "exit_norm")
        skip_alpha = self.param("skip_alpha", init.zeros, (1,))
        return jax.nn.relu(skip_alpha * x + h)


class ResARModule(nn.Module):
    """Causal dilated AR residual module (ref modules.py:143-201)."""

    ninp: int
    fmaps: int
    res_fmaps: int
    kwidth: int
    dilation: int
    use_bias: bool = True
    norm_type: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw__1 = self.kwidth - 1
        P = kw__1 + kw__1 * (self.dilation - 1)
        x_p = conv_ops.zero_pad_1d(x, P, 0)  # causal pad (ref modules.py:184)
        h = Conv1d(self.ninp, self.fmaps, self.kwidth, dilation=self.dilation,
                   use_bias=self.use_bias, snorm=(self.norm_type == "snorm"),
                   w_init=init.torch_default_conv_weight,
                   b_init=init.torch_default_bias(self.ninp * self.kwidth),
                   name="dil_conv")(x_p, train=train)
        norm = build_norm(self.norm_type, self.fmaps, "dil_norm")
        if norm is not None:
            h = norm(h, train=train)
        h = PReLU(self.fmaps, init_val=0.0, name="act")(h)
        a = h
        sk = Conv1d(self.fmaps, self.ninp, 1, use_bias=self.use_bias,
                    snorm=(self.norm_type == "snorm"),
                    w_init=init.torch_default_conv_weight,
                    b_init=init.torch_default_bias(self.fmaps),
                    name="conv_1x1_skip")(h, train=train)
        norm = build_norm(self.norm_type, self.ninp, "conv_1x1_skip_norm")
        if norm is not None:
            sk = norm(sk, train=train)
        y = x + sk
        res = Conv1d(self.fmaps, self.res_fmaps, 1, use_bias=self.use_bias,
                     snorm=(self.norm_type == "snorm"),
                     w_init=init.torch_default_conv_weight,
                     b_init=init.torch_default_bias(self.fmaps),
                     name="conv_1x1_res")(a, train=train)
        norm = build_norm(self.norm_type, self.res_fmaps, "conv_1x1_res_norm")
        if norm is not None:
            res = norm(res, train=train)
        return y, res


class SincConv(nn.Module):
    """SincNet mel-initialized parametric band-pass filterbank (ref modules.py:227-293),
    with the filter construction fully vectorized (the reference loops in Python per filter
    on every forward, modules.py:274-286 — a TPU anti-pattern we replace with broadcasting).
    """

    N_filt: int
    Filt_dim: int
    fs: float
    padding: str = "VALID"

    def _mel_init(self):
        import numpy as np

        low_freq_mel = 80
        high_freq_mel = 2595 * np.log10(1 + (self.fs / 2) / 700)
        mel_points = np.linspace(low_freq_mel, high_freq_mel, self.N_filt)
        f_cos = 700 * (10 ** (mel_points / 2595) - 1)
        b1 = np.roll(f_cos, 1)
        b2 = np.roll(f_cos, -1)
        b1[0] = 30
        b2[-1] = (self.fs / 2) - 100
        return b1 / self.fs, (b2 - b1) / self.fs

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1_init, band_init = self._mel_init()
        filt_b1 = self.param("filt_b1", lambda k: jnp.asarray(b1_init, jnp.float32))
        filt_band = self.param("filt_band", lambda k: jnp.asarray(band_init, jnp.float32))
        N = self.Filt_dim
        fs = self.fs
        t_right = jnp.linspace(1, (N - 1) / 2, int((N - 1) / 2)) / fs  # (K2,)
        min_freq, min_band = 50.0, 50.0
        beg = jnp.abs(filt_b1) + min_freq / fs  # (F,)
        end = beg + (jnp.abs(filt_band) + min_band / fs)

        def low_pass(f):  # f (F,) normalized
            band = (f * fs)[:, None]  # (F,1)
            arg = 2 * math.pi * band * t_right[None, :]
            y_right = jnp.sin(arg) / arg  # (F, K2)
            y_left = jnp.flip(y_right, axis=1)
            ones = jnp.ones((f.shape[0], 1))
            y = jnp.concatenate([y_left, ones, y_right], axis=1)  # (F, K)
            return 2 * f[:, None] * y

        band_pass = low_pass(end) - low_pass(beg)
        band_pass = band_pass / jnp.max(band_pass, axis=1, keepdims=True)
        n = jnp.linspace(0, N, N)
        window = 0.54 - 0.46 * jnp.cos(2 * math.pi * n / N)  # (ref modules.py:269-271)
        filters = band_pass * window[None, :]  # (F, K)
        kernel = filters.T[:, None, :]  # (K, 1, F)
        if self.padding == "SAME":
            x = conv_ops.reflect_pad_1d(x, N // 2, N // 2)
        return conv_ops.conv1d(x, kernel)


class CombFilter(nn.Module):
    """2-tap dilated comb filter with causal pad (ref modules.py:295-308)."""

    ninputs: int
    fmaps: int
    L: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        def comb_init(key, shape, dtype=jnp.float32):
            # ref modules.py:301-303: weight (fmaps, ninputs, 2), [:,:,1]=1, [:,:,0]~U(0,1)
            k, cin, cout = shape
            r = jax.random.uniform(key, (1, cin, cout), dtype)
            return jnp.concatenate([r, jnp.ones((1, cin, cout), dtype)], axis=0)

        x_p = conv_ops.zero_pad_1d(x, self.L, 0)
        return Conv1d(self.ninputs, self.fmaps, 2, dilation=self.L, use_bias=False,
                      w_init=comb_init, name="filt")(x_p)


class PostProcessingCombNet(nn.Module):
    """Parallel comb filters + linear mix (ref modules.py:310-330)."""

    ninputs: int
    fmaps: int
    L: Sequence[int] = (4, 8, 16, 32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        hs = []
        for i, l in enumerate(self.L):
            hs.append(CombFilter(self.ninputs, self.fmaps // len(self.L), l,
                                 name=f"filts_{i}")(x))
        hs = jnp.concatenate(hs, axis=-1)  # (B, T, fmaps)
        return Linear(self.fmaps, 1, use_bias=False,
                      w_init=init.torch_default_conv_weight, name="W")(hs)


class Conv1DResBlock(nn.Module):
    """Dilated conv residual block (ref core.py:228-304)."""

    ninputs: int
    fmaps: int
    kwidth: int = 3
    dilations: Sequence[int] = (1, 2, 4, 8)
    stride: int = 4
    use_bias: bool = True
    transpose: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.dilations[0] == 1 and len(self.dilations) > 1
        h = x
        res_act = None
        prev_in = self.ninputs
        for n, d in enumerate(self.dilations):
            curr_stride = self.stride if n == 0 else 1
            if n == 0 or (n + 1) >= len(self.dilations):
                curr_fmaps = self.fmaps
            else:
                curr_fmaps = max(self.fmaps // 4, 1)
            if self.stride > 1 and n == 0:
                pad_tuple = ((self.kwidth // 2) - 1, self.kwidth // 2)
            else:
                p_ = ((self.kwidth - 1) * self.dilations[n]) // 2
                pad_tuple = (p_, p_)
            if n == 0 and self.transpose:
                p_ = (self.kwidth - 4) // 2
                op_ = 0
                if p_ < 0:
                    op_ = -p_
                    p_ = 0
                # torch output_padding extends the output on the right
                h = ConvTranspose1d(prev_in, curr_fmaps, self.kwidth,
                                    stride=curr_stride, padding=p_,
                                    use_bias=self.use_bias,
                                    w_init=init.normal_002,
                                    name=f"convs_{n}")(h, train=train)
                if op_ > 0:
                    h = conv_ops.zero_pad_1d(h, 0, op_)
            else:
                h = conv_ops.zero_pad_1d(h, *pad_tuple)
                h = Conv1d(prev_in, curr_fmaps, self.kwidth, stride=curr_stride,
                           dilation=d, use_bias=self.use_bias,
                           w_init=init.normal_002, name=f"convs_{n}")(h, train=train)
            h = PReLU(curr_fmaps, name=f"acts_{n}")(h)
            if n == 0:
                res_act = h
            prev_in = curr_fmaps
        return h + res_act


def pos_code(chunk_pos: jax.Array, x: jax.Array) -> jax.Array:
    """Sinusoidal positional code per slice index (ref core.py:306-325), vectorized.

    x: (B, T, C); chunk_pos: (B,) integer slice indices.
    """
    B, T, C = x.shape
    position = chunk_pos[:, None] * T + jnp.arange(T)[None, :]  # (B, T)
    div_term = jnp.exp(jnp.arange(0, C, 2) * (-math.log(10000.0) / C))  # (C/2,)
    ang = position[:, :, None] * div_term[None, None, :]  # (B, T, C/2)
    pe = jnp.zeros((B, T, C), x.dtype)
    pe = pe.at[:, :, 0::2].set(jnp.sin(ang))
    pe = pe.at[:, :, 1::2].set(jnp.cos(ang))
    return x + pe
