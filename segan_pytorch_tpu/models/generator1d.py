"""Generator1D — the legacy SEGAN-v1 research generator, reconstructed.

The reference defines Generator1D (ref generator.py:232-605) but it is DEAD CODE
there: its layers are built from `GBlock`, which is referenced
(ref generator.py:328,404,417) yet defined nowhere in the repo — instantiating it
raises NameError.  `OutGate` (ref generator.py:446) is likewise missing.  This
module reconstructs the class from its call sites, option semantics, and the
SEGAN v1 paper so the v1 research options have a live TPU-native counterpart:

- enc GBlock:  [optional cheby1 anti-aliasing FIR] -> conv1d(stride=pool,
  same-size pad, pad_type constant|reflect) -> [LayerNorm] -> [dropout] -> act,
  returning (activated, pre-activation) — pre-activations feed skips like the
  v2 Generator (post_skip switches to activated).
- dec GBlock:  transposed conv (exact xpool, GDeconv trim rule) OR
  `linterp` linear-interpolation upsample + conv1d(stride 1); same norm/act tail.
- core options: z concat at the bottleneck (z_dim channels, scaled by z_std) |
  `rnn_core` bidirectional LSTM whose initial hidden state is z | `no_z`;
  `z_all` re-concats a time-doubled z at every decoder stage; `pos_code`
  sinusoidal slice-position code; `freeze_enc` stops gradients into the encoder.
- conditioning: `num_spks` one-hot speaker id concat at every decoder stage.
- outputs: Tanh unless `no_tanh`; `aal_out` fixed cheby1 FIR; `post_proc`
  PostProcessingCombNet (+tanh); `out_gate` sigmoid-gated conv (reconstructed —
  the reference's OutGate class is absent); `big_out_filter` 513-tap conv.
- `convblock` swaps the plain conv for Conv1DResBlock; `skip_blacklist` disables
  individual skips; `mlpconv` raises NotImplementedError exactly like the
  reference does (generator.py:345-346).

Unreconstructable options are rejected loudly rather than guessed: `satt`
(self-attention inside the missing GBlock) raises NotImplementedError.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .modules import (Conv1d, ConvTranspose1d, Conv1DResBlock, LayerNorm,
                      PReLU, PostProcessingCombNet, pos_code)
from .generator import GSkip
from ..ops import conv as conv_ops
from ..ops import initializers as init


def _cheby1_aal_taps(pooling: int, ntaps: int = 65) -> np.ndarray:
    """Impulse response of the reference's anti-aliasing filter:
    cheby1(8, 0.05, 0.8/pooling) (ref generator.py:292-296)."""
    from scipy.signal import cheby1, dimpulse, dlti

    system = dlti(*cheby1(8, 0.05, 0.8 / pooling))
    _, yout = dimpulse(system, n=ntaps)
    return np.asarray(yout[0], np.float32).reshape(-1)


def _apply_act(act: Optional[str], h: jax.Array, mdl: nn.Module, fmaps: int,
               name: str) -> jax.Array:
    if act is None:  # last decoder layer under no_tanh: linear output
        return h
    if act == "PReLU":
        return PReLU(fmaps, name=name)(h)
    if act == "ReLU":
        return jax.nn.relu(h)
    if act == "Tanh":
        return jnp.tanh(h)
    if act == "LeakyReLU":
        return jax.nn.leaky_relu(h)
    if act == "glu":
        raise NotImplementedError("glu GBlock activation is not reconstructed")
    raise TypeError(f"Unsupported Generator1D activation: {act}")


class GBlock1D(nn.Module):
    """Reconstructed v1 GBlock (see module docstring)."""

    ninp: int
    fmaps: int
    kwidth: int
    act: Optional[str] = None
    lnorm: bool = False
    dropout: float = 0.0
    pooling: int = 2
    enc: bool = True
    use_bias: bool = False
    aal: bool = False
    snorm: bool = False
    convblock: bool = False
    linterp: bool = False
    linterp_mode: str = "linear"
    pad_type: str = "constant"

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        h = x
        if self.enc:
            if self.aal:
                taps = _cheby1_aal_taps(self.pooling)
                k = jnp.asarray(taps)[:, None, None] * jnp.eye(self.ninp)[None]
                pad = len(taps) // 2
                hp = jnp.pad(h, ((0, 0), (pad, len(taps) - 1 - pad), (0, 0)))
                h = conv_ops.conv1d(hp, k.astype(h.dtype), stride=1)
            if self.convblock:
                h = Conv1DResBlock(self.ninp, self.fmaps, self.kwidth,
                                   stride=self.pooling, use_bias=self.use_bias,
                                   name="conv")(h, train=train)
            else:
                lpad = self.kwidth // 2
                rpad = self.kwidth - 1 - lpad
                if self.pad_type == "reflect":
                    hp = conv_ops.reflect_pad_1d(h, lpad, rpad)
                else:
                    hp = jnp.pad(h, ((0, 0), (lpad, rpad), (0, 0)))
                h = Conv1d(self.ninp, self.fmaps, self.kwidth,
                           stride=self.pooling, use_bias=self.use_bias,
                           snorm=self.snorm, name="conv")(hp, train=train)
        else:
            if self.linterp and self.pooling > 1:
                # linear-interpolation upsample x pooling, then conv1d stride 1
                B, T, C = h.shape
                tgt = T * self.pooling
                src = (jnp.arange(tgt) + 0.5) / self.pooling - 0.5
                lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, T - 1)
                hi_ = jnp.clip(lo + 1, 0, T - 1)
                w = (src - lo).astype(h.dtype)[None, :, None]
                h = h[:, lo, :] * (1 - w) + h[:, hi_, :] * w
                lpad = self.kwidth // 2
                rpad = self.kwidth - 1 - lpad
                hp = jnp.pad(h, ((0, 0), (lpad, rpad), (0, 0)))
                h = Conv1d(C, self.fmaps, self.kwidth, stride=1,
                           use_bias=self.use_bias, snorm=self.snorm,
                           name="conv")(hp, train=train)
            elif self.pooling > 1:
                pad = max(0, (self.pooling - self.kwidth) // -2)
                h = ConvTranspose1d(self.ninp, self.fmaps, self.kwidth,
                                    stride=self.pooling, padding=pad,
                                    use_bias=True, snorm=self.snorm,
                                    name="deconv")(h, train=train)
                if self.kwidth % 2 != 0:
                    h = h[:, :-1, :]
            else:
                lpad = self.kwidth // 2
                rpad = self.kwidth - 1 - lpad
                hp = jnp.pad(h, ((0, 0), (lpad, rpad), (0, 0)))
                h = Conv1d(self.ninp, self.fmaps, self.kwidth, stride=1,
                           use_bias=self.use_bias, snorm=self.snorm,
                           name="conv")(hp, train=train)
        if self.lnorm:
            h = LayerNorm(name="norm")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        linear = h
        h = _apply_act(self.act, h, self, self.fmaps, "act")
        return h, linear


class Generator1D(nn.Module):
    """Reconstructed legacy v1 generator (ref generator.py:232-605)."""

    ninputs: int
    enc_fmaps: Sequence[int]
    kwidth: int
    activations: Union[str, Sequence[Optional[str]], None] = None
    lnorm: bool = False
    dropout: float = 0.0
    pooling: Union[int, Sequence[int]] = 2
    z_dim: int = 256
    z_all: bool = False
    z_std: float = 1.0
    skip: bool = True
    skip_blacklist: Sequence[int] = ()
    dec_activations: Optional[Sequence[Optional[str]]] = None
    use_bias: bool = False
    aal: bool = False
    aal_out: bool = False
    skip_init: str = "one"
    skip_dropout: float = 0.0
    no_tanh: bool = False
    rnn_core: bool = False
    linterp: bool = False
    linterp_mode: str = "linear"
    mlpconv: bool = False
    dec_kwidth: Optional[int] = None
    no_z: bool = False
    skip_type: str = "alpha"
    num_spks: Optional[int] = None
    skip_merge: str = "sum"
    snorm: bool = False
    convblock: bool = False
    post_skip: bool = False
    use_pos_code: bool = False
    satt: bool = False
    dec_fmaps: Optional[Sequence[int]] = None
    up_poolings: Optional[Sequence[int]] = None
    post_proc: bool = False
    out_gate: bool = False
    big_out_filter: bool = False
    freeze_enc: bool = False
    skip_kwidth: int = 11
    pad_type: str = "constant"

    def _plan(self):
        if self.mlpconv:
            # the reference raises here too (generator.py:345-346)
            raise NotImplementedError("MLPconv is not useful and should be deleted")
        if self.satt:
            raise NotImplementedError(
                "satt relies on the reference's missing GBlock attention — "
                "not reconstructable")
        enc_fmaps = list(self.enc_fmaps)
        pooling = self.pooling
        if not isinstance(pooling, (list, tuple)) or len(list(pooling)) == 1:
            pooling = [pooling if isinstance(pooling, int) else list(pooling)[0]
                       ] * len(enc_fmaps)
        pooling = list(pooling)
        acts = self.activations
        if acts is None or isinstance(acts, str):
            acts = [acts] * len(enc_fmaps)
        acts = ["PReLU" if a is None else a for a in acts]
        dec_fmaps = self.dec_fmaps
        up_poolings = self.up_poolings
        if dec_fmaps is None:
            dec_fmaps = enc_fmaps[:-1][::-1] + [1]
            up_poolings = pooling[::-1]
        else:
            assert up_poolings is not None
        dec_kwidth = self.dec_kwidth or self.kwidth
        dec_acts = list(self.dec_activations) if self.dec_activations is not None \
            else [acts[0]] * len(dec_fmaps)
        return enc_fmaps, pooling, acts, list(dec_fmaps), list(up_poolings), \
            dec_kwidth, dec_acts

    def sample_z(self, rng, bottleneck_shape):
        """z for the bottleneck: (B, T_b, z_dim) (or LSTM h0 under rnn_core)."""
        B, Tb, C = bottleneck_shape
        if self.rnn_core:
            return self.z_std * jax.random.normal(rng, (2, B, C // 2))
        return self.z_std * jax.random.normal(rng, (B, Tb, self.z_dim))

    @nn.compact
    def __call__(self, x, z=None, spkid=None, slice_idx=0, ret_hid: bool = False,
                 train: bool = False):
        enc_fmaps, pooling, acts, dec_fmaps, up_poolings, dec_kwidth, dec_acts = \
            self._plan()
        if self.num_spks is not None and spkid is None:
            raise ValueError("Please specify spk ID to network to build OH "
                             "identifier in decoder")
        hall = {}
        hi = x
        skips = {}
        ninp = self.ninputs
        for l_i, (fmap, pool, act) in enumerate(zip(enc_fmaps, pooling, acts)):
            hi, linear_hi = GBlock1D(
                ninp, fmap, self.kwidth, act=act, lnorm=self.lnorm,
                dropout=self.dropout, pooling=pool, enc=True,
                use_bias=self.use_bias, aal=self.aal, snorm=self.snorm,
                convblock=self.convblock, pad_type=self.pad_type,
                name=f"gen_enc_{l_i}")(hi, train=train)
            if self.skip and l_i < len(enc_fmaps) - 1 \
                    and l_i not in self.skip_blacklist:
                skips[l_i] = hi if self.post_skip else linear_hi
            if ret_hid:
                hall[f"enc_{l_i}"] = hi
            ninp = fmap

        B, Tb, Cb = hi.shape
        z_up = None
        if self.rnn_core:
            if z is None:
                if self.no_z:
                    z = jnp.zeros((2, B, Cb // 2), hi.dtype)
                else:
                    z = self.sample_z(self.make_rng("z"), hi.shape)
            hi = _BiLSTM(Cb // 2, name="rnn_core")(hi, z.astype(hi.dtype))
        else:
            if not self.no_z:
                if z is None:
                    z = self.sample_z(self.make_rng("z"), hi.shape)
                if z.ndim != hi.ndim:
                    raise ValueError(
                        f"len(z.size) {z.ndim} != len(hi.size) {hi.ndim}")
                hi = jnp.concatenate([z.astype(hi.dtype), hi], axis=-1)
                z_up = z
                if ret_hid:
                    hall["enc_zc"] = hi
            if self.use_pos_code:
                hi = pos_code(jnp.broadcast_to(jnp.asarray(slice_idx), (B,)), hi)
        if self.freeze_enc:
            hi = jax.lax.stop_gradient(hi)

        spk_oh = None
        if self.num_spks is not None:
            ids = jnp.asarray(spkid).reshape(B).astype(jnp.int32)
            spk_oh = jax.nn.one_hot(ids, self.num_spks, dtype=hi.dtype)

        enc_layer_idx = len(enc_fmaps) - 1
        ninp = hi.shape[-1]
        for l_i, (fmap, act, pool) in enumerate(zip(dec_fmaps, dec_acts,
                                                    up_poolings)):
            if self.skip and enc_layer_idx in skips and pool > 1:
                hi = GSkip(self.skip_type, enc_fmaps[enc_layer_idx],
                           skip_init=self.skip_init,
                           skip_dropout=self.skip_dropout,
                           merge_mode=self.skip_merge, kwidth=self.skip_kwidth,
                           use_bias=True,
                           name=f"alpha_{enc_layer_idx}")(
                    skips[enc_layer_idx], hi, train=train)
            if l_i > 0 and self.z_all and z_up is not None:
                z_up = jnp.concatenate([z_up, z_up], axis=1)  # double time
                hi = jnp.concatenate([hi, z_up.astype(hi.dtype)], axis=-1)
            if spk_oh is not None:
                oh = jnp.broadcast_to(spk_oh[:, None, :],
                                      (B, hi.shape[1], self.num_spks))
                hi = jnp.concatenate([hi, oh], axis=-1)
            last = l_i >= len(dec_fmaps) - 1
            act_l = (None if self.no_tanh else "Tanh") if last else act
            hi, _ = GBlock1D(
                hi.shape[-1], fmap, dec_kwidth, act=act_l,
                lnorm=self.lnorm and not last,
                dropout=0.0 if last else self.dropout,
                pooling=pool, enc=(pool <= 1), use_bias=self.use_bias,
                snorm=self.snorm, convblock=self.convblock,
                linterp=self.linterp, linterp_mode=self.linterp_mode,
                pad_type=self.pad_type,
                name=f"gen_dec_{l_i}")(hi, train=train)
            enc_layer_idx -= 1
            if ret_hid:
                hall[f"dec_{l_i}"] = hi

        if self.aal_out:
            taps = _cheby1_aal_taps(int(np.max(up_poolings)))
            k = jnp.asarray(np.concatenate([taps, [0.0]]).astype(np.float32))
            k = k[:, None, None]
            pad = len(taps) // 2
            hp = jnp.pad(hi, ((0, 0), (pad, len(k) - 1 - pad), (0, 0)))
            hi = conv_ops.conv1d(hp, k.astype(hi.dtype), stride=1)
        if self.post_proc:
            hi = jnp.tanh(PostProcessingCombNet(1, 512, name="comb_net")(
                hi, train=train))
        if self.out_gate:
            # reconstructed OutGate (the reference's class is absent): x * sigmoid(conv(x))
            g = Conv1d(1, 1, 1, stride=1, use_bias=True, name="out_gate")(
                hi, train=train)
            hi = hi * jax.nn.sigmoid(g)
        if self.big_out_filter:
            hp = jnp.pad(hi, ((0, 0), (256, 256), (0, 0)))
            hi = Conv1d(1, 1, 513, stride=1, use_bias=True, name="out_filter")(
                hp, train=train)
        if ret_hid:
            hall["z"] = z
            return hi, hall
        return hi


class _BiLSTM(nn.Module):
    """Bidirectional LSTM core (ref generator.py:356-361): z is the initial
    hidden state of both directions; output is the concat of directions."""

    hidden: int

    @nn.compact
    def __call__(self, x, h0):
        # x: (B, T, C); h0: (2, B, hidden)
        B = x.shape[0]
        c0 = jnp.zeros((B, self.hidden), x.dtype)
        scan = nn.scan(lambda cell, carry, xt: cell(carry, xt),
                       variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=1, out_axes=1)
        cell = nn.OptimizedLSTMCell(self.hidden, name="cell_fwd")
        cell_b = nn.OptimizedLSTMCell(self.hidden, name="cell_bwd")
        _, fwd = scan(cell, (c0, h0[0]), x)
        _, bwd = scan(cell_b, (c0, h0[1]), jnp.flip(x, axis=1))
        bwd = jnp.flip(bwd, axis=1)
        return jnp.concatenate([fwd, bwd], axis=-1)
