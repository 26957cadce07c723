"""SEGAN Discriminator (layer L2): BatchNorm conv1d stack over the channel-concatenated
(judged_wav, conditioner) pair, with random per-layer phase-shift rolls and five head
variants.  Reference: segan/models/discriminator.py:65-194.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .modules import GConv1DBlock, Conv1d, Linear, PReLU, SincConv
from ..ops import initializers as init
from ..ops.roll import phase_shift_roll


class Discriminator(nn.Module):
    """ref discriminator.py:65-194.

    Input x: (B, T, 2) — channel-concat of the judged wav and the conditioning noisy wav
    (ref model.py:173-175).  Returns (logit, int_act dict).

    The phase shift (ref discriminator.py:160-172, WaveGAN trick) draws, per conv layer,
    a shift in [1, phase_shift] and a direction, then circularly rolls the time axis.
    The roll randomness comes from the 'phase' PRNG stream; it is applied whenever that
    stream is provided (the reference applies it in train and eval alike).
    """

    ninputs: int
    fmaps: List[int]
    kwidth: int
    poolings: List[int]
    pool_type: str = "none"
    pool_slen: Optional[int] = None
    norm_type: Optional[str] = "bnorm"
    use_bias: bool = True
    phase_shift: Optional[int] = None
    sinc_conv: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None, stats_groups: int = 1):
        """stats_groups > 1: x is a stack of G sub-batches judged in ONE pass (the
        fused real/fake D apply).  Each group gets its own BatchNorm statistics and
        its own per-layer phase draw — group g draws from the rng stream 'phase' (g=0)
        / 'phase{g+1}' (g>0) — so the result is bit-identical to G sequential applies
        with those streams (see models/segan.py:d_loss_fn)."""
        if self.pool_slen is None:
            raise ValueError(
                "Please specify D network pool seq len (pool_slen) in the end "
                "of the conv stack: [inp_len // (total_pooling_factor)]"
            )
        if self.phase_shift is not None:
            assert isinstance(self.phase_shift, int)
            assert self.phase_shift > 1, self.phase_shift
        fmaps = list(self.fmaps)
        h = x
        ninp = self.ninputs
        if self.sinc_conv:
            # sinc front-end on each of the two channels (ref discriminator.py:90-95,152-156)
            sc = SincConv(fmaps[0] // 2, 251, 16e3, padding="SAME", name="sinc_conv")
            h_l = sc(h[..., :1])
            h_r = sc(h[..., 1:])
            h = jnp.concatenate([h_l, h_r], axis=-1)
            ninp = fmaps[0]
            fmaps = fmaps[1:]
        int_act: Dict[str, jax.Array] = {}
        use_phase = self.phase_shift is not None and self.has_rng("phase")
        for ii, (fmap, pool) in enumerate(zip(fmaps, self.poolings)):
            if use_phase:
                if stats_groups == 1:
                    key = self.make_rng("phase")
                    k_shift, k_dir = jax.random.split(key)
                    shift = jax.random.randint(k_shift, (), 1, self.phase_shift + 1)
                    right = jax.random.bernoulli(k_dir, 0.5)
                    h = phase_shift_roll(h, shift, right, self.phase_shift)
                else:
                    Bg = h.shape[0] // stats_groups
                    parts = []
                    for g in range(stats_groups):
                        key = self.make_rng("phase" if g == 0 else f"phase{g + 1}")
                        k_shift, k_dir = jax.random.split(key)
                        shift = jax.random.randint(
                            k_shift, (), 1, self.phase_shift + 1)
                        right = jax.random.bernoulli(k_dir, 0.5)
                        parts.append(phase_shift_roll(
                            h[g * Bg:(g + 1) * Bg], shift, right, self.phase_shift))
                    h = jnp.concatenate(parts, axis=0)
            h = GConv1DBlock(
                ninp,
                fmap,
                self.kwidth,
                stride=pool,
                use_bias=self.use_bias,
                norm_type=self.norm_type,
                use_pallas=self.use_pallas,
                name=f"enc_blocks_{ii}",
            )(h, train=train, mask=mask, stats_groups=stats_groups)
            int_act[f"h_{ii}"] = h
            ninp = fmap
        snorm = self.norm_type == "snorm"
        if self.pool_type == "none":
            # flatten -> FC 256 -> PReLU -> 128 -> PReLU -> 1 (ref discriminator.py:109-117)
            hf = h.reshape(h.shape[0], -1)
            in_feats = self.pool_slen * fmaps[-1]
            y = Linear(in_feats, 256, snorm=snorm, name="fc_0")(hf, train=train)
            y = PReLU(256, name="fc_1")(y)
            y = Linear(256, 128, snorm=snorm, name="fc_2")(y, train=train)
            # NB: the reference spectral-norms this PReLU slope too (discriminator.py:121)
            y = PReLU(128, snorm=snorm, name="fc_3")(y, train=train)
            y = Linear(128, 1, name="fc_4")(y)
        elif self.pool_type == "conv":
            hp = Conv1d(fmaps[-1], 1, 1, snorm=snorm,
                        w_init=init.normal_002, name="pool_conv")(h, train=train)
            hp = hp.reshape(hp.shape[0], -1)
            int_act["avg_conv_h"] = hp
            y = Linear(self.pool_slen, 1, snorm=snorm, name="fc")(hp, train=train)
        elif self.pool_type == "gmax":
            hp = jnp.max(h, axis=1)  # AdaptiveMaxPool1d(1) (ref discriminator.py:129)
            y = Linear(fmaps[-1], 1, snorm=snorm, name="fc")(hp, train=train)
        elif self.pool_type == "gavg":
            hp = jnp.mean(h, axis=1)  # AdaptiveAvgPool1d(1) (ref discriminator.py:134)
            y = Linear(fmaps[-1], 1, snorm=snorm, name="fc")(hp, train=train)
        elif self.pool_type == "mlp":
            hp = Conv1d(fmaps[-1], fmaps[-1], 1, snorm=snorm,
                        w_init=init.normal_002, name="mlp_0")(h, train=train)
            hp = PReLU(fmaps[-1], snorm=snorm, name="mlp_1")(hp, train=train)
            y = Conv1d(fmaps[-1], 1, 1, w_init=init.normal_002,
                       name="mlp_2")(hp, train=train)
        else:
            raise TypeError(f"Unrecognized pool type: {self.pool_type}")
        int_act["logit"] = y
        return y, int_act


def build_discriminator(cfg) -> Discriminator:
    """Assemble a Discriminator from a SEGANConfig (mirrors ref model.py:102-110)."""
    dkwidth = cfg.gkwidth if cfg.dkwidth is None else cfg.dkwidth
    return Discriminator(
        ninputs=2,
        fmaps=cfg.denc_fmaps,
        kwidth=dkwidth,
        poolings=cfg.denc_poolings,
        pool_type=cfg.dpool_type,
        pool_slen=cfg.dpool_slen,
        norm_type=cfg.dnorm_type,
        phase_shift=cfg.phase_shift,
        sinc_conv=cfg.sinc_conv,
        use_pallas=getattr(cfg, "use_pallas", False),
        name="D",
    )
