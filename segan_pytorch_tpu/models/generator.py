"""SEGAN+ Generator (layer L2): skip-connected strided conv1d encoder → z-concat at the
bottleneck → transposed-conv decoder with Tanh output.

Reference: segan/models/generator.py:80-230 (Generator), :18-78 (GSkip).
Layout here is channels-last (B, T, C); z is concatenated channel-first in the feature dim
([z, h], ref generator.py:205).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .modules import GConv1DBlock, GDeconv1DBlock, Conv1d
from ..ops import conv as conv_ops
from ..ops import initializers as init


class GSkip(nn.Module):
    """Per-skip learnable shuttle (ref generator.py:18-78).

    skip_type: 'alpha' (learnable per-channel scale), 'constant' (frozen scale),
    'conv' (k-wide conv, zero padding — torch nn.Conv1d default).
    merge_mode: 'sum' | 'concat' (concat order is [hi, sk_h], ref generator.py:76).
    """

    skip_type: str
    size: int
    skip_init: str = "one"
    skip_dropout: float = 0.0
    merge_mode: str = "sum"
    kwidth: int = 11
    use_bias: bool = True

    @nn.compact
    def __call__(self, hj, hi, train: bool = False):
        if self.skip_type in ("alpha", "constant"):
            if self.skip_init == "zero":
                alpha_init = init.zeros
            elif self.skip_init == "randn":
                alpha_init = jax.nn.initializers.normal(1.0)
            elif self.skip_init == "one":
                alpha_init = init.ones
            else:
                raise TypeError(f"Unrecognized alpha init scheme: {self.skip_init}")
            skip_k = self.param("skip_k", alpha_init, (self.size,))
            if self.skip_type == "constant":
                # frozen: zero the gradient (ref generator.py:41-42 requires_grad=False)
                skip_k = jax.lax.stop_gradient(skip_k)
            sk_h = skip_k.astype(hj.dtype) * hj  # broadcast over (B, T, C)
        elif self.skip_type == "conv":
            pad = self.kwidth // 2 if self.kwidth > 1 else 0
            hj_p = conv_ops.zero_pad_1d(hj, pad, pad)  # torch Conv1d zero padding
            sk_h = Conv1d(
                self.size,
                self.size,
                self.kwidth,
                use_bias=self.use_bias,
                w_init=init.normal_002,
                name="skip_k",
            )(hj_p, train=train)
        else:
            raise TypeError(f"Unrecognized GSkip scheme: {self.skip_type}")
        if self.skip_dropout > 0:
            sk_h = nn.Dropout(self.skip_dropout, deterministic=not train)(sk_h)
        if self.merge_mode == "sum":
            return sk_h + hi
        elif self.merge_mode == "concat":
            return jnp.concatenate([hi, sk_h], axis=-1)
        raise TypeError(f"Unrecognized skip merge mode: {self.merge_mode}")


class Generator(nn.Module):
    """ref generator.py:80-230. Construction mirrors the reference exactly:

    - encoder: GConv1DBlock(fmaps[i], pool=poolings[i], kwidth)
    - skip for every enc layer but the last (pi < len(fmaps))
    - bottleneck channels += z_dim unless no_z; z concatenated FIRST
    - decoder: dec_fmaps = fmaps[::-1][1:] + [1]; skip merge (doubling input channels
      under 'concat') on dec layers with pi > 1 and pool > 1; final act Tanh
    """

    ninputs: int
    fmaps: List[int]
    kwidth: Any
    poolings: List[int]
    dec_fmaps: Optional[List[int]] = None
    dec_kwidth: Any = None
    dec_poolings: Optional[List[int]] = None
    z_dim: Optional[int] = None
    no_z: bool = False
    skip: bool = True
    use_bias: bool = False
    skip_init: str = "one"
    skip_dropout: float = 0.0
    skip_type: str = "alpha"
    norm_type: Optional[str] = None
    skip_merge: str = "sum"
    skip_kwidth: int = 11
    use_pallas: bool = False
    # decoder transposed-conv lowering (cfg.deconv_impl; None = 'dilated').
    # AEWSEGAN defaults to 'edge-blocked' (BENCH.md r4 matrix, +2.1% at batch
    # 150); all lowerings are mathematically identical
    deconv_impl: Optional[str] = None

    def _plan(self):
        """Derive the static architecture plan (mirrors ref generator.py:103-178)."""
        fmaps = list(self.fmaps)
        poolings = list(self.poolings)
        kwidth = self.kwidth
        if isinstance(kwidth, int):
            kwidth = [kwidth] * len(fmaps)
        enc = []
        ninp = self.ninputs
        skip_layers = set()
        for pi, (fmap, pool, kw) in enumerate(zip(fmaps, poolings, kwidth), start=1):
            if self.skip and pi < len(fmaps):
                skip_layers.add(pi - 1)
            enc.append((ninp, fmap, kw, pool))
            ninp = fmap
        z_dim = self.z_dim
        if not self.no_z and z_dim is None:
            z_dim = fmaps[-1]
        if not self.no_z:
            ninp += z_dim
        dec_fmaps = self.dec_fmaps
        if dec_fmaps is None:
            dec_fmaps = fmaps[::-1][1:] + [1]
        dec_poolings = self.dec_poolings
        if dec_poolings is None:
            dec_poolings = poolings[:]
        dec_kwidth = self.dec_kwidth
        if dec_kwidth is None:
            dec_kwidth = kwidth[:]
        elif isinstance(dec_kwidth, int):
            dec_kwidth = [dec_kwidth] * len(dec_fmaps)
        dec = []
        for pi, (fmap, pool, kw) in enumerate(
            zip(dec_fmaps, dec_poolings, dec_kwidth), start=1
        ):
            if self.skip and pi > 1 and pool > 1 and self.skip_merge == "concat":
                ninp *= 2
            act = "Tanh" if pi >= len(dec_fmaps) else None
            dec.append((ninp, fmap, kw, pool, act))
            ninp = fmap
        return enc, skip_layers, z_dim, dec, dec_poolings

    @property
    def effective_z_dim(self) -> Optional[int]:
        if self.no_z:
            return None
        return self.z_dim if self.z_dim is not None else list(self.fmaps)[-1]

    def sample_z(self, rng: jax.Array, x_shape: Tuple[int, ...]) -> Optional[jax.Array]:
        """z ~ N(0,1) of shape (B, T_bottleneck, z_dim) (ref generator.py:196-199)."""
        if self.no_z:
            return None
        B, T = x_shape[0], x_shape[1]
        t = T
        for p in self.poolings:
            t //= p
        return jax.random.normal(rng, (B, t, self.effective_z_dim), jnp.float32)

    @nn.compact
    def __call__(self, x, z=None, ret_hid: bool = False, train: bool = False):
        enc_plan, skip_layers, z_dim, dec_plan, dec_poolings = self._plan()
        hall: Dict[str, jax.Array] = {}
        hi = x
        skips: Dict[int, jax.Array] = {}
        n_enc = len(enc_plan)
        for l_i, (ninp, fmap, kw, pool) in enumerate(enc_plan):
            hi, linear_hi = GConv1DBlock(
                ninp,
                fmap,
                kw,
                stride=pool,
                use_bias=self.use_bias,
                norm_type=self.norm_type,
                use_pallas=self.use_pallas,
                name=f"enc_blocks_{l_i}",
            )(hi, train=train, ret_linear=True)
            if self.skip and l_i < (n_enc - 1):
                # skips store the PRE-activation tensor (ref generator.py:185,191)
                skips[l_i] = linear_hi
            if ret_hid:
                hall[f"enc_{l_i}"] = hi
        if not self.no_z:
            if z is None:
                z = jax.random.normal(
                    self.make_rng("z"), hi.shape[:2] + (z_dim,), hi.dtype
                )
            if z.ndim != hi.ndim:
                raise ValueError(f"len(z.shape) {z.ndim} != len(hi.shape) {hi.ndim}")
            hi = jnp.concatenate([z.astype(hi.dtype), hi], axis=-1)  # z first (ref :205)
            if ret_hid:
                hall["enc_zc"] = hi
        enc_layer_idx = n_enc - 1
        for l_i, (ninp, fmap, kw, pool, act) in enumerate(dec_plan):
            if self.skip and enc_layer_idx in skip_layers and dec_poolings[l_i] > 1:
                hi = GSkip(
                    self.skip_type,
                    enc_plan[enc_layer_idx][1],
                    skip_init=self.skip_init,
                    skip_dropout=self.skip_dropout,
                    merge_mode=self.skip_merge,
                    kwidth=self.skip_kwidth,
                    use_bias=self.use_bias,
                    name=f"alpha_{enc_layer_idx}",
                )(skips[enc_layer_idx], hi, train=train)
            if pool > 1:
                hi = GDeconv1DBlock(
                    ninp,
                    fmap,
                    kw,
                    stride=pool,
                    norm_type=self.norm_type,
                    use_bias=self.use_bias,
                    act=act,
                    deconv_impl=self.deconv_impl,
                    name=f"dec_blocks_{l_i}",
                )(hi, train=train)
            else:
                hi = GConv1DBlock(
                    ninp,
                    fmap,
                    kw,
                    stride=1,
                    use_bias=self.use_bias,
                    norm_type=self.norm_type,
                    use_pallas=self.use_pallas,
                    name=f"dec_blocks_{l_i}",
                )(hi, train=train)
            enc_layer_idx -= 1
            if ret_hid:
                hall[f"dec_{l_i}"] = hi
        if ret_hid:
            hall["z"] = z
            return hi, hall
        return hi


def build_generator(cfg) -> Generator:
    """Assemble a Generator from a SEGANConfig (mirrors ref model.py:82-96)."""
    return Generator(
        ninputs=1,
        fmaps=cfg.genc_fmaps,
        kwidth=cfg.gkwidth,
        poolings=cfg.genc_poolings,
        dec_fmaps=cfg.gdec_fmaps,
        dec_kwidth=cfg.gdec_kwidth,
        dec_poolings=cfg.gdec_poolings,
        z_dim=cfg.z_dim,
        no_z=cfg.no_z,
        skip=not cfg.no_skip,
        use_bias=cfg.bias,
        skip_init=cfg.skip_init,
        skip_type=cfg.skip_type,
        norm_type=cfg.gnorm_type,
        skip_merge=cfg.skip_merge,
        skip_kwidth=cfg.skip_kwidth,
        use_pallas=getattr(cfg, "use_pallas", False),
        deconv_impl=getattr(cfg, "deconv_impl", None),
        name="G",
    )
