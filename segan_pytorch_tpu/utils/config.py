"""Typed configuration for the SEGAN-TPU framework.

The reference drives everything from a flat argparse namespace dumped as JSON ``train.opts``
(ref: train.py:102-246, train.py:253-255) which is rehydrated at inference time through a
trivial attribute shim (ref: clean.py:22-36).  We keep that exact JSON schema for
interoperability — released ``train.opts`` files (e.g. ckpt_segan+/train.opts) must load —
but expose it as a typed dataclass with defaults identical to the reference argparse.

Legacy-key tolerance (ref SURVEY §2.5): shipped configs may carry a boolean ``l1_loss``
instead of the newer ``reg_loss`` string (ckpt_segan+/train.opts:41); we accept both.
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, List, Optional


def _default_fmaps() -> List[int]:
    return [64, 128, 256, 512, 1024]


def _default_poolings() -> List[int]:
    return [4, 4, 4, 4, 4]


@dataclass
class SEGANConfig:
    """All training/inference options. Field names & defaults mirror ref train.py:102-246."""

    # paths / io
    save_path: str = "seganv1_ckpt"
    d_pretrained_ckpt: Optional[str] = None
    g_pretrained_ckpt: Optional[str] = None
    cache_dir: str = "data_cache"
    clean_trainset: str = "data/clean_trainset"
    noisy_trainset: str = "data/noisy_trainset"
    clean_valset: Optional[str] = None
    noisy_valset: Optional[str] = None
    h5_data_root: Optional[str] = None
    h5: bool = False

    # data
    data_stride: float = 0.5
    seed: int = 111
    epoch: int = 100
    patience: int = 100
    batch_size: int = 100
    save_freq: int = 50
    slice_size: int = 16384

    # optimization
    opt: str = "rmsprop"
    l1_dec_epoch: int = 100
    l1_weight: float = 100.0
    l1_dec_step: float = 1e-5
    g_lr: float = 5e-5
    d_lr: float = 5e-5
    preemph: float = 0.95
    max_samples: Optional[int] = None
    eval_workers: int = 2
    slice_workers: int = 1
    num_workers: int = 1
    no_cuda: bool = False  # kept for config-file compat; meaningless on TPU
    random_scale: List[float] = field(default_factory=lambda: [1])
    no_train_gen: bool = False
    preemph_norm: bool = False

    # model family
    wsegan: bool = False
    aewsegan: bool = False
    vanilla_gan: bool = False
    no_bias: bool = False
    n_fft: int = 2048
    reg_loss: str = "l1_loss"  # 'l1_loss' | 'mse_loss'

    # G skip connections
    skip_merge: str = "concat"
    skip_type: str = "alpha"  # alpha | conv | constant
    skip_init: str = "one"  # one | zero | randn
    skip_kwidth: int = 11

    # G architecture
    gkwidth: int = 31
    genc_fmaps: List[int] = field(default_factory=_default_fmaps)
    genc_poolings: List[int] = field(default_factory=_default_poolings)
    z_dim: int = 1024
    gdec_fmaps: Optional[List[int]] = None
    gdec_poolings: Optional[List[int]] = None
    gdec_kwidth: Optional[int] = None
    gnorm_type: Optional[str] = None
    no_z: bool = False
    no_skip: bool = False
    pow_weight: float = 0.001
    misalign_pair: bool = False
    interf_pair: bool = False

    # D architecture
    denc_fmaps: List[int] = field(default_factory=_default_fmaps)
    dpool_type: str = "none"  # none | conv | gmax | gavg | mlp
    dpool_slen: int = 16
    dkwidth: Optional[int] = None
    denc_poolings: List[int] = field(default_factory=_default_poolings)
    dnorm_type: Optional[str] = "bnorm"
    phase_shift: Optional[int] = 5
    sinc_conv: bool = False

    # derived (ref train.py:248); None = derive from no_bias in __post_init__
    bias: Optional[bool] = None

    # --- TPU-native extensions (not in the reference argparse) ---
    # number of data-parallel shards; 0/1 = single chip, >1 = shard batch over a mesh
    dp: int = 1
    # tensor-parallel degree: >1 builds a (data, model) mesh and Megatron-shards the
    # D head FC over 'model' (parallel/sharding.py:shard_params); 0/1 = off
    mp: int = 1
    # compute dtype for network matmuls/convs ('float32' or 'bfloat16'); params stay fp32
    compute_dtype: str = "float32"
    # BatchNorm statistics scope under data parallelism: 'global' (cross-replica, the
    # natural pjit semantics) or reserved 'local' for shard_map per-replica stats
    bn_stats: str = "global"
    # legacy boolean from old config files (ckpt_segan+/train.opts:41); recorded only
    legacy_l1_loss: Optional[bool] = None
    # transposed-conv lowering for the generator decoder (ops/conv.py
    # conv_transpose1d_auto): None = engine default ('dilated' for SEGAN/WSEGAN;
    # 'edge-blocked' for AEWSEGAN, measured +2.1% at canonical batch 150 —
    # BENCH.md r4 matrix: 4962-4988 vs 4846-4896 slices/s; the G-only step makes
    # the Cout=1 output deconv a larger fraction). All lowerings are
    # mathematically identical (step-equality tested); SEGAN_TPU_DECONV
    # env var overrides for experiments
    deconv_impl: Optional[str] = None
    # --- trace-time lowering knobs (ops/knobs.py) ---
    # Each selects where the FLOPs run, never what they compute (step-equality
    # tested). None = built-in default; the SEGAN_TPU_* env var overrides for
    # one-off experiments; train.py records the RESOLVED values in the dumped
    # train.opts so reloading that file reproduces the exact lowering set.
    conv_grad: Optional[str] = None       # 'xla' | 'custom' | 'auto'
    edge_conv: Optional[str] = None       # 'off' | 's2d'
    bn_impl: Optional[str] = None         # 'onepass' | 'twopass'
    snorm_impl: Optional[str] = None      # 'per_apply' | 'cached'
    fuse_d: Optional[bool] = None         # SEGAN D real/fake grouped pair
    ws_fuse_d: Optional[bool] = None      # WSEGAN all-pairs grouped D apply
    stft_precision: Optional[str] = None  # 'highest' | 'default' | None (dtype rule)
    stft_method: Optional[str] = None     # 'auto' | 'matmul' | 'fft'
    roll_impl: Optional[str] = None       # 'jnp' | 'halo'
    # use fused Pallas kernels where available
    use_pallas: bool = False
    # resume training from the latest EOE checkpoints in save_path
    resume: bool = False
    # save end-of-epoch checkpoints every N epochs (1 = reference parity; raise it
    # when epochs are tiny or the host link is slow — EOE payloads are ~1 GB)
    eoe_save_every: int = 1
    # multi-host bring-up (jax.distributed.initialize); None = single process
    coordinator: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    # capture a device trace (save_path/profile) + log per-step MFU and memory stats
    profile: bool = False
    # validation batches scored per epoch; 1 = reference parity (model.py:469-484
    # scores a single batch), 0 = sweep the full validation set
    eval_max_samples: int = 1
    # on-the-fly additive-noise augmentation (data/augment.py, ref utils.py:51-297):
    # a dir of noise wavs activates it; noisy slices are regenerated from clean at a
    # random SNR from snr_levels each epoch (the reference imports Additive at
    # train.py:7 but never wires it — this closes that gap)
    noises_dir: Optional[str] = None
    snr_levels: List[int] = field(default_factory=lambda: [0, 5, 10])
    # streaming bounded-buffer shuffle (data/loader.py); 0 = global shuffle
    shuffle_buffer: int = 0
    # 'sharded' (independent per-shard buffers, most sequential IO) or 'global'
    # (deterministic cross-shard: assembled batches == single-host loader)
    shuffle_buffer_mode: str = "sharded"
    # full train steps per dispatched program (lax.scan over stacked batches;
    # bit-equal per step). Amortizes per-dispatch overhead — measured +2% on the
    # WSEGAN step at batch 150 (39.7 -> 40.6% MFU at 4), +1.3% on SEGAN+ at
    # batch 300. Honored by all three train loops (single-process; groups never
    # span an epoch — the ragged tail runs single steps)
    steps_per_call: int = 1
    # collate-time cast of clean/noisy (e.g. 'bfloat16' halves H2D bytes)
    loader_dtype: Optional[str] = None
    # native gather (segan_io.cpp) thread-pool size; 0 = hardware concurrency
    io_threads: int = 0

    def __post_init__(self):
        if self.bias is None:
            self.bias = not self.no_bias

    # ------------------------------------------------------------------
    @classmethod
    def from_dict(cls, d: dict) -> "SEGANConfig":
        """Build from a (possibly legacy) train.opts dict, tolerating unknown/missing keys."""
        d = dict(d)
        # legacy key: boolean l1_loss instead of reg_loss (ckpt_segan+/train.opts:41)
        if "reg_loss" not in d and "l1_loss" in d:
            d["legacy_l1_loss"] = bool(d["l1_loss"])
            # the modern default is l1_loss (ref train.py:179-181)
            d["reg_loss"] = "l1_loss"
        d.pop("l1_loss", None)
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = {k: v for k, v in d.items() if k not in known}
        kwargs = {k: v for k, v in d.items() if k in known}
        cfg = cls(**kwargs)  # __post_init__ derives bias from no_bias when absent
        cfg._unknown = unknown  # type: ignore[attr-defined]
        return cfg

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        return d

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)


def load_train_opts(path: str) -> SEGANConfig:
    """Load a reference-format train.opts JSON (ref: clean.py:33-36)."""
    with open(path, "r") as f:
        return SEGANConfig.from_dict(json.load(f))


def dump_train_opts(cfg: SEGANConfig, save_path: Optional[str] = None) -> str:
    """Dump config as train.opts JSON into cfg.save_path (ref: train.py:253-255)."""
    save_path = save_path or cfg.save_path
    os.makedirs(save_path, exist_ok=True)
    out = os.path.join(save_path, "train.opts")
    with open(out, "w") as f:
        f.write(cfg.to_json())
    return out
