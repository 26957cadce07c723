"""Trace-time lowering knobs with ONE resolution order, config-recorded.

Every performance lowering this framework can swap (conv backward, edge-layer
space-to-depth, BN stats form, spectral-norm iteration policy, fused D pairs,
STFT contraction precision, phase-roll lowering, deconv lowering) is selected
at trace time. Historically each was an ad-hoc ``SEGAN_TPU_*`` env read inside
the op/step body — works for A/B runs, but a reloaded checkpoint could not know
which lowerings produced it. This module gives them all the ``deconv_impl``
treatment (ops/conv.py:conv_transpose1d_auto):

    priority:  env var  >  registered SEGANConfig field  >  built-in default

* Env vars keep winning so one-off experiments can override any engine.
* Engines call :func:`register_config` at construction, so the typed config
  fields (utils/config.py) drive the lowering set for product runs.
* :func:`effective` resolves every knob for a given config; train.py records
  the result in the dumped train.opts, so reloading that file reproduces the
  exact lowering set regardless of later default changes.

All lowerings are mathematically identical (step-equality tested); knobs only
move where the FLOPs run. See BENCH.md for the measured campaigns behind each
default.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

# knob name (== SEGANConfig field name) -> (env var, built-in default)
KNOBS: Dict[str, tuple] = {
    # conv/deconv backward lowering: 'xla' | 'custom' | 'auto' (ops/conv.py)
    "conv_grad": ("SEGAN_TPU_CONV_GRAD", "xla"),
    # tiny-Cin edge-layer space-to-depth forward: 'off' | 's2d' (ops/conv.py)
    "edge_conv": ("SEGAN_TPU_EDGE_CONV", "off"),
    # BatchNorm batch-stats form: 'onepass' | 'twopass' (models/modules.py)
    "bn_impl": ("SEGAN_TPU_BN", "onepass"),
    # spectral-norm power-iteration policy: 'per_apply' | 'cached'
    "snorm_impl": ("SEGAN_TPU_SNORM", "per_apply"),
    # SEGAN D real/fake pair in one grouped apply: bool (models/segan.py)
    "fuse_d": ("SEGAN_TPU_FUSE_D", False),
    # WSEGAN all-pairs grouped D apply: bool (models/wsegan.py)
    "ws_fuse_d": ("SEGAN_TPU_WS_FUSE_D", False),
    # power-loss DFT contraction: None (= compute-dtype rule) | 'highest' | 'default'
    "stft_precision": ("SEGAN_TPU_STFT_PRECISION", None),
    # STFT lowering: 'auto' (matmul-DFT on TPU, fft elsewhere) | 'matmul' | 'fft'
    "stft_method": ("SEGAN_TPU_STFT", "auto"),
    # phase-shift roll lowering: 'jnp' | 'halo' (ops/roll.py)
    "roll_impl": ("SEGAN_TPU_ROLL", "jnp"),
    # transposed-conv lowering: None (= engine default) | 'dilated' | 'phased'
    # | 'blocked' | 'edge-blocked' (ops/conv.py:conv_transpose1d_auto)
    "deconv_impl": ("SEGAN_TPU_DECONV", None),
}

_BOOL_KNOBS = ("fuse_d", "ws_fuse_d")

# values registered from the active engine's SEGANConfig (register_config)
_registered: Dict[str, Any] = {}


def _env_to_bool(v: str) -> bool:
    return v not in ("0", "", "false", "off")


def _normalize(name: str, v: Any) -> Any:
    if name in _BOOL_KNOBS:
        return _env_to_bool(v) if isinstance(v, str) else bool(v)
    return v


def register_config(cfg: Any) -> None:
    """Adopt the knob fields of a SEGANConfig as the process-wide defaults.

    Called by engine constructors (models/segan.py:SEGAN.__init__). Fields left
    at None fall through to the built-in default. Last registration wins —
    matching the trace-time, process-global nature of these lowerings; tests
    that need per-call overrides use the env vars, which always take priority.
    """
    for name in KNOBS:
        v = getattr(cfg, name, None)
        if v is None:
            _registered.pop(name, None)
        else:
            _registered[name] = _normalize(name, v)


def clear() -> None:
    """Drop all registered config values (test isolation)."""
    _registered.clear()


def resolve(name: str, override: Any = None) -> Any:
    """Resolve a knob: env var > `override` (caller-threaded cfg value) >
    registered config > built-in default."""
    env_var, default = KNOBS[name]
    env = os.environ.get(env_var)
    if env is not None and env != "":
        return _normalize(name, env)
    if override is not None:
        return _normalize(name, override)
    if name in _registered:
        return _registered[name]
    return default


def resolve_bool(name: str, override: Any = None) -> bool:
    return bool(resolve(name, override))


def effective(cfg: Any) -> Dict[str, Any]:
    """Resolve every knob for `cfg` (env > cfg > default), for train.opts.

    `deconv_impl` is left as the cfg/env value (None = engine default) — the
    engine resolves it in its constructor (e.g. AEWSEGAN's 'edge-blocked',
    models/wsegan.py) and train.py dumps the ENGINE's config, which carries
    the resolved value.
    """
    out = {}
    for name in KNOBS:
        out[name] = resolve(name, getattr(cfg, name, None))
    return out
