"""Lowering-knob resolution tests (ops/knobs.py): one resolution order
(env > config > default), engine registration, train.opts recording, and the
edge-blocked/custom-grad interaction (ADVICE r4).

These pin VERDICT r4 item 4: the SEGAN_TPU_* knobs are now typed SEGANConfig
fields recorded in the dumped train.opts, so reloading a checkpoint's config
reproduces the exact lowering set."""
import dataclasses
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segan_pytorch_tpu.ops import knobs
from segan_pytorch_tpu.utils.config import SEGANConfig, dump_train_opts, load_train_opts


@pytest.fixture(autouse=True)
def clean_knobs(monkeypatch):
    """Isolate the process-global knob registry and the env from each test."""
    for env_var, _ in knobs.KNOBS.values():
        monkeypatch.delenv(env_var, raising=False)
    saved = dict(knobs._registered)
    knobs.clear()
    yield
    knobs.clear()
    knobs._registered.update(saved)


def small_cfg(**kw):
    base = dict(
        slice_size=1024,
        genc_fmaps=[8, 16, 32], genc_poolings=[4, 4, 4], gkwidth=31, z_dim=32,
        denc_fmaps=[8, 16, 32], denc_poolings=[4, 4, 4], dpool_slen=16,
        batch_size=2, save_path="/tmp/segan_knobs_test",
    )
    base.update(kw)
    return SEGANConfig(**base)


class TestResolveOrder:
    def test_builtin_defaults(self):
        assert knobs.resolve("conv_grad") == "xla"
        assert knobs.resolve("bn_impl") == "onepass"
        assert knobs.resolve("snorm_impl") == "per_apply"
        assert knobs.resolve("edge_conv") == "off"
        assert knobs.resolve("roll_impl") == "jnp"
        assert knobs.resolve("stft_precision") is None
        assert knobs.resolve_bool("fuse_d") is False
        assert knobs.resolve_bool("ws_fuse_d") is False

    def test_config_beats_default(self):
        knobs.register_config(small_cfg(bn_impl="twopass", fuse_d=True))
        assert knobs.resolve("bn_impl") == "twopass"
        assert knobs.resolve_bool("fuse_d") is True
        # unset fields fall through to the built-in default
        assert knobs.resolve("conv_grad") == "xla"

    def test_env_beats_config(self, monkeypatch):
        knobs.register_config(small_cfg(bn_impl="twopass", fuse_d=True))
        monkeypatch.setenv("SEGAN_TPU_BN", "onepass")
        monkeypatch.setenv("SEGAN_TPU_FUSE_D", "0")
        assert knobs.resolve("bn_impl") == "onepass"
        assert knobs.resolve_bool("fuse_d") is False

    def test_override_between_env_and_config(self, monkeypatch):
        # caller-threaded value (e.g. a module's deconv_impl attribute) beats
        # the registered config but loses to the env var
        knobs.register_config(small_cfg(deconv_impl="phased"))
        assert knobs.resolve("deconv_impl", override="blocked") == "blocked"
        monkeypatch.setenv("SEGAN_TPU_DECONV", "dilated")
        assert knobs.resolve("deconv_impl", override="blocked") == "dilated"

    def test_reregister_clears_stale_fields(self):
        knobs.register_config(small_cfg(bn_impl="twopass"))
        knobs.register_config(small_cfg())  # bn_impl=None -> back to default
        assert knobs.resolve("bn_impl") == "onepass"

    def test_bool_env_spellings(self, monkeypatch):
        for v, want in [("1", True), ("true", True), ("0", False),
                        ("false", False), ("off", False)]:
            monkeypatch.setenv("SEGAN_TPU_WS_FUSE_D", v)
            assert knobs.resolve_bool("ws_fuse_d") is want


class TestEngineRegistration:
    def test_segan_init_registers_cfg(self):
        from segan_pytorch_tpu.models import SEGAN

        SEGAN(small_cfg(bn_impl="twopass", conv_grad="auto"))
        assert knobs.resolve("bn_impl") == "twopass"
        assert knobs.resolve("conv_grad") == "auto"

    def test_aewsegan_does_not_mutate_caller_cfg(self):
        from segan_pytorch_tpu.models import AEWSEGAN, SEGAN

        cfg = small_cfg()
        engine = AEWSEGAN(cfg)
        # the engine default was resolved into a COPY...
        assert engine.cfg.deconv_impl == "edge-blocked"
        # ...and the caller's object is untouched: reusing it elsewhere must
        # not leak AEWSEGAN's default (ADVICE r4)
        assert cfg.deconv_impl is None
        SEGAN(cfg)  # re-registers; deconv stays engine-default for SEGAN
        assert knobs.resolve("deconv_impl") is None

    def test_aewsegan_respects_explicit_deconv(self):
        from segan_pytorch_tpu.models import AEWSEGAN

        cfg = small_cfg(deconv_impl="dilated")
        engine = AEWSEGAN(cfg)
        assert engine.cfg is cfg and engine.cfg.deconv_impl == "dilated"


class TestTrainOptsRecording:
    def test_effective_covers_every_knob(self):
        eff = knobs.effective(small_cfg(bn_impl="twopass"))
        assert set(eff) == set(knobs.KNOBS)
        assert eff["bn_impl"] == "twopass"
        assert eff["conv_grad"] == "xla" and eff["fuse_d"] is False

    def test_effective_honors_env(self, monkeypatch):
        monkeypatch.setenv("SEGAN_TPU_CONV_GRAD", "custom")
        assert knobs.effective(small_cfg())["conv_grad"] == "custom"

    def test_roundtrip_reproduces_lowering_set(self, tmp_path, monkeypatch):
        # simulate the train.py dump: resolve effective knobs into cfg fields
        monkeypatch.setenv("SEGAN_TPU_EDGE_CONV", "s2d")
        cfg = small_cfg(save_path=str(tmp_path), bn_impl="twopass")
        for k, v in knobs.effective(cfg).items():
            setattr(cfg, k, v)
        path = dump_train_opts(cfg)
        d = json.load(open(path))
        assert d["bn_impl"] == "twopass" and d["edge_conv"] == "s2d"
        assert d["conv_grad"] == "xla" and d["fuse_d"] is False
        # reload WITHOUT the env var: the recorded values drive the lowering
        monkeypatch.delenv("SEGAN_TPU_EDGE_CONV")
        cfg2 = load_train_opts(str(path))
        knobs.register_config(cfg2)
        assert knobs.resolve("edge_conv") == "s2d"
        assert knobs.resolve("bn_impl") == "twopass"

    def test_legacy_train_opts_still_load(self):
        # a pre-knob train.opts (no knob keys) resolves to pure defaults
        cfg = SEGANConfig.from_dict({"batch_size": 7})
        knobs.register_config(cfg)
        for name in knobs.KNOBS:
            _, default = knobs.KNOBS[name]
            assert knobs.resolve(name) == default


class TestEdgeBlockedCustomGrad:
    """ADVICE r4: impl='edge-blocked' layers that fall through to the dilated
    forward (kernel K>2) must still honor conv_grad='custom'."""

    def _grads(self, impl, monkeypatch, mode):
        from segan_pytorch_tpu.ops.conv import conv_transpose1d_auto

        monkeypatch.setenv("SEGAN_TPU_CONV_GRAD", mode)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
        # (K, Cin, Cout) with Cout=4 > 2: under 'edge-blocked' this layer falls
        # through to the dilated forward and must keep the custom grads
        k = jnp.asarray(rng.randn(8, 8, 4).astype(np.float32))

        def loss(x, k):
            return jnp.sum(conv_transpose1d_auto(x, k, stride=4, impl=impl) ** 2)

        return jax.grad(loss, argnums=(0, 1))(x, k)

    def test_edge_blocked_matches_dilated_grads(self, monkeypatch):
        gx_d, gk_d = self._grads("dilated", monkeypatch, "custom")
        gx_e, gk_e = self._grads("edge-blocked", monkeypatch, "custom")
        gx_x, gk_x = self._grads("dilated", monkeypatch, "xla")
        np.testing.assert_allclose(gx_d, gx_x, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(gx_e, gx_x, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(gk_e, gk_x, rtol=1e-4, atol=1e-4)
