"""Network-level tests: Generator/Discriminator shape traces (SURVEY §3.3/3.4),
skip variants, pool heads, and torch-checkpoint conversion parity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segan_pytorch_tpu.utils.config import SEGANConfig
from segan_pytorch_tpu.models.generator import Generator, build_generator
from segan_pytorch_tpu.models.discriminator import Discriminator, build_discriminator

pytestmark = pytest.mark.quick

torch = pytest.importorskip("torch")
KEY = jax.random.PRNGKey(0)


def small_cfg(**kw):
    base = dict(
        slice_size=1024,
        genc_fmaps=[8, 16, 32], genc_poolings=[4, 4, 4], gkwidth=31, z_dim=32,
        denc_fmaps=[8, 16, 32], denc_poolings=[4, 4, 4], dpool_slen=16,
        save_path="/tmp/segan_test",
    )
    base.update(kw)
    return SEGANConfig(**base)


class TestGeneratorShapes:
    def test_roundtrip_and_hidden_trace(self):
        G = build_generator(small_cfg())
        x = jnp.zeros((2, 1024, 1))
        v = G.init({"params": KEY, "z": KEY}, x, train=False)
        y, hall = G.apply(v, x, ret_hid=True, train=False, rngs={"z": KEY})
        assert y.shape == (2, 1024, 1)
        # encoder pyramid 1024 -> 256 -> 64 -> 16 (SURVEY §3.3 scaled down)
        assert hall["enc_0"].shape == (2, 256, 8)
        assert hall["enc_1"].shape == (2, 64, 16)
        assert hall["enc_2"].shape == (2, 16, 32)
        assert hall["enc_zc"].shape == (2, 16, 64)  # z (32) + enc (32), z first
        assert hall["dec_0"].shape == (2, 64, 16)
        assert hall["dec_2"].shape == (2, 1024, 1)
        # output in [-1, 1] (Tanh)
        assert float(jnp.max(jnp.abs(y))) <= 1.0

    @pytest.mark.parametrize("skip_merge", ["sum", "concat"])
    @pytest.mark.parametrize("skip_type", ["alpha", "constant", "conv"])
    def test_skip_variants(self, skip_merge, skip_type):
        G = build_generator(small_cfg(skip_merge=skip_merge, skip_type=skip_type))
        x = jnp.zeros((1, 1024, 1))
        v = G.init({"params": KEY, "z": KEY}, x, train=False)
        y = G.apply(v, x, train=False, rngs={"z": KEY})
        assert y.shape == (1, 1024, 1)

    def test_no_skip_no_z(self):
        G = build_generator(small_cfg(no_skip=True, no_z=True))
        x = jnp.zeros((1, 1024, 1))
        v = G.init({"params": KEY}, x, train=False)
        assert "alpha_0" not in v["params"]
        y = G.apply(v, x, train=False)
        assert y.shape == (1, 1024, 1)

    def test_explicit_z_reuse_is_deterministic(self):
        G = build_generator(small_cfg())
        x = jnp.asarray(np.random.RandomState(0).randn(1, 1024, 1).astype(np.float32))
        v = G.init({"params": KEY, "z": KEY}, x, train=False)
        z = G.sample_z(jax.random.PRNGKey(42), x.shape)
        y1 = G.apply(v, x, z=z, train=False)
        y2 = G.apply(v, x, z=z, train=False)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_gnorm_snorm_has_spectral_vars(self):
        G = build_generator(small_cfg(gnorm_type="snorm"))
        x = jnp.zeros((1, 1024, 1))
        v = G.init({"params": KEY, "z": KEY}, x, train=False)
        assert "spectral" in v


class TestDiscriminatorShapes:
    @pytest.mark.parametrize("pool_type", ["none", "conv", "gmax", "gavg", "mlp"])
    def test_pool_heads(self, pool_type):
        cfg = small_cfg(dpool_type=pool_type)
        D = build_discriminator(cfg)
        x = jnp.zeros((3, 1024, 2))
        v = D.init({"params": KEY, "phase": KEY}, x, train=False)
        (y, int_act), _ = D.apply(v, x, train=True, mutable=["batch_stats"],
                                  rngs={"phase": KEY})
        if pool_type == "mlp":
            assert y.shape == (3, 16, 1)
        else:
            assert y.shape == (3, 1)
        assert "h_0" in int_act and "logit" in int_act

    def test_phase_shift_changes_with_rng_and_preserves_shape(self):
        cfg = small_cfg(phase_shift=5)
        D = build_discriminator(cfg)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 1024, 2).astype(np.float32))
        v = D.init({"params": KEY, "phase": KEY}, x, train=False)
        (y1, _), _ = D.apply(v, x, train=True, mutable=["batch_stats"],
                             rngs={"phase": jax.random.PRNGKey(1)})
        (y2, _), _ = D.apply(v, x, train=True, mutable=["batch_stats"],
                             rngs={"phase": jax.random.PRNGKey(2)})
        assert y1.shape == y2.shape == (1, 1)
        assert not np.allclose(np.asarray(y1), np.asarray(y2))

    def test_snorm_head(self):
        cfg = small_cfg(dnorm_type="snorm")
        D = build_discriminator(cfg)
        x = jnp.zeros((2, 1024, 2))
        v = D.init({"params": KEY, "phase": KEY}, x, train=False)
        assert "spectral" in v
        # fc_3 PReLU slope is spectral-normed too (ref discriminator.py:121)
        assert "fc_3" in v["spectral"]

    def test_sinc_conv_front(self):
        # sinc front-end consumes fmaps[0]: only 2 strided convs remain -> T=64
        cfg = small_cfg(sinc_conv=True, dpool_slen=64)
        D = build_discriminator(cfg)
        x = jnp.zeros((1, 1024, 2))
        v = D.init({"params": KEY, "phase": KEY}, x, train=False)
        (y, _), _ = D.apply(v, x, train=True, mutable=["batch_stats"],
                            rngs={"phase": KEY})
        assert y.shape == (1, 1)


class TestFullSizeParamCounts:
    def test_default_param_counts(self):
        """G ≈ 65M, D ≈ 26M for the released SEGAN+ config (SURVEY §2.1).
        Construction-only check via flax's shape-only init (no FLOPs)."""
        cfg = SEGANConfig()
        G, D = build_generator(cfg), build_discriminator(cfg)
        gv = jax.eval_shape(
            lambda: G.init({"params": KEY, "z": KEY},
                           jnp.zeros((1, 16384, 1)), train=False))
        dv = jax.eval_shape(
            lambda: D.init({"params": KEY, "phase": KEY},
                           jnp.zeros((1, 16384, 2)), train=False))
        ng = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(gv["params"]))
        nd = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(dv["params"]))
        assert ng == 64_770_561
        assert nd == 25_825_793


class TestTorchCkptConversion:
    def _torch_generator_state(self, rng):
        """Fabricate a torch-layout SEGAN+ generator state dict for the small config
        (enc [8,16,32] pool 4, z 32, dec [16,8,1], alpha skips, concat merge)."""
        st = {}
        enc = [(1, 8), (8, 16), (16, 32)]
        for i, (cin, cout) in enumerate(enc):
            st[f"enc_blocks.{i}.conv.weight"] = rng.randn(cout, cin, 31).astype("f") * .1
            st[f"enc_blocks.{i}.conv.bias"] = rng.randn(cout).astype("f") * .1
            st[f"enc_blocks.{i}.act.weight"] = rng.randn(cout).astype("f") * .1
        for i in range(2):
            st[f"alpha_{i}.skip_k"] = rng.randn(1, enc[i][1], 1).astype("f")
        dec = [(64, 16), (32, 8), (16, 1)]  # concat doubling on layers 1,2
        for i, (cin, cout) in enumerate(dec):
            st[f"dec_blocks.{i}.deconv.weight"] = rng.randn(cin, cout, 31).astype("f") * .1
            st[f"dec_blocks.{i}.deconv.bias"] = rng.randn(cout).astype("f") * .1
            if i < 2:
                st[f"dec_blocks.{i}.act.weight"] = rng.randn(cout).astype("f") * .1
        return st

    def _torch_generator_forward(self, st, x):
        """Reference-semantics forward composed from torch functional ops (spec
        re-statement of generator.py:180-230 for the small config)."""
        import torch.nn.functional as F

        skips = {}
        h = torch.from_numpy(x.transpose(0, 2, 1))
        for i in range(3):
            hp = F.pad(h, (31 // 2 - 1, 31 // 2), mode="reflect")
            a = F.conv1d(hp, torch.from_numpy(st[f"enc_blocks.{i}.conv.weight"]),
                         torch.from_numpy(st[f"enc_blocks.{i}.conv.bias"]), stride=4)
            if i < 2:
                skips[i] = a  # pre-activation (ref generator.py:185,191)
            h = F.prelu(a, torch.from_numpy(st[f"enc_blocks.{i}.act.weight"]))
        z = torch.zeros(h.shape[0], 32, h.shape[2])
        h = torch.cat([z, h], dim=1)
        enc_idx = 2
        for i in range(3):
            if enc_idx in skips:
                sk = torch.from_numpy(st[f"alpha_{enc_idx}.skip_k"]) * skips[enc_idx]
                h = torch.cat([h, sk], dim=1)  # concat merge [hi, sk_h]
            h = F.conv_transpose1d(
                h, torch.from_numpy(st[f"dec_blocks.{i}.deconv.weight"]),
                torch.from_numpy(st[f"dec_blocks.{i}.deconv.bias"]),
                stride=4, padding=13)
            h = h[:, :, :-1]
            if i < 2:
                h = F.prelu(h, torch.from_numpy(st[f"dec_blocks.{i}.act.weight"]))
            else:
                h = torch.tanh(h)
            enc_idx -= 1
        return h.numpy().transpose(0, 2, 1)

    def test_generator_conversion_forward_parity(self, tmp_path):
        rng = np.random.RandomState(7)
        st = self._torch_generator_state(rng)
        ckpt = tmp_path / "gen.ckpt"
        torch.save({"state_dict": {k: torch.from_numpy(v) for k, v in st.items()}},
                   str(ckpt))
        from segan_pytorch_tpu.utils.checkpoint import load_torch_generator, \
            filter_merge_state

        loaded = load_torch_generator(str(ckpt))
        cfg = small_cfg(no_bias=False)
        cfg.bias = True
        G = build_generator(cfg)
        x = rng.randn(2, 1024, 1).astype(np.float32)
        v = G.init({"params": KEY, "z": KEY}, jnp.asarray(x), train=False)
        merged = filter_merge_state({"params": v["params"]}, loaded)
        n_loaded = len(jax.tree.leaves(loaded["params"]))
        n_model = len(jax.tree.leaves(v["params"]))
        assert n_loaded == n_model, (n_loaded, n_model)
        z = jnp.zeros((2, 16, 32))
        y = np.asarray(G.apply({"params": merged["params"]}, jnp.asarray(x), z=z,
                               train=False))
        y_ref = self._torch_generator_forward(st, x)
        np.testing.assert_allclose(y, y_ref, atol=5e-5)

    def test_legacy_gen_enc_names_migrate(self, tmp_path):
        rng = np.random.RandomState(3)
        st = {"gen_enc.0.conv.weight": torch.from_numpy(rng.randn(8, 1, 31).astype("f")),
              "gen_dec.0.conv.weight": torch.from_numpy(rng.randn(8, 4, 31).astype("f"))}
        ckpt = tmp_path / "legacy.ckpt"
        torch.save({"state_dict": st}, str(ckpt))
        from segan_pytorch_tpu.utils.checkpoint import load_torch_generator

        loaded = load_torch_generator(str(ckpt))
        assert "enc_blocks_0" in loaded["params"]
        assert "dec_blocks_0" in loaded["params"]
        assert "deconv" in loaded["params"]["dec_blocks_0"]


class TestGenerateBatch:
    """generate_batch == N sequential generate() calls: same PRNG stream order
    (the i-th utterance consumes the i-th z draw), generator row-independent in
    eval mode, padding rows inert. Equality is to 1 fp32 ulp — XLA's fusion
    plan (and thus rounding) legitimately depends on the batch shape."""

    def _engine(self, seed=3):
        from segan_pytorch_tpu.models import SEGAN
        cfg = small_cfg(batch_size=1)
        segan = SEGAN(cfg)
        segan.init_state(jax.random.PRNGKey(0), batch_size=1)
        segan._gen_rng = jax.random.PRNGKey(seed)
        return segan

    @pytest.mark.parametrize("overlap", [0.0, 0.25])
    def test_matches_sequential(self, overlap):
        rng = np.random.RandomState(11)
        wavs = [rng.randn(n).astype(np.float32) * 0.3
                for n in (1500, 5000, 1024)]
        seq_engine = self._engine()
        seq = [seq_engine.generate(w, overlap=overlap) for w in wavs]
        bat_engine = self._engine()
        bat = bat_engine.generate_batch(wavs, overlap=overlap)
        assert len(bat) == len(seq)
        for (sw, sc), (bw, bc) in zip(seq, bat):
            np.testing.assert_allclose(sw, bw, atol=1e-6, rtol=0)
            np.testing.assert_allclose(sc, bc, atol=1e-5, rtol=0)

    def test_empty_list(self):
        # clean.py --batch_utts flushes a possibly-empty tail group; an empty
        # input must not touch the PRNG stream or the device.
        segan = self._engine()
        assert segan.generate_batch([]) == []
        assert segan.generate_batch(np.zeros((0, 100), np.float32)) == []

    def test_ndarray_input(self):
        # a 2-D ndarray of utterances is iterable rows — must not hit
        # ndarray-truthiness in the empty guard
        segan = self._engine()
        wavs = np.random.RandomState(0).randn(2, 1500).astype(np.float32) * .1
        outs = segan.generate_batch(wavs)
        assert [o[0].shape[0] for o in outs] == [1500, 1500]

    def test_no_z_config(self):
        from segan_pytorch_tpu.models import SEGAN
        cfg = small_cfg(batch_size=1, no_z=True)
        segan = SEGAN(cfg)
        segan.init_state(jax.random.PRNGKey(0), batch_size=1)
        wavs = [np.zeros((2000,), np.float32), np.ones((900,), np.float32) * .1]
        outs = segan.generate_batch(wavs)
        assert [o[0].shape[0] for o in outs] == [2000, 900]
