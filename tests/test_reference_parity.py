"""End-to-end network parity vs the ACTUAL reference implementation.

Loads the reference's torch Generator/Discriminator straight from /root/reference (with
stubs for its unavailable third-party deps), transfers the torch-initialized weights into
our flax models through the public checkpoint converter, and compares forward outputs on
identical inputs — the strongest possible guard against subtle semantic drift (padding,
skip order, z-concat order, flatten order, BN momentum...).
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def ref():
    for name in ("numba", "soundfile", "librosa", "tensorboardX", "torchvision",
                 "torchvision.utils", "ahoproc_tools", "ahoproc_tools.io",
                 "ahoproc_tools.interpolate"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "numba":
                mod.jit = lambda *a, **k: (lambda f: f)
                mod.int32 = mod.float32 = None
            if name == "tensorboardX":
                mod.SummaryWriter = object
            sys.modules[name] = mod
    sys.path.insert(0, "/root/reference/segan/models")

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        m = importlib.util.module_from_spec(spec)
        sys.modules[name] = m
        spec.loader.exec_module(m)
        return m

    gen = load("ref_generator", "/root/reference/segan/models/generator.py")
    disc = load("ref_discriminator", "/root/reference/segan/models/discriminator.py")
    return types.SimpleNamespace(gen=gen, disc=disc)


def _save_ckpt(module, tmp_path, name):
    p = str(tmp_path / name)
    torch.save({"state_dict": module.state_dict()}, p)
    return p


def small_cfg(**kw):
    from segan_pytorch_tpu.utils.config import SEGANConfig

    base = dict(slice_size=1024,
                genc_fmaps=[8, 16, 32], genc_poolings=[4, 4, 4], gkwidth=31, z_dim=32,
                denc_fmaps=[8, 16, 32], denc_poolings=[4, 4, 4], dpool_slen=16,
                no_bias=False, save_path="/tmp/refpar")
    base.update(kw)
    cfg = SEGANConfig(**base)
    cfg.bias = True
    return cfg


def _load_our_G(cfg, ckpt, x, z):
    from segan_pytorch_tpu.models.generator import build_generator
    from segan_pytorch_tpu.utils.checkpoint import load_torch_generator, \
        filter_merge_state

    G = build_generator(cfg)
    v = G.init({"params": KEY, "z": KEY}, jnp.asarray(x), train=False)
    loaded = load_torch_generator(ckpt)
    merged = filter_merge_state({"params": v["params"]}, loaded)
    variables = {"params": merged["params"]}
    if "spectral" in v:
        spec = filter_merge_state({"spectral": v["spectral"]},
                                  {"spectral": loaded.get("spectral", {})})
        variables["spectral"] = spec["spectral"]
    return G, variables


class TestGeneratorParity:
    @pytest.mark.parametrize("skip_merge,skip_type", [
        ("concat", "alpha"),
        ("sum", "alpha"),
        ("concat", "constant"),
        ("concat", "conv"),
    ])
    def test_forward_matches_reference(self, ref, tmp_path, skip_merge, skip_type):
        RG = ref.gen.Generator(1, [8, 16, 32], 31, [4, 4, 4], z_dim=32, skip=True,
                               bias=True, skip_init="one", skip_type=skip_type,
                               norm_type=None, skip_merge=skip_merge, skip_kwidth=11)
        RG.eval()
        ckpt = _save_ckpt(RG, tmp_path, f"g_{skip_merge}_{skip_type}.ckpt")
        rng = np.random.RandomState(0)
        x = rng.randn(2, 1024, 1).astype(np.float32) * 0.3
        z = rng.randn(2, 16, 32).astype(np.float32)
        with torch.no_grad():
            y_ref = RG(torch.from_numpy(x.transpose(0, 2, 1)),
                       z=torch.from_numpy(z.transpose(0, 2, 1)))
        y_ref = y_ref.numpy().transpose(0, 2, 1)
        cfg = small_cfg(skip_merge=skip_merge, skip_type=skip_type)
        G, variables = _load_our_G(cfg, ckpt, x, z)
        y = np.asarray(G.apply(variables, jnp.asarray(x), z=jnp.asarray(z),
                               train=False))
        np.testing.assert_allclose(y, y_ref, atol=3e-5)

    def test_no_bias_parity(self, ref, tmp_path):
        """--no_bias configs: the reference's GDeconv1DBlock accepts bias but never
        forwards it to ConvTranspose1d (ref modules.py:110-119), so decoder deconvs
        keep bias even when bias=False.  Our blocks must replicate that bug or the
        torch checkpoint's deconv.bias leaves are silently dropped on transfer."""
        RG = ref.gen.Generator(1, [8, 16, 32], 31, [4, 4, 4], z_dim=32, skip=True,
                               bias=False, skip_init="one", skip_type="alpha",
                               norm_type=None, skip_merge="concat", skip_kwidth=11)
        RG.eval()
        # push deconv biases away from 0 so the parity is non-trivial
        with torch.no_grad():
            for blk in RG.dec_blocks:
                if hasattr(blk, "deconv") and blk.deconv.bias is not None:
                    blk.deconv.bias.add_(torch.randn_like(blk.deconv.bias))
        ckpt = _save_ckpt(RG, tmp_path, "g_nobias.ckpt")
        rng = np.random.RandomState(7)
        x = rng.randn(2, 1024, 1).astype(np.float32) * 0.3
        z = rng.randn(2, 16, 32).astype(np.float32)
        with torch.no_grad():
            y_ref = RG(torch.from_numpy(x.transpose(0, 2, 1)),
                       z=torch.from_numpy(z.transpose(0, 2, 1)))
        cfg = small_cfg(no_bias=True)
        cfg.bias = False
        G, variables = _load_our_G(cfg, ckpt, x, z)
        y = np.asarray(G.apply(variables, jnp.asarray(x), z=jnp.asarray(z),
                               train=False))
        np.testing.assert_allclose(y, y_ref.numpy().transpose(0, 2, 1), atol=3e-5)

    def test_no_z_parity(self, ref, tmp_path):
        RG = ref.gen.Generator(1, [8, 16, 32], 31, [4, 4, 4], no_z=True, skip=True,
                               bias=True, skip_init="one", skip_type="alpha",
                               norm_type=None, skip_merge="concat")
        RG.eval()
        ckpt = _save_ckpt(RG, tmp_path, "g_noz.ckpt")
        x = np.random.RandomState(1).randn(1, 1024, 1).astype(np.float32) * 0.3
        with torch.no_grad():
            y_ref = RG(torch.from_numpy(x.transpose(0, 2, 1)))
        cfg = small_cfg(no_z=True)
        G, variables = _load_our_G(cfg, ckpt, x, None)
        y = np.asarray(G.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(y, y_ref.numpy().transpose(0, 2, 1), atol=3e-5)


class TestDiscriminatorParity:
    def _transfer(self, RD, cfg, tmp_path, name):
        from segan_pytorch_tpu.models.discriminator import build_discriminator
        from segan_pytorch_tpu.utils.checkpoint import load_torch_discriminator, \
            filter_merge_state

        ckpt = _save_ckpt(RD, tmp_path, name)
        D = build_discriminator(cfg)
        v = D.init({"params": KEY, "phase": KEY}, jnp.zeros((1, 1024, 2)),
                   train=False)
        loaded = load_torch_discriminator(ckpt, cfg.dpool_slen, cfg.denc_fmaps[-1])
        model_tree = {"params": v["params"]}
        if "batch_stats" in v:
            model_tree["batch_stats"] = v["batch_stats"]
        merged = filter_merge_state(model_tree, loaded)
        return D, merged

    def test_bnorm_eval_parity(self, ref, tmp_path):
        RD = ref.disc.Discriminator(2, [8, 16, 32], 31, [4, 4, 4],
                                    pool_type="none", pool_slen=16,
                                    norm_type="bnorm", phase_shift=None)
        # push the running stats away from the init so eval parity is non-trivial
        with torch.no_grad():
            for _ in range(3):
                RD(torch.randn(4, 2, 1024))
        RD.eval()
        cfg = small_cfg()
        cfg.phase_shift = None
        D, variables = self._transfer(RD, cfg, tmp_path, "d_bnorm.ckpt")
        x = np.random.RandomState(2).randn(3, 1024, 2).astype(np.float32) * 0.3
        with torch.no_grad():
            y_ref, _ = RD(torch.from_numpy(x.transpose(0, 2, 1)))
        y, _ = D.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=5e-5)

    @pytest.mark.parametrize("pool_type,pool_slen", [
        ("conv", 16), ("gmax", 16), ("gavg", 16), ("mlp", 16),
    ])
    def test_pool_head_parity(self, ref, tmp_path, pool_type, pool_slen):
        RD = ref.disc.Discriminator(2, [8, 16, 32], 31, [4, 4, 4],
                                    pool_type=pool_type, pool_slen=pool_slen,
                                    norm_type=None, phase_shift=None)
        RD.eval()
        cfg = small_cfg(dpool_type=pool_type, dpool_slen=pool_slen,
                        dnorm_type=None)
        cfg.phase_shift = None
        D, variables = self._transfer(RD, cfg, tmp_path, f"d_{pool_type}.ckpt")
        x = np.random.RandomState(3).randn(2, 1024, 2).astype(np.float32) * 0.3
        with torch.no_grad():
            y_ref, _ = RD(torch.from_numpy(x.transpose(0, 2, 1)))
        y, _ = D.apply(variables, jnp.asarray(x), train=False)
        yr = y_ref.numpy()
        yo = np.asarray(y)
        if pool_type == "mlp":
            yr = yr.transpose(0, 2, 1)
        np.testing.assert_allclose(yo, yr, atol=5e-5)


class TestSpectralNormParity:
    """Torch checkpoints built with --gnorm_type snorm --dnorm_type snorm (the
    run_wsegan_train.sh configuration) store weight_orig/weight_u/weight_v per
    nn.utils.spectral_norm; conversion must land them as our unnormalized 'weight'
    + 'spectral' u/v (v re-permuted to our column order) for exact eval parity."""

    def test_snorm_generator_roundtrip(self, ref, tmp_path):
        RG = ref.gen.Generator(1, [8, 16, 32], 31, [4, 4, 4], z_dim=32, skip=True,
                               bias=True, skip_init="one", skip_type="alpha",
                               norm_type="snorm", skip_merge="concat",
                               skip_kwidth=11)
        # a few train-mode forwards so u/v move off their random init
        with torch.no_grad():
            for i in range(3):
                RG(torch.randn(2, 1, 1024) * 0.3,
                   z=torch.randn(2, 32, 16))
        RG.eval()
        ckpt = _save_ckpt(RG, tmp_path, "g_snorm.ckpt")
        rng = np.random.RandomState(11)
        x = rng.randn(2, 1024, 1).astype(np.float32) * 0.3
        z = rng.randn(2, 16, 32).astype(np.float32)
        with torch.no_grad():
            y_ref = RG(torch.from_numpy(x.transpose(0, 2, 1)),
                       z=torch.from_numpy(z.transpose(0, 2, 1)))
        cfg = small_cfg(gnorm_type="snorm")
        G, variables = _load_our_G(cfg, ckpt, x, z)
        assert "spectral" in variables and variables["spectral"], (
            "snorm u/v state missing after conversion")
        y = np.asarray(G.apply(variables, jnp.asarray(x), z=jnp.asarray(z),
                               train=False))
        np.testing.assert_allclose(y, y_ref.numpy().transpose(0, 2, 1), atol=5e-5)

    def test_snorm_discriminator_roundtrip(self, ref, tmp_path):
        from segan_pytorch_tpu.models.discriminator import build_discriminator
        from segan_pytorch_tpu.utils.checkpoint import (
            load_torch_discriminator, filter_merge_state)

        RD = ref.disc.Discriminator(2, [8, 16, 32], 31, [4, 4, 4],
                                    pool_type="none", pool_slen=16,
                                    norm_type="snorm", phase_shift=None)
        with torch.no_grad():
            for _ in range(3):
                RD(torch.randn(2, 2, 1024) * 0.3)
        RD.eval()
        ckpt = _save_ckpt(RD, tmp_path, "d_snorm.ckpt")
        cfg = small_cfg(dnorm_type="snorm")
        cfg.phase_shift = None
        D = build_discriminator(cfg)
        v = D.init({"params": KEY, "phase": KEY}, jnp.zeros((1, 1024, 2)),
                   train=False)
        loaded = load_torch_discriminator(ckpt, cfg.dpool_slen, cfg.denc_fmaps[-1])
        assert "spectral" in loaded and loaded["spectral"]
        model_tree = {"params": v["params"], "spectral": v["spectral"]}
        merged = filter_merge_state(model_tree, loaded)
        x = np.random.RandomState(12).randn(2, 1024, 2).astype(np.float32) * 0.3
        with torch.no_grad():
            y_ref, _ = RD(torch.from_numpy(x.transpose(0, 2, 1)))
        y, _ = D.apply(merged, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=5e-5)


class TestLossParity:
    def test_lsgan_losses_match_reference_composition(self, ref, tmp_path):
        """One full fused step's loss values vs the reference's 3-phase computation
        with the same weights, z, and no phase shift (model.py:291-321)."""
        import torch.nn.functional as F

        RG = ref.gen.Generator(1, [8, 16, 32], 31, [4, 4, 4], z_dim=32, skip=True,
                               bias=True, skip_init="one", skip_type="alpha",
                               norm_type=None, skip_merge="concat")
        RD = ref.disc.Discriminator(2, [8, 16, 32], 31, [4, 4, 4],
                                    pool_type="none", pool_slen=16,
                                    norm_type="bnorm", phase_shift=None)
        RG.train()
        RD.train()
        g_ckpt = _save_ckpt(RG, tmp_path, "lg.ckpt")
        d_ckpt = _save_ckpt(RD, tmp_path, "ld.ckpt")
        rng = np.random.RandomState(4)
        clean = (rng.randn(4, 1024, 1) * 0.3).astype(np.float32)
        noisy = clean + (rng.randn(4, 1024, 1) * 0.05).astype(np.float32)
        z = rng.randn(4, 16, 32).astype(np.float32)

        # --- reference composition (torch), BN in train mode ---
        tc = torch.from_numpy(clean.transpose(0, 2, 1))
        tn = torch.from_numpy(noisy.transpose(0, 2, 1))
        tz = torch.from_numpy(z.transpose(0, 2, 1))
        Genh = RG(tn, z=tz)
        d_real, _ = RD(torch.cat([tc, tn], dim=1))
        d_real_loss = F.mse_loss(d_real.view(-1), torch.ones(4))
        d_fake, _ = RD(torch.cat([Genh.detach(), tn], dim=1))
        d_fake_loss = F.mse_loss(d_fake.view(-1), torch.zeros(4))
        # (no optimizer step: parity of the loss surfaces, not the update)
        d_fake_, _ = RD(torch.cat([Genh, tn], dim=1))
        g_adv_loss = F.mse_loss(d_fake_.view(-1), torch.ones(4))
        g_l1_loss = 100.0 * F.l1_loss(Genh, tc)

        # --- ours: same weights, same z, D params NOT updated between passes ---
        from segan_pytorch_tpu.models.segan import masked_mse, reg_loss_fn, MUTS
        from segan_pytorch_tpu.models.generator import build_generator
        from segan_pytorch_tpu.models.discriminator import build_discriminator
        from segan_pytorch_tpu.utils.checkpoint import (
            load_torch_generator, load_torch_discriminator, filter_merge_state)

        cfg = small_cfg()
        cfg.phase_shift = None
        G = build_generator(cfg)
        D = build_discriminator(cfg)
        gv = G.init({"params": KEY, "z": KEY}, jnp.asarray(noisy), train=True)
        dv = D.init({"params": KEY}, jnp.zeros((4, 1024, 2)), train=True)
        gm = filter_merge_state({"params": gv["params"]},
                                load_torch_generator(g_ckpt))
        dm = filter_merge_state(
            {"params": dv["params"], "batch_stats": dv["batch_stats"]},
            load_torch_discriminator(d_ckpt, 16, 32))
        mask = jnp.ones((4,))
        Genh_j = G.apply({"params": gm["params"]}, jnp.asarray(noisy),
                         z=jnp.asarray(z), train=True)
        dvars = {"params": dm["params"], "batch_stats": dm["batch_stats"]}
        (dr, _), m1 = D.apply(dvars, jnp.concatenate(
            [jnp.asarray(clean), jnp.asarray(noisy)], -1), train=True,
            mutable=["batch_stats"])
        drl = masked_mse(dr, 1.0, mask)
        (df, _), m2 = D.apply({"params": dm["params"], **m1}, jnp.concatenate(
            [Genh_j, jnp.asarray(noisy)], -1), train=True, mutable=["batch_stats"])
        dfl = masked_mse(df, 0.0, mask)
        (df_, _), _ = D.apply({"params": dm["params"], **m2}, jnp.concatenate(
            [Genh_j, jnp.asarray(noisy)], -1), train=True, mutable=["batch_stats"])
        gal = masked_mse(df_, 1.0, mask)
        gl1 = 100.0 * reg_loss_fn("l1_loss")(Genh_j, jnp.asarray(clean), mask)

        np.testing.assert_allclose(float(drl), float(d_real_loss), rtol=2e-3)
        np.testing.assert_allclose(float(dfl), float(d_fake_loss), rtol=2e-3)
        np.testing.assert_allclose(float(gal), float(g_adv_loss), rtol=2e-3)
        np.testing.assert_allclose(float(gl1), float(g_l1_loss), rtol=2e-4)


class TestWSEGANLossParity:
    def test_wsegan_losses_match_reference_composition(self, ref, tmp_path):
        """WSEGAN loss surfaces vs the reference's computation (model.py:572-668):
        MSE cost on full-size labels, STFT power loss (10log10|stft|^2, n_fft=min(T,2048),
        hop 160, win 320, normalized), additive-masked L1."""
        import torch.nn.functional as F

        RG = ref.gen.Generator(1, [8, 16, 32], 31, [4, 4, 4], z_dim=32, skip=True,
                               bias=True, skip_init="one", skip_type="alpha",
                               norm_type=None, skip_merge="concat")
        RD = ref.disc.Discriminator(2, [8, 16, 32], 31, [4, 4, 4],
                                    pool_type="none", pool_slen=16,
                                    norm_type=None, phase_shift=None)
        RG.train(); RD.train()
        g_ckpt = _save_ckpt(RG, tmp_path, "wg.ckpt")
        d_ckpt = _save_ckpt(RD, tmp_path, "wd.ckpt")
        rng = np.random.RandomState(5)
        clean = (rng.randn(4, 1024, 1) * 0.3).astype(np.float32)
        noisy = clean + (rng.randn(4, 1024, 1) * 0.05).astype(np.float32)
        z = rng.randn(4, 16, 32).astype(np.float32)
        amask_np = np.array([1, 0, 1, 0], np.float32)

        tc = torch.from_numpy(clean.transpose(0, 2, 1))
        tn = torch.from_numpy(noisy.transpose(0, 2, 1))
        tz = torch.from_numpy(z.transpose(0, 2, 1))
        Genh = RG(tn, z=tz)
        d_real, _ = RD(torch.cat([tc, tn], 1))
        d_real_loss = F.mse_loss(d_real, torch.ones(d_real.size()))
        d_fake, _ = RD(torch.cat([Genh.detach(), tn], 1))
        d_fake_loss = F.mse_loss(d_fake, torch.zeros(d_fake.size()))
        d_loss_ref = 0.5 * (d_real_loss + d_fake_loss)
        d_fake_, _ = RD(torch.cat([Genh, tn], 1))
        g_adv_ref = F.mse_loss(d_fake_, torch.ones(d_fake_.size()))
        n_fft = min(clean.shape[1], 2048)
        cs = torch.stft(tc.squeeze(1), n_fft=n_fft, hop_length=160, win_length=320,
                        window=torch.ones(320), normalized=True,
                        return_complex=True)
        gs = torch.stft(Genh.squeeze(1), n_fft=n_fft, hop_length=160,
                        win_length=320, window=torch.ones(320), normalized=True,
                        return_complex=True)
        cpow = 10 * torch.log10(cs.abs() ** 2 + 10e-20)
        gpow = 10 * torch.log10(gs.abs() ** 2 + 10e-20)
        pow_ref = 0.001 * F.l1_loss(gpow, cpow)
        tmask = torch.from_numpy(amask_np)[:, None, None]
        den_ref = 100.0 * F.l1_loss(Genh * tmask, tc * tmask)

        # --- ours: same weights/z, NO optimizer updates (loss surface parity) ---
        from segan_pytorch_tpu.models import WSEGAN
        from segan_pytorch_tpu.models.wsegan import make_wsegan_train_step
        from segan_pytorch_tpu.models.segan import build_optimizer, GANTrainState
        from segan_pytorch_tpu.utils.checkpoint import (
            load_torch_generator, load_torch_discriminator, filter_merge_state)
        import optax

        cfg = small_cfg(wsegan=True, dnorm_type=None, n_fft=2048)
        cfg.phase_shift = None
        ws = WSEGAN(cfg)
        ws.init_state(batch_size=4)
        gm = filter_merge_state({"params": ws.state.g_params},
                                load_torch_generator(g_ckpt))
        dm = filter_merge_state({"params": ws.state.d_params},
                                load_torch_discriminator(d_ckpt, 16, 32))
        # zero LR so the step's "updated D" equals the original D (matching the
        # no-step torch composition above)
        zero_tx = optax.sgd(0.0)
        step = make_wsegan_train_step(ws.G, ws.D, zero_tx, zero_tx, cfg)
        state = ws.state.replace(
            g_params=gm["params"], d_params=dm["params"],
            g_opt=zero_tx.init(gm["params"]), d_opt=zero_tx.init(dm["params"]))

        # pin z: wrap the generator's sample_z
        import jax as _jax

        # patch the CLASS attribute and restore the class attribute (restoring
        # ws.G.sample_z — a bound method — would pin `self` to this test's
        # generator for every later Generator instance in the process)
        orig_sample = ws.G.__class__.sample_z
        try:
            ws.G.__class__.sample_z = lambda self, rng, shape: jnp.asarray(z)
            new_state, metrics, Genh_j, _ = step(
                state, jnp.asarray(clean), jnp.asarray(noisy), jnp.ones((4,)),
                jnp.asarray(amask_np), _jax.random.PRNGKey(0), jnp.float32(100.0))
        finally:
            ws.G.__class__.sample_z = orig_sample

        np.testing.assert_allclose(float(metrics["d_loss"]), float(d_loss_ref),
                                   rtol=2e-3)
        np.testing.assert_allclose(float(metrics["g_adv"]), float(g_adv_ref),
                                   rtol=2e-3)
        np.testing.assert_allclose(float(metrics["pow_loss"]), float(pow_ref),
                                   rtol=2e-3)
        np.testing.assert_allclose(float(metrics["den_loss"]), float(den_ref),
                                   rtol=2e-3)
        # weighted d_loss identity
        np.testing.assert_allclose(
            float(metrics["d_loss"]),
            0.5 * (float(metrics["d_real"]) + float(metrics["d_fake"])), rtol=1e-5)


class TestTorchExport:
    """Reverse migration: export OUR weights to the reference's torch format,
    strict-load them into the ACTUAL upstream modules, and require forward
    equality — the mirror image of the import-parity tests above."""

    def test_generator_export_strict_load_forward(self, ref, tmp_path):
        from segan_pytorch_tpu.models.generator import build_generator
        from segan_pytorch_tpu.utils.checkpoint import export_torch_generator

        cfg = small_cfg(skip_merge="concat", skip_type="alpha")
        G = build_generator(cfg)
        rng = np.random.RandomState(21)
        x = rng.randn(2, 1024, 1).astype(np.float32) * 0.3
        z = rng.randn(2, 16, 32).astype(np.float32)
        v = G.init({"params": KEY, "z": KEY}, jnp.asarray(x), train=False)
        out = str(tmp_path / "g_export.ckpt")
        export_torch_generator({"params": v["params"]}, out, step=7)

        RG = ref.gen.Generator(1, [8, 16, 32], 31, [4, 4, 4], z_dim=32,
                               skip=True, bias=True, skip_init="one",
                               skip_type="alpha", norm_type=None,
                               skip_merge="concat", skip_kwidth=11)
        payload = torch.load(out)
        assert payload["step"] == 7
        RG.load_state_dict(payload["state_dict"], strict=True)
        RG.eval()
        with torch.no_grad():
            y_ref = RG(torch.from_numpy(x.transpose(0, 2, 1)),
                       z=torch.from_numpy(z.transpose(0, 2, 1)))
        y = np.asarray(G.apply(v, jnp.asarray(x), z=jnp.asarray(z),
                               train=False))
        np.testing.assert_allclose(y, y_ref.numpy().transpose(0, 2, 1),
                                   atol=3e-5)

    def test_discriminator_export_strict_load_forward(self, ref, tmp_path):
        from segan_pytorch_tpu.models.discriminator import build_discriminator
        from segan_pytorch_tpu.utils.checkpoint import (
            export_torch_discriminator)

        cfg = small_cfg()
        cfg.phase_shift = None
        D = build_discriminator(cfg)
        v = D.init({"params": KEY, "phase": KEY}, jnp.zeros((1, 1024, 2)),
                   train=False)
        # push batch stats off the init so eval parity is non-trivial
        rngs = np.random.RandomState(5)
        bs = jax.tree.map(
            lambda a: a + rngs.uniform(0.1, 0.5, a.shape).astype(a.dtype),
            v["batch_stats"])
        out = str(tmp_path / "d_export.ckpt")
        export_torch_discriminator(
            {"params": v["params"], "batch_stats": bs}, out,
            cfg.dpool_slen, cfg.denc_fmaps[-1], step=3)

        RD = ref.disc.Discriminator(2, [8, 16, 32], 31, [4, 4, 4],
                                    pool_type="none", pool_slen=16,
                                    norm_type="bnorm", phase_shift=None)
        RD.load_state_dict(torch.load(out)["state_dict"], strict=True)
        RD.eval()
        x = np.random.RandomState(6).randn(3, 1024, 2).astype(np.float32) * 0.3
        with torch.no_grad():
            y_ref, _ = RD(torch.from_numpy(x.transpose(0, 2, 1)))
        y, _ = D.apply({"params": v["params"], "batch_stats": bs},
                       jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=5e-5)

    def test_export_import_roundtrip(self, tmp_path):
        """export -> load_torch_* must reproduce the original tree exactly
        (layout transposes are involutions)."""
        from segan_pytorch_tpu.models.generator import build_generator
        from segan_pytorch_tpu.models.discriminator import build_discriminator
        from segan_pytorch_tpu.utils.checkpoint import (
            export_torch_discriminator,
            export_torch_generator,
            load_torch_discriminator,
            load_torch_generator,
        )

        cfg = small_cfg()
        G = build_generator(cfg)
        vg = G.init({"params": KEY, "z": KEY}, jnp.zeros((1, 1024, 1)),
                    train=False)
        gpath = str(tmp_path / "g.ckpt")
        export_torch_generator({"params": vg["params"]}, gpath)
        back = load_torch_generator(gpath)
        jax.tree.map(np.testing.assert_array_equal, back["params"],
                     jax.tree.map(np.asarray, vg["params"]))

        D = build_discriminator(cfg)
        vd = D.init({"params": KEY, "phase": KEY}, jnp.zeros((1, 1024, 2)),
                    train=False)
        dpath = str(tmp_path / "d.ckpt")
        export_torch_discriminator(
            {"params": vd["params"], "batch_stats": vd["batch_stats"]},
            dpath, cfg.dpool_slen, cfg.denc_fmaps[-1])
        back = load_torch_discriminator(dpath, cfg.dpool_slen,
                                        cfg.denc_fmaps[-1])
        jax.tree.map(np.testing.assert_array_equal, back["params"],
                     jax.tree.map(np.asarray, vd["params"]))
        jax.tree.map(np.testing.assert_array_equal, back["batch_stats"],
                     jax.tree.map(np.asarray, vd["batch_stats"]))

    def test_snorm_export_roundtrip_forward(self, ref, tmp_path):
        """Spectral-norm (the WSEGAN config): torch -> ours -> torch must
        strict-load into a fresh snorm reference module and produce the
        ORIGINAL module's eval output (weight_orig + re-permuted u/v)."""
        from segan_pytorch_tpu.utils.checkpoint import (
            export_torch_generator, load_torch_generator)

        RG = ref.gen.Generator(1, [8, 16, 32], 31, [4, 4, 4], z_dim=32,
                               skip=True, bias=True, skip_init="one",
                               skip_type="alpha", norm_type="snorm",
                               skip_merge="concat", skip_kwidth=11)
        with torch.no_grad():  # move u/v off their random init
            for _ in range(3):
                RG(torch.randn(2, 1, 1024) * 0.3, z=torch.randn(2, 32, 16))
        RG.eval()
        src = _save_ckpt(RG, tmp_path, "g_snorm_src.ckpt")
        tree = load_torch_generator(src)
        assert tree.get("spectral"), "importer lost the snorm state"
        back = str(tmp_path / "g_snorm_back.ckpt")
        export_torch_generator(tree, back)

        RG2 = ref.gen.Generator(1, [8, 16, 32], 31, [4, 4, 4], z_dim=32,
                                skip=True, bias=True, skip_init="one",
                                skip_type="alpha", norm_type="snorm",
                                skip_merge="concat", skip_kwidth=11)
        RG2.load_state_dict(torch.load(back)["state_dict"], strict=True)
        RG2.eval()
        rng = np.random.RandomState(13)
        x = torch.from_numpy(rng.randn(2, 1, 1024).astype(np.float32) * 0.3)
        z = torch.from_numpy(rng.randn(2, 32, 16).astype(np.float32))
        with torch.no_grad():
            y1 = RG(x, z=z).numpy()
            y2 = RG2(x, z=z).numpy()
        np.testing.assert_allclose(y2, y1, atol=1e-6)

    def test_snorm_discriminator_export_roundtrip(self, ref, tmp_path):
        """snorm D incl. the PReLU-slope quirk and the fc.0 flatten permute:
        import -> export -> strict load -> identical eval logits."""
        from segan_pytorch_tpu.utils.checkpoint import (
            export_torch_discriminator, load_torch_discriminator)

        def build():
            return ref.disc.Discriminator(2, [8, 16, 32], 31, [4, 4, 4],
                                          pool_type="none", pool_slen=16,
                                          norm_type="snorm", phase_shift=None)

        RD = build()
        with torch.no_grad():
            for _ in range(3):
                RD(torch.randn(2, 2, 1024) * 0.3)
        RD.eval()
        src = _save_ckpt(RD, tmp_path, "d_snorm_src.ckpt")
        tree = load_torch_discriminator(src, 16, 32)
        assert tree.get("spectral")
        back = str(tmp_path / "d_snorm_back.ckpt")
        export_torch_discriminator(tree, back, 16, 32)
        RD2 = build()
        RD2.load_state_dict(torch.load(back)["state_dict"], strict=True)
        RD2.eval()
        x = torch.from_numpy(
            np.random.RandomState(17).randn(3, 2, 1024).astype(np.float32)
            * 0.3)
        with torch.no_grad():
            y1, _ = RD(x)
            y2, _ = RD2(x)
        np.testing.assert_allclose(y2.numpy(), y1.numpy(), atol=1e-6)
