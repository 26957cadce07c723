"""End-to-end test of tools/ab_parity.py: a reference-built torch generator + a
synthetic corpus must flow through the harness, produce the BASELINE.md metric
rows, and show waveform-level A/B parity between this framework's inference and
the ACTUAL reference torch inference loop with the same checkpoint."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("abparity")
    from scipy.io import wavfile

    rng = np.random.RandomState(0)
    (d / "clean").mkdir()
    (d / "noisy").mkdir()
    n = 32000  # 2 s
    t = np.arange(n) / 16000.0
    for i in range(2):
        env = np.clip(np.sin(2 * np.pi * (2.0 + i) * t) + 0.3, 0, None)
        c = (env * np.sin(2 * np.pi * (180 + 40 * i) * t) * 0.4
             + 0.005 * rng.randn(n)).astype(np.float32)
        nz = c + 0.08 * rng.randn(n).astype(np.float32)
        wavfile.write(str(d / "clean" / f"u{i}.wav"), 16000,
                      (np.clip(c, -1, 1) * 32767).astype(np.int16))
        wavfile.write(str(d / "noisy" / f"u{i}.wav"), 16000,
                      (np.clip(nz, -1, 1) * 32767).astype(np.int16))
    return d


def _make_ref_ckpt_and_cfg(tmp_path):
    """Build the ACTUAL reference torch Generator at a tiny config and dump a
    matching train.opts."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from ab_parity import load_reference_torch_generator

    from segan_pytorch_tpu.utils.config import SEGANConfig

    cfg = SEGANConfig(slice_size=4096, genc_fmaps=[8, 16], genc_poolings=[4, 4],
                      gkwidth=31, z_dim=16, denc_fmaps=[8, 16],
                      denc_poolings=[4, 4], dpool_slen=256,
                      save_path=str(tmp_path))
    cfg.bias = True
    cfg_file = os.path.join(str(tmp_path), "train.opts")
    with open(cfg_file, "w") as f:
        f.write(cfg.to_json())
    # build the torch reference generator with random weights and save its ckpt
    ckpt = os.path.join(str(tmp_path), "ref_g.ckpt")
    # load_reference_torch_generator needs an existing ckpt; create from a
    # freshly-constructed module first
    import importlib.util
    import types

    for name in ("numba", "soundfile", "librosa", "tensorboardX",
                 "ahoproc_tools", "ahoproc_tools.io", "ahoproc_tools.interpolate"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "numba":
                mod.jit = lambda *a, **k: (lambda f: f)
                mod.int32 = mod.float32 = None
            if name == "tensorboardX":
                mod.SummaryWriter = object
            sys.modules[name] = mod
    sys.path.insert(0, "/root/reference/segan/models")
    spec = importlib.util.spec_from_file_location(
        "ref_generator_mk", "/root/reference/segan/models/generator.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules["ref_generator_mk"] = m
    spec.loader.exec_module(m)
    RG = m.Generator(1, [8, 16], 31, [4, 4], z_dim=16, skip=True, bias=True,
                     skip_init="one", skip_type="alpha", norm_type=None,
                     skip_merge="concat", skip_kwidth=11)
    torch.save({"state_dict": RG.state_dict()}, ckpt)
    del load_reference_torch_generator
    return ckpt, cfg_file


class TestABParityHarness:
    @pytest.mark.slow
    def test_end_to_end_with_reference_torch_model(self, corpus, tmp_path):
        ckpt, cfg_file = _make_ref_ckpt_and_cfg(tmp_path)
        out = str(tmp_path / "report.json")
        env = dict(os.environ, SEGAN_TPU_PLATFORM="cpu", PYTHONPATH=ROOT)
        r = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "ab_parity.py"),
             "--g_ckpt", ckpt, "--cfg_file", cfg_file,
             "--clean_test", str(corpus / "clean"),
             "--noisy_test", str(corpus / "noisy"),
             "--ab_torch", "--out", out],
            capture_output=True, text=True, cwd=ROOT, timeout=540, env=env)
        assert r.returncode == 0, r.stderr[-3000:]
        with open(out) as f:
            rep = json.load(f)
        assert rep["n_files"] == 2
        for system in ("noisy", "enh", "enh_torch"):
            m = rep["means"][system]
            for k in ("pesq", "stoi", "csig", "cbak", "covl", "ssnr"):
                assert np.isfinite(m[k]), (system, k, m)
        # waveform A/B: our inference vs the reference torch loop, same ckpt+z
        assert rep["ab"]["max_sample_diff"] < 5e-4, rep["ab"]
        assert rep["ab"]["mean_diff_snr_db"] > 55, rep["ab"]
        # identical pipelines must score identically at metric precision
        for k in ("pesq", "stoi", "covl"):
            assert abs(rep["means"]["enh"][k]
                       - rep["means"]["enh_torch"][k]) < 0.02, k
        assert "BASELINE.md rows" in r.stdout
