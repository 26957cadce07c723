"""Metric golden-parity tests: our SSNR/WSS/LLR/Composite vs the actual reference
implementation (/root/reference/segan/utils.py), imported with stubs for its
unavailable deps (numba, soundfile, librosa, torch-pesq chain)."""
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def ref_utils():
    """Import the reference segan/utils.py with missing third-party deps stubbed."""
    for name in ("numba", "soundfile", "librosa"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "numba":
                mod.jit = lambda *a, **k: (lambda f: f)
                mod.int32 = mod.float32 = None
            sys.modules[name] = mod
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_segan_utils", "/root/reference/segan/utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def speechlike(n=8000, seed=0):
    """Synthetic speech-like signal: sum of harmonics with noise + envelope."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.3 * t)
    sig = sum((0.4 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / 16000.0)
              for k in range(1, 6))
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.1 * t))
    return (sig * env + 0.01 * rng.randn(n)).astype(np.float32)


class TestMetricParity:
    def test_ssnr_matches_reference(self, ref_utils):
        from segan_pytorch_tpu.metrics import SSNR

        ref = speechlike(seed=1)
        deg = ref + 0.05 * np.random.RandomState(2).randn(ref.shape[0]).astype("f")
        o_ref, seg_ref = ref_utils.SSNR(ref, deg)
        o_my, seg_my = SSNR(ref, deg)
        np.testing.assert_allclose(o_my, o_ref, rtol=1e-6)
        np.testing.assert_allclose(seg_my, seg_ref, rtol=1e-5)

    def test_wss_matches_reference(self, ref_utils):
        from segan_pytorch_tpu.metrics import wss

        ref = speechlike(seed=3)
        deg = ref + 0.08 * np.random.RandomState(4).randn(ref.shape[0]).astype("f")
        w_ref = ref_utils.wss(ref, deg, 16000)
        w_my = wss(ref, deg, 16000)
        np.testing.assert_allclose(w_my, w_ref, rtol=1e-4)

    def test_llr_matches_reference(self, ref_utils):
        from segan_pytorch_tpu.metrics import llr

        ref = speechlike(seed=5)
        deg = ref + 0.08 * np.random.RandomState(6).randn(ref.shape[0]).astype("f")
        l_ref = ref_utils.llr(ref, deg, 16000)
        l_my = llr(ref, deg, 16000)
        np.testing.assert_allclose(l_my, l_ref, rtol=1e-3, atol=1e-5)

    def test_lpcoeff_matches_reference(self, ref_utils):
        from segan_pytorch_tpu.metrics import lpcoeff

        frame = speechlike(n=480, seed=7).astype(np.float64)
        a_ref = ref_utils.lpcoeff(frame, 16)
        a_my = lpcoeff(frame, 16)
        for x, y in zip(a_my, a_ref):
            np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-5)

    def test_composite_matches_reference_sans_pesq(self, ref_utils, monkeypatch):
        """CompositeEval parity with PESQ pinned (no pesqmain binary in either)."""
        from segan_pytorch_tpu.metrics import composite as comp

        ref = speechlike(seed=8)
        deg = ref + 0.06 * np.random.RandomState(9).randn(ref.shape[0]).astype("f")
        monkeypatch.setattr(ref_utils, "PESQ", lambda a, b: "2.5")
        monkeypatch.setattr(comp, "PESQ", lambda a, b: 2.5)
        r = ref_utils.CompositeEval(ref, deg, True)
        m = comp.CompositeEval(ref, deg, True)
        np.testing.assert_allclose(m, r, rtol=1e-4)

    def test_composite_finite_with_silent_pauses(self, monkeypatch):
        """Digitally-silent frames (exact zeros, e.g. the v2 demo corpus's
        pauses) make Levinson–Durbin divide 0/0 inside llr; CompositeEval must
        drop those frames instead of returning NaN Csig/Covl (found live on the
        r4 v2 quality campaign)."""
        from segan_pytorch_tpu.metrics import composite as comp

        ref = speechlike(seed=11)
        deg = ref + 0.06 * np.random.RandomState(12).randn(ref.shape[0]).astype("f")
        # a full silent region spanning many 30 ms frames in BOTH signals
        ref[2000:12000] = 0.0
        deg[2000:12000] = 0.0
        monkeypatch.setattr(comp, "PESQ", lambda a, b: 2.5)
        vals = comp.CompositeEval(ref, deg, True)
        assert all(np.isfinite(v) for v in vals), vals


class TestSTOI:
    def test_stoi_sane_ordering(self):
        from segan_pytorch_tpu.metrics import stoi

        clean = speechlike(n=32000, seed=10)
        rng = np.random.RandomState(11)
        slightly = clean + 0.02 * rng.randn(clean.shape[0]).astype("f")
        very = clean + 0.5 * rng.randn(clean.shape[0]).astype("f")
        s_self = stoi(clean, clean, 16000)
        s_slight = stoi(clean, slightly, 16000)
        s_noisy = stoi(clean, very, 16000)
        assert s_self > 0.99
        assert s_self >= s_slight > s_noisy


class TestPesqLike:
    """The P.862-structured approximation backend (metrics/perceptual.py): the contract
    is monotonicity with distortion on the MOS scale, not certified-PESQ equality."""

    def _speechlike_broadband(self, n=32000, seed=0):
        from scipy.signal import butter, lfilter

        rng = np.random.RandomState(seed)
        t = np.arange(n) / 16000.0
        f0 = 120 + 30 * np.sin(2 * np.pi * 2.3 * t)
        voiced = sum((0.4 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / 16000.0)
                     for k in range(1, 6))
        fric = rng.randn(n) * (np.sin(2 * np.pi * 1.7 * t) > 0.6) * 0.15
        b, a = butter(4, [3000 / 8000, 7000 / 8000], btype="band")
        fric = lfilter(b, a, fric)
        return ((voiced * 0.5 * (1 + np.sin(2 * np.pi * 3.1 * t))) + fric
                ).astype(np.float32)

    def test_monotone_in_snr(self):
        from segan_pytorch_tpu.metrics.perceptual import pesq_like

        clean = self._speechlike_broadband()
        rng = np.random.RandomState(1)
        scores = []
        for snr_db in [40, 20, 10, 0]:
            sigma = np.sqrt(np.mean(clean**2) / 10 ** (snr_db / 10))
            scores.append(pesq_like(clean, clean + sigma * rng.randn(len(clean))))
        assert scores == sorted(scores, reverse=True), scores
        assert scores[0] > 4.0       # nearly clean
        assert scores[-1] < 2.0      # heavily corrupted

    def test_identity_and_gain_invariance(self):
        from segan_pytorch_tpu.metrics.perceptual import pesq_like

        clean = self._speechlike_broadband(seed=2)
        assert pesq_like(clean, clean) > 4.5
        assert pesq_like(clean, 0.5 * clean) > 4.5  # level-aligned

    def test_silence_and_filtering_penalized(self):
        from scipy.signal import butter, lfilter

        from segan_pytorch_tpu.metrics.perceptual import pesq_like

        clean = self._speechlike_broadband(seed=3)
        self_score = pesq_like(clean, clean)
        # omissions are penalized less than additions (P.862 asymmetry principle),
        # but silence must still lose clearly to the clean signal
        assert pesq_like(clean, np.zeros_like(clean)) < self_score - 1.5
        b, a = butter(4, 1000 / 8000)
        assert pesq_like(clean, lfilter(b, a, clean)) < self_score - 0.3

    def test_backend_chain_reaches_approx(self, monkeypatch):
        """With no pesqmain/python-pesq, PESQ() falls through to the approximation."""
        from segan_pytorch_tpu.metrics import pesq as pesq_mod

        monkeypatch.setenv("SEGAN_TPU_PESQ", "auto")
        clean = self._speechlike_broadband(seed=4)
        v = pesq_mod.PESQ(clean, clean)
        assert v is not None and v > 4.0
        monkeypatch.setenv("SEGAN_TPU_PESQ", "strict")
        pesq_mod._WARNED = False
        assert pesq_mod.PESQ(clean, clean) is None  # strict mode: no fake values


class TestSilentEdges:
    """VERDICT r4 weak-6: silent frames/utterances must be scored warning-free —
    the guards sit BEFORE the divides (metrics/composite.py llr/SSNR), and
    non-finite frame distortions are dropped by the trimmed mean."""

    def test_half_silent_utterance_warning_free(self):
        import warnings
        from segan_pytorch_tpu.metrics.composite import CompositeEval

        t = np.arange(16384) / 16000.0
        clean = np.sin(2 * np.pi * 300 * t).astype(np.float32)
        clean[:8192] = 0.0  # leading digital silence -> silent LLR frames
        noisy = clean + 0.01 * np.random.RandomState(0).randn(16384).astype(np.float32)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            csig, cbak, covl = CompositeEval(clean, noisy, pesq_value=2.0)
        assert np.isfinite(csig) and np.isfinite(cbak) and np.isfinite(covl)

    def test_all_silent_utterance_warning_free(self):
        import warnings
        from segan_pytorch_tpu.metrics.composite import CompositeEval, SSNR

        z = np.zeros(16384, np.float32)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            CompositeEval(z, z, pesq_value=1.0)  # degenerate but must not warn
            snr, seg = SSNR(z, z, 16000)
        assert snr == -np.inf  # log10(0): the reference's unguarded value
        assert np.all(np.isfinite(seg))

    def test_silent_guard_is_noop_on_wellconditioned_input(self):
        """The guards must not change scores on inputs whose LPC frames are
        well-conditioned (num/den > 0 everywhere): broadband noise. Ill-
        conditioned frames (den < 0 from the float32 Levinson–Durbin) are nan
        in the reference too — both get dropped by the trimmed-mean filter."""
        import warnings
        from segan_pytorch_tpu.metrics.composite import llr

        rng = np.random.RandomState(1)
        clean = rng.randn(16384).astype(np.float32)
        noisy = clean + 0.1 * rng.randn(16384).astype(np.float32)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            d = llr(clean, noisy, 16000)
        assert np.all(np.isfinite(d))  # no frame tripped a guard
