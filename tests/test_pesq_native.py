"""Native P.862 pipeline tests (native/pesq862.cpp via metrics/pesq_native.py).

No certified PESQ oracle exists in this environment, so these pin the pipeline's
PROPERTIES (the certified-vector comparison lives in tests/golden/pesq_golden.json,
produced by tools/pesq_validate.py wherever a pesqmain binary is available — the
golden test below activates automatically once that file exists):
- exact self-score: identical signals -> raw 4.5 -> WB MOS-LQO 4.644
- monotonic degradation with additive-noise level, values in the plausible
  certified range at each anchor SNR
- invariance to global gain (level alignment) and small constant delay
  (time alignment)
- NB mode functional with the P.862.1 mapping
"""
import json
import os

import numpy as np
import pytest

from segan_pytorch_tpu.metrics.pesq_native import pesq_native, get_lib

pytestmark = [
    pytest.mark.skipif(get_lib() is None,
                       reason="native pesq862 lib unavailable (no g++?)"),
    pytest.mark.quick,
]

FS = 16000


def speech_like(seconds=3.0, seed=0):
    rng = np.random.RandomState(seed)
    n = int(FS * seconds)
    t = np.arange(n) / FS
    env = np.clip(np.sin(2 * np.pi * 2.2 * t) + 0.3, 0, None)
    f0 = 120 + 20 * np.sin(2 * np.pi * 0.5 * t)
    ph = 2 * np.pi * np.cumsum(f0) / FS
    sig = sum(np.exp(-(k / 8.0)) * np.sin(k * ph) for k in range(1, 25))
    return (env * sig * 0.12 + 0.001 * rng.randn(n)).astype(np.float32)


def with_noise(clean, snr_db, seed=7):
    rng = np.random.RandomState(seed)
    nse = rng.randn(len(clean)).astype(np.float32)
    nse *= np.sqrt(np.mean(clean ** 2) / np.mean(nse ** 2)) * 10 ** (-snr_db / 20)
    return clean + nse


class TestNativePESQ:
    def test_identical_signals_score_max(self):
        clean = speech_like()
        mos, raw = pesq_native(clean, clean, FS, wb=True, return_raw=True)
        assert raw == pytest.approx(4.5, abs=1e-9)
        assert mos == pytest.approx(4.6438887, abs=1e-4)

    def test_monotonic_in_snr_and_plausible_range(self):
        clean = speech_like()
        scores = [pesq_native(clean, with_noise(clean, snr), FS)
                  for snr in (40, 30, 20, 10, 0)]
        assert all(a > b for a, b in zip(scores, scores[1:])), scores
        assert 4.0 < scores[0] <= 4.65          # 40 dB: near-transparent
        assert 2.3 < scores[2] < 3.5, scores    # 20 dB
        assert 1.0 <= scores[4] < 2.0, scores   # 0 dB: bad

    def test_gain_invariance(self):
        clean = speech_like(seed=1)
        assert pesq_native(clean, 0.3 * clean, FS) == pytest.approx(4.6439, abs=1e-3)
        assert pesq_native(clean, 2.5 * clean, FS) == pytest.approx(4.6439, abs=1e-3)

    def test_delay_invariance(self):
        clean = speech_like(seed=2)
        deg = np.concatenate([np.zeros(800, np.float32), clean])[: len(clean)]
        assert pesq_native(clean, deg, FS) > 4.5

    def test_nb_mode(self):
        clean = speech_like(seed=3)
        mos = pesq_native(clean, with_noise(clean, 15), FS, wb=False)
        assert mos is not None and 1.0 <= mos <= 4.6

    def test_enhancement_ordering(self):
        """Enhanced (partial noise removal) must score between noisy and clean."""
        clean = speech_like(seed=4)
        noisy = with_noise(clean, 8)
        partially = clean + 0.3 * (noisy - clean)
        s_noisy = pesq_native(clean, noisy, FS)
        s_enh = pesq_native(clean, partially, FS)
        assert s_enh > s_noisy + 0.3

    def test_invalid_inputs(self):
        clean = speech_like()
        assert pesq_native(clean[:100], clean[:100], FS) is None
        assert pesq_native(np.zeros(FS, np.float32), clean[:FS], FS) is None


class TestAdversarialProperties:
    """Adversarial self-validation needing no external binary (VERDICT r2 #3):
    invariances the certified algorithm provably has, checked at tight
    tolerances, plus the piecewise-variable-delay case the iterative
    utterance-splitting realignment exists for."""

    def test_level_shift_invariance_pm3db(self):
        """±3 dB level shifts are removed by the fixed-level alignment stage."""
        clean = speech_like(seed=11)
        noisy = with_noise(clean, 15)
        base = pesq_native(clean, noisy, FS)
        for db in (-3.0, 3.0):
            g = 10 ** (db / 20)
            assert pesq_native(clean, g * noisy, FS) == pytest.approx(
                base, abs=0.02), db
            assert pesq_native(g * clean, noisy, FS) == pytest.approx(
                base, abs=0.05), db

    def test_constant_delay_invariance_with_noise(self):
        """Same noisy signal, ±N-sample constant delay: score must not move."""
        clean = speech_like(seed=12)
        noisy = with_noise(clean, 12)
        base = pesq_native(clean, noisy, FS)
        for shift in (160, 480, -320):
            if shift > 0:
                deg = np.concatenate([np.zeros(shift, np.float32), noisy])
            else:
                deg = noisy[-shift:]
            assert pesq_native(clean, deg, FS) == pytest.approx(
                base, abs=0.1), shift

    def test_piecewise_variable_delay_realignment(self):
        """A degraded signal whose delay CHANGES mid-signal (first half +240,
        second half -240 samples) must score near the zero-delay score — the
        iterative utterance-splitting realignment recovers both delays; a
        constant-delay-only aligner mis-aligns half the signal and collapses
        the score."""
        clean = speech_like(seconds=4.0, seed=13)
        noisy = with_noise(clean, 20)
        h = len(noisy) // 2
        d1, d2 = 240, -240
        first = np.concatenate([np.zeros(d1, np.float32), noisy[:h]])[:h]
        second = noisy[h - d2:]
        deg = np.concatenate([first, second])[: len(clean)]
        base = pesq_native(clean, noisy, FS)
        split_score = pesq_native(clean, deg, FS)
        # a 240-sample (15 ms) misalignment of half the signal costs >1 MOS
        # when unhandled; require the splitter to recover most of it
        assert split_score > base - 0.35, (split_score, base)

    def test_silence_padding_invariance(self):
        """Leading/trailing silence on the degraded side only shifts alignment,
        not the score."""
        clean = speech_like(seed=14)
        noisy = with_noise(clean, 15)
        base = pesq_native(clean, noisy, FS)
        padded = np.concatenate([np.zeros(1600, np.float32), noisy,
                                 np.zeros(1600, np.float32)])
        assert pesq_native(clean, padded, FS) == pytest.approx(base, abs=0.1)

    def test_self_score_is_the_ceiling(self):
        """No degraded signal may out-score the identical pair."""
        clean = speech_like(seed=15)
        ceiling = pesq_native(clean, clean, FS)
        for snr in (40, 20, 5):
            assert pesq_native(clean, with_noise(clean, snr), FS) <= ceiling


class TestGoldenVectors:
    """Activates once tools/pesq_validate.py has produced certified golden
    vectors on a machine with pesqmain / python-pesq."""

    GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pesq_golden.json")

    @pytest.mark.skipif(not os.path.exists(GOLDEN),
                        reason="no certified golden vectors yet "
                               "(run tools/pesq_validate.py where pesqmain exists)")
    def test_matches_certified(self):
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        import pesq_validate as pv

        with open(self.GOLDEN) as f:
            golden = json.load(f)
        diffs = []
        for row in golden["rows"]:
            clean = pv.speech_like(3.0, row["seed"])
            deg = pv.degradations(clean, row["seed"])[row["cond"]]
            nat = pesq_native(clean, deg, golden["fs"], wb=True)
            diffs.append(abs(nat - row["certified"]))
        assert float(np.mean(diffs)) < 0.25, diffs  # MAE gate vs certified
