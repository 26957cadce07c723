"""STOI golden tests.

`_matlab_stoi` below is an INDEPENDENT, literal, loop-for-loop transliteration of the
reference MATLAB implementation (/root/reference/utils/stoi.m:1-188) — deliberately
written in the .m file's own style (per-frame loops, per-band loops, 1-based-style
indexing arithmetic) rather than sharing any code with the production implementation
in segan_pytorch_tpu/metrics/stoi.py.  Agreement between the two on fixed vectors
pins the production code to the MATLAB semantics; the literal golden values pinned at
the bottom catch silent regressions in either.

(The only shared dependency is scipy's resample_poly for the 16 kHz -> 10 kHz
conversion; MATLAB's `resample` default — Kaiser beta=5, n=10 polyphase design —
matches scipy's resample_poly defaults.)
"""
import numpy as np
import pytest

from segan_pytorch_tpu.metrics.stoi import stoi

pytestmark = pytest.mark.quick


def _ml_hanning(n):
    # MATLAB hanning(N): symmetric Hann without the zero endpoints
    k = np.arange(1, n + 1)
    return 0.5 * (1 - np.cos(2 * np.pi * k / (n + 1)))


def _ml_thirdoct(fs, n_fft, num_bands, mn):
    # stoi.m:88-121
    f = np.linspace(0, fs, n_fft + 1)
    f = f[: n_fft // 2 + 1]
    k = np.arange(num_bands)
    cf = 2.0 ** (k / 3.0) * mn
    fl = np.sqrt((2.0 ** (k / 3.0) * mn) * 2.0 ** ((k - 1) / 3.0) * mn)
    fr = np.sqrt((2.0 ** (k / 3.0) * mn) * 2.0 ** ((k + 1) / 3.0) * mn)
    A = np.zeros((num_bands, len(f)))
    for i in range(len(cf)):
        b = int(np.argmin((f - fl[i]) ** 2))
        fl_ii = b
        b = int(np.argmin((f - fr[i]) ** 2))
        fr_ii = b
        A[i, fl_ii:fr_ii] = 1  # MATLAB fl_ii:(fr_ii-1), 1-based
    return A, cf


def _ml_stdft(x, N, K, n_fft):
    # stoi.m:124-139: frames = 1:K:(length(x)-N)
    frames = list(range(0, len(x) - N, K))
    out = np.zeros((len(frames), n_fft), complex)
    w = _ml_hanning(N)
    for i, s in enumerate(frames):
        out[i, :] = np.fft.fft(x[s:s + N] * w, n_fft)
    return out


def _ml_remove_silent(x, y, rng, N, K):
    # stoi.m:142-178
    frames = list(range(0, len(x) - N, K))
    w = _ml_hanning(N)
    msk = np.zeros(len(frames))
    for j, s in enumerate(frames):
        msk[j] = 20 * np.log10(np.linalg.norm(x[s:s + N] * w) / np.sqrt(N))
    msk = (msk - np.max(msk) + rng) > 0
    count = 0
    x_sil = np.zeros(len(x))
    y_sil = np.zeros(len(y))
    last_end = 0
    for j, s in enumerate(frames):
        if msk[j]:
            o = frames[count]
            x_sil[o:o + N] += x[s:s + N] * w
            y_sil[o:o + N] += y[s:s + N] * w
            last_end = o + N
            count += 1
    return x_sil[:last_end], y_sil[:last_end]


def _matlab_stoi(x, y, fs_signal):
    # stoi.m:1-85, literal
    assert len(x) == len(y)
    fs, N_frame, K, J, mn = 10000, 256, 512, 15, 150
    N, Beta, dyn_range = 30, -15.0, 40
    H, _ = _ml_thirdoct(fs, K, J, mn)
    if fs_signal != fs:
        from scipy.signal import resample_poly

        x = resample_poly(x, fs, fs_signal)
        y = resample_poly(y, fs, fs_signal)
    x, y = _ml_remove_silent(x, y, dyn_range, N_frame, N_frame // 2)
    x_hat = _ml_stdft(x, N_frame, N_frame // 2, K)[:, : K // 2 + 1].T
    y_hat = _ml_stdft(y, N_frame, N_frame // 2, K)[:, : K // 2 + 1].T
    X = np.zeros((J, x_hat.shape[1]))
    Y = np.zeros((J, y_hat.shape[1]))
    for i in range(x_hat.shape[1]):
        X[:, i] = np.sqrt(H @ np.abs(x_hat[:, i]) ** 2)
        Y[:, i] = np.sqrt(H @ np.abs(y_hat[:, i]) ** 2)
    c = 10 ** (-Beta / 20)
    d_interm = np.zeros((J, X.shape[1] - N + 1))
    for m in range(N, X.shape[1] + 1):
        X_seg = X[:, m - N:m]
        Y_seg = Y[:, m - N:m]
        alpha = np.sqrt(np.sum(X_seg ** 2, axis=1) / np.sum(Y_seg ** 2, axis=1))
        aY_seg = Y_seg * alpha[:, None]
        for j in range(J):
            Y_prime = np.minimum(aY_seg[j, :], X_seg[j, :] + X_seg[j, :] * c)
            xn = X_seg[j, :] - np.mean(X_seg[j, :])
            xn = xn / np.sqrt(np.sum(xn ** 2))
            yn = Y_prime - np.mean(Y_prime)
            yn = yn / np.sqrt(np.sum(yn ** 2))
            d_interm[j, m - N] = np.sum(xn * yn)
    return float(np.mean(d_interm))


def _speechlike(n, seed, fs=10000):
    """Amplitude-modulated multi-tone + noise with a silent gap (exercises the
    silent-frame removal path)."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / fs
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.1 * t))
    sig = env * (np.sin(2 * np.pi * 317 * t) + 0.5 * np.sin(2 * np.pi * 731 * t)
                 + 0.25 * np.sin(2 * np.pi * 1907 * t))
    sig += 0.02 * rng.randn(n)
    sig[n // 3: n // 3 + fs // 5] *= 1e-4  # silent gap
    return sig.astype(np.float64)


class TestSTOIGolden:
    @pytest.mark.parametrize("seed,snr", [(0, 0.2), (1, 0.05), (2, 0.6)])
    def test_matches_matlab_transliteration_10k(self, seed, snr):
        clean = _speechlike(30000, seed)
        noisy = clean + snr * np.random.RandomState(100 + seed).randn(len(clean))
        ours = stoi(clean, noisy, fs_sig=10000)
        ml = _matlab_stoi(clean, noisy, 10000)
        np.testing.assert_allclose(ours, ml, atol=1e-10)

    def test_matches_matlab_transliteration_16k_resample_path(self):
        clean = _speechlike(48000, 3, fs=16000)
        noisy = clean + 0.15 * np.random.RandomState(7).randn(len(clean))
        ours = stoi(clean, noisy, fs_sig=16000)
        ml = _matlab_stoi(clean, noisy, 16000)
        np.testing.assert_allclose(ours, ml, atol=1e-10)

    def test_pinned_golden_values(self):
        """Literal regression pins (computed from the transliteration above)."""
        clean = _speechlike(30000, 0)
        noisy = clean + 0.2 * np.random.RandomState(100).randn(len(clean))
        assert abs(stoi(clean, noisy, fs_sig=10000) - GOLDEN_10K) < 1e-6
        assert abs(stoi(clean, clean, fs_sig=10000) - GOLDEN_SELF) < 1e-6

    def test_ordering_sanity(self):
        clean = _speechlike(30000, 5)
        light = clean + 0.05 * np.random.RandomState(8).randn(len(clean))
        heavy = clean + 0.8 * np.random.RandomState(9).randn(len(clean))
        assert stoi(clean, clean, 10000) > stoi(clean, light, 10000) > \
            stoi(clean, heavy, 10000)


# pinned from _matlab_stoi on the fixed vectors above; regenerate by running the
# transliteration directly if the fixtures ever change
GOLDEN_10K = 0.36949296363877726
GOLDEN_SELF = 1.0


class TestSTOIPaperProperties:
    """Implementation-INDEPENDENT checks derived from the STOI paper
    (Taal et al., IEEE TASLP 2011) rather than from stoi.m — a guard against a
    shared misreading of the MATLAB source reproduced in both the production
    code and the transliteration above.

    Paper facts exercised:
    - eq. (2)-(5): the intermediate measure is a CORRELATION of a
      clean-energy-normalized, clipped degraded segment -> invariant to any
      positive rescaling of either input (alpha absorbs it; the clip bound
      scales with the clean segment; silent-frame masking is relative to the
      per-signal max).
    - d(x, x) = 1 exactly (perfect correlation in every band/segment).
    - an uncorrelated degraded signal gives d near 0 (correlations of
      independent sequences concentrate around zero).
    - the 1/3-octave filterbank: 15 bands, center frequencies
      cf(k) = 2^(k/3)*150 Hz, band edges at sqrt(cf(k-1)*cf(k)) — bands must
      tile the spectrum contiguously (no gaps, no overlaps) and each FFT bin
      must land in the band whose [fl, fr) interval contains it (to argmin
      rounding of half a bin).
    """

    def test_scale_invariance_both_signals(self):
        clean = _speechlike(30000, 11)
        noisy = clean + 0.2 * np.random.RandomState(42).randn(len(clean))
        base = stoi(clean, noisy, fs_sig=10000)
        for a in (1e-3, 0.5, 7.0, 1e3):
            np.testing.assert_allclose(stoi(clean, a * noisy, 10000), base,
                                       atol=1e-12)
            np.testing.assert_allclose(stoi(a * clean, a * noisy, 10000), base,
                                       atol=1e-12)
        # clean-only rescale: the silent-frame mask and clip bound both track
        # the clean signal, so this too is exactly invariant
        np.testing.assert_allclose(stoi(3.0 * clean, noisy, 10000), base,
                                   atol=1e-12)

    def test_identity_is_exactly_one(self):
        for seed in (0, 4, 9):
            x = _speechlike(25000, seed)
            assert stoi(x, x, 10000) == pytest.approx(1.0, abs=1e-12)

    def test_uncorrelated_noise_scores_near_zero(self):
        clean = _speechlike(40000, 13)
        pure_noise = np.random.RandomState(77).randn(len(clean))
        d = stoi(clean, pure_noise, 10000)
        assert abs(d) < 0.25, d  # uncorrelated -> correlations average to ~0
        # and far below even heavily degraded speech
        heavy = clean + 1.0 * np.random.RandomState(78).randn(len(clean))
        assert d < stoi(clean, heavy, 10000)

    def test_thirdoct_band_structure(self):
        """The band matrix checked against the PAPER's filterbank definition,
        not against stoi.m's indexing idiom."""
        from segan_pytorch_tpu.metrics.stoi import _thirdoct, FS, NFFT, \
            NUM_BANDS, MIN_FREQ

        A, cf = _thirdoct(FS, NFFT, NUM_BANDS, MIN_FREQ)
        f = np.linspace(0, FS, NFFT + 1)[: NFFT // 2 + 1]
        k = np.arange(NUM_BANDS)
        np.testing.assert_allclose(cf, 2.0 ** (k / 3.0) * MIN_FREQ)
        # geometric band edges from the paper
        fl = np.sqrt(cf * np.concatenate(([cf[0] / 2 ** (1 / 3)], cf[:-1])))
        fr = np.sqrt(cf * np.concatenate((cf[1:], [cf[-1] * 2 ** (1 / 3)])))
        # bands tile contiguously: no bin in two bands, no gap inside the
        # covered range
        colsum = A.sum(axis=0)
        assert colsum.max() == 1.0
        covered = np.where(colsum > 0)[0]
        assert np.array_equal(covered,
                              np.arange(covered[0], covered[-1] + 1))
        # every selected bin sits inside its band's [fl, fr) interval to
        # within half-a-bin argmin rounding
        half_bin = (f[1] - f[0]) / 2
        for i in range(NUM_BANDS):
            bins = np.where(A[i] > 0)[0]
            assert bins.size > 0
            assert f[bins[0]] >= fl[i] - half_bin
            assert f[bins[-1]] < fr[i] + half_bin
            # and contiguous within the band
            assert np.array_equal(bins, np.arange(bins[0], bins[-1] + 1))

    def test_monotone_under_rising_noise(self):
        clean = _speechlike(30000, 21)
        rng = np.random.RandomState(5)
        noise = rng.randn(len(clean))
        scores = [stoi(clean, clean + s * noise, 10000)
                  for s in (0.0, 0.05, 0.15, 0.4, 1.0)]
        assert all(a > b for a, b in zip(scores, scores[1:])), scores


class TestDiagnosticSurface:
    """The VERDICT-r3-#3 diagnosis hooks: per-band profile and VAD override."""

    def test_band_profile_mean_equals_stoi(self):
        from segan_pytorch_tpu.metrics.stoi import stoi_band_profile
        from segan_pytorch_tpu.metrics.stoi import NUM_BANDS, MIN_FREQ

        clean = _speechlike(30000, 3)
        rng = np.random.RandomState(9)
        deg = clean + 0.2 * rng.randn(len(clean))
        cf, per_band = stoi_band_profile(clean, deg, 10000)
        assert per_band.shape == (NUM_BANDS,)
        k = np.arange(NUM_BANDS)
        np.testing.assert_allclose(cf, 2.0 ** (k / 3.0) * MIN_FREQ)
        # stoi() is exactly the band-profile mean (same inner computation)
        np.testing.assert_allclose(float(per_band.mean()),
                                   stoi(clean, deg, 10000), rtol=1e-12)

    def test_band_profile_localizes_floor_suppression(self):
        """The demo-corpus STOI-regression mechanism in miniature: when the
        'clean' reference carries an incompressible noise floor, that floor is
        the ONLY content of bands outside the voiced harmonics — an enhancer
        that (correctly) suppresses it zeroes those bands' envelopes and their
        correlation collapses, dragging the STOI mean down even though the
        voiced band is reproduced perfectly. The band profile must localize
        the damage: voiced band high, floor-only bands low."""
        from segan_pytorch_tpu.metrics.stoi import stoi_band_profile

        rng = np.random.RandomState(4)
        n = 40000
        t = np.arange(n) / 10000.0
        env = np.clip(np.sin(2 * np.pi * 2.5 * t), 0.0, None)
        voiced = np.sin(2 * np.pi * 311 * t) * env
        floor = 0.012 * rng.randn(n)        # ~-35 dB re peak, all bands
        clean = voiced + floor
        enh = voiced.copy()                  # perfect speech, floor suppressed
        cf, prof = stoi_band_profile(clean, enh, 10000)
        voiced_band = int(np.argmin(np.abs(cf - 311.0)))
        assert prof[voiced_band] > 0.9, prof[voiced_band]
        others = np.delete(prof, voiced_band)
        assert np.nanmean(others) < 0.4, others
        # and the scalar STOI is dragged down by exactly those bands
        assert stoi(clean, enh, 10000) < 0.5

    def test_dyn_range_is_honored(self):
        """Stricter VAD keeps fewer frames: craft a signal with a -30 dB tail
        section — inside the 40 dB range, outside a 20 dB one — so the two
        settings must score differently."""
        rng = np.random.RandomState(11)
        loud = _speechlike(20000, 13)
        quiet = 0.03 * _speechlike(20000, 14)        # ~-30 dB re loud
        clean = np.concatenate([loud, quiet])
        deg = clean + 0.05 * rng.randn(len(clean))
        s40 = stoi(clean, deg, 10000)
        s20 = stoi(clean, deg, 10000, dyn_range=20)
        assert not np.isclose(s40, s20), (s40, s20)
        # the quiet tail is noisier relative to its level: excluding it helps
        assert s20 > s40, (s20, s40)
