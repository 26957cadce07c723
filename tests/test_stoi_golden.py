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
