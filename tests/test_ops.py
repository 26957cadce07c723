"""Golden-parity tests of the conv/signal/stft ops against torch (CPU) and numpy."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segan_pytorch_tpu.ops import (
    conv1d,
    conv_transpose1d,
    reflect_pad_1d,
    normalize_wave_minmax,
    denormalize_wave_minmax,
    pre_emphasize,
    de_emphasize,
    de_emphasize_np,
    pre_emphasize_np,
    make_div_n,
    slice_signal_indices,
    stft_mag,
)
from segan_pytorch_tpu.ops.conv import conv_transpose1d_phased

pytestmark = pytest.mark.quick

torch = pytest.importorskip("torch")


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


class TestConv1d:
    @pytest.mark.parametrize("stride,L,k,cin,cout", [
        (4, 256, 31, 1, 8),
        (4, 1024, 31, 4, 16),
        (1, 200, 31, 3, 5),
        (2, 128, 5, 2, 4),
    ])
    def test_matches_torch(self, stride, L, k, cin, cout):
        x = _rand(2, L, cin)
        w = _rand(k, cin, cout, seed=1)
        b = _rand(cout, seed=2)
        y = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                              stride=stride))
        xt = torch.from_numpy(x.transpose(0, 2, 1))
        wt = torch.from_numpy(w.transpose(2, 1, 0).copy())
        yt = torch.nn.functional.conv1d(xt, wt, torch.from_numpy(b), stride=stride)
        np.testing.assert_allclose(y, yt.numpy().transpose(0, 2, 1), atol=2e-4)

    def test_strided_reflect_pad_length(self):
        # GConv1DBlock semantics: stride-4 conv maps L -> L/4 exactly (SURVEY §3.3)
        x = jnp.zeros((1, 16384, 1))
        xp = reflect_pad_1d(x, 31 // 2 - 1, 31 // 2)
        w = jnp.zeros((31, 1, 8))
        y = conv1d(xp, w, stride=4)
        assert y.shape == (1, 4096, 8)

    def test_dilated(self):
        x = _rand(1, 100, 2)
        w = _rand(5, 2, 3, seed=3)
        y = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), dilation=4))
        xt = torch.from_numpy(x.transpose(0, 2, 1))
        wt = torch.from_numpy(w.transpose(2, 1, 0).copy())
        yt = torch.nn.functional.conv1d(xt, wt, dilation=4)
        np.testing.assert_allclose(y, yt.numpy().transpose(0, 2, 1), atol=2e-4)


class TestConvTranspose1d:
    @pytest.mark.parametrize("stride,L,k,pad,cin,cout", [
        (4, 16, 31, 13, 8, 4),   # the SEGAN decoder config: pad = max(0,(4-31)//-2)=13
        (4, 64, 31, 13, 4, 2),
        (2, 32, 4, 1, 3, 5),
        (1, 20, 5, 2, 2, 2),
    ])
    def test_matches_torch(self, stride, L, k, pad, cin, cout):
        x = _rand(2, L, cin)
        w = _rand(k, cin, cout, seed=1)
        b = _rand(cout, seed=2)
        y = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                        stride=stride, padding=pad))
        xt = torch.from_numpy(x.transpose(0, 2, 1))
        # torch ConvTranspose1d weight layout (Cin, Cout, K)
        wt = torch.from_numpy(w.transpose(1, 2, 0).copy())
        yt = torch.nn.functional.conv_transpose1d(
            xt, wt, torch.from_numpy(b), stride=stride, padding=pad)
        np.testing.assert_allclose(y, yt.numpy().transpose(0, 2, 1), atol=2e-4)
        # deconv maps L -> stride*L + (k - 2p - stride); SEGAN trims 1 when k odd -> 4L
        if k == 31 and stride == 4 and pad == 13:
            assert y.shape[1] == 4 * L + 1

    @pytest.mark.parametrize("stride,L,k,pad", [(4, 16, 31, 13), (2, 32, 4, 1),
                                                (4, 10, 8, 2)])
    def test_phased_equals_dilated(self, stride, L, k, pad):
        x = _rand(1, L, 4)
        w = _rand(k, 4, 3, seed=5)
        y1 = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                         stride=stride, padding=pad))
        y2 = np.asarray(conv_transpose1d_phased(jnp.asarray(x), jnp.asarray(w),
                                                stride=stride, padding=pad))
        np.testing.assert_allclose(y1, y2, atol=2e-4)

    @pytest.mark.parametrize(
        "stride,L,k,pad,cin,cout,oblock",
        [
            (4, 16, 31, 13, 32, 16, 4),    # polyphase (oblock == stride)
            (4, 16, 31, 13, 32, 16, 8),
            (4, 64, 31, 13, 8, 1, 16),     # tiny-Cout edge layer
            (4, 64, 31, 13, 8, 1, None),   # auto oblock selection
            (4, 100, 31, 13, 8, 2, None),
            (2, 32, 4, 1, 4, 3, 2),
            (4, 10, 8, 2, 4, 3, 16),
            (4, 16, 4, 13, 4, 3, 4),   # 2*pad >> K: negative right block padding
        ],
    )
    def test_blocked_equals_dilated(self, stride, L, k, pad, cin, cout, oblock):
        from segan_pytorch_tpu.ops.conv import conv_transpose1d_blocked

        x = _rand(2, L, cin)
        w = _rand(k, cin, cout, seed=7)
        b = _rand(cout, seed=9).reshape(-1)
        y1 = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                         jnp.asarray(b), stride=stride, padding=pad))
        y2 = np.asarray(conv_transpose1d_blocked(jnp.asarray(x), jnp.asarray(w),
                                                 jnp.asarray(b), stride=stride,
                                                 padding=pad, oblock=oblock))
        assert y1.shape == y2.shape
        np.testing.assert_allclose(y1, y2, atol=2e-4)

    def test_blocked_gradients_match(self):
        from segan_pytorch_tpu.ops.conv import conv_transpose1d_blocked

        x = jnp.asarray(_rand(2, 16, 8))
        w = jnp.asarray(_rand(31, 8, 4, seed=3))

        def loss(fn, w):
            return jnp.sum(fn(x, w, stride=4, padding=13) ** 2)

        g1 = jax.grad(lambda w: loss(conv_transpose1d, w))(w)
        g2 = jax.grad(lambda w: loss(conv_transpose1d_blocked, w))(w)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-3)


class TestSignal:
    def test_normalize_int16_endpoints(self):
        # int16 PCM endpoints: -32768 -> -1, 32767 -> +1, 0 -> ~0 (ref se_dataset.py:108)
        x = np.array([-32768, 0, 32767], dtype=np.int64)
        y = np.asarray(normalize_wave_minmax(x))
        np.testing.assert_allclose(y, [-1.0, 2.0 / 65535.0, 1.0], atol=1e-4)
        # denormalize formula (ref utils.py:23-24): 65535*x/2 - 1 + 32767
        np.testing.assert_allclose(
            np.asarray(denormalize_wave_minmax(np.array([-1.0, 1.0]))),
            [-1.5, 65533.5], atol=1e-3)

    def test_preemph_deemph_inverse(self):
        x = _rand(1000)
        y = pre_emphasize_np(x, 0.95)
        x2 = de_emphasize_np(y, 0.95)
        np.testing.assert_allclose(x, x2, atol=1e-4)

    def test_deemph_scan_matches_sequential(self):
        y = _rand(4, 512)
        # sequential reference semantics (ref se_dataset.py:119-126)
        x_ref = np.zeros_like(y)
        for b in range(y.shape[0]):
            x_ref[b, 0] = y[b, 0]
            for n in range(1, y.shape[1]):
                x_ref[b, n] = 0.95 * x_ref[b, n - 1] + y[b, n]
        x_jax = np.asarray(de_emphasize(jnp.asarray(y), 0.95))
        np.testing.assert_allclose(x_jax, x_ref, atol=1e-3)
        x_np = de_emphasize_np(y, 0.95)
        np.testing.assert_allclose(x_np, x_ref, atol=1e-4)

    def test_preemph_jax_matches_np(self):
        x = _rand(3, 777)
        a = np.asarray(pre_emphasize(jnp.asarray(x)))
        for i in range(3):
            np.testing.assert_allclose(a[i], pre_emphasize_np(x[i]), atol=1e-6)

    def test_make_div_n(self):
        # ref utils.py:26-38 quirk: adds a full extra N when already divisible
        assert make_div_n(jnp.zeros((100,)), 64).shape == (128,)
        assert make_div_n(jnp.zeros((128,)), 64).shape == (192,)

    def test_slice_indices(self):
        # ref se_dataset.py:80: beg in range(0, n - window + 1, offset)
        idx = slice_signal_indices(40000, 16384, 0.5)
        assert idx == [(0, 16384), (8192, 24576), (16384, 32768)]


class TestSTFT:
    def test_matches_torch_stft(self):
        x = _rand(2, 16384)
        mag = np.asarray(stft_mag(jnp.asarray(x), n_fft=2048, hop_length=160,
                                  win_length=320, normalized=True))
        xt = torch.from_numpy(x)
        st = torch.stft(xt, n_fft=2048, hop_length=160, win_length=320,
                        window=torch.ones(320), normalized=True, center=True,
                        return_complex=True)
        mag_t = st.abs().numpy()
        assert mag.shape == mag_t.shape
        np.testing.assert_allclose(mag, mag_t, atol=2e-4)

    def test_matmul_dft_matches_fft(self):
        """The MXU matmul-DFT path (auto-selected on TPU, where XLA's fft costs
        ~40% of the WSEGAN step) must match the rfft path numerically."""
        x = jnp.asarray(_rand(2, 16384))
        kw = dict(n_fft=2048, hop_length=160, win_length=320, normalized=True)
        m_fft = np.asarray(stft_mag(x, method="fft", **kw))
        m_mm = np.asarray(stft_mag(x, method="matmul", **kw))
        np.testing.assert_allclose(m_mm, m_fft, atol=2e-5)
        # torch parity of the matmul path directly
        xt = torch.from_numpy(np.asarray(x))
        st = torch.stft(xt, n_fft=2048, hop_length=160, win_length=320,
                        window=torch.ones(320), normalized=True, center=True,
                        return_complex=True)
        np.testing.assert_allclose(m_mm, st.abs().numpy(), atol=2e-4)
        # gradients agree too (the power loss backwards through this)
        def loss(xx, method):
            from segan_pytorch_tpu.ops.stft import power_spectrum_db  # noqa
            m = stft_mag(xx, method=method, **kw)
            return jnp.mean(10.0 * jnp.log10(m ** 2 + 1e-19))
        g_fft = np.asarray(jax.grad(lambda a: loss(a, "fft"))(x))
        g_mm = np.asarray(jax.grad(lambda a: loss(a, "matmul"))(x))
        np.testing.assert_allclose(g_mm, g_fft, atol=2e-4)

    def test_short_input_small_nfft(self):
        """n_fft = min(T, 2048) path with the matmul method (T < win grid)."""
        x = jnp.asarray(_rand(1, 1024))
        a = np.asarray(stft_mag(x, method="fft"))
        b = np.asarray(stft_mag(x, method="matmul"))
        np.testing.assert_allclose(b, a, atol=2e-5)

    def test_power_loss_grad_finite_on_silence(self):
        """Regression (caught in a real WSEGAN hardware run): the power loss
        gradient must be finite on inputs with exactly-zero frames — the old
        sqrt(|X|)-then-square chain NaN'd there (d sqrt/dx at 0 = inf, * 0)."""
        from segan_pytorch_tpu.ops.stft import power_spectrum_db

        for method in ("fft", "matmul"):
            for x in (jnp.zeros((2, 4096), jnp.float32),          # all silence
                      jnp.concatenate([jnp.zeros((1, 4096)),       # half silence
                                       jnp.asarray(_rand(1, 4096))])):
                g = jax.grad(lambda a: jnp.mean(
                    stft_mag(a, method=method, n_fft=2048) ** 2))(x)
                # stft_mag itself is documented grad-unsafe at 0; the LOSS path:
                gp = jax.grad(lambda a: jnp.mean(
                    power_spectrum_db(a, 2048, method=method)))(x)
                assert np.isfinite(np.asarray(gp)).all(), method
        del g  # mag grad may be nan at exact zeros; only the loss path is pinned

    def test_dft_basis_cache_is_trace_safe(self):
        """Regression: the cached DFT basis must be numpy, not a jax array — a
        first use INSIDE a jit trace would otherwise cache a tracer and poison
        every later trace (UnexpectedTracerError)."""
        from segan_pytorch_tpu.ops.stft import _dft_matrix_np

        _dft_matrix_np.cache_clear()
        kw = dict(n_fft=512, hop_length=160, win_length=320, method="matmul")
        x = jnp.asarray(_rand(1, 2048))
        y1 = jax.jit(lambda a: jnp.sum(stft_mag(a, **kw)))(x)  # populates cache
        y2 = jax.jit(lambda a: jnp.sum(stft_mag(a, **kw) * 2))(x)  # 2nd trace
        assert np.isfinite(float(y1)) and np.isfinite(float(y2))
        assert isinstance(_dft_matrix_np(320, 512), np.ndarray)


class TestPhaseShiftRoll:
    def test_matches_jnp_roll(self):
        from segan_pytorch_tpu.ops.roll import phase_shift_roll

        x = jnp.asarray(_rand(2, 33, 3))
        for s in range(1, 6):
            for right in (False, True):
                y = phase_shift_roll(x, jnp.asarray(s), jnp.asarray(right), 5)
                ref = jnp.roll(x, s if right else -s, axis=1)
                np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))

    def test_gradient_is_inverse_roll(self):
        from segan_pytorch_tpu.ops.roll import phase_shift_roll

        x = jnp.asarray(_rand(1, 16, 2))
        g = jax.grad(lambda v: jnp.sum(
            phase_shift_roll(v, jnp.asarray(3), jnp.asarray(True), 5) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(2 * x), rtol=1e-6)

    def test_large_max_shift_falls_back(self):
        from segan_pytorch_tpu.ops.roll import phase_shift_roll

        x = jnp.asarray(_rand(1, 64, 2))
        y = phase_shift_roll(x, jnp.asarray(20), jnp.asarray(False), 20)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(jnp.roll(x, -20, axis=1)))


class TestCustomConvGrads:
    """SEGAN_TPU_CONV_GRAD=custom replaces the strided conv/deconv backward with the
    blocked-transpose dx + phase-decomposed dot_general dw (ops/conv.py). The custom
    path must match XLA autodiff to float tolerance, forward and both grads."""

    def _run(self, monkeypatch, fn, args, mode):
        monkeypatch.setenv("SEGAN_TPU_CONV_GRAD", mode)
        return fn(*args)

    @pytest.mark.parametrize(
        "B,T,Ci,Co,K,s",
        [
            (2, 64, 3, 5, 31, 4),   # unused trailing input sample (T > s*(To-1)+K)
            (2, 67, 2, 64, 31, 4),  # the D input layer shape class
            (3, 40, 8, 4, 5, 2),
            (2, 33, 4, 4, 31, 3),   # stride not dividing K
            (1, 16, 1, 2, 4, 4),    # K == stride
        ],
    )
    def test_conv1d_custom_grads_match_xla(self, monkeypatch, B, T, Ci, Co, K, s):
        from segan_pytorch_tpu.ops.conv import conv1d

        x = jnp.asarray(_rand(B, T, Ci))
        w = jnp.asarray(_rand(K, Ci, Co, seed=3))

        def loss_x(xx, mode):
            monkeypatch.setenv("SEGAN_TPU_CONV_GRAD", mode)
            return jnp.sum(jnp.sin(conv1d(xx, w, stride=s)))

        def loss_w(ww, mode):
            monkeypatch.setenv("SEGAN_TPU_CONV_GRAD", mode)
            return jnp.sum(jnp.sin(conv1d(x, ww, stride=s)))

        monkeypatch.setenv("SEGAN_TPU_CONV_GRAD", "custom")
        y1 = conv1d(x, w, stride=s)
        monkeypatch.setenv("SEGAN_TPU_CONV_GRAD", "xla")
        y0 = conv1d(x, w, stride=s)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)
        gx0 = jax.grad(loss_x)(x, "xla")
        gx1 = jax.grad(loss_x)(x, "custom")
        np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1), atol=2e-4)
        gw0 = jax.grad(loss_w)(w, "xla")
        gw1 = jax.grad(loss_w)(w, "custom")
        np.testing.assert_allclose(np.asarray(gw0), np.asarray(gw1), atol=2e-4)

    @pytest.mark.parametrize(
        "B,L,Ci,Co,K,s,p",
        [
            (2, 16, 8, 4, 31, 4, 13),  # G decoder shape class
            (2, 10, 4, 1, 31, 4, 13),  # Cout=1 output layer
            (3, 9, 4, 3, 4, 2, 1),
            (2, 8, 2, 2, 8, 4, 2),
        ],
    )
    def test_deconv_custom_grads_match_xla(self, monkeypatch, B, L, Ci, Co, K, s, p):
        from segan_pytorch_tpu.ops.conv import conv_transpose1d_auto

        x = jnp.asarray(_rand(B, L, Ci))
        w = jnp.asarray(_rand(K, Ci, Co, seed=5))

        def loss_x(xx, mode):
            monkeypatch.setenv("SEGAN_TPU_CONV_GRAD", mode)
            return jnp.sum(jnp.sin(conv_transpose1d_auto(xx, w, stride=s, padding=p)))

        def loss_w(ww, mode):
            monkeypatch.setenv("SEGAN_TPU_CONV_GRAD", mode)
            return jnp.sum(jnp.sin(conv_transpose1d_auto(x, ww, stride=s, padding=p)))

        monkeypatch.setenv("SEGAN_TPU_CONV_GRAD", "custom")
        y1 = conv_transpose1d_auto(x, w, stride=s, padding=p)
        monkeypatch.setenv("SEGAN_TPU_CONV_GRAD", "xla")
        y0 = conv_transpose1d_auto(x, w, stride=s, padding=p)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)
        gx0 = jax.grad(loss_x)(x, "xla")
        gx1 = jax.grad(loss_x)(x, "custom")
        np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1), atol=2e-4)
        gw0 = jax.grad(loss_w)(w, "xla")
        gw1 = jax.grad(loss_w)(w, "custom")
        np.testing.assert_allclose(np.asarray(gw0), np.asarray(gw1), atol=2e-4)


class TestS2DEdgeConv:
    """Space-to-depth lowering for tiny-Cin strided convs (SEGAN_TPU_EDGE_CONV=s2d):
    bit-equal forward (identical FLOPs reassociated onto MXU lanes) and matching
    gradients vs the plain lowering."""

    @pytest.mark.parametrize("cin,T,K,s", [
        (1, 16384, 31, 4),   # G enc1
        (2, 1024, 31, 4),    # D conv1
        (1, 512, 31, 2),
        (2, 500, 15, 5),     # non-pow2 stride, T not aligned to any block
    ])
    def test_matches_plain_conv(self, cin, T, K, s):
        from segan_pytorch_tpu.ops.conv import (conv1d, conv1d_s2d,
                                                reflect_pad_1d)

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, T, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(K, cin, 8).astype(np.float32) * 0.1)
        xp = reflect_pad_1d(x, K // 2 - 1, K // 2)
        ref = conv1d(xp, w, stride=s)
        got = conv1d_s2d(xp, w, stride=s)
        assert got.shape == ref.shape
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

        gx_ref = jax.grad(lambda a: jnp.sum(
            conv1d(reflect_pad_1d(a, K // 2 - 1, K // 2), w, stride=s) ** 2))(x)
        gx_s2d = jax.grad(lambda a: jnp.sum(
            conv1d_s2d(reflect_pad_1d(a, K // 2 - 1, K // 2), w,
                       stride=s) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gx_s2d), np.asarray(gx_ref),
                                   atol=1e-4)
        gw_ref = jax.grad(lambda ww: jnp.sum(conv1d(xp, ww, stride=s) ** 2))(w)
        gw_s2d = jax.grad(
            lambda ww: jnp.sum(conv1d_s2d(xp, ww, stride=s) ** 2))(w)
        np.testing.assert_allclose(np.asarray(gw_s2d), np.asarray(gw_ref),
                                   atol=1e-2, rtol=1e-5)

    def test_env_dispatch_gates_on_cin(self, monkeypatch):
        """The env flag reroutes only the tiny-Cin edge shapes (Cin*K <= 64);
        fat layers keep the plain lowering (where XLA already wins)."""
        from segan_pytorch_tpu.ops.conv import conv1d

        rng = np.random.RandomState(1)
        x1 = jnp.asarray(rng.randn(2, 16413, 1).astype(np.float32))
        w1 = jnp.asarray(rng.randn(31, 1, 64).astype(np.float32) * 0.1)
        x2 = jnp.asarray(rng.randn(2, 1024, 64).astype(np.float32))
        w2 = jnp.asarray(rng.randn(31, 64, 32).astype(np.float32) * 0.1)
        monkeypatch.setenv("SEGAN_TPU_EDGE_CONV", "0")
        ref1, ref2 = conv1d(x1, w1, stride=4), conv1d(x2, w2, stride=4)
        monkeypatch.setenv("SEGAN_TPU_EDGE_CONV", "s2d")
        got1, got2 = conv1d(x1, w1, stride=4), conv1d(x2, w2, stride=4)
        np.testing.assert_array_equal(np.asarray(got1), np.asarray(ref1))
        np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref2))

    def test_full_train_step_equal(self, monkeypatch, tmp_path):
        """The fused SEGAN step under the flag reproduces the default step's
        losses (fresh engines -> fresh jits; env is read at trace time)."""
        from segan_pytorch_tpu.utils.config import SEGANConfig
        from segan_pytorch_tpu.models import SEGAN

        def run(flag):
            monkeypatch.setenv("SEGAN_TPU_EDGE_CONV", flag)
            cfg = SEGANConfig(slice_size=1024, genc_fmaps=[8, 16, 32],
                              genc_poolings=[4, 4, 4], z_dim=32,
                              denc_fmaps=[8, 16, 32], denc_poolings=[4, 4, 4],
                              dpool_slen=16, batch_size=4,
                              save_path=str(tmp_path))
            s = SEGAN(cfg)
            s.init_state(jax.random.PRNGKey(0), batch_size=4)
            s.prepare_train(4)
            rng = np.random.RandomState(3)
            clean = rng.randn(4, 1024, 1).astype(np.float32) * 0.1
            noisy = clean + rng.randn(4, 1024, 1).astype(np.float32) * 0.05
            m, _, _ = s.train_step(clean, noisy, np.ones((4,), np.float32),
                                   jax.random.PRNGKey(1), 100.0)
            return {k: float(v) for k, v in m.items()}

        base = run("0")
        s2d = run("s2d")
        for k in base:
            assert abs(base[k] - s2d[k]) <= 1e-4 * (abs(base[k]) + 1e-3), \
                (k, base[k], s2d[k])

    def test_full_train_step_equal_combined_edge_lowerings(self, monkeypatch,
                                                           tmp_path):
        """The queued perf matrix's 'both' configuration (s2d edge convs +
        edge-blocked deconv for the Cout=1 output layer) is step-equal to the
        default path — the TPU measurement can flip defaults without a
        correctness question."""
        from segan_pytorch_tpu.utils.config import SEGANConfig
        from segan_pytorch_tpu.models import SEGAN

        def run(edge, deconv):
            monkeypatch.setenv("SEGAN_TPU_EDGE_CONV", edge)
            monkeypatch.setenv("SEGAN_TPU_DECONV", deconv)
            cfg = SEGANConfig(slice_size=1024, genc_fmaps=[8, 16, 32],
                              genc_poolings=[4, 4, 4], z_dim=32,
                              denc_fmaps=[8, 16, 32], denc_poolings=[4, 4, 4],
                              dpool_slen=16, batch_size=4,
                              save_path=str(tmp_path))
            s = SEGAN(cfg)
            s.init_state(jax.random.PRNGKey(0), batch_size=4)
            s.prepare_train(4)
            rng = np.random.RandomState(3)
            clean = rng.randn(4, 1024, 1).astype(np.float32) * 0.1
            noisy = clean + rng.randn(4, 1024, 1).astype(np.float32) * 0.05
            m, _, _ = s.train_step(clean, noisy, np.ones((4,), np.float32),
                                   jax.random.PRNGKey(1), 100.0)
            return {k: float(v) for k, v in m.items()}

        base = run("0", "dilated")
        both = run("s2d", "edge-blocked")
        for k in base:
            assert abs(base[k] - both[k]) <= 1e-4 * (abs(base[k]) + 1e-3), \
                (k, base[k], both[k])
