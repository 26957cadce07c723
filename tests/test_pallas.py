"""Pallas fused conv kernel tests (interpret mode on CPU): forward parity with the XLA
path, gradient parity through the custom VJP, and the use_pallas generator path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segan_pytorch_tpu.ops.conv import conv1d, reflect_pad_1d
from segan_pytorch_tpu.ops.pallas import conv1d as plconv

pytestmark = pytest.mark.quick

KEY = jax.random.PRNGKey(0)


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.fixture(autouse=True)
def force_interpret(monkeypatch):
    """CPU has no Mosaic; run the kernel in interpreter mode for these tests."""
    orig = plconv._pallas_conv_prelu

    def interp(x, w, b, a, stride, t_tile, interpret):
        return orig(x, w, b, a, stride, t_tile, True)

    monkeypatch.setattr(plconv, "_pallas_conv_prelu", interp)
    yield


def _xla_ref(x_p, w, b, a, stride):
    pre = conv1d(jnp.asarray(x_p), jnp.asarray(w), jnp.asarray(b), stride=stride)
    y = jnp.maximum(pre, 0) + jnp.asarray(a) * jnp.minimum(pre, 0)
    return y, pre


class TestFusedConvForward:
    @pytest.mark.parametrize("B,L,cin,cout,k,s", [
        (2, 256, 4, 8, 31, 4),
        (1, 128, 8, 16, 31, 1),
        (2, 64, 3, 8, 5, 2),
    ])
    def test_matches_xla(self, B, L, cin, cout, k, s):
        x = _rand(B, L, cin)
        w = _rand(k, cin, cout, seed=1) * 0.1
        b = _rand(cout, seed=2) * 0.1
        a = _rand(cout, seed=3) * 0.1
        P = (k // 2 - 1, k // 2) if s > 1 else (k // 2, k // 2)
        x_p = np.asarray(reflect_pad_1d(jnp.asarray(x), *P))
        y, pre = plconv.fused_conv1d_prelu(
            jnp.asarray(x_p), jnp.asarray(w), jnp.asarray(b), jnp.asarray(a), s)
        y_ref, pre_ref = _xla_ref(x_p, w, b, a, s)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=5e-6)
        np.testing.assert_allclose(np.asarray(pre), np.asarray(pre_ref), atol=5e-6)


class TestFusedEncoder23:
    def test_matches_xla_chain(self):
        """Chained enc2+enc3 kernel == reflect-pad -> conv -> PReLU twice via
        the XLA ops (interpret mode; small channel widths, same 31/4 geometry)."""
        from segan_pytorch_tpu.ops.pallas import encoder_fused as ef

        B, T1, C1, C2, C3 = 4, 256, 8, 16, 32
        h1 = _rand(B, T1, C1)
        w2 = _rand(31, C1, C2, seed=1) * 0.1
        b2 = _rand(C2, seed=2) * 0.1
        a2 = _rand(C2, seed=3) * 0.1
        w3 = _rand(31, C2, C3, seed=4) * 0.1
        b3 = _rand(C3, seed=5) * 0.1
        a3 = _rand(C3, seed=6) * 0.1
        pre2, pre3, post3 = ef.fused_enc23_fwd(
            jnp.asarray(h1), jnp.asarray(w2), jnp.asarray(b2), jnp.asarray(a2),
            jnp.asarray(w3), jnp.asarray(b3), jnp.asarray(a3),
            batch_tile=2, interpret=True)

        xp = reflect_pad_1d(jnp.asarray(h1), 14, 15)
        y2_ref, pre2_ref = _xla_ref(np.asarray(xp), w2, b2, a2, 4)
        yp = reflect_pad_1d(y2_ref, 14, 15)
        y3_ref, pre3_ref = _xla_ref(np.asarray(yp), w3, b3, a3, 4)
        np.testing.assert_allclose(np.asarray(pre2), np.asarray(pre2_ref),
                                   atol=5e-6)
        np.testing.assert_allclose(np.asarray(pre3), np.asarray(pre3_ref),
                                   atol=5e-6)
        np.testing.assert_allclose(np.asarray(post3), np.asarray(y3_ref),
                                   atol=5e-6)


class TestFusedConvGrad:
    def test_grad_parity_with_xla(self):
        B, L, cin, cout, k, s = 2, 128, 4, 8, 31, 4
        x_p = _rand(B, L + k - 1 - (s - 1), cin)
        w = _rand(k, cin, cout, seed=1) * 0.1
        b = _rand(cout, seed=2) * 0.1
        a = _rand(cout, seed=3) * 0.1
        tgt_len = (x_p.shape[1] - k) // s + 1

        def loss_pl(x, w, b, a):
            y, pre = plconv.fused_conv1d_prelu(x, w, b, a, s)
            return jnp.sum(y**2) + jnp.sum(pre * 0.1)

        def loss_xla(x, w, b, a):
            pre = conv1d(x, w, b, stride=s)
            y = jnp.maximum(pre, 0) + a * jnp.minimum(pre, 0)
            return jnp.sum(y**2) + jnp.sum(pre * 0.1)

        args = tuple(map(jnp.asarray, (x_p, w, b, a)))
        g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(*args)
        g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*args)
        for gp, gx, name in zip(g_pl, g_xla, "xwba"):
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-4,
                                       err_msg=name)


class TestGeneratorPallasPath:
    def test_generator_outputs_match(self):
        from segan_pytorch_tpu.utils.config import SEGANConfig
        from segan_pytorch_tpu.models.generator import build_generator

        base = dict(slice_size=1024, genc_fmaps=[8, 16], genc_poolings=[4, 4],
                    z_dim=16, save_path="/tmp/x")
        g0 = build_generator(SEGANConfig(**base))
        g1 = build_generator(SEGANConfig(use_pallas=True, **base))
        x = jnp.asarray(_rand(2, 1024, 1, seed=5))
        v = g0.init({"params": KEY, "z": KEY}, x, train=False)
        z = g0.sample_z(jax.random.PRNGKey(7), x.shape)
        y0 = g0.apply(v, x, z=z, train=False)
        y1 = g1.apply(v, x, z=z, train=False)  # same params tree
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)
