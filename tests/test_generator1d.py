"""Generator1D (legacy v1) tests.

The reference's Generator1D is dead code — it builds layers from `GBlock`, which
is absent from the repo (NameError at ref generator.py:328), so no torch parity
is possible; these tests pin the reconstruction's shape contract, the live
option matrix, and the reference-documented behaviors (z reuse, no_tanh linear
output, NotImplementedError for mlpconv exactly like ref generator.py:345-346).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segan_pytorch_tpu.models.generator1d import Generator1D

pytestmark = pytest.mark.quick

KEY = jax.random.PRNGKey(0)


def build(x, pooling=4, **kw):
    g = Generator1D(ninputs=1, enc_fmaps=[8, 16, 32], kwidth=31,
                    pooling=pooling, z_dim=16, **kw)
    extra = {}
    if kw.get("num_spks"):
        extra["spkid"] = jnp.arange(x.shape[0])
    v = g.init({"params": KEY, "z": KEY, "dropout": KEY}, x, train=False, **extra)
    return g, v, extra


X = jnp.asarray(np.random.RandomState(0).randn(2, 1024, 1).astype(np.float32))


class TestGenerator1DOptions:
    @pytest.mark.parametrize("kw", [
        {},
        {"no_z": True},
        {"rnn_core": True},
        {"num_spks": 4},
        {"linterp": True},
        {"use_pos_code": True},
        {"post_proc": True},
        {"out_gate": True},
        {"big_out_filter": True},
        {"lnorm": True, "dropout": 0.2},
        {"skip_blacklist": (0,)},
        {"skip_merge": "concat"},
        {"aal": True},
        {"aal_out": True},
        {"convblock": True},
        {"snorm": True},
        {"freeze_enc": True},
    ])
    def test_shape_roundtrip(self, kw):
        g, v, extra = build(X, **kw)
        y = g.apply(v, X, train=False, rngs={"z": KEY}, **extra)
        assert y.shape == X.shape

    def test_z_all_doubles_time_per_stage(self):
        # the reference's z_all doubles z's time axis per decoder stage
        # (ref generator.py:552-554) — consistent only with pooling=2
        g, v, extra = build(X, pooling=2, z_all=True)
        y = g.apply(v, X, train=False, rngs={"z": KEY})
        assert y.shape == X.shape

    def test_tanh_bounds_and_no_tanh_linear(self):
        g, v, _ = build(X)
        y = g.apply(v, X, train=False, rngs={"z": KEY})
        assert float(jnp.max(jnp.abs(y))) <= 1.0
        g2, v2, _ = build(X, no_tanh=True)
        y2 = g2.apply(v2, X * 100, train=False, rngs={"z": KEY})
        assert float(jnp.max(jnp.abs(y2))) > 0  # linear head, unbounded

    def test_pinned_z_reproducible(self):
        g, v, _ = build(X)
        z = g.sample_z(jax.random.PRNGKey(3), (2, 16, 32))
        y1 = g.apply(v, X, z=z, train=False)
        y2 = g.apply(v, X, z=z, train=False)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_onehot_requires_spkid(self):
        g = Generator1D(ninputs=1, enc_fmaps=[8, 16, 32], kwidth=31,
                        pooling=4, z_dim=16, num_spks=4)
        with pytest.raises(ValueError, match="spk ID"):
            g.init({"params": KEY, "z": KEY}, X, train=False)

    def test_mlpconv_raises_like_reference(self):
        g = Generator1D(ninputs=1, enc_fmaps=[8, 16, 32], kwidth=31,
                        pooling=4, z_dim=16, mlpconv=True)
        with pytest.raises(NotImplementedError, match="MLPconv"):
            g.init({"params": KEY, "z": KEY}, X, train=False)

    def test_satt_rejected_loudly(self):
        g = Generator1D(ninputs=1, enc_fmaps=[8, 16, 32], kwidth=31,
                        pooling=4, z_dim=16, satt=True)
        with pytest.raises(NotImplementedError, match="satt"):
            g.init({"params": KEY, "z": KEY}, X, train=False)

    def test_freeze_enc_stops_bottleneck_gradients(self):
        """The reference detaches AFTER skips are captured (generator.py:521-522),
        so encoder grads vanish only when skips are off; with skips on they still
        flow through the skip tensors — replicate both behaviors."""
        def grads_for(**kw):
            g, v, _ = build(X, **kw)
            z = g.sample_z(jax.random.PRNGKey(3), (2, 16, 32))

            def loss(params):
                y = g.apply({"params": params}, X, z=z, train=False)
                return jnp.mean(y.astype(jnp.float32) ** 2)

            grads = jax.grad(loss)(v["params"])

            def norm(prefix):
                return sum(float(jnp.sum(jnp.abs(l)))
                           for k, sub in grads.items() if k.startswith(prefix)
                           for l in jax.tree.leaves(sub))

            return norm("gen_enc"), norm("gen_dec")

        enc_n, dec_n = grads_for(freeze_enc=True, skip=False)
        assert enc_n == 0.0  # bottleneck path cut, no skips -> frozen encoder
        assert dec_n > 0.0
        enc_s, _ = grads_for(freeze_enc=True)  # skips on: grads leak via skips
        assert enc_s > 0.0
